"""Benchmark harness — the engine analog of the reference's
run_client_times.py (/root/reference/run_client_times.py:4-17) and
export_record.py, re-expressed for the declared query set.

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology (r2+): $SPARK_GRAFT_BENCH_REPS warm repetitions per query
(default 3) with the per-query MEDIAN reported — this machine's
run-to-run variance is ±2× (BENCH_NOTES.md), so single-rep deltas are
noise. Per-query shuffle/spill/peak-memory telemetry is scraped from
the Spark UI REST API (the observability the reference exposes through
its per-phase timing messages, /root/reference/datanode.py:346-370) and
attached under "telemetry" + mirrored to bench_shuffle.json.

Execution uses the noop sink so the full physical plan runs (scan →
shuffle → agg) without sink or driver-collect overhead — the honest
engine-side number.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from myhadoop_spark import registry
from myhadoop_spark.session import get_spark

_STAGE_FIELDS = {
    "shuffle_read_bytes": "shuffleReadBytes",
    "shuffle_write_bytes": "shuffleWriteBytes",
    "spill_memory_bytes": "memoryBytesSpilled",
    "spill_disk_bytes": "diskBytesSpilled",
    "peak_execution_memory": "peakExecutionMemory",
}


class StageMeter:
    """Per-query executor telemetry scraped from the Spark UI REST API.
    Cumulative across completed stages; delta() gives the per-query
    slice. peak_execution_memory is summed over stages — an upper bound
    on concurrent peak, but comparable run-to-run. Degrades to zeros
    when the UI is disabled."""

    def __init__(self, spark):
        self.base = spark.sparkContext.uiWebUrl  # None when UI disabled
        self.app_id = spark.sparkContext.applicationId
        self._last = dict.fromkeys(_STAGE_FIELDS, 0)

    def snapshot(self) -> dict[str, int]:
        if not self.base:
            return dict(self._last)
        import urllib.request

        try:
            url = (f"{self.base}/api/v1/applications/{self.app_id}"
                   "/stages?status=complete")
            with urllib.request.urlopen(url, timeout=5) as r:
                stages = json.load(r)
            return {k: sum(s.get(api, 0) for s in stages)
                    for k, api in _STAGE_FIELDS.items()}
        except Exception:
            return dict(self._last)

    def delta(self) -> dict[str, int]:
        now = self.snapshot()
        d = {k: now[k] - self._last[k] for k in _STAGE_FIELDS}
        self._last = now
        return d


def run_query(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_UI", "1")  # enables REST metrics
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf")) if "sf" in Path(sf_dir).name else 0.0
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("bench")
    qs = registry.all_queries()

    # JVM/codegen warm-up on an uncounted query so the first measured
    # query doesn't absorb session start-up cost
    run_query(spark, qs["wc"], sf_dir)

    meter = StageMeter(spark)
    meter.delta()  # baseline after warm-up
    times: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    telemetry: dict[str, dict[str, int]] = {}
    for name, fn in qs.items():
        rep_times = []
        for i in range(reps):
            rep_times.append(round(run_query(spark, fn, sf_dir), 4))
            if i == 0:
                # telemetry from the first rep only (per-run work, not ×reps)
                telemetry[name] = meter.delta()
            else:
                meter.delta()
        all_reps[name] = rep_times
        times[name] = round(statistics.median(rep_times), 4)

    total = round(sum(times.values()), 4)

    # telemetry detail to a side file (stdout stays the one-line
    # driver contract, plus a compact telemetry map)
    with open("bench_shuffle.json", "w") as f:
        json.dump({"sf": sf, "reps": all_reps, "queries": telemetry}, f, indent=1)

    # TSV record mirroring the reference's export shape
    # (/root/reference/export_record.py:8-56: one row per run with config
    # columns then per-phase times) — here one row per (query, rep).
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    with open("bench_records.tsv", "w") as f:
        f.write("engine\tcpus\tsf\tquery\trep\twall_s\n")
        for name, rts in all_reps.items():
            for i, t in enumerate(rts):
                f.write(f"myhadoop_spark\t{cpus}\t{sf}\t{name}\t{i}\t{t}\n")

    print(json.dumps({
        "metric": "declared_query_set_wall",
        "value": total,
        "unit": "sec",
        "n": reps,
        "aggregation": "median_of_warm_reps",
        "queries": times,
        "telemetry": {name: {"shuffle_write_bytes": t["shuffle_write_bytes"],
                             "spill_disk_bytes": t["spill_disk_bytes"],
                             "peak_execution_memory": t["peak_execution_memory"]}
                      for name, t in telemetry.items()},
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
