"""Benchmark harness — the engine analog of the reference's
run_client_times.py (/root/reference/run_client_times.py:4-17) and
export_record.py, re-expressed for the declared query set.

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution uses the noop sink so the full physical plan runs (scan →
shuffle → agg) without sink or driver-collect overhead — the honest
engine-side number.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from myhadoop_spark import registry
from myhadoop_spark.session import get_spark


class ShuffleMeter:
    """Per-query shuffle read/write bytes scraped from the Spark UI REST
    API — the observability the reference exposes through its per-phase
    timing messages (/root/reference/datanode.py:346-370), here per
    Spark stage. Degrades to zeros when the UI is disabled."""

    def __init__(self, spark):
        self.base = spark.sparkContext.uiWebUrl  # None when UI disabled
        self.app_id = spark.sparkContext.applicationId
        self._last = (0, 0)

    def snapshot(self) -> tuple[int, int]:
        if not self.base:
            return self._last
        import urllib.request

        try:
            url = f"{self.base}/api/v1/applications/{self.app_id}/stages?status=complete"
            with urllib.request.urlopen(url, timeout=5) as r:
                stages = json.load(r)
            return (sum(s.get("shuffleReadBytes", 0) for s in stages),
                    sum(s.get("shuffleWriteBytes", 0) for s in stages))
        except Exception:
            return self._last

    def delta(self) -> tuple[int, int]:
        now = self.snapshot()
        d = (now[0] - self._last[0], now[1] - self._last[1])
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
    spark = get_spark("bench")
    qs = registry.all_queries()

    # JVM/codegen warm-up on an uncounted query so the first measured
    # query doesn't absorb session start-up cost
    run_query(spark, qs["wc"], sf_dir)

    meter = ShuffleMeter(spark)
    meter.delta()  # baseline after warm-up
    times: dict[str, float] = {}
    shuffles: dict[str, dict[str, int]] = {}
    for name, fn in qs.items():
        times[name] = round(run_query(spark, fn, sf_dir), 4)
        rd, wr = meter.delta()
        shuffles[name] = {"shuffle_read_bytes": rd, "shuffle_write_bytes": wr}

    total = round(sum(times.values()), 4)

    # shuffle-bytes detail to a side file (stdout stays the one-line
    # driver contract)
    with open("bench_shuffle.json", "w") as f:
        json.dump({"sf": sf, "queries": shuffles}, f, indent=1)

    # TSV record mirroring the reference's export shape
    # (/root/reference/export_record.py:8-56: one row per run with config
    # columns then per-phase times) — here one row per query.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    with open("bench_records.tsv", "w") as f:
        f.write("engine\tcpus\tsf\tquery\twall_s\n")
        for name, t in times.items():
            f.write(f"myhadoop_spark\t{cpus}\t{sf}\t{name}\t{t}\n")

    print(json.dumps({
        "metric": "declared_query_set_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
