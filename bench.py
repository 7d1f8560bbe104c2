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


def run_query(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf")) if "sf" in Path(sf_dir).name else 0.0
    spark = get_spark("bench")
    qs = registry.all_queries()

    # JVM/codegen warm-up on an uncounted query so the first measured
    # query doesn't absorb session start-up cost
    run_query(spark, qs["wc"], sf_dir)

    times: dict[str, float] = {}
    for name, fn in qs.items():
        times[name] = round(run_query(spark, fn, sf_dir), 4)

    total = round(sum(times.values()), 4)

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
