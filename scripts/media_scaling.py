"""media_features floor-bound evidence (VERDICT r2 perf-weak #3).

The bench-visible media_features wall (~0.6 s at any toy n) is the
mapInPandas Python-stage floor (worker dispatch + Arrow setup), not
per-row work. This script times the same decode → rollup pipeline at
geometrically growing media counts and appends to media_scaling.tsv:

    engine  n_media  wall_s  rows_per_s

If wall is ~flat from 64 → 6,400 and then grows ~linearly, the bench
ratio vs DuckDB's 8 ms is a fixed-cost artifact that amortizes at real
scale — the same argument (and shape) as scaling_study.tsv.

Run: python scripts/media_scaling.py [counts...]  (default 64 6400 640000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.session import get_spark
from myhadoop_spark.sources.multimodal import decode_media, fake_media_df


def run_one(spark, n: int) -> float:
    df = decode_media(fake_media_df(spark, n), fake=True, feature_dim=8)
    out = df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
    )
    # warm + 2 measured reps, min (floor-seeking: we're measuring cost
    # structure, not steady-state throughput)
    out.write.format("noop").mode("overwrite").save()
    walls = []
    for _ in range(2):
        t0 = time.time()
        out.write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    return min(walls)


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [64, 6_400, 640_000]
    spark = get_spark("media_scaling")
    out = Path("media_scaling.tsv")
    if not out.exists():
        out.write_text("engine\tn_media\twall_s\trows_per_s\n")
    for n in counts:
        w = run_one(spark, n)
        line = f"myhadoop_spark\t{n}\t{w:.3f}\t{n / w:.0f}\n"
        with out.open("a") as f:
            f.write(line)
        print(line.strip())
    spark.stop()


if __name__ == "__main__":
    main()
