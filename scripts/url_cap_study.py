"""Hot-domain rehearsal for domain_cap (operators/url_dedup.py): one
domain holds ~95% of the corpus. The spec window sorts ALL of it on
one reducer; the banded plan's only sort is each domain's single
boundary band (~n/bands rows), with whole bands kept/dropped by the
(domain, band) count join.

Appends: engine  n_docs  op  wall_s  max_sorted_rows  rows_out
  * max_sorted_rows = the largest per-task sort the plan performs for
    the hot domain (window: the whole domain; banded: the boundary
    band) — the single-reducer-skew number that must stay bounded.

Run: python scripts/url_cap_study.py [n_docs] (default 400000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.operators.url_dedup import (
    _HASH_BUCKETS,
    _rank_hash,
    domain_cap,
    domain_cap_window,
)
from myhadoop_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    spark = get_spark("url_cap_study")
    out = Path("url_cap_study.tsv")
    if not out.exists():
        out.write_text(
            "engine\tn_docs\top\twall_s\tmax_sorted_rows\trows_out\n")

    hot = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 20 < 19, "hot.com")
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 5).cast("string"),
                            F.lit(".com"))).alias("domain")) \
        .localCheckpoint()
    cap = n // 10
    n_hot = hot.filter(F.col("domain") == "hot.com").count()

    bands = 32
    width = (_HASH_BUCKETS + bands - 1) // bands
    # boundary-band size: per-(domain,band) counts, find the band
    # straddling the cap for the hot domain
    from pyspark.sql import Window
    wb = (Window.partitionBy("domain").orderBy("_band")
          .rowsBetween(Window.unboundedPreceding, -1))
    lab = (hot.withColumn("_h", _rank_hash(F.col("doc_id")))
           .withColumn("_band", F.expr(f"_h div {width}"))
           .groupBy("domain", "_band").agg(F.count("*").alias("bn"))
           .withColumn("cum", F.coalesce(F.sum("bn").over(wb), F.lit(0)))
           .filter((F.col("domain") == "hot.com")
                   & (F.col("cum") < cap)
                   & (F.col("cum") + F.col("bn") > cap)))
    boundary_rows = [r["bn"] for r in lab.collect()]
    max_boundary = max(boundary_rows) if boundary_rows else 0

    def run(op, thunk, sorted_rows):
        t0 = time.time()
        rows = thunk().count()
        wall = time.time() - t0
        line = (f"myhadoop_spark\t{n}\t{op}\t{wall:.3f}\t"
                f"{sorted_rows}\t{rows}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip())

    run("domain_cap_window", lambda: domain_cap_window(hot, cap=cap),
        n_hot)
    run("domain_cap_banded",
        lambda: domain_cap(hot, cap=cap, bands=bands), max_boundary)
    spark.stop()


if __name__ == "__main__":
    main()
