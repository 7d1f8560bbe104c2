"""pandas_udf_score group-size amortization evidence (VERDICT r3
item 2 — the last perf-weak entry).

The bench-visible pandas_udf_score wall (~6.7 s median at sf0.1) is
dominated by per-group Arrow dispatch over ~15k tiny groups (~10 rows
each), not by Python compute: the grouped-map stage alone costs ~3.3 s
regardless of plan shape (BENCH_NOTES r3 decomposition). This script
times the same three-branch battery (scalar pandas UDF + GROUPED_AGG
UDAF + applyInPandas grouped map, identical plan shape: one explicit
hashpartitioning exchange feeding both pandas branches, co-partitioned
reassembly join) with the SAME input rows but geometrically FEWER
groups — group key = o_custkey % G — and appends to pandas_scaling.tsv:

    engine  sf  n_groups  rows  wall_s  us_per_row

If wall falls as groups shrink at constant row count, the per-group
Arrow overhead amortizes with group size — i.e. the 40× bench ratio on
15k toy groups is a fixed-cost artifact of group granularity, and real
workloads (fewer, larger groups per partition) sit near the flat part
of the curve. The reference analog: its entire user surface is the
arbitrary-Python-callable path (/root/reference/app.py:6-14); this
battery is that surface's honest cost on Spark.

Run: python scripts/pandas_scaling.py [sf_dir] [group_counts...]
     (default /root/testdata/sf0.1 15000 1500 150)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.queries.relational2 import (
    _affinity_score,
    _cents_total,
    _rank_in_customer,
)
from myhadoop_spark.session import get_spark
from myhadoop_spark.shipping import ensure_shipped


def build(spark, sf_dir: str, n_groups: int):
    """The pandas_udf_score battery with group key o_custkey % n_groups
    — same rows, same three Python paths, same exchange discipline."""
    orders = (load(spark, sf_dir, "orders")
              .select("o_orderkey", "o_custkey", "o_totalprice")
              .withColumn("gkey", F.pmod(F.col("o_custkey"), F.lit(n_groups)))
              .withColumn("cents",
                          F.round(F.col("o_totalprice") * 100, 0)
                          .cast("long"))
              .repartition(spark.sparkContext.defaultParallelism,
                           F.col("gkey")))
    ranked = orders.groupBy("gkey").applyInPandas(
        lambda pdf: _rank_in_customer(pdf),
        schema=("o_orderkey bigint, o_custkey bigint, o_totalprice double, "
                "gkey bigint, cents bigint, price_rank bigint"))
    totals = orders.groupBy("gkey").agg(
        _cents_total("cents").alias("cust_total_cents"))
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return (
        ranked.join(totals, "gkey")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey",
                _affinity_score(F.col("o_totalprice").cast("double"),
                                F.col("c_acctbal")).alias("score"),
                "cust_total_cents", "price_rank")
    )


def run_one(spark, sf_dir: str, n_groups: int) -> float:
    df = build(spark, sf_dir, n_groups)
    df.write.format("noop").mode("overwrite").save()  # warm
    walls = []
    for _ in range(3):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    return min(walls)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and not args[0].isdigit() else "/root/testdata/sf0.1"
    counts = [int(a) for a in args if a.isdigit()] or [15_000, 1_500, 150]
    spark = get_spark("pandas_scaling")
    ensure_shipped(spark)
    rows = load(spark, sf_dir, "orders").count()
    sf = Path(sf_dir).name
    out = Path("pandas_scaling.tsv")
    if not out.exists():
        out.write_text("engine\tsf\tn_groups\trows\twall_s\tus_per_row\n")
    for g in counts:
        w = run_one(spark, sf_dir, g)
        line = (f"myhadoop_spark\t{sf}\t{g}\t{rows}\t{w:.3f}\t"
                f"{w / rows * 1e6:.2f}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip())
    spark.stop()


if __name__ == "__main__":
    main()
