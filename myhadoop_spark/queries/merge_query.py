"""merge_scd2 — MERGE upsert + SCD2 history as a declared query.

CDC over an orders snapshot: an update feed replaces half the rows
(WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT via operators/merge.py's
anti-join + union emulation — the image has no lakehouse format on the
classpath), then the merged snapshot is rewritten as slowly-changing-
dimension type-2 history per customer: each order version is valid from
its own date until the customer's next order (NULL → current).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.merge import merge_upsert, scd2_apply
from myhadoop_spark.registry import register

_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate")


@register(
    "merge_scd2",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                         o_totalprice, o_orderdate
                  FROM orders WHERE o_orderkey % 4 <> 0),
    upd AS (SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                   o_totalprice * 1.1 AS o_totalprice, o_orderdate
            FROM orders WHERE o_orderkey % 2 = 0),
    merged AS (SELECT * FROM base
               WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
               UNION ALL SELECT * FROM upd),
    s AS (SELECT *,
                 LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate ASC,
                                                  o_orderkey ASC) AS nxt
          FROM merged)
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(o_orderdate AS TIMESTAMP) AS valid_from,
           CAST(nxt AS TIMESTAMP) AS valid_to,
           nxt IS NULL AS is_current
    FROM s
    """,
    tags=("merge", "cdc", "extension"),
)
def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE + SCD2 battery: a stale orders snapshot (keys %4 != 0)
    receives an update feed (keys %2 == 0: status 'U', price × 1.1) via
    merge_upsert — matched rows replaced, unmatched inserted, untouched
    rows kept — then scd2_apply rewrites the merged snapshot as per-
    customer validity windows (lead over (o_orderdate, o_orderkey); the
    key tie-break makes same-day versions deterministic).

    Scale: one anti-join + union on the merge key, one window shuffle
    on the SCD key — both single-shuffle patterns at any snapshot
    size."""
    orders = load(spark, sf_dir, "orders").select(*_COLS)
    base = orders.filter(F.col("o_orderkey") % 4 != 0)
    updates = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
        "o_orderdate",
    )
    merged = merge_upsert(base, updates, "o_orderkey")
    hist = scd2_apply(merged, merged.limit(0), "o_custkey", "o_orderdate",
                      tiebreak=("o_orderkey",))
    return hist.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("valid_from").cast("timestamp_ntz").alias("valid_from"),
        F.col("valid_to").cast("timestamp_ntz").alias("valid_to"),
        "is_current",
    )
