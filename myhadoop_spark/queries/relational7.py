"""Seventh wave: map-type battery, struct battery, null-safe join —
the last collection/semantics gaps in the §2.2 scalar surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.registry import register

# ---------------------------------------------------------------------------
# map functions (outputs flattened to scalars — map literals themselves
# render differently across engines, their CONTENTS don't)
# ---------------------------------------------------------------------------


@register(
    "map_fns",
    oracle="""
    WITH m AS (SELECT o_orderkey,
                      MAP {'status': o_orderstatus,
                           'priority': o_orderpriority} AS props
               FROM orders WHERE o_orderkey % 500 = 0)
    SELECT o_orderkey,
           props['status'][1] AS status_val,
           props['priority'][1] AS prio_val,
           CAST(cardinality(props) AS INT) AS n_keys,
           array_to_string(list_sort(map_keys(props)), ',') AS keys_sorted,
           list_contains(map_keys(props), 'status') AS has_status,
           list_contains(map_keys(props), 'missing') AS has_missing
    FROM m
    """,
    tags=("scalar", "map"),
)
def map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type battery: construction, key lookup, cardinality, key
    enumeration, membership — emitted as scalars so both engines'
    map internals stay out of the comparison."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 500 == 0)
    props = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        F.element_at(props, "status").alias("status_val"),
        F.element_at(props, "priority").alias("prio_val"),
        F.size(props).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(props)), ",").alias("keys_sorted"),
        F.array_contains(F.map_keys(props), "status").alias("has_status"),
        F.array_contains(F.map_keys(props), "missing").alias("has_missing"),
    )


# ---------------------------------------------------------------------------
# struct functions
# ---------------------------------------------------------------------------


@register(
    "struct_fns",
    oracle="""
    WITH s AS (SELECT c_custkey,
                      struct_pack(seg := c_mktsegment,
                                  bal := c_acctbal,
                                  nation := c_nationkey) AS info
               FROM customer WHERE c_custkey % 100 = 0)
    SELECT c_custkey,
           info.seg AS seg,
           info.bal AS bal,
           CAST(info.nation AS INT) AS nation,
           info.bal > 0 AS solvent
    FROM s
    """,
    tags=("scalar", "struct"),
)
def struct_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct battery: construction + field access + derived predicate,
    flattened back to scalars for comparison."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 100 == 0)
    info = F.struct(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_nationkey").alias("nation"),
    )
    return c.select(
        "c_custkey",
        info.getField("seg").alias("seg"),
        info.getField("bal").alias("bal"),
        info.getField("nation").alias("nation"),
        (info.getField("bal") > 0).alias("solvent"),
    )


# ---------------------------------------------------------------------------
# null-safe join (<=> / IS NOT DISTINCT FROM)
# ---------------------------------------------------------------------------


@register(
    "nullsafe_join",
    oracle="""
    WITH a AS (SELECT c_custkey,
                      CASE WHEN c_nationkey % 5 = 0 THEN NULL
                           ELSE c_nationkey END AS nk
               FROM customer),
    b AS (SELECT n_nationkey, n_name,
                 CASE WHEN n_nationkey % 5 = 0 THEN NULL
                      ELSE n_nationkey END AS nk
          FROM nation)
    SELECT a.c_custkey, b.n_name
    FROM a JOIN b ON a.nk IS NOT DISTINCT FROM b.nk
    WHERE a.c_custkey % 20 = 0
    """,
    tags=("join", "null"),
)
def nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=>): NULL keys MATCH each other — a plain
    equi-join silently drops them. Exercises the NULL-bucket explosion
    case deliberately (every NULL-keyed customer × every NULL-keyed
    nation), which at scale is itself a skew hazard worth knowing."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_nationkey") % 5 == 0, None)
        .otherwise(F.col("c_nationkey")).alias("nk"),
    ).filter(F.col("c_custkey") % 20 == 0)
    nat = load(spark, sf_dir, "nation").select(
        "n_name",
        F.when(F.col("n_nationkey") % 5 == 0, None)
        .otherwise(F.col("n_nationkey")).alias("nk2"),
    )
    return (
        cust.join(nat, F.col("nk").eqNullSafe(F.col("nk2")))
        .select("c_custkey", "n_name")
    )
