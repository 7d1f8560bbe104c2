"""Fixture-table catalog.

The reference's "catalog" is a directory listing: one logical dataset per
input directory (/root/reference/tools.py:132-163). Ours is a thin
parquet→DataFrame loader over the driver fixtures (TESTDATA.md), with
temp-view registration so every query is also runnable as plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# dimension tables small enough to broadcast at any realistic scale factor
BROADCAST_TABLES = {"region", "nation"}


def tune(spark: SparkSession) -> SparkSession:
    """Runtime session settings every query depends on, applied defensively
    because the driver's harness may pass a session built elsewhere:
    UTC so timestamp semantics match the (UTC-naive) DuckDB oracle, and
    nanosAsLong so the ns-precision events table is readable at all."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


# (application id, sf_dir, table) → DataFrame; caches the analyzed
# logical plan so repeated query invocations skip file listing + footer
# reads (~100-200 ms of driver-side latency per table per query).
# Keyed by applicationId — unique per session, unlike id(spark) which
# the allocator may reuse after a stop().
_df_cache: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Column pruning/predicate pushdown reach the
    parquet scan because callers filter/select on the returned DataFrame
    before any action (Catalyst handles the rest)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; one of {TABLES}")
    tune(spark)
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, name)
    if key in _df_cache:
        return _df_cache[key]
    # evict entries from other (stopped) sessions so the cache cannot
    # grow without bound across session restarts in one process
    for stale in [k for k in _df_cache if k[0] != app_id]:
        del _df_cache[stale]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts arrives as raw nanoseconds (see tune()); truncate to µs exactly
        # like DuckDB's TIMESTAMP_NS → TIMESTAMP cast. Integer division —
        # double math would lose precision above 2^53 ns.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _df_cache[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view named after the table."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def load_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """load() plus scan widening for heavy per-row work.

    A fixture table is one small parquet file with one row group — a
    single input split — so compute-dense narrow pipelines (winnowing,
    minhash folds, per-char runs) would run on ONE core regardless of
    shuffle settings. When the scan yields fewer partitions than the
    default parallelism, repartition round-robin up to it; on real
    multi-file data (the 100 TB case) the scan already produces at
    least that many splits and this is a NO-OP — no shuffle appears in
    the plan."""
    df = load(spark, sf_dir, name)
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df
