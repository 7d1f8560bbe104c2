"""Third wave: sessionization, exact median, unpivot, date & array
function batteries — rounding out the SURVEY.md §2.2 scalar/temporal
surface with engine-portable semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.functions.money import dec
from myhadoop_spark.registry import register

# ---------------------------------------------------------------------------
# batch sessionization (gaps-and-islands) — the batch twin of
# streaming/windows.sessionized (session_window)
# ---------------------------------------------------------------------------

SESSION_GAP_US = 10 * 60 * 1_000_000  # 10 minutes in µs


@register(
    "sessionize",
    oracle=f"""
    WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events),
    l AS (SELECT user_id, event_id, ts, value,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                           > {SESSION_GAP_US}
                      THEN 1 ELSE 0 END AS is_new
          FROM e WINDOW w AS (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC)),
    s AS (SELECT user_id, ts, value,
                 SUM(is_new) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC
                                   ROWS UNBOUNDED PRECEDING) AS session_id
          FROM l)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM s GROUP BY user_id, session_id
    """,
    tags=("window", "session", "extension"),
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: a session breaks after a 10-minute
    silence per user. One window pass (lag → new-session flag → running
    sum) + one grouped aggregate; shuffles once on user_id. The streaming
    twin (session_window) lives in streaming/windows.py."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    wo = Window.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                               F.col("event_id").asc())
    us = F.unix_micros("ts")
    is_new = F.when(
        F.lag(us).over(wo).isNull()
        | ((us - F.lag(us).over(wo)) > SESSION_GAP_US), 1).otherwise(0)
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = ev.withColumn("session_id",
                           F.sum(is_new).over(wrun).cast("bigint"))
    return (
        tagged.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").cast("timestamp_ntz").alias("session_start"),
            F.max("ts").cast("timestamp_ntz").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# exact median via double-row_number (deterministic, unlike interpolating
# percentile implementations which differ across engines)
# ---------------------------------------------------------------------------


@register(
    "median_price",
    oracle="""
    WITH r AS (SELECT o_orderpriority, o_totalprice, o_orderkey,
                      ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                         ORDER BY o_totalprice ASC,
                                                  o_orderkey ASC) AS rn,
                      COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
               FROM orders)
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS median_price,
           MIN(cnt) AS n_orders
    FROM r
    WHERE rn = CAST(floor((cnt + 1) / 2.0) AS BIGINT)
       OR rn = CAST(floor((cnt + 2) / 2.0) AS BIGINT)
    GROUP BY o_orderpriority
    """,
    tags=("aggregate", "percentile"),
)
def median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median: the middle element (odd) or the mean of
    the two middle elements (even), selected by row_number — bit-exact
    across engines, unlike interpolating percentile_cont variants."""
    orders = load(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority")
    wo = wp.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    r = orders.select(
        "o_orderpriority", "o_totalprice",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("cnt"),
    )
    mid1 = F.floor((F.col("cnt") + 1) / 2.0).cast("bigint")
    mid2 = F.floor((F.col("cnt") + 2) / 2.0).cast("bigint")
    return (
        r.filter((F.col("rn") == mid1) | (F.col("rn") == mid2))
        .groupBy("o_orderpriority")
        .agg(
            (F.sum(dec("o_totalprice")).cast("double")
             / F.count(F.lit(1))).alias("median_price"),
            F.min("cnt").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# unpivot (wide → long)
# ---------------------------------------------------------------------------


@register(
    "unpivot_metrics",
    oracle="""
    WITH long AS (
      SELECT 'quantity' AS metric, CAST(l_quantity AS DECIMAL(18,2)) AS v
      FROM lineitem
      UNION ALL
      SELECT 'extendedprice', CAST(l_extendedprice AS DECIMAL(18,2))
      FROM lineitem
      UNION ALL
      SELECT 'discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
    )
    SELECT metric, COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS total
    FROM long GROUP BY metric
    """,
    tags=("unpivot",),
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stack() unpivot of three measures into (metric, value) rows +
    per-metric aggregate. The scan is read once; stack expands rows
    inside the same codegen stage (no triple scan, unlike the UNION ALL
    oracle formulation)."""
    li = load(spark, sf_dir, "lineitem")
    long = li.selectExpr(
        "stack(3, 'quantity', CAST(l_quantity AS DECIMAL(18,2)),"
        " 'extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)),"
        " 'discount', CAST(l_discount AS DECIMAL(18,2))) AS (metric, v)"
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("total"),
    )


# ---------------------------------------------------------------------------
# date arithmetic battery
# ---------------------------------------------------------------------------


@register(
    "date_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(date_diff('day', o_orderdate, l_shipdate) AS INT) AS ship_days,
           CAST(l_shipdate + INTERVAL 30 DAY AS TIMESTAMP) AS ship_plus_30,
           CAST(isodow(l_shipdate) - 1 AS INT) AS ship_weekday,
           CAST(last_day(l_shipdate) AS DATE) AS ship_month_end,
           CAST(quarter(l_shipdate) AS INT) AS ship_quarter,
           CAST(epoch(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS ship_epoch
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_orderkey % 100 = 0
    """,
    tags=("scalar", "date"),
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal function battery (datediff, interval add, weekday,
    last_day, quarter, epoch) with cross-engine alignment notes:
    Spark weekday() is 0=Monday == DuckDB isodow-1; Spark date_add
    returns DATE so it is cast back to midnight timestamp to match
    ts + INTERVAL."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    ship = F.col("l_shipdate")
    return j.select(
        "l_orderkey", "l_linenumber",
        F.datediff(ship.cast("date"), F.col("o_orderdate").cast("date"))
        .alias("ship_days"),
        F.date_add(ship.cast("date"), 30).cast("timestamp_ntz")
        .alias("ship_plus_30"),
        F.weekday(ship).alias("ship_weekday"),
        F.last_day(ship.cast("date")).alias("ship_month_end"),
        F.quarter(ship).alias("ship_quarter"),
        F.unix_timestamp(ship).cast("bigint").alias("ship_epoch"),
    )


# ---------------------------------------------------------------------------
# array function battery
# ---------------------------------------------------------------------------


@register(
    "array_fns",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS n_dims,
           embedding[1] AS first_val,
           embedding[-1] AS last_val,
           list_max(embedding) AS vmax,
           list_min(embedding) AS vmin,
           CAST(len(list_filter(embedding, x -> x < 0)) AS INT) AS n_neg,
           list_slice(embedding, 1, 3) AS head3,
           list_reverse(list_slice(embedding, 1, 3)) AS head3_rev,
           list_sort(list_slice(embedding, 1, 4))[4] AS top_of_4
    FROM embeddings WHERE vec_id % 10 = 0
    """,
    tags=("scalar", "array"),
)
def array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function battery over the embedding column: size, indexing,
    min/max, filtered count, slice, reverse, sort — all JVM built-ins
    (float32 values pass through untouched, so no float math to drift)."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(e).alias("n_dims"),
        F.element_at(e, 1).alias("first_val"),
        F.element_at(e, -1).alias("last_val"),
        F.array_max(e).alias("vmax"),
        F.array_min(e).alias("vmin"),
        F.size(F.filter(e, lambda x: x < 0)).alias("n_neg"),
        F.slice(e, 1, 3).alias("head3"),
        F.reverse(F.slice(e, 1, 3)).alias("head3_rev"),
        F.element_at(F.array_sort(F.slice(e, 1, 4)), 4).alias("top_of_4"),
    )
