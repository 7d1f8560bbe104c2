"""Relational query set — SURVEY.md §2.4 queries 2-13.

The reference implements none of these (its data plane is map → shuffle →
reduce-by-key only, /root/reference/datanode.py:574-667); they are the
engine surface mandated by SURVEY.md §2.2. Every query is a declarative
DataFrame plan (Catalyst handles pushdown/pruning/join selection) with a
DuckDB oracle string for the differential gate.

Scale notes are inline per query; the common rules:
  * dimension tables (region, nation) are explicitly broadcast;
  * fact-fact joins shuffle on their keys and rely on AQE for skew;
  * monetary aggregates use exact DECIMAL sums (functions/money.py) so
    results are partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.functions.money import (
    SQL_REVENUE_TERM,
    davg,
    dec,
    dsum,
    revenue_term,
    sql_davg,
    sql_dsum,
    sql_dsum_raw,
)
from myhadoop_spark.registry import register

# ---------------------------------------------------------------------------
# 2. sort — global sort w/ deterministic tie-break + limit (reference analog:
#    the vestigial MergeSort app, /root/reference/app.py:17-43 → R14).
#    Scale: orderBy+limit compiles to TakeOrderedAndProject — each partition
#    keeps only its local top-N, no global shuffle of the full table.
# ---------------------------------------------------------------------------


@register(
    "sort_topn",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
    tags=("sort", "limit"),
)
def sort_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort of lineitem by price with unique (orderkey, linenumber)
    tie-break so the LIMIT is deterministic across engines."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(),
                 F.col("l_linenumber").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# 3. filter + projection — predicate pushdown & column pruning showcase.
# ---------------------------------------------------------------------------


@register(
    "filter_proj",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({SQL_REVENUE_TERM} AS DOUBLE) AS revenue,
           l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05
      AND l_quantity < 25
    """,
    tags=("filter", "projection"),
)
def filter_proj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range + numeric filters with arithmetic projection. The filters
    and the 4-column read schema push down to the parquet scan (verified
    via .explain: PushedFilters / ReadSchema)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") < 25)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            revenue_term().cast("double").alias("revenue"),
            "l_quantity",
        )
    )


# ---------------------------------------------------------------------------
# 4. grouped aggregation — TPC-H Q1 shape (generalizes reference R8+R11:
#    combiner + reduce-by-key, /root/reference/utilities.py:170-185 —
#    Spark's partial/final HashAggregate is exactly that two-round fold).
# ---------------------------------------------------------------------------


@register(
    "agg_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum_raw(SQL_REVENUE_TERM, 'sum_disc_price')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("aggregate",),
)
def agg_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped multi-aggregate. Partial aggregation (map-side
    combine) happens automatically — the Spark analog of the reference's
    ICPP/NEW combiner plans (/root/reference/datanode.py:449-496)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(revenue_term()).cast("double").alias("sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# 5. two-table join + aggregation.
#    Scale: orders⋈customer is a shuffle hash/sort-merge join on custkey at
#    100 TB (both sides large); AQE picks broadcast automatically when the
#    dim side fits under the threshold.
# ---------------------------------------------------------------------------


@register(
    "join2",
    oracle=f"""
    SELECT c_mktsegment, o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'sum_price')},
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderstatus
    """,
    tags=("join", "aggregate"),
)
def join2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer equi-join + grouped aggregation."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# 6. multi-way join — TPC-H Q5 shape.
#    Scale: nation/region are broadcast (5/25 rows at any SF); the
#    lineitem⋈orders⋈customer spine shuffles on the join keys and Catalyst
#    reorders the dim joins behind the fact joins.
# ---------------------------------------------------------------------------


@register(
    "join_multi",
    oracle=f"""
    SELECT n_name,
           {sql_dsum_raw(SQL_REVENUE_TERM, 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "aggregate"),
)
def join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table join chain (TPC-H Q5 shape): revenue per nation in ASIA."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(revenue_term()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# 7. semi / anti joins.
#    Scale: left-semi/anti shuffle only the distinct keys of the right side;
#    no payload columns move.
# ---------------------------------------------------------------------------


@register(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    tags=("join",),
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having at least one order above 400k (left_semi)."""
    customer = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    """,
    tags=("join",),
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who never placed a 450k+ order (left_anti)."""
    customer = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 450000).select("o_custkey")
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# 8. window functions — ranking + running sum.
#    Scale: single shuffle on the partition key; running sum uses an exact
#    decimal accumulation so the prefix values are engine-independent.
# ---------------------------------------------------------------------------


@register(
    "window_rank",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER() OVER wo AS rn,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER wf AS DOUBLE)
             AS running_spend,
           CAST(LAG(o_orderkey) OVER wo AS BIGINT) AS prev_orderkey
    FROM orders
    WINDOW wo AS (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC, o_orderkey ASC),
           wf AS (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order sequence: row_number, running spend, lag.
    lag/row_number use the order-only window (Spark rejects frames on
    offset functions); the running sum uses the explicit prefix frame."""
    orders = load(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(wo).alias("rn"),
        F.sum(dec("o_totalprice")).over(wf).cast("double").alias("running_spend"),
        F.lag("o_orderkey").over(wo).cast("bigint").alias("prev_orderkey"),
    )


# ---------------------------------------------------------------------------
# 9. top-k by aggregate.
#    Scale: agg shuffles on partkey; the final top-10 is TakeOrdered (no
#    global sort). part side pruned to 2 columns before the join.
# ---------------------------------------------------------------------------


@register(
    "topk",
    oracle=f"""
    SELECT p_partkey, p_name,
           {sql_dsum_raw(SQL_REVENUE_TERM, 'revenue')}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_partkey, p_name
    ORDER BY revenue DESC, p_partkey ASC
    LIMIT 10
    """,
    tags=("join", "aggregate", "limit"),
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 parts by discounted revenue, partkey tie-break."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name")
        .agg(F.sum(revenue_term()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("p_partkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# 10. set operations.
# ---------------------------------------------------------------------------

_RICH = "SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000"
_BIGSPEND = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000"


def _rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )


def _bigspend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("custkey"))
    )


@register(
    "set_union",
    oracle=f"{_RICH} UNION {_BIGSPEND}",
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of high-balance and big-spender customer keys."""
    return _rich(spark, sf_dir).union(_bigspend(spark, sf_dir)).distinct()


@register(
    "set_intersect",
    oracle=f"{_RICH} INTERSECT {_BIGSPEND}",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of the same two key sets."""
    return _rich(spark, sf_dir).intersect(_bigspend(spark, sf_dir))


@register(
    "set_except",
    oracle=f"{_RICH} EXCEPT {_BIGSPEND}",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: high-balance customers who never placed a 450k+ order.
    subtract() is SQL EXCEPT (distinct) semantics."""
    return _rich(spark, sf_dir).subtract(_bigspend(spark, sf_dir))


# ---------------------------------------------------------------------------
# 11. distinct counting (exact; the approximate twin lives in text.py with a
#     rows-only check since HLL sketches differ across engines).
# ---------------------------------------------------------------------------


@register(
    "distinct_agg",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(DISTINCT o_orderpriority) AS n_prio,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("aggregate", "distinct"),
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts per order status."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register("approx_distinct", oracle=None, tags=("aggregate", "approx"))
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) per order status — sketch values are
    engine-specific, so correctness is bound-checked against the exact
    count in tests/test_approx.py rather than oracle-hashed."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_cust"),
    )


# ---------------------------------------------------------------------------
# 12. rollup (grouping sets).
# ---------------------------------------------------------------------------


@register(
    "cube_rollup",
    oracle=f"""
    SELECT n_name, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(n_name, o_orderpriority)
    """,
    tags=("aggregate", "rollup"),
)
def cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(n_name, o_orderpriority) with count + exact sum. Neither
    grouping column is nullable in the data, so the rollup NULLs
    unambiguously mark subtotal levels."""
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority",
                                                  "o_totalprice")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("n_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "sum_price"))
    )


# ---------------------------------------------------------------------------
# 13. scalar function battery (string / date / math).
#     Cross-engine type notes: Spark length() → INT vs DuckDB BIGINT (cast),
#     Spark floor/ceil → BIGINT vs DuckDB DOUBLE (cast), both sides pinned.
# ---------------------------------------------------------------------------


@register(
    "scalar_fns",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)  AS o_year,
           CAST(month(o_orderdate) AS INT) AS o_month,
           CAST(day(o_orderdate) AS INT)   AS o_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           substring(o_orderpriority, 1, 1) AS prio_code,
           upper(o_orderstatus)  AS status_u,
           lower(o_orderpriority) AS prio_l,
           CAST(length(o_orderpriority) AS INT) AS prio_len,
           concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
           replace(o_orderpriority, '-', '_') AS prio_u,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           CAST(ceil(o_totalprice)  AS BIGINT) AS price_ceil,
           abs(o_totalprice - 250000.0) AS price_dev,
           CAST(o_custkey % 7 AS BIGINT) AS cust_mod,
           CAST(sqrt(o_totalprice) AS DOUBLE) AS price_sqrt
    FROM orders
    """,
    tags=("scalar",),
)
def scalar_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar battery over orders — all JVM-side built-ins
    inside one whole-stage-codegen span (no UDFs)."""
    o = load(spark, sf_dir, "orders")
    ts = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(ts).alias("o_year"),
        F.month(ts).alias("o_month"),
        F.dayofmonth(ts).alias("o_day"),
        F.date_trunc("month", ts).cast("timestamp_ntz").alias("month_start"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.upper("o_orderstatus").alias("status_u"),
        F.lower("o_orderpriority").alias("prio_l"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("prio_u"),
        F.floor("o_totalprice").alias("price_floor"),
        F.ceil("o_totalprice").alias("price_ceil"),
        F.abs(F.col("o_totalprice") - F.lit(250000.0)).alias("price_dev"),
        (F.col("o_custkey") % 7).cast("bigint").alias("cust_mod"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
    )
