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
    gate=False,  # demoted from the 50-row driver window in r4: the
    # TakeOrderedAndProject plan is exercised by topk (both plan-asserted
    # in tests/test_plans.py) and the sort semantics by sort_full; the
    # slot went to substring_dedup (queries/dedup_ext.py). Still
    # oracle-checked via tests/test_correctness.py.
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


@register(
    "sort_full",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    """,
    tags=("sort",),
)
def sort_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Totally-ordered FULL output — the exact semantics of the reference's
    MergeSort app (/root/reference/app.py:17-43, R14), which emits the whole
    sorted dataset, not a top-N. Unlike sort_topn (TakeOrderedAndProject,
    per-partition pruning), this compiles to sampled RANGE partitioning +
    per-partition sort: every partition holds a disjoint key range and is
    locally sorted, so concatenating partitions in order IS the total order
    — no single-node merge, the scalable form of a 100 TB global sort.
    Unique (orderkey, linenumber) tie-break makes the order deterministic
    across engines."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(),
                 F.col("l_linenumber").asc())
    )


# ---------------------------------------------------------------------------
# 3. filter + projection — predicate pushdown & column pruning showcase.
# ---------------------------------------------------------------------------


@register(
    "filter_proj",
    gate=False,  # demoted in r11 for the seven curation-operator
    #              promotions (VERDICT r10 #1) — still oracle-checked
    #              in pytest, the scalar_fns precedent
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
    gate=False,  # demoted in r4: equi-join+agg is tpch_q3/join_multi's
    # shape; the slot went to bloom_dedup (queries/dedup_ext.py). Still
    # oracle-checked via tests/test_correctness.py.
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
    "semi_anti_join",
    oracle="""
    SELECT 'semi' AS op, c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    UNION ALL
    SELECT 'anti' AS op, c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    """,
    tags=("join",),
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join battery (SURVEY §2.4 #7 'semi_anti'): customers
    WITH a 400k+ order (left_semi) tagged 'semi', customers WITHOUT a
    450k+ order (left_anti) tagged 'anti'. Both forms shuffle only the
    distinct right-side keys — no payload columns move."""
    customer = load(spark, sf_dir, "customer")
    big400 = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000).select("o_custkey")
    big450 = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 450000).select("o_custkey")
    semi = (
        customer.join(big400, customer.c_custkey == big400.o_custkey, "left_semi")
        .select(F.lit("semi").alias("op"), "c_custkey", "c_name")
    )
    anti = (
        customer.join(big450, customer.c_custkey == big450.o_custkey, "left_anti")
        .select(F.lit("anti").alias("op"), "c_custkey", "c_name")
    )
    return semi.unionAll(anti)


# ---------------------------------------------------------------------------
# 8. window functions — the full battery (ranking, running frames, RANGE
#    frames) lives in relational5.window_fns.
# ---------------------------------------------------------------------------
# 9. top-k by aggregate.
#    Scale: agg shuffles on partkey; the final top-10 is TakeOrdered (no
#    global sort). part side pruned to 2 columns before the join.
# ---------------------------------------------------------------------------


@register(
    "topk",
    gate=False,  # demoted in r11 for the seven curation-operator
    #              promotions (VERDICT r10 #1) — still oracle-checked
    #              in pytest, the scalar_fns precedent
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
# 10. set operations — ALL FIVE forms (UNION / INTERSECT / EXCEPT and the
#     ALL multiset variants) as one tagged battery. The distinct forms run
#     over customer keys; the ALL forms over lineitem partkey multisets
#     (where duplicates make ALL genuinely differ from DISTINCT). Result
#     rows carry the op tag + the multiset multiplicity so one hashable
#     schema covers both families.
# ---------------------------------------------------------------------------

_RICH = "SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000"
_BIGSPEND = "SELECT o_custkey AS key FROM orders WHERE o_totalprice > 450000"
_LI_PARTS = ("SELECT l_partkey AS key FROM lineitem WHERE l_quantity >= 45")
_HEAVY_PARTS = ("SELECT l_partkey AS key FROM lineitem WHERE l_discount >= 0.08")


def _rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("key"))
    )


def _bigspend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("key"))
    )


def _li_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") >= 45).select(
        F.col("l_partkey").alias("key"))


def _heavy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_discount") >= 0.08).select(
        F.col("l_partkey").alias("key"))


@register(
    "set_ops",
    gate=False,  # demoted in r11 for the seven curation-operator
    #              promotions (VERDICT r10 #1) — still oracle-checked
    #              in pytest, the scalar_fns precedent
    oracle=f"""
    SELECT 'union' AS op, key, CAST(1 AS BIGINT) AS n
    FROM ({_RICH} UNION {_BIGSPEND})
    UNION ALL
    SELECT 'intersect', key, 1 FROM ({_RICH} INTERSECT {_BIGSPEND})
    UNION ALL
    SELECT 'except', key, 1 FROM ({_RICH} EXCEPT {_BIGSPEND})
    UNION ALL
    SELECT 'except_all', key, COUNT(*)
    FROM ({_LI_PARTS} EXCEPT ALL {_HEAVY_PARTS}) GROUP BY key
    UNION ALL
    SELECT 'intersect_all', key, COUNT(*)
    FROM ({_LI_PARTS} INTERSECT ALL {_HEAVY_PARTS}) GROUP BY key
    """,
    tags=("setop",),
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation battery: union().distinct(), intersect(), subtract()
    (SQL EXCEPT) over customer keys; exceptAll() / intersectAll()
    multiset semantics over repeated lineitem partkeys (multiplicities
    reported per key). Every Spark set operator is exercised in one
    declared query. Scale: each form is one shuffle on the key column;
    the ALL variants add Spark's internal count-replication, identical
    in shape to the groupBy the distinct forms run."""
    one = F.lit(1).cast("bigint")
    rich, bigspend = _rich(spark, sf_dir), _bigspend(spark, sf_dir)
    li, heavy = _li_parts(spark, sf_dir), _heavy_parts(spark, sf_dir)
    parts = [
        rich.union(bigspend).distinct()
        .select(F.lit("union").alias("op"), "key", one.alias("n")),
        rich.intersect(bigspend)
        .select(F.lit("intersect").alias("op"), "key", one.alias("n")),
        rich.subtract(bigspend)
        .select(F.lit("except").alias("op"), "key", one.alias("n")),
        li.exceptAll(heavy).groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "key", "n"),
        li.intersectAll(heavy).groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "key", "n"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# 11. distinct counting (exact; the approximate twin lives in text.py with a
#     rows-only check since HLL sketches differ across engines).
# ---------------------------------------------------------------------------


def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts per order status.

    Deregistered from the 50-entry driver gate in round 4 to make room
    for the decontam gate slot (VERDICT r3 item 4): exact-countDistinct
    semantics stay oracle-proven through approx_distinct, whose hashed
    exact_cust column is the same COUNT(DISTINCT o_custkey) per status;
    this fuller battery remains differentially tested against
    DISTINCT_AGG_SQL in tests/test_sql_surface.py."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.count(F.lit(1)).alias("n_orders"),
    )


DISTINCT_AGG_SQL = """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(DISTINCT o_orderpriority) AS n_prio,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
"""


@register(
    "approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_cust,
           TRUE AS hll_within_5pct
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("aggregate", "approx"),
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd=0.01) per order status. Sketch
    estimates are engine-specific, so the raw estimate can't be hash-compared
    across engines; instead the query emits the exact countDistinct (hashed
    against the oracle) plus a boolean asserting the HLL estimate landed
    within 5× its configured rsd of the exact value — so the sketch IS
    oracle-verified, as a bound rather than a bit-pattern. The raw estimate
    is additionally bound-checked in tests/test_approx.py.

    Plan note: the exact and approx counts run as SEPARATE aggregations
    joined on the 3-row group key. Combining them in one agg() makes
    Catalyst plan countDistinct via a pre-aggregation keyed on
    (status, custkey) — and the partial HLL sketch (1,639 long registers
    at rsd=0.01) is then materialized and shuffled PER (status, custkey)
    ROW (~200 MB at sf0.1, measured 3.4 s warm); split, each branch
    shuffles only its natural state — per-partition sketches for the
    approx side — and the query drops to sub-second. The split is also
    the right shape at 100 TB: sketch shuffle volume stays
    ∝ partitions × groups, not ∝ distinct (group, key) pairs."""
    orders = load(spark, sf_dir, "orders")
    exact = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_cust"))
    approx = orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("_approx"))
    return (
        exact.join(approx, "o_orderstatus")
        .select(
            "o_orderstatus",
            "exact_cust",
            (F.abs(F.col("_approx") - F.col("exact_cust"))
             <= 0.05 * F.col("exact_cust")).alias("hll_within_5pct"),
        )
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
    GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name),
                            (o_orderpriority), ())
    """,
    tags=("aggregate", "rollup", "grouping-sets"),
)
def cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS over the orders⋈customer⋈nation join: the ROLLUP
    lattice ((n_name, prio), (n_name), ()) PLUS the extra (prio) set —
    i.e. this one query covers both rollup subtotal semantics and
    arbitrary grouping-set selection (the full CUBE lattice here, chosen
    explicitly). Neither grouping column is nullable in the data, so the
    subtotal NULLs are unambiguous. Spark expands the sets with one
    Expand node feeding a single partial/final aggregate — one shuffle
    regardless of how many sets are listed."""
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority",
                                                  "o_totalprice")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    aggs = (F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "sum_price"))
    if hasattr(joined, "groupingSets"):  # Spark 4 DataFrame API
        return joined.groupingSets(
            [["n_name", "o_orderpriority"], ["n_name"], ["o_orderpriority"], []],
            "n_name", "o_orderpriority",
        ).agg(*aggs)
    joined.createOrReplaceTempView("co_nation_joined")  # pragma: no cover
    return joined.sparkSession.sql(f"""
        SELECT n_name, o_orderpriority, COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice', 'sum_price')}
        FROM co_nation_joined
        GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name),
                                (o_orderpriority), ())
    """)


# ---------------------------------------------------------------------------
# 13. scalar function battery (math / date / string — the full §2.2 scalar
#     surface in one single-table, single-codegen-stage pass over orders).
#     Cross-engine type notes: Spark length() → INT vs DuckDB BIGINT (cast),
#     Spark floor/ceil → BIGINT vs DuckDB DOUBLE (cast), Spark weekday()
#     0=Monday == DuckDB isodow-1, Spark date_add returns DATE (cast back
#     to midnight timestamp); both sides pinned.
# ---------------------------------------------------------------------------


@register(
    "scalar_fns",
    # r10: rotated OUT of the gate for interval_overlap (VERDICT r9
    # item 5) — the scalar/temporal expression surface stays oracle-
    # checked here ungated (pytest differential), alongside its
    # sibling batteries array_fns / map_struct_fns / null_fns
    gate=False,
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)  AS o_year,
           CAST(month(o_orderdate) AS INT) AS o_month,
           CAST(day(o_orderdate) AS INT)   AS o_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS INT)
             AS days_since_92,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS date_plus_30,
           CAST(isodow(o_orderdate) - 1 AS INT) AS o_weekday,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)
             AS o_month_end,
           CAST(quarter(o_orderdate) AS INT) AS o_quarter,
           CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_epoch,
           substring(o_orderpriority, 1, 1) AS prio_code,
           upper(o_orderstatus)  AS status_u,
           lower(o_orderpriority) AS prio_l,
           CAST(length(o_orderpriority) AS INT) AS prio_len,
           concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
           replace(o_orderpriority, '-', '_') AS prio_u,
           lpad(o_orderpriority, 15, '*') AS prio_lpad,
           rpad(o_orderstatus, 4, '.') AS status_rpad,
           translate(o_orderpriority, '-', '_') AS prio_tr,
           reverse(o_orderpriority) AS prio_rev,
           repeat(substring(o_orderpriority, 1, 2), 3) AS prio_rep,
           CAST(strpos(o_orderpriority, '-') AS INT) AS dash_pos,
           split_part(o_orderpriority, '-', 1) AS prio_head,
           regexp_replace(o_orderpriority, '[0-9]+', 'N') AS prio_nonum,
           regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_num,
           left(o_orderpriority, 4) AS prio_left,
           right(o_orderpriority, 4) AS prio_right,
           CAST(starts_with(o_orderpriority, '1') AS BOOLEAN) AS is_urgent,
           CAST(contains(o_orderpriority, '-') AS BOOLEAN) AS has_dash,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           CAST(ceil(o_totalprice)  AS BIGINT) AS price_ceil,
           abs(o_totalprice - 250000.0) AS price_dev,
           CAST(o_custkey % 7 AS BIGINT) AS cust_mod,
           CAST(sqrt(o_totalprice) AS DOUBLE) AS price_sqrt
    FROM orders
    """,
    tags=("scalar", "string", "date"),
)
def scalar_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + temporal + string scalar battery over orders — 35 columns of
    JVM-side built-ins inside one whole-stage-codegen span (no UDFs, no
    joins, no shuffle). Consolidates the former scalar/string/date
    batteries into the one pass a columnar engine would actually run."""
    o = load(spark, sf_dir, "orders")
    ts = F.col("o_orderdate")
    prio = F.col("o_orderpriority")
    return o.select(
        "o_orderkey",
        F.year(ts).alias("o_year"),
        F.month(ts).alias("o_month"),
        F.dayofmonth(ts).alias("o_day"),
        F.date_trunc("month", ts).cast("timestamp_ntz").alias("month_start"),
        F.datediff(ts.cast("date"), F.lit("1992-01-01").cast("date"))
        .alias("days_since_92"),
        F.date_add(ts.cast("date"), 30).cast("timestamp_ntz")
        .alias("date_plus_30"),
        F.weekday(ts).alias("o_weekday"),
        F.last_day(ts.cast("date")).cast("timestamp_ntz").alias("o_month_end"),
        F.quarter(ts).alias("o_quarter"),
        F.unix_timestamp(ts).cast("bigint").alias("o_epoch"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.upper("o_orderstatus").alias("status_u"),
        F.lower("o_orderpriority").alias("prio_l"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.replace(prio, F.lit("-"), F.lit("_")).alias("prio_u"),
        F.lpad(prio, 15, "*").alias("prio_lpad"),
        F.rpad(F.col("o_orderstatus"), 4, ".").alias("status_rpad"),
        F.translate(prio, "-", "_").alias("prio_tr"),
        F.reverse(prio).alias("prio_rev"),
        F.repeat(F.substring("o_orderpriority", 1, 2), 3).alias("prio_rep"),
        F.instr(prio, "-").alias("dash_pos"),
        F.split_part(prio, F.lit("-"), F.lit(1)).alias("prio_head"),
        F.regexp_replace(prio, "[0-9]+", "N").alias("prio_nonum"),
        F.regexp_extract(prio, "([0-9]+)", 1).alias("prio_num"),
        F.substring("o_orderpriority", 1, 4).alias("prio_left"),
        # F.right matches DuckDB right() exactly incl. strings shorter
        # than 4 chars (substr(length-3, 4) would drop all but the last)
        F.right(prio, F.lit(4)).alias("prio_right"),
        F.startswith(prio, F.lit("1")).alias("is_urgent"),
        F.contains(prio, F.lit("-")).alias("has_dash"),
        F.floor("o_totalprice").alias("price_floor"),
        F.ceil("o_totalprice").alias("price_ceil"),
        F.abs(F.col("o_totalprice") - F.lit(250000.0)).alias("price_dev"),
        (F.col("o_custkey") % 7).cast("bigint").alias("cust_mod"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
    )
