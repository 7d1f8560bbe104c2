"""Data-quality constraint suite over the TPC-H-ish fixtures — the
declared face of operators/constraints.py (ungated DuckDB
differential: integer violation counts, bitwise)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (parity with peers)

from myhadoop_spark.catalog import load
from myhadoop_spark.registry import register


@register(
    "data_quality",
    oracle="""
    WITH base AS (
      SELECT COUNT(*) AS n_rows,
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                 AS v_notnull,
             SUM(CASE WHEN o_totalprice IS NULL
                        OR NOT (o_totalprice BETWEEN 0 AND 1000000)
                      THEN 1 ELSE 0 END) AS v_range,
             SUM(CASE WHEN o_orderstatus IS NULL
                        OR o_orderstatus NOT IN ('O', 'F', 'P')
                      THEN 1 ELSE 0 END) AS v_status,
             SUM(CASE WHEN NOT COALESCE(o_orderdate < o_orderdate
                                        + INTERVAL 200 DAY, FALSE)
                      THEN 1 ELSE 0 END) AS v_sat
      FROM orders),
    uniq AS (SELECT (SELECT COUNT(*) FROM orders)
                  - COUNT(DISTINCT o_orderkey) AS v_unique FROM orders),
    fk AS (SELECT COUNT(*) AS v_fk FROM orders
           WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                   WHERE c_custkey IS NOT NULL)
              OR o_custkey IS NULL)
    SELECT "constraint", violations, n_rows,
           violations = 0 AS passed
    FROM (
      SELECT 'not_null(o_custkey)' AS "constraint",
             CAST(v_notnull AS BIGINT) AS violations, n_rows FROM base
      UNION ALL
      SELECT 'in_range(o_totalprice, 0, 1000000)',
             CAST(v_range AS BIGINT), n_rows FROM base
      UNION ALL
      SELECT 'accepted_values(o_orderstatus)',
             CAST(v_status AS BIGINT), n_rows FROM base
      UNION ALL
      SELECT 'satisfies(order_before_200d)',
             CAST(v_sat AS BIGINT), n_rows FROM base
      UNION ALL
      SELECT 'unique(o_orderkey)', CAST(v_unique AS BIGINT), n_rows
      FROM uniq, base
      UNION ALL
      SELECT 'foreign_key(o_custkey)', CAST(v_fk AS BIGINT), n_rows
      FROM fk, base)
    """,
    tags=("quality", "extension"),
    gate=False,
)
def data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint report over ``orders`` (+ the customer
    FK): every row-level check folds into ONE conditional-aggregation
    scan; uniqueness adds one hash agg, the FK one anti-join
    (operators/constraints.py). The satisfies() row exercises
    three-valued logic (a NULL predicate counts as a violation)."""
    from myhadoop_spark.operators.constraints import (
        accepted_values,
        check_constraints,
        foreign_key,
        in_range,
        not_null,
        satisfies,
        unique,
    )

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    suite = [
        not_null("o_custkey"),
        in_range("o_totalprice", 0, 1_000_000),
        accepted_values("o_orderstatus", ["O", "F", "P"]),
        satisfies("order_before_200d",
                  "o_orderdate < o_orderdate + INTERVAL 200 DAY"),
        unique("o_orderkey"),
        foreign_key("o_custkey", customer, "c_custkey"),
    ]
    return check_constraints(orders, suite)
