"""Deterministic numeric aggregation helpers.

Double summation is order-dependent, and Spark's shuffle order differs
run-to-run and engine-to-engine — a correctness-gate hazard when results
are value-hashed against a DuckDB oracle. Monetary fixture columns carry
two decimal digits, so we aggregate them as exact DECIMAL(18,2): decimal
addition is associative/commutative, which makes the sum independent of
partitioning and identical across engines bit-for-bit. The final cast to
double restores a plain schema. At 100 TB this also removes the need for
any "deterministic reduction order" machinery — partial aggregation stays
fully parallel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC)


def dsum(c: Column | str, alias: str) -> Column:
    """Exact sum of a 2-decimal column, surfaced as double."""
    return F.sum(dec(c)).cast("double").alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Exact-sum / count average (double division of identical operands is
    deterministic across engines)."""
    c = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec(c)).cast("double") / F.count(F.lit(1))).alias(alias)


def revenue_term() -> Column:
    """l_extendedprice * (1 - l_discount) as an exact decimal term.

    Matches the oracle-side
    ``CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))``.
    """
    return dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))


# Oracle-side SQL fragments (DuckDB) kept next to their Spark twins so the
# two can never drift apart silently.
SQL_DEC = "DECIMAL(18,2)"


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) / COUNT(*) AS {alias}"


def sql_dsum_raw(expr: str, alias: str) -> str:
    """Sum of an expression that is ALREADY exact decimal (e.g. the revenue
    term product) — no inner re-cast, matching Spark's F.sum(decimal_expr)."""
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


SQL_REVENUE_TERM = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))"
)
