"""Sixth wave: multiset set operations (ALL variants) and positional
explode — the remaining set-op/generator coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.queries.text import _sql_tokens, _tokens
from myhadoop_spark.registry import register

# partkey multisets: lineitem repeats partkeys; orders side via join keeps
# duplicates too, so the ALL variants differ from the distinct forms
_LI_PARTS = ("SELECT l_partkey AS partkey FROM lineitem "
             "WHERE l_quantity >= 45")
_HEAVY_PARTS = ("SELECT l_partkey AS partkey FROM lineitem "
                "WHERE l_discount >= 0.08")


@register(
    "set_except_all",
    oracle=f"{_LI_PARTS} EXCEPT ALL {_HEAVY_PARTS}",
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: multiset difference — each partkey keeps
    max(count_left − count_right, 0) copies, unlike distinct EXCEPT."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 45).select(
        F.col("l_partkey").alias("partkey"))
    b = li.filter(F.col("l_discount") >= 0.08).select(
        F.col("l_partkey").alias("partkey"))
    return a.exceptAll(b)


@register(
    "set_intersect_all",
    oracle=f"{_LI_PARTS} INTERSECT ALL {_HEAVY_PARTS}",
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: multiset intersection — min(count_left,
    count_right) copies per partkey."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 45).select(
        F.col("l_partkey").alias("partkey"))
    b = li.filter(F.col("l_discount") >= 0.08).select(
        F.col("l_partkey").alias("partkey"))
    return a.intersectAll(b)


@register(
    "explode_positions",
    oracle=rf"""
    WITH t AS (SELECT doc_id, {_sql_tokens('text')} AS toks FROM documents),
    p AS (SELECT doc_id,
                 unnest(list_transform(
                     generate_series(1, least(len(toks), 3)),
                     i -> struct_pack(pos := i - 1, tok := toks[i]))) AS s
          FROM t WHERE len(toks) > 0)
    SELECT s.pos AS pos, s.tok AS token, COUNT(*) AS freq
    FROM p GROUP BY s.pos, s.tok
    """,
    tags=("generator", "text"),
)
def explode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: which tokens open documents? Counts of the first
    three token positions across the corpus (position-aware generator —
    the ordinality-preserving row expansion)."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()
    return (
        docs.select(F.posexplode(F.slice(toks, 1, 3)).alias("pos", "token"))
        .groupBy("pos", "token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
