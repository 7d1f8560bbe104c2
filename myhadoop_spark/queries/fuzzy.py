"""Fuzzy string matching — the Ed-Join edit-distance similarity join
(operators/edjoin.py) over the part catalog.

The entity-resolution face of the dedup family: "which part names are
within 2 edits" finds typo'd / near-identical catalog entries the way
token-set generators (minhash, PPJoin) cannot — character-level edits
shift every overlapping token, but barely move the q-gram prefix.

Reference analog: none — SURVEY.md §2.3 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.registry import register

_ED_D = 2  # max edit distance
_ED_Q = 2  # q-gram width


@register(
    "edit_dist_join",
    oracle=f"""
    WITH p AS (SELECT p_partkey AS id,
                      p_name || ' ' || p_brand || ' ' || p_type AS nm
               FROM part)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
    FROM p a JOIN p b ON a.id < b.id
    WHERE abs(length(a.nm) - length(b.nm)) <= {_ED_D}
      AND levenshtein(a.nm, b.nm) <= {_ED_D}
    """,
    tags=("fuzzy", "dedup", "extension"),
    # r8: promoted into the 50-slot gate window (the r6/r7 verdicts'
    # standing ask) — bitwise at both SFs since r6
)
def edit_dist_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All part pairs whose composite name (name + brand + type) is
    within {_ED_D} edits — exact output (the DuckDB twin is the
    brute-force quadratic join; the engine side is the banded Ed-Join
    prefix filter, never all-pairs)."""
    parts = (load(spark, sf_dir, "part")
             .select(F.col("p_partkey").alias("id"),
                     F.concat_ws(" ", "p_name", "p_brand", "p_type")
                     .alias("nm")))
    from myhadoop_spark.operators.edjoin import edit_distance_pairs

    pairs = edit_distance_pairs(parts, "id", "nm",
                                max_dist=_ED_D, q=_ED_Q)
    return pairs.select("id_a", "id_b",
                        F.col("dist").cast("bigint").alias("dist"))
