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


# ---------------------------------------------------------------------------
# entity resolution (r11): the full canonicalization chain — fuzzy
# pairs → transitive entity clusters → one canonical record per
# entity. The canonical member is the SHORTEST name (ties:
# lexicographic, then id) — a realistic normalization rule ("Brand X
# Large" beats "Brandd X Large") computed as a partial-aggregable
# min(struct(len, nm, id)) survivor, never a window over members.
# Composes the Ed-Join banded prefix filter with the iterative CC
# operator; the oracle chains the brute-force levenshtein join with
# the recursive-CTE closure and a window as the spec.
# ---------------------------------------------------------------------------


@register(
    "entity_resolution",
    oracle=f"""
    WITH RECURSIVE p AS (SELECT p_partkey AS id,
                       p_name || ' ' || p_brand || ' ' || p_type AS nm
                FROM part),
    pr AS (SELECT a.id AS ia, b.id AS ib
           FROM p a JOIN p b ON a.id < b.id
           WHERE abs(length(a.nm) - length(b.nm)) <= {_ED_D}
             AND levenshtein(a.nm, b.nm) <= {_ED_D}),
    sym AS (SELECT ia AS a, ib AS b FROM pr
            UNION SELECT ib, ia FROM pr),
    reach(id, r) AS (
      SELECT a, a FROM (SELECT a FROM sym UNION SELECT b FROM sym) n(a)
      UNION
      SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a
    ),
    cc AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
    lab AS (SELECT p.id, p.nm,
                   coalesce(cc.component, p.id) AS entity
            FROM p LEFT JOIN cc ON p.id = cc.id),
    agg AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_members
            FROM lab GROUP BY entity),
    r AS (SELECT entity, id, nm,
                 row_number() OVER (PARTITION BY entity
                                    ORDER BY length(nm), nm, id) AS rn
          FROM lab)
    SELECT r.entity, r.id AS canon_id, r.nm AS canon_nm,
           agg.n_members
    FROM r JOIN agg ON r.entity = agg.entity
    WHERE rn = 1 ORDER BY r.entity
    """,
    gate=False,
    tags=("fuzzy", "dedup", "extension", "iterative", "composition"),
)
def entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(entity, canon_id, canon_nm, n_members): every part resolved
    to its canonical entity — Ed-Join pairs (≤ {_ED_D} edits) →
    connected components → shortest-name representative. Singletons
    self-represent."""
    from myhadoop_spark.operators.connected_components import (
        connected_components,
    )
    from myhadoop_spark.operators.edjoin import edit_distance_pairs

    parts = (load(spark, sf_dir, "part")
             .select(F.col("p_partkey").alias("id"),
                     F.concat_ws(" ", "p_name", "p_brand", "p_type")
                     .alias("nm")))
    pairs = edit_distance_pairs(parts, "id", "nm",
                                max_dist=_ED_D, q=_ED_Q)
    cc = connected_components(pairs.select(F.col("id_a").alias("src"),
                                           F.col("id_b").alias("dst")))
    lab = (parts.join(cc.withColumnRenamed("id", "_cid"),
                      parts.id == F.col("_cid"), "left")
           .select("id", "nm",
                   F.coalesce("component", "id").alias("entity")))
    return (lab.groupBy("entity")
            .agg(F.min(F.struct(F.length("nm").alias("l"),
                                F.col("nm"), F.col("id"))).alias("_s"),
                 F.count(F.lit(1)).cast("long").alias("n_members"))
            .select("entity", F.col("_s.id").alias("canon_id"),
                    F.col("_s.nm").alias("canon_nm"), "n_members")
            .orderBy("entity"))
