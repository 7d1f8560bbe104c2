"""Corpus-wide boilerplate span removal — the C4/CCNet cleanup step
the engine was missing: token n-gram shingles that repeat across many
DOCUMENTS (navigation chrome, license footers, template headers) are
boilerplate; every span any such shingle covers is stripped from
every document, corpus-wide.

Semantics (deterministic, engine-exact):

    df(g)    = #distinct documents containing shingle g (n tokens)
    B        = { g : df(g) ≥ min_df }
    covered  = positions p such that some occurrence of some g ∈ B
               spans p (occurrence at i covers i … i+n−1, 1-based)
    clean    = the document's tokens at uncovered positions, in
               order, re-joined by single spaces

Everything is integer positions and exact string equality, so the
DuckDB differential compares bitwise — including the rebuilt
``clean_text`` strings.

Scale shape (100 TB): one shingle explode + (g → distinct-doc count)
aggregation (shuffle ∝ shingle vocabulary — partial-aggregable), one
equi-join of the shingle stream against the boilerplate set (B is a
df-threshold survivor set: high-frequency grams are FEW — but it is
data-dependent, so it joins hash-partitioned rather than assuming
broadcast), one per-doc covered-position collect_set (bounded by the
doc's own length — per-document state, the doc_metrics discipline),
one narrow rebuild projection. No windows, no UDFs, no driver state.

Reference analog: none — §2.3 extension surface (text-curation
family, beside operators/scrub.py and queries/repetition.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _toks(text_col: str):
    return F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda t: t != F.lit(""))


def _shingles(n: int):
    """array<struct<pos,g>> of 1-based shingle starts — empty when the
    doc has fewer than n tokens (an unguarded sequence() would run
    DESCENDING and fabricate shingles, the interval-join lesson)."""
    return F.expr(
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> struct(i AS pos, "
        f"array_join(slice(_toks, i, {n}), ' ') AS g)) "
        f"ELSE array() END")


def boilerplate_grams(docs: DataFrame, *, n: int = 2, min_df: int,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(g, df): the shingles appearing in ≥ min_df distinct docs."""
    sh = (docs.withColumn("_toks", _toks(text_col))
          .select(F.col(id_col).alias("_id"),
                  F.explode(_shingles(n)).alias("_s"))
          .select("_id", F.col("_s.g").alias("g")))
    return (sh.groupBy("g")
            .agg(F.count_distinct("_id").alias("df"))
            .filter(F.col("df") >= min_df))


def strip_boilerplate(docs: DataFrame, *, n: int = 2, min_df: int,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """docs + (n_removed, clean_text): every position covered by a
    corpus-boilerplate shingle removed, remaining tokens re-joined."""
    base = docs.withColumn("_toks", _toks(text_col))
    sh = base.select(F.col(id_col),
                     F.explode(_shingles(n)).alias("_s")) \
        .select(id_col, F.col("_s.pos").alias("pos"),
                F.col("_s.g").alias("g"))
    bp = boilerplate_grams(docs, n=n, min_df=min_df,
                           text_col=text_col, id_col=id_col) \
        .select("g")
    covered = (sh.join(bp, "g")
               .select(id_col,
                       F.explode(F.expr(
                           f"sequence(pos, pos + {n - 1})")).alias("p"))
               .groupBy(id_col)
               .agg(F.collect_set("p").alias("_cov")))
    kept = F.expr(
        "filter(transform(_toks, (t, i) -> struct(t AS t, i + 1 AS p)),"
        " s -> NOT array_contains(coalesce(_cov, array()), s.p))")
    return (base.join(covered, id_col, "left")
            .withColumn("_kept", kept)
            .withColumn("n_removed",
                        (F.size("_toks") - F.size("_kept")).cast("long"))
            .withColumn("clean_text",
                        F.array_join(F.expr("transform(_kept, s -> s.t)"),
                                     " "))
            .drop("_toks", "_cov", "_kept"))
