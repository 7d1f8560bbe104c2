"""PPJoin-style prefix filtering for set-similarity joins (Xiao et
al. 2008, "Efficient Similarity Joins for Near Duplicate Detection").

The exact-recall candidate generator for Jaccard ≥ τ: order each
document's grams by GLOBAL rarity (ascending document frequency, ties
by gram id) and keep only the |g| − ⌈τ·|g|⌉ + 1 rarest — two sets with
Jaccard ≥ τ MUST share at least one gram inside both prefixes
(pigeonhole on the overlap bound ⌈τ/(1+τ)·(|a|+|b|)⌉), so the
prefix-gram equi-join loses nothing. Selectivity depends entirely on
the gram-frequency distribution:

  * measured on the r5 Zipfian corpus (scripts/ppjoin_study.py →
    ppjoin_study.tsv): 47 % fewer candidates and 5.5× less wall than
    the size-ratio generator at identical verified output — rare grams
    are actually rare, so prefixes discriminate;
  * measured on the uniform corpus: a wash (~15 % pruning) — the r2
    ROADMAP negative result was a fixture artifact of uniform token
    draws, not a property of the algorithm.

Scale shape: one document-frequency aggregation (shuffle ∝ gram
vocabulary), one per-doc window for the rarity ranking (shuffle ∝
total grams, the same cardinality any gram explode pays), then an
equi-join on prefix grams — banded by construction, never all-pairs.
The size-ratio filter composes on top for free (it rides the same
candidate rows). ngram_jaccard keeps size-ratio as its default
generator because the GATE fixture is uniform; on a real corpus the
prefix filter is the better first layer.

Reference analog: none — §2.3 extension surface (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_candidates(grams: DataFrame, tau: float, *,
                      apply_size_filter: bool = True) -> DataFrame:
    """(doc1, doc2) candidate pairs from the PPJoin prefix join.
    ``grams`` needs (doc_id, grams: array) with DISTINCT grams per doc
    (the Jaccard-set convention). Exact recall for Jaccard ≥ tau."""
    ex = grams.select("doc_id", F.size("grams").alias("n"),
                      F.explode("grams").alias("gram"))
    freq = ex.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(),
                                             F.col("gram").asc())
    pref = (ex.join(freq, "gram")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= F.col("n")
                    - F.ceil(F.lit(tau) * F.col("n")) + 1)
            .select("doc_id", "n", "gram"))
    a = pref.select(F.col("doc_id").alias("doc1"), F.col("n").alias("n1"),
                    "gram")
    b = pref.select(F.col("doc_id").alias("doc2"), F.col("n").alias("n2"),
                    "gram")
    cond = F.col("doc1") < F.col("doc2")
    if apply_size_filter:
        cond = cond & ((F.least("n1", "n2").cast("double")
                        / F.greatest("n1", "n2").cast("double"))
                       >= tau)
    return (a.join(b, "gram").filter(cond)
            .select("doc1", "doc2").distinct())


def jaccard_pairs(grams: DataFrame, tau: float) -> DataFrame:
    """(doc1, doc2, jaccard) for all pairs with set-Jaccard ≥ tau,
    prefix-filtered candidates + exact verify (|A∪B| from sizes)."""
    cand = prefix_candidates(grams, tau)
    g1 = grams.select(F.col("doc_id").alias("doc1"),
                      F.col("grams").alias("g1"))
    g2 = grams.select(F.col("doc_id").alias("doc2"),
                      F.col("grams").alias("g2"))
    inter = F.size(F.array_intersect("g1", "g2")).cast("double")
    tot = (F.size("g1") + F.size("g2")).cast("double")
    par = grams.sparkSession.sparkContext.defaultParallelism
    return (cand.repartition(par, "doc1")
            .join(g1, "doc1").join(g2, "doc2")
            .select("doc1", "doc2", (inter / (tot - inter)).alias("jaccard"))
            .filter(F.col("jaccard") >= tau))
