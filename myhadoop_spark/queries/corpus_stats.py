"""Corpus-level text analytics: vocabulary coverage, bigrams, TF-IDF,
quality-weighted sampling — the statistics a training-data pipeline
computes before and after curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.queries.sampling import hash_bucket
from myhadoop_spark.queries.text import _sql_tokens, _tokens
from myhadoop_spark.registry import register

# ---------------------------------------------------------------------------
# vocabulary with cumulative coverage
# ---------------------------------------------------------------------------


@register(
    "vocab_coverage",
    oracle=rf"""
    WITH t AS (SELECT unnest({_sql_tokens('text')}) AS word FROM documents),
    c AS (SELECT word, COUNT(*) AS freq FROM t GROUP BY word),
    tot AS (SELECT SUM(freq) AS n FROM c),
    r AS (SELECT word, freq,
                 ROW_NUMBER() OVER (ORDER BY freq DESC, word ASC) AS rank,
                 SUM(freq) OVER (ORDER BY freq DESC, word ASC
                                 ROWS UNBOUNDED PRECEDING) AS cum
          FROM c)
    SELECT rank, word, freq,
           CAST(cum AS DOUBLE) / (SELECT n FROM tot) AS cum_coverage
    FROM r
    """,
    tags=("text", "extension"),
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary with cumulative corpus coverage —
    the curve that decides a tokenizer's vocab size. Counts are exact
    ints, so coverage ratios are engine-identical."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(F.explode(_tokens()).alias("word"))
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    total = counts.agg(F.sum("freq").alias("n"))
    w = Window.orderBy(F.col("freq").desc(), F.col("word").asc())
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = counts.select(
        F.row_number().over(w).alias("rank"),
        "word", "freq",
        F.sum("freq").over(wcum).alias("cum"),
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "rank", "word", "freq",
        (F.col("cum").cast("double") / F.col("n")).alias("cum_coverage"),
    )


# ---------------------------------------------------------------------------
# bigram counts
# ---------------------------------------------------------------------------


@register(
    "bigram_count",
    oracle=rf"""
    WITH toks AS (SELECT doc_id, {_sql_tokens('text')} AS t FROM documents),
    b AS (SELECT unnest(list_transform(
                     generate_series(1, len(t) - 1),
                     i -> concat(t[i], ' ', t[i + 1]))) AS bigram
          FROM toks WHERE len(t) >= 2)
    SELECT bigram, COUNT(*) AS freq
    FROM b GROUP BY bigram HAVING COUNT(*) >= 5
    """,
    tags=("text", "extension"),
)
def bigram_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token bigram frequencies (≥5): the collocation statistic
    for tokenizer merges / phrase mining. Bigrams are formed inside the
    array (transform over an index sequence) before one explode — no
    self-join of token positions."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(_tokens().alias("t")).filter(F.size("t") >= 2)
    bigrams = toks.select(F.explode(F.expr(
        "transform(sequence(1, size(t) - 1),"
        " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
    )).alias("bigram"))
    return (
        bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= 5)
    )


# ---------------------------------------------------------------------------
# TF-IDF (rational idf — ln() differs across engines in the last ulp,
# so the idf factor is kept as an exact ratio)
# ---------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    oracle=rf"""
    WITH toks AS (SELECT doc_id, unnest({_sql_tokens('text')}) AS term
                  FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
           GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (SELECT tf.doc_id, tf.term,
                      CAST(tf.tf AS DOUBLE) * (SELECT n_docs FROM n) / df.df
                        AS tfidf
               FROM tf JOIN df ON tf.term = df.term),
    r AS (SELECT doc_id, term, tfidf,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term ASC) AS rn
          FROM scored)
    SELECT doc_id, term, tfidf, CAST(rn AS INT) AS rn
    FROM r WHERE rn <= 3
    """,
    tags=("text", "extension"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf·(N/df) — linear
    idf so every score is a ratio of exact integers (bit-identical
    across engines, unlike log-idf whose libm rounding differs)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # lazy corpus size — an eager .count() here would run an extra scan
    # job at every plan build (same pattern as vocab_coverage)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term",
                (F.col("tf").cast("double") * F.col("n_docs") / F.col("df"))
                .alias("tfidf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(),
                                             F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf", "rn")
    )


# ---------------------------------------------------------------------------
# quality-weighted sampling
# ---------------------------------------------------------------------------


@register(
    "quality_weighted_sample",
    oracle=rf"""
    WITH t AS (SELECT doc_id, {_sql_tokens('text')} AS toks FROM documents),
    s AS (SELECT doc_id,
                 CAST(len(toks) AS DOUBLE) AS n_tokens,
                 CAST(len(list_distinct(toks)) AS DOUBLE) AS n_distinct
          FROM t WHERE len(toks) > 0),
    q AS (SELECT doc_id,
                 0.5 * least(1.0, n_tokens / 50.0)
                   + 0.5 * (n_distinct / n_tokens) AS quality
          FROM s)
    SELECT doc_id, quality
    FROM q
    WHERE CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 1000 AS DOUBLE) / 1000.0 < quality * 0.5
    """,
    tags=("sampling", "text", "extension"),
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample documents with probability ∝ quality (acceptance test:
    id-hash uniform < quality/2) — better documents are kept more often,
    and the draw is deterministic/engine-portable like all sampling
    here."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    quality = (F.lit(0.5) * F.least(F.lit(1.0), n_tokens / F.lit(50.0))
               + F.lit(0.5) * (n_distinct / n_tokens))
    u = hash_bucket(F.col("doc_id"), 1000).cast("double") / F.lit(1000.0)
    return (
        docs.filter(F.size(toks) > 0)
        .select("doc_id", quality.alias("quality"), u.alias("u"))
        .filter(F.col("u") < F.col("quality") * 0.5)
        .select("doc_id", "quality")
    )
