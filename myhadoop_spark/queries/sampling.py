"""Deterministic sampling operators for training-data pipelines.

Random sampling (`df.sample`) is seed- and partitioning-dependent —
unreproducible across engines and across reruns on different cluster
layouts. Pipelines that must be auditable sample by CONTENT HASH:
hash(id) mod N < k selects a stable pseudo-random k/N fraction that any
engine reproduces bit-for-bit, survives repartitioning, and composes
(the same doc lands in the same split everywhere). md5-derived hashes
keep it engine-portable (same trick as dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.registry import register


def hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Stable pseudo-random bucket in [0, buckets) from a column value."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
    return h % buckets


_SQL_BUCKET = ("CAST(concat('0x', substr(md5(CAST({col} AS VARCHAR)), 1, 8)) "
               "AS BIGINT) % {n}")


@register(
    "sample_hash",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_SQL_BUCKET.format(col='doc_id', n=100)} < 20
    """,
    tags=("sampling", "extension"),
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% sample of documents by id-hash bucket."""
    docs = load(spark, sf_dir, "documents")
    return docs.filter(hash_bucket(F.col("doc_id")) < 20).select(
        "doc_id", "lang", "n_chars")


@register(
    "train_test_split",
    oracle=f"""
    WITH b AS (SELECT doc_id, lang,
                      {_SQL_BUCKET.format(col='doc_id', n=100)} AS bucket
               FROM documents)
    SELECT doc_id, lang,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    tags=("sampling", "extension"),
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by id-hash bucket —
    reproducible on any engine, any partitioning, any rerun."""
    docs = load(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    return docs.select(
        "doc_id", "lang",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
        .alias("split"),
    )


@register(
    "stratified_sample",
    oracle=f"""
    WITH r AS (SELECT doc_id, lang,
                      ROW_NUMBER() OVER (
                        PARTITION BY lang
                        ORDER BY {_SQL_BUCKET.format(col='doc_id', n=1000000)}
                                 ASC, doc_id ASC) AS rn
               FROM documents)
    SELECT doc_id, lang FROM r WHERE rn <= 20
    """,
    tags=("sampling", "extension"),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 documents per language, chosen pseudo-randomly but
    deterministically (rank by id-hash within each stratum). One shuffle
    on the stratum key; at scale the per-stratum top-k goes through
    partial top-k, not a full sort."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        hash_bucket(F.col("doc_id"), 1_000_000).asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )
