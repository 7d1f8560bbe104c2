"""Streaming near-dedup: signature-identical docs are suppressed across
micro-batches; survivors equal the batch first-per-signature set."""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.streaming.near_dedup import (
    minhash_signature_col,
    near_dedup_stream,
)


@pytest.fixture(scope="module")
def doc_stream(spark, tmp_path_factory):
    """Two micro-batches of synthetic docs where batch 2 repeats some of
    batch 1's texts with doc ids shifted (near-dup replays)."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
        "how vexingly quick daft zebras jump",
    ]
    rows1 = [(i, texts[i % 4], "2024-01-01 00:%02d:00" % i) for i in range(8)]
    rows2 = [(100 + i, texts[i % 2], "2024-01-01 01:%02d:00" % i)
             for i in range(4)]
    src = tmp_path_factory.mktemp("nd_src")
    now = time.time()
    for n, rows in enumerate([rows1, rows2]):
        df = spark.createDataFrame(rows, "doc_id LONG, text STRING, ts_s STRING") \
            .select("doc_id", "text",
                    F.col("ts_s").cast("timestamp").alias("ts"))
        staging = tmp_path_factory.mktemp(f"nd_b{n}")
        df.coalesce(1).write.mode("overwrite").parquet(str(staging))
        f = next(Path(staging).glob("part-*.parquet"))
        dst = src / f"{n:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (now + n * 10, now + n * 10))
    return str(src)


def test_stream_near_dedup_keeps_one_per_signature(spark, doc_stream):
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(doc_stream))
    q = (near_dedup_stream(stream).writeStream.outputMode("append")
         .format("memory").queryName("nd_out").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT doc_id, minhash_sig FROM nd_out").collect()
    finally:
        q.stop()
    # exactly one survivor per distinct signature; all batch-2 replays
    # (ids >= 100 repeating batch-1 texts) suppressed
    sigs = [r["minhash_sig"] for r in rows]
    assert len(sigs) == len(set(sigs))
    assert len(rows) == 4  # four distinct texts
    assert all(r["doc_id"] < 100 for r in rows)


def test_signature_col_matches_batch_family(spark):
    """The streaming signature column equals the batch operator's
    signature for the same text (shared hash family)."""
    from myhadoop_spark.queries.dedup import minhash_signatures

    batch = minhash_signatures(spark, "/root/testdata/sf0.001")
    full_sig_batch = (
        batch.groupBy("doc_id")
        .agg(F.array_join(F.transform(
            F.array_sort(F.collect_list(F.struct("band", "band_sig"))),
            lambda s: s["band_sig"]), ",").alias("sig"))
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    direct = docs.select("doc_id", minhash_signature_col("text").alias("sig")) \
        .filter(F.size(F.array_distinct(F.filter(
            F.split(F.col("text"), r"\s+"), lambda t: t != F.lit("")))) > 0)
    a = {r["doc_id"]: r["sig"] for r in full_sig_batch.collect()}
    b = {r["doc_id"]: r["sig"] for r in direct.collect()}
    assert a == b
