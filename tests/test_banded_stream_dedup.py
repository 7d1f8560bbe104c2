"""Banded (OR-of-bands) streaming near-dedup: cross-batch band matches
flag near-duplicates that full-signature equality would miss."""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.streaming.near_dedup import (
    band_decisions,
    band_keys_col,
    banded_near_dedup_stream,
)

TEXTS_B1 = [
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "one two three four five six seven"),
]
TEXTS_B2 = [
    (10, "alpha beta gamma delta epsilon zeta"),      # exact replay → dup
    (11, "totally different words entirely here now"),  # novel → kept
    (12, "one two three four five six seven extra"),   # superset → maybe
]


def _write_batch(spark, rows, path, ts_base, mtime):
    df = spark.createDataFrame(
        [(i, t, f"2024-01-01 {ts_base}:{n:02d}:00")
         for n, (i, t) in enumerate(rows)],
        "doc_id LONG, text STRING, s STRING",
    ).select("doc_id", "text", F.col("s").cast("timestamp").alias("ts"))
    staging = Path(str(path) + "_staging")
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    f = next(staging.glob("part-*.parquet"))
    shutil.copy(f, path)
    os.utime(path, (mtime, mtime))


@pytest.fixture(scope="module")
def replay(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("banded_src")
    now = time.time()
    _write_batch(spark, TEXTS_B1, src / "000.parquet", "00", now)
    _write_batch(spark, TEXTS_B2, src / "001.parquet", "01", now + 10)
    return str(src)


def test_banded_stream_flags_cross_batch_band_matches(spark, replay):
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(replay))
    decisions = {}

    def sink(batch_df, epoch_id):
        for r in band_decisions(batch_df).collect():
            decisions[r["doc_id"]] = (r["is_near_dup"], r["matched_doc"])

    q = (banded_near_dedup_stream(stream)
         .writeStream.outputMode("update").foreachBatch(sink).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # ground truth from the batch band keys: doc is dup iff it shares a
    # band with any earlier (smaller-ts, here smaller-batch) doc
    all_rows = TEXTS_B1 + TEXTS_B2
    df = spark.createDataFrame(all_rows, "doc_id LONG, text STRING")
    bands = {r["doc_id"]: set(r["bk"]) for r in
             df.select("doc_id", band_keys_col("text").alias("bk")).collect()}
    seen: set[str] = set()
    expected: dict[int, bool] = {}
    for batch in (TEXTS_B1, TEXTS_B2):
        batch_new: set[str] = set()
        for doc_id, _ in batch:
            expected[doc_id] = bool(bands[doc_id] & seen)
            batch_new |= bands[doc_id]
        seen |= batch_new

    # within-batch first-presenter ties: batch-1 docs own their bands
    got = {d: dup for d, (dup, _) in decisions.items()}
    # docs in batch 1 must not be dups of each other (distinct texts)
    assert got[1] is False and got[2] is False
    assert got[10] is True      # exact replay shares all 4 bands
    assert got[11] is False     # novel
    assert got[12] == expected[12]  # superset: whatever the bands say
    # and the flagged replay points at its batch-1 owner
    assert decisions[10][1] == 1
