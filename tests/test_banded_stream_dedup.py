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

# r14 (VERDICT r13 item 1): heavy parity/property battery — the
# slow tier; see pytest.ini. Run with -m "slow or not slow".
pytestmark = pytest.mark.slow

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


def test_band_state_expires_after_ttl(spark, tmp_path_factory):
    """With a watermark, a replay arriving after the TTL horizon is NOT
    flagged — the band registry evicted the expired owner."""
    src = tmp_path_factory.mktemp("ttl_src")
    now = time.time()
    text = "expiring text alpha beta gamma"
    # batch 1 at t=0h, batch 2 a week later (advances watermark far past
    # the 6h TTL), batch 3 replays the batch-1 text
    _write_batch(spark, [(1, text)], src / "000.parquet", "00", now)
    _write_batch(spark, [(2, "unrelated filler words")],
                 src / "001.parquet", "08", now + 10)
    # craft batch 2 with a much later day to push the watermark
    from pyspark.sql import functions as FF
    df = spark.createDataFrame(
        [(2, "unrelated filler words", "2024-01-20 00:00:00")],
        "doc_id LONG, text STRING, s STRING",
    ).select("doc_id", "text", FF.col("s").cast("timestamp").alias("ts"))
    staging = Path(str(src / "001.parquet") + "_late")
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    shutil.copy(next(staging.glob("part-*.parquet")), src / "001.parquet")
    os.utime(src / "001.parquet", (now + 10, now + 10))
    _write_batch(spark, [(3, text)], src / "002.parquet", "02", now + 20)
    # batch 3's ts (2024-01-01) is behind the watermark (2024-01-20 - 1h),
    # so give it a fresh late-Jan timestamp instead to stay live
    df3 = spark.createDataFrame(
        [(3, text, "2024-01-21 00:00:00")],
        "doc_id LONG, text STRING, s STRING",
    ).select("doc_id", "text", FF.col("s").cast("timestamp").alias("ts"))
    staging3 = Path(str(src / "002.parquet") + "_v2")
    df3.coalesce(1).write.mode("overwrite").parquet(str(staging3))
    shutil.copy(next(staging3.glob("part-*.parquet")), src / "002.parquet")
    os.utime(src / "002.parquet", (now + 20, now + 20))

    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    decisions = {}

    def sink(batch_df, epoch_id):
        for r in band_decisions(batch_df).collect():
            decisions[r["doc_id"]] = r["is_near_dup"]

    q = (banded_near_dedup_stream(stream, watermark="1 hour")
         .writeStream.outputMode("update").foreachBatch(sink).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert decisions[1] is False
    # doc 3 replays doc 1's text 20 days later — ownership expired, so
    # it is treated as fresh
    assert decisions[3] is False, decisions


def test_band_registry_state_metrics(spark, replay):
    """State observability (ROADMAP r2 #2, applyInPandasWithState leg):
    the band registry reports its keyed-state size through
    StreamingQueryProgress, and that size is bounded by the number of
    distinct band keys presented — the leak gauge an operator watches
    at corpus scale."""
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(replay))
    q = (banded_near_dedup_stream(stream)
         .writeStream.outputMode("update")
         .foreachBatch(lambda df, _eid: df.count()).start())
    try:
        q.processAllAvailable()
        state_rows = [
            op["numRowsTotal"]
            for p in q.recentProgress
            for op in (p.get("stateOperators") or [])
        ]
    finally:
        q.stop()
    assert state_rows and max(state_rows) > 0, q.recentProgress
    all_rows = TEXTS_B1 + TEXTS_B2
    df = spark.createDataFrame(all_rows, "doc_id LONG, text STRING")
    n_bands = (df.select(F.explode(band_keys_col("text")).alias("bk"))
               .distinct().count())
    assert max(state_rows) <= n_bands, (max(state_rows), n_bands)
