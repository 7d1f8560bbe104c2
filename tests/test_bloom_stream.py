"""Streaming Bloom dedup (streaming/bloom_ingest.py): cross-batch
duplicate suppression with an incrementally maintained filter table —
convergence to the batch-built filter, restart safety, and the
no-false-negative guarantee across batches."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from myhadoop_spark.operators.bloom import bloom_build
from myhadoop_spark.streaming.bloom_ingest import (
    load_filter,
    start_bloom_dedup_stream,
)

import pytest

# r14 (VERDICT r13 item 1): heavy parity/property battery — the
# slow tier; see pytest.ini. Run with -m "slow or not slow".
pytestmark = pytest.mark.slow

SCHEMA = "doc_id INT, text STRING"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        path, mode="overwrite")


def _run(spark, tmp_path, batches, subdir="run", n_filter_shards=1):
    base = tmp_path / subdir
    src = base / "src"
    for i, rows in enumerate(batches):
        _write_batch(spark, str(src / f"b{i}"), rows)
        time.sleep(0.2)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/*"))
    q = start_bloom_dedup_stream(
        stream, filter_path=str(base / "bloom"),
        out_path=str(base / "out"), checkpoint=str(base / "ckpt"),
        n_filter_shards=n_filter_shards)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return base


def test_cross_batch_duplicates_dropped(spark, tmp_path):
    base = _run(spark, tmp_path, [
        [(1, "alpha doc"), (2, "beta doc")],
        # 3 repeats alpha's content (cross-batch dup), 4 is new;
        # 5/6 are a within-batch dup pair
        [(3, "alpha doc"), (4, "gamma doc"), (5, "delta doc"),
         (6, "delta doc")],
        # a whole batch of nothing new
        [(7, "beta doc"), (8, "gamma doc")],
    ])
    out = {(r.doc_id, r.text)
           for r in spark.read.parquet(str(base / "out")).collect()}
    texts = sorted(t for _, t in out)
    assert texts == ["alpha doc", "beta doc", "delta doc", "gamma doc"]
    assert {i for i, _ in out} <= {1, 2, 4, 5, 6}  # never a later re-send


def test_filter_converges_to_batch_built(spark, tmp_path):
    """After the stream, the maintained filter table must EQUAL the
    filter built in one shot over the emitted corpus — incremental OR
    is exact, not approximate."""
    base = _run(spark, tmp_path, [
        [(1, "one"), (2, "two")],
        [(3, "three"), (4, "two")],
    ], subdir="conv")
    maintained = {(r.word_idx, r.word)
                  for r in load_filter(spark, str(base / "bloom")).collect()}
    emitted = spark.read.parquet(str(base / "out")).select("text")
    direct = {(r.word_idx, r.word)
              for r in bloom_build(emitted, "text").collect()}
    assert maintained == direct


def test_sharded_stream_matches_single_filter_stream(spark, tmp_path):
    """The same batch sequence run through the sharded probe path must
    emit the same rows AND leave the same filter table bit-for-bit —
    the maintained table is shard-agnostic, sharding is a probe-time
    view."""
    batches = [
        [(1, "alpha doc"), (2, "beta doc")],
        [(3, "alpha doc"), (4, "gamma doc"), (5, "delta doc"),
         (6, "delta doc")],
        [(7, "beta doc"), (8, "gamma doc")],
    ]
    plain = _run(spark, tmp_path, batches, subdir="plain")
    shard = _run(spark, tmp_path, batches, subdir="shard",
                 n_filter_shards=4)
    out_p = {(r.doc_id, r.text)
             for r in spark.read.parquet(str(plain / "out")).collect()}
    out_s = {(r.doc_id, r.text)
             for r in spark.read.parquet(str(shard / "out")).collect()}
    assert out_p == out_s
    f_p = {(r.word_idx, r.word)
           for r in load_filter(spark, str(plain / "bloom")).collect()}
    f_s = {(r.word_idx, r.word)
           for r in load_filter(spark, str(shard / "bloom")).collect()}
    assert f_p == f_s


def test_restart_resumes_and_still_dedups(spark, tmp_path):
    """Kill after batch 1, restart with the same checkpoint + filter:
    history survives — a re-sent old document is still dropped."""
    base = tmp_path / "restart"
    src = base / "src"
    _write_batch(spark, str(src / "b0"), [(1, "first doc"), (2, "second doc")])

    def _start():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(f"{src}/*"))
        return start_bloom_dedup_stream(
            stream, filter_path=str(base / "bloom"),
            out_path=str(base / "out"), checkpoint=str(base / "ckpt"))

    q = _start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    time.sleep(0.2)
    _write_batch(spark, str(src / "b1"), [(3, "first doc"), (4, "new doc")])
    q = _start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    texts = sorted(r.text
                   for r in spark.read.parquet(str(base / "out")).collect())
    assert texts == ["first doc", "new doc", "second doc"]
