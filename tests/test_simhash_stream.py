"""Streaming simhash near-dedup (streaming/simhash_stream):
within-batch cluster representatives, exact cross-batch suppression,
arrival order, replay idempotence, loud guards."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.streaming.simhash_stream import (
    read_clean,
    start_simhash_dedup_stream,
)

SCHEMA = "doc_id long, simhash long"


def _write_src(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    for rows in batches:
        (spark.createDataFrame(rows, SCHEMA)
         .coalesce(1).write.mode("append").parquet(src))
    return src


def _run(spark, src, path, ckpt, *, stats=None, max_files=1, **kw):
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", max_files).parquet(src))
    q = start_simhash_dedup_stream(stream, path=path, checkpoint=ckpt,
                                   stats=stats, **kw)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        time.sleep(0.2)


def test_within_batch_cluster_representatives(spark, tmp_path):
    # 1 and 2 differ by 1 bit; 3 differs from 2 by 1 more bit (a
    # CHAIN: 1~2, 2~3, but 1 and 3 are 2 apart — still one cluster
    # at radius 2); 9 is far away
    rows = [(1, 0b1111), (2, 0b1110), (3, 0b1100),
            (9, 0b11110000111100001111)]
    src = _write_src(spark, tmp_path, [rows])
    path = str(tmp_path / "sh")
    _run(spark, src, path, str(tmp_path / "ck"), max_files=10)
    kept = {r["doc_id"] for r in read_clean(spark, path).collect()}
    assert kept == {1, 9}  # min id per cluster + the singleton


def test_cross_batch_suppression_and_arrival_order(spark, tmp_path):
    b1 = [(5, 0b1010)]
    b2 = [(2, 0b1011), (7, 0b1110000011)]  # 2 ~ accepted 5 -> drops
    src = _write_src(spark, tmp_path, [b1, b2])
    path = str(tmp_path / "sh")
    stats: list = []
    _run(spark, src, path, str(tmp_path / "ck"), stats=stats)
    kept = {r["doc_id"] for r in read_clean(spark, path).collect()}
    # doc 2 has a smaller id than 5 but arrived later: never revoked
    assert kept == {5, 7}
    assert [s["docs_kept"] for s in stats] == [1, 1]
    assert stats[-1]["seen"] == 2


def test_replay_idempotent_and_param_guard(spark, tmp_path):
    rows = [(1, 7), (2, 7)]
    src = _write_src(spark, tmp_path, [rows])
    path = str(tmp_path / "sh")
    _run(spark, src, path, str(tmp_path / "ck"))
    before = sorted(map(tuple, read_clean(spark, path).collect()))
    _run(spark, src, path, str(tmp_path / "ck2"))  # replay batch 0
    assert sorted(map(tuple, read_clean(spark, path).collect())) == before
    with pytest.raises(Exception, match="near-duplicate"):
        _run(spark, src, path, str(tmp_path / "ck3"), max_hamming=3)
    with pytest.raises(ValueError):
        start_simhash_dedup_stream(None, path="x", checkpoint="y",
                                   max_hamming=0)


def test_extra_columns_ride_through(spark, tmp_path):
    rows = [(1, 3, "keep me")]
    src = str(tmp_path / "src")
    (spark.createDataFrame(rows, "doc_id long, simhash long, text string")
     .coalesce(1).write.parquet(src))
    stream = (spark.readStream
              .schema("doc_id long, simhash long, text string")
              .parquet(src))
    path = str(tmp_path / "sh")
    q = start_simhash_dedup_stream(stream, path=path,
                                   checkpoint=str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        time.sleep(0.2)
    out = read_clean(spark, path).collect()
    assert out[0]["text"] == "keep me"
