"""Streaming line dedup (streaming/line_dedup_stream): single-batch
stream ≡ one-shot batch operator (bitwise), arrival-order keep-first
across batches, replay idempotence, and loud lineage/param guards."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.line_dedup import line_dedup
from myhadoop_spark.operators.line_filter import split_lines
from myhadoop_spark.streaming.line_dedup_stream import (
    read_clean,
    read_seen,
    start_line_dedup_stream,
)

SCHEMA = "doc_id long, text string"


def _write_src(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    for rows in batches:
        (spark.createDataFrame(rows, SCHEMA)
         .coalesce(1).write.mode("append").parquet(src))
    return src


def _run(spark, src, path, ckpt, *, stats=None, max_files=1, **kw):
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", max_files).parquet(src)
              .withColumn("_l", split_lines("text", r"\n")))
    q = start_line_dedup_stream(stream, path=path, checkpoint=ckpt,
                                lines_col_name="_l", stats=stats, **kw)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        time.sleep(0.2)


def test_single_batch_stream_equals_one_shot(spark, tmp_path):
    rows = [(i, f"common footer\nuniq {i}\nmid {i % 3}")
            for i in range(1, 25)]
    src = _write_src(spark, tmp_path, [rows])
    path = str(tmp_path / "ld")
    _run(spark, src, path, str(tmp_path / "ck"), max_files=10)
    got = sorted(map(tuple,
                     read_clean(spark, path)
                     .select("doc_id", "n_lines", "n_kept",
                             "clean_text").collect()))
    docs = (spark.createDataFrame(rows, SCHEMA)
            .withColumn("_l", split_lines("text", r"\n")))
    want = sorted(map(tuple,
                      line_dedup(docs, lines_col="_l")
                      .select("doc_id", "n_lines", "n_kept",
                              "clean_text").collect()))
    assert got == want


def test_arrival_order_keep_first_across_batches(spark, tmp_path):
    b1 = [(1, "footer\nalpha")]
    b2 = [(2, "footer\nbeta"), (3, "footer")]
    src = _write_src(spark, tmp_path, [b1, b2])
    path = str(tmp_path / "ld")
    stats: list = []
    _run(spark, src, path, str(tmp_path / "ck"), stats=stats)
    out = {r["doc_id"]: r for r in read_clean(spark, path).collect()}
    # batch 1 introduced 'footer' and keeps it; batch 2's copies drop
    assert out[1]["clean_text"] == "footer\nalpha"
    assert out[2]["clean_text"] == "beta"
    assert 3 not in out  # every line already seen -> doc dropped
    assert [s["docs_kept"] for s in stats] == [1, 1]
    seen = {r["key"] for r in read_seen(spark, path).collect()}
    assert seen == {"footer", "alpha", "beta"}


def test_replay_idempotent_and_lineage_guard(spark, tmp_path):
    rows = [(1, "a line\nb line")]
    src = _write_src(spark, tmp_path, [rows])
    path = str(tmp_path / "ld")
    _run(spark, src, path, str(tmp_path / "ck"))
    before = sorted(map(tuple, read_clean(spark, path).collect()))
    # same checkpoint, no new files: nothing replays, state unchanged
    _run(spark, src, path, str(tmp_path / "ck"))
    assert sorted(map(tuple, read_clean(spark, path).collect())) == before
    # a FRESH checkpoint replays batch 0 against last_batch=0: the
    # idempotent skip path (same batch id) leaves state unchanged
    _run(spark, src, path, str(tmp_path / "ck2"))
    assert sorted(map(tuple, read_clean(spark, path).collect())) == before


def test_param_guard_is_loud(spark, tmp_path):
    rows = [(1, "a line 1\nb line")]
    src = _write_src(spark, tmp_path, [rows])
    path = str(tmp_path / "ld")
    _run(spark, src, path, str(tmp_path / "ck"))
    with pytest.raises(Exception, match="dedup key"):
        _run(spark, src, path, str(tmp_path / "ck3"), normalize=True)


def test_normalized_stream_keys(spark, tmp_path):
    b1 = [(1, "Call 555 Now\nalpha")]
    b2 = [(2, "call 123 now\nbeta")]
    src = _write_src(spark, tmp_path, [b1, b2])
    path = str(tmp_path / "ld")
    _run(spark, src, path, str(tmp_path / "ck"), normalize=True)
    out = {r["doc_id"]: r for r in read_clean(spark, path).collect()}
    assert out[1]["clean_text"] == "Call 555 Now\nalpha"
    assert out[2]["clean_text"] == "beta"


def test_rejects_min_kept_zero(spark):
    # the guard fires before any stream is touched
    with pytest.raises(ValueError):
        start_line_dedup_stream(None, path="x", checkpoint="y",
                                lines_col_name="_l", min_kept_lines=0)
