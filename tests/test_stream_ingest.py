"""Streaming ingestion into the MERGE-upserted lakehouse table:
continuous document batches → exactly one current row per doc_id."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.lakehouse import read_table
from myhadoop_spark.streaming.ingest import latest_per_key, start_stream_upsert

SCHEMA = "doc_id INT, version INT, text STRING"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        path, mode="overwrite")


def test_stream_upsert_converges_to_latest(spark, tmp_path):
    src = tmp_path / "src"
    batches = [
        [(1, 1, "one v1"), (2, 1, "two v1"), (3, 1, "three v1")],
        # updates 2 and 3, inserts 4
        [(2, 2, "two v2"), (3, 2, "three v2"), (4, 2, "four v2")],
        # two versions of doc 1 inside ONE micro-batch: latest_per_key
        # must pick v3, not file order
        [(1, 2, "one v2"), (1, 3, "one v3")],
    ]
    for i, rows in enumerate(batches):
        _write_batch(spark, str(src / f"b{i}"), rows)
        time.sleep(0.2)  # distinct mtimes → deterministic source ordering

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/*"))
    table = str(tmp_path / "docs_tbl")
    q = start_stream_upsert(
        stream, table, key="doc_id",
        checkpoint=str(tmp_path / "ckpt"), version_col="version")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.doc_id, r.version, r.text)
           for r in read_table(spark, table).collect()}
    assert got == {
        (1, 3, "one v3"), (2, 2, "two v2"),
        (3, 2, "three v2"), (4, 2, "four v2")}


def test_restart_resumes_without_duplicates(spark, tmp_path):
    """Stop after the first file, restart with the same checkpoint, add
    more data: the table must equal the latest-per-key of everything,
    with no double-application of the already-committed batch."""
    src = tmp_path / "src"
    _write_batch(spark, str(src / "b0"), [(1, 1, "a"), (2, 1, "b")])

    def start():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(f"{src}/*"))
        return start_stream_upsert(
            stream, str(tmp_path / "tbl"), key="doc_id",
            checkpoint=str(tmp_path / "ckpt"), version_col="version")

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _write_batch(spark, str(src / "b1"), [(2, 2, "b2"), (3, 2, "c2")])
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = read_table(spark, str(tmp_path / "tbl"))
    assert out.count() == 3
    got = {(r.doc_id, r.version, r.text) for r in out.collect()}
    assert got == {(1, 1, "a"), (2, 2, "b2"), (3, 2, "c2")}


def test_latest_per_key_tiebreak_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 1, "x"), (1, 1, "y")], SCHEMA)
    out = latest_per_key(df, "doc_id", "version", tiebreak=("text",))
    assert [tuple(r) for r in out.collect()] == [(1, 1, "y")]
