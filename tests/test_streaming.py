"""Streaming ≡ batch equivalence (SURVEY.md §5.4): the Structured
Streaming windowed aggregation over a file-replayed event stream must
converge to the batch result on the same rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.functions.money import dec
from myhadoop_spark.streaming.windows import (
    dedup_stream,
    read_event_stream,
    run_to_memory,
    sessionized,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_source(spark, tmp_path_factory):
    """Replay sf0.001 events as 4 parquet files (4 micro-batches)."""
    src = tmp_path_factory.mktemp("event_stream")
    ev = load(spark, SF_SMOKE, "events")
    # split by event_id ranges so batch boundaries are deterministic
    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")  # raw nanos ts
    n = raw.count()
    step = n // 4 + 1
    ids = raw.select(F.col("event_id")).collect()
    for i in range(4):
        part = raw.filter((F.col("event_id") >= i * step)
                          & (F.col("event_id") < (i + 1) * step))
        part.coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i}")
    # flatten: move part files into one dir with strictly increasing
    # mtimes — the parquet file source orders batches by modification
    # time, and out-of-order replay would make whole files late vs the
    # watermark
    import os
    import shutil
    import time
    from pathlib import Path
    flat = tmp_path_factory.mktemp("event_stream_flat")
    now = time.time()
    for i, f in enumerate(sorted(Path(src).glob("b*/part-*.parquet"))):
        dst = flat / f"{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    return str(flat), ev


def test_tumbling_stream_equals_batch(spark, event_source):
    src_dir, batch_events = event_source
    stream = read_event_stream(spark, src_dir)
    q = run_to_memory(tumbling_counts(stream), "stream_out", "complete")
    try:
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM stream_out").collect()
        }
    finally:
        q.stop()
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in (
            batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(dec("value")).cast("double").alias("sum_value"))
            .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"),
                    "event_type", "n_events", "sum_value")
        ).collect()
    }
    assert got == expected


def test_sessionized_runs(spark, event_source):
    src_dir, _ = event_source
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=4)
    q = run_to_memory(sessionized(stream), "sessions_out", "complete")
    try:
        rows = spark.sql("SELECT * FROM sessions_out").collect()
    finally:
        q.stop()
    assert rows, "no sessions produced"
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1


def test_stream_dedup(spark, event_source):
    src_dir, batch_events = event_source
    stream = read_event_stream(spark, src_dir)
    q = run_to_memory(dedup_stream(stream), "dedup_out", "append")
    try:
        n = spark.sql("SELECT COUNT(*) AS n FROM dedup_out").collect()[0]["n"]
    finally:
        q.stop()
    assert n == batch_events.count()


def test_state_metrics_bounded_by_watermark(spark, event_source):
    """State observability (ROADMAP r2 #2): the windowed aggregation
    reports its state size through StreamingQueryProgress, and the
    watermark keeps it bounded by the open-window count — the metric an
    operator watches at 100 TB to know state isn't leaking."""
    from myhadoop_spark.streaming.windows import tumbling_counts

    src_dir, batch_events = event_source
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    q = run_to_memory(tumbling_counts(stream), "state_metrics_out", "append")
    try:
        progress = q.recentProgress
        state_rows = [
            op["numRowsTotal"]
            for p in progress for op in (p.get("stateOperators") or [])
        ]
    finally:
        q.stop()
    assert state_rows and max(state_rows) > 0, progress
    # bound: state holds at most the (window × event_type) groups seen
    n_groups = (
        batch_events.select(F.window("ts", "1 hour"), "event_type")
        .distinct().count()
    )
    assert max(state_rows) <= n_groups, (max(state_rows), n_groups)


def test_stream_definable_on_empty_directory(spark, tmp_path):
    """A stream defined before its producer writes any file must not
    throw (r3 advice: schema inference re-introduced a non-empty-dir
    requirement); it falls back to the pinned default events schema and
    picks up files that appear later."""
    from myhadoop_spark.streaming.windows import (
        read_event_stream,
        run_to_memory,
        tumbling_counts,
    )

    empty = tmp_path / "empty_events"
    empty.mkdir()
    stream = read_event_stream(spark, str(empty))
    assert "ts" in stream.columns and stream.isStreaming
    q = run_to_memory(tumbling_counts(stream), "empty_dir_out", "append")
    try:
        assert spark.table("empty_dir_out").count() == 0
    finally:
        q.stop()
