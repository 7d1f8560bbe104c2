"""Streaming HLL index maintenance (streaming/hll_stream): batching
invariance (incremental merge == one-shot index), monotone running
estimates, replay idempotence, loud param guards."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.hll_index import estimate, group_sketches
from myhadoop_spark.streaming.hll_stream import (
    read_index,
    start_hll_stream,
)

SCHEMA = "g string, v long"


def _write_src(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    for rows in batches:
        (spark.createDataFrame(rows, SCHEMA)
         .coalesce(1).write.mode("append").parquet(src))
    return src


def _run(spark, src, path, ckpt, *, stats=None, max_files=1, **kw):
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", max_files).parquet(src))
    q = start_hll_stream(stream, path=path, checkpoint=ckpt,
                         keys=["g"], value_col="v", stats=stats, **kw)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        time.sleep(0.2)


def _batches():
    # 3 batches, overlapping values within and across batches
    return [[(f"g{i % 3}", (b * 40 + i) % 70) for i in range(60)]
            for b in range(3)]


def test_batched_equals_one_shot(spark, tmp_path):
    batches = _batches()
    src = _write_src(spark, tmp_path, batches)
    path = str(tmp_path / "hll")
    stats: list = []
    _run(spark, src, path, str(tmp_path / "ck"), stats=stats)
    got = sorted(map(tuple,
                     estimate(read_index(spark, path), ["g"]).collect()))
    all_rows = [r for b in batches for r in b]
    df = spark.createDataFrame(all_rows, SCHEMA)
    want = sorted(map(tuple,
                      estimate(group_sketches(df, ["g"], "v"),
                               ["g"]).collect()))
    assert got == want
    # running total estimate is monotone non-decreasing
    ests = [s["total_estimate"] for s in stats]
    assert ests == sorted(ests) and len(ests) == 3


def test_replay_and_param_guard(spark, tmp_path):
    src = _write_src(spark, tmp_path, [_batches()[0]])
    path = str(tmp_path / "hll")
    _run(spark, src, path, str(tmp_path / "ck"))
    before = sorted(map(tuple, read_index(spark, path)
                        .select("g", "n_rows").collect()))
    # fresh checkpoint replays batch 0 -> idempotent skip
    _run(spark, src, path, str(tmp_path / "ck2"))
    assert sorted(map(tuple, read_index(spark, path)
                      .select("g", "n_rows").collect())) == before
    with pytest.raises(Exception, match="counted"):
        _run(spark, src, path, str(tmp_path / "ck3"), lgk=13)


def test_empty_first_batch_reports_zero(spark, tmp_path):
    """An empty FIRST micro-batch (meta is None, so the empty-batch
    skip doesn't fire) yields a NULL total estimate over the empty
    sketch table — stats must report 0, not TypeError the stream."""
    src = str(tmp_path / "src")
    empty = spark.createDataFrame([], SCHEMA)
    empty.coalesce(1).write.mode("append").parquet(src)
    (spark.createDataFrame(_batches()[0], SCHEMA)
     .coalesce(1).write.mode("append").parquet(src))
    path = str(tmp_path / "hll")
    stats: list = []
    _run(spark, src, path, str(tmp_path / "ck"), stats=stats)
    assert stats[0]["total_estimate"] == 0
    assert stats[0]["groups"] == 0
    assert stats[-1]["total_estimate"] > 0


def test_rejects_empty_keys(spark):
    with pytest.raises(ValueError):
        start_hll_stream(None, path="x", checkpoint="y", keys=[],
                         value_col="v")
