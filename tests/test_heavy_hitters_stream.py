"""Streaming Misra-Gries maintenance (streaming/heavy_hitters_stream):
the mergeable-summaries bound holds across micro-batches, replay is
idempotent, and the query face orders correctly."""

from __future__ import annotations

import time
from collections import Counter

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.streaming.heavy_hitters_stream import (
    start_mg_stream,
    stream_topk,
)

# r14 (VERDICT r13 item 1): heavy parity/property battery — the
# slow tier; see pytest.ini. Run with -m "slow or not slow".
pytestmark = pytest.mark.slow

CAP = 8


def _mk_terms(spark, tmp_path):
    """A skewed term stream: a few heavy terms + a long tail, written
    as multiple files so availableNow splits it into micro-batches."""
    rows = []
    for i in range(3000):
        if i % 3 == 0:
            rows.append((f"heavy{i % 2}",))
        elif i % 7 == 0:
            rows.append(("warm",))
        else:
            rows.append((f"tail{i % 97}",))
    df = spark.createDataFrame(rows, "term string")
    src = str(tmp_path / "src")
    df.repartition(5).write.parquet(src)
    return src, Counter(t for (t,) in rows)


def _run(spark, src, path, ckpt):
    stream = spark.readStream.schema("term string") \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = start_mg_stream(stream, path=path, checkpoint=ckpt, capacity=CAP)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        time.sleep(0.2)


def test_bound_holds_and_heavy_terms_survive(spark, tmp_path):
    src, true = _mk_terms(spark, tmp_path)
    path = str(tmp_path / "mg")
    _run(spark, src, path, str(tmp_path / "ck1"))
    rows = stream_topk(spark, path, k=CAP).collect()
    assert rows
    err = rows[0].err_bound
    n = sum(true.values())
    assert err == n // (CAP + 1)
    got = {r.term: r.est for r in rows}
    for t, est in got.items():
        assert est <= true[t] <= est + err, (t, est, true[t], err)
    # the mergeable-MG guarantee: anything truly heavier than the
    # bound must be present in the summary
    for t, c in true.items():
        if c > err:
            assert t in got, (t, c, err)
    # ordering: est desc, term asc
    keys = [(-r.est, r.term) for r in rows]
    assert keys == sorted(keys)


def test_same_checkpoint_restart_is_noop(spark, tmp_path):
    """Restarting over the SAME checkpoint with no new data absorbs
    nothing and leaves the summary byte-identical (the crash-replay of
    the last batch is skipped idempotently)."""
    src, _ = _mk_terms(spark, tmp_path)
    path = str(tmp_path / "mg")
    ck = str(tmp_path / "ck1")
    _run(spark, src, path, ck)
    first = [(r.term, r.est, r.err_bound) for r in
             stream_topk(spark, path, k=CAP).collect()]
    _run(spark, src, path, ck)  # same checkpoint: nothing new
    again = [(r.term, r.est, r.err_bound) for r in
             stream_topk(spark, path, k=CAP).collect()]
    assert again == first


def test_fresh_checkpoint_fails_loudly(spark, tmp_path):
    """A recreated checkpoint restarts batch ids from 0 — its batches
    can bundle absorbed AND new rows, so the state machine must refuse
    (silently skipping would undercount, merging would double-count)."""
    from pyspark.errors import StreamingQueryException

    src, _ = _mk_terms(spark, tmp_path)
    path = str(tmp_path / "mg")
    _run(spark, src, path, str(tmp_path / "ck1"))
    with pytest.raises(StreamingQueryException,
                       match="different checkpoint lineage"):
        _run(spark, src, path, str(tmp_path / "ck2"))


def test_capacity_mismatch_fails_loudly(spark, tmp_path):
    from pyspark.errors import StreamingQueryException

    src, _ = _mk_terms(spark, tmp_path)
    path = str(tmp_path / "mg")
    _run(spark, src, path, str(tmp_path / "ck1"))
    stream = spark.readStream.schema("term string").parquet(src)
    q = start_mg_stream(stream, path=path,
                        checkpoint=str(tmp_path / "ck3"),
                        capacity=CAP * 2)
    with pytest.raises(StreamingQueryException,
                       match="incomparable summaries"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()


def test_missing_state_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        stream_topk(spark, str(tmp_path / "nope"))
