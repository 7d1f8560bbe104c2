"""Streaming budgeted selection (streaming/budget_stream):
single-batch stream ≡ one-shot operator (bitwise), budget
conservation across batches, exhausted-budget behavior, replay
idempotence, loud guards."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.budget_select import budget_select
from myhadoop_spark.streaming.budget_stream import (
    budget_left,
    read_kept,
    start_budget_stream,
)

# r14 (VERDICT r13 item 1): heavy parity/property battery — the
# slow tier; see pytest.ini. Run with -m "slow or not slow".
pytestmark = pytest.mark.slow

SCHEMA = "doc_id long, score long, n_tokens long"


def _write_src(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    for rows in batches:
        (spark.createDataFrame(rows, SCHEMA)
         .coalesce(1).write.mode("append").parquet(src))
    return src


def _run(spark, src, path, ckpt, *, budget, stats=None, max_files=1,
         **kw):
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", max_files).parquet(src))
    q = start_budget_stream(stream, path=path, checkpoint=ckpt,
                            budget=budget, stats=stats, **kw)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        time.sleep(0.2)


def _rows(b, n=20):
    return [(b * 100 + i, (i * 7 + b) % 50, 3 + (i % 5)) for i in range(n)]


def test_single_batch_equals_one_shot(spark, tmp_path):
    rows = _rows(0, 40)
    src = _write_src(spark, tmp_path, [rows])
    path = str(tmp_path / "bs")
    _run(spark, src, path, str(tmp_path / "ck"), budget=60,
         max_files=10)
    got = sorted(map(tuple, read_kept(spark, path)
                     .select("doc_id", "score", "n_tokens").collect()))
    docs = spark.createDataFrame(rows, SCHEMA)
    want = sorted(map(tuple, budget_select(docs, 60).collect()))
    assert got == want


def test_budget_conservation_and_exhaustion(spark, tmp_path):
    batches = [_rows(b) for b in range(4)]
    src = _write_src(spark, tmp_path, batches)
    path = str(tmp_path / "bs")
    stats: list = []
    _run(spark, src, path, str(tmp_path / "ck"), budget=100,
         stats=stats)
    spent = sum(s["tokens"] for s in stats)
    assert budget_left(spark, path) == max(0, 100 - spent)
    # admission is monotone non-increasing once the budget tightens,
    # and the straddling batch admits a partial prefix
    assert stats[0]["admitted"] > 0
    assert stats[-1]["budget_left"] >= 0
    lefts = [s["budget_left"] for s in stats]
    assert lefts == sorted(lefts, reverse=True)
    # exhausted: a later batch admits nothing once budget_left ~ 0
    if lefts[-1] < 3:
        assert stats[-1]["admitted"] == 0 or lefts[-1] >= 0


def test_batch_local_greedy_contract(spark, tmp_path):
    """Arrival order matters BY DESIGN: a high-score doc in batch 2
    is not admitted once batch 1 spent the budget (no revocation)."""
    b1 = [(1, 1, 5)]           # low score, eats the whole budget
    b2 = [(2, 99, 5)]          # better, but too late
    src = _write_src(spark, tmp_path, [b1, b2])
    path = str(tmp_path / "bs")
    _run(spark, src, path, str(tmp_path / "ck"), budget=5)
    kept = {r["doc_id"] for r in read_kept(spark, path).collect()}
    assert kept == {1}
    assert budget_left(spark, path) == 0


def test_overshoot_clamps_to_zero(spark, tmp_path):
    """The straddling document may overshoot the remaining budget;
    the persisted state clamps at 0 (never negative) and later
    batches admit nothing."""
    b1 = [(1, 5, 10)]          # admitted (prefix 0 < 4), spends 10
    b2 = [(2, 99, 1)]          # budget exhausted — not admitted
    src = _write_src(spark, tmp_path, [b1, b2])
    path = str(tmp_path / "bs")
    stats: list = []
    _run(spark, src, path, str(tmp_path / "ck"), budget=4,
         stats=stats)
    assert budget_left(spark, path) == 0
    assert all(s["budget_left"] >= 0 for s in stats)
    kept = {r["doc_id"] for r in read_kept(spark, path).collect()}
    assert kept == {1}


def test_replay_and_guards(spark, tmp_path):
    src = _write_src(spark, tmp_path, [_rows(0)])
    path = str(tmp_path / "bs")
    _run(spark, src, path, str(tmp_path / "ck"), budget=30)
    before = sorted(map(tuple, read_kept(spark, path).collect()))
    _run(spark, src, path, str(tmp_path / "ck2"), budget=30)  # replay
    assert sorted(map(tuple, read_kept(spark, path).collect())) == before
    with pytest.raises(Exception, match="bands"):
        _run(spark, src, path, str(tmp_path / "ck3"), budget=30,
             bands=7)
    with pytest.raises(ValueError):
        start_budget_stream(None, path="x", checkpoint="y", budget=-1)
