"""Contiguous global index (operators/indexing.py): exact rank
equality with a sorted-Python model, contiguity 0..N−1, partitioning
invariance, the duplicate-key refusal, and plan shape (range exchange,
no single-partition window sort). The cross-engine differential is
the ungated query ``global_index`` (tests/test_correctness.py)."""

from __future__ import annotations

import contextlib
import io

import pytest

from myhadoop_spark.operators.indexing import assign_global_index

ROWS = [(d, f"s{d % 7}") for d in (9, 3, 27, 1, 14, 0, 5, 22, 11, 8)]
SCHEMA = "doc_id long, src string"


def test_matches_sorted_rank(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r.doc_id: r.idx
           for r in assign_global_index(df, ["src", "doc_id"]).collect()}
    want = {d: i for i, (d, _) in
            enumerate(sorted(ROWS, key=lambda r: (r[1], r[0])))}
    assert got == want


def test_contiguous_zero_based(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    idx = sorted(r.idx for r in
                 assign_global_index(df, ["doc_id"]).collect())
    assert idx == list(range(len(ROWS)))


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    a = sorted(map(tuple, assign_global_index(
        df, ["src", "doc_id"]).collect()))
    b = sorted(map(tuple, assign_global_index(
        df.repartition(9), ["src", "doc_id"],
        num_partitions=3).collect()))
    assert a == b


def test_duplicate_keys_refused(spark):
    df = spark.createDataFrame(ROWS + [(9, "dup")], SCHEMA)
    with pytest.raises(ValueError, match="unique total order"):
        assign_global_index(df, ["doc_id"])


def test_no_single_partition_window(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = assign_global_index(df, ["src", "doc_id"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan, plan  # Arrow numbering only
