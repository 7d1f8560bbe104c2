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


def _run_stream(spark, src, out, ckpt, n_files=1):
    import time

    from myhadoop_spark.operators.indexing import start_indexing_stream

    stream = (spark.readStream.schema("doc_id long, src string")
              .option("maxFilesPerTrigger", n_files).parquet(src))
    q = start_indexing_stream(stream, ["doc_id"], out_path=out,
                              checkpoint=ckpt, num_partitions=3)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        time.sleep(0.2)


def test_stream_ids_contiguous_across_batches(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    src = str(tmp_path / "src")
    df.repartition(3).write.parquet(src)
    out = str(tmp_path / "out")
    _run_stream(spark, src, out, str(tmp_path / "ck1"))
    rows = spark.read.parquet(out).collect()
    assert sorted(r.idx for r in rows) == list(range(len(ROWS)))
    # within every batch, ids follow the key order
    by_batch: dict = {}
    for r in rows:
        by_batch.setdefault(r.batch_id, []).append((r.idx, r.doc_id))
    assert len(by_batch) >= 2  # maxFilesPerTrigger=1 over 3 files
    for b, rs in by_batch.items():
        ordered = sorted(rs)
        assert [d for _, d in ordered] == sorted(d for _, d in ordered), b


def test_stream_replay_reproduces_ids(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    src = str(tmp_path / "src")
    df.repartition(3).write.parquet(src)
    out = str(tmp_path / "out")
    _run_stream(spark, src, out, str(tmp_path / "ck1"))
    first = sorted((r.doc_id, r.idx)
                   for r in spark.read.parquet(out).collect())
    _run_stream(spark, src, out, str(tmp_path / "ck2"))  # full replay
    again = sorted((r.doc_id, r.idx)
                   for r in spark.read.parquet(out).collect())
    assert again == first


def test_stream_crash_between_meta_and_data(spark, tmp_path):
    """Meta written, data write crashed: the replayed batch reuses its
    recorded start and overwrites the (missing) output with the same
    ids."""
    import shutil

    df = spark.createDataFrame(ROWS, SCHEMA)
    src = str(tmp_path / "src")
    df.repartition(3).write.parquet(src)
    out = str(tmp_path / "out")
    _run_stream(spark, src, out, str(tmp_path / "ck1"))
    want = sorted((r.doc_id, r.idx)
                  for r in spark.read.parquet(out).collect())
    # simulate the crash window on the LAST batch: data gone, meta kept
    batches = sorted(p.name for p in (tmp_path / "out").glob("batch_id=*"))
    shutil.rmtree(tmp_path / "out" / batches[-1])
    _run_stream(spark, src, out, str(tmp_path / "ck2"))
    got = sorted((r.doc_id, r.idx)
                 for r in spark.read.parquet(out).collect())
    assert got == want


def test_deterministic_shuffle_is_reproducible_permutation(spark):
    from myhadoop_spark.operators.indexing import deterministic_shuffle

    df = spark.createDataFrame(ROWS, SCHEMA)
    a = {r.doc_id: r.shuffle_idx
         for r in deterministic_shuffle(df, ["doc_id"]).collect()}
    assert sorted(a.values()) == list(range(len(ROWS)))  # permutation
    b = {r.doc_id: r.shuffle_idx
         for r in deterministic_shuffle(df.repartition(5),
                                        ["doc_id"]).collect()}
    assert a == b                                # rerun/partitioning-stable
    c = {r.doc_id: r.shuffle_idx
         for r in deterministic_shuffle(df, ["doc_id"],
                                        seed="7").collect()}
    assert c != a                                # a seed re-shuffles
    assert sorted(c.values()) == list(range(len(ROWS)))
    # and it is a genuine shuffle, not the sorted order
    sorted_order = {d: i for i, (d, _) in
                    enumerate(sorted(ROWS, key=lambda r: r[0]))}
    assert a != sorted_order


def test_stream_partial_own_meta_self_heals(spark, tmp_path):
    """Crash mid-tmp-write of a batch's own meta (main file absent,
    partial .tmp served by read_small_file): the replayed batch must
    derive the offset fresh instead of wedging on the parse error."""
    import os

    df = spark.createDataFrame(ROWS, SCHEMA)
    src = str(tmp_path / "src")
    df.repartition(3).write.parquet(src)
    out = str(tmp_path / "out")
    _run_stream(spark, src, out, str(tmp_path / "ck1"))
    want = sorted((r.doc_id, r.idx)
                  for r in spark.read.parquet(out).collect())
    metas = sorted((tmp_path / "out" / "_idx_meta").glob("batch-*.json"))
    last = metas[-1]
    # simulate: data + meta of the last batch gone, a truncated .tmp
    # left behind
    import shutil
    batches = sorted(p.name for p in (tmp_path / "out").glob("batch_id=*"))
    shutil.rmtree(tmp_path / "out" / batches[-1])
    (tmp_path / "out" / "_idx_meta" / (last.name + ".tmp")).write_text(
        '{"start": 4')
    os.remove(last)
    _run_stream(spark, src, out, str(tmp_path / "ck2"))
    got = sorted((r.doc_id, r.idx)
                 for r in spark.read.parquet(out).collect())
    assert got == want
