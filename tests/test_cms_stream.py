"""Streaming CMS maintenance (streaming/cms_stream): the maintained
sketch is BITWISE the one-shot sketch of everything absorbed (the
exact-merge property cashed in), replay is idempotent, lineage rewinds
fail loudly, and parameter mismatches are refused."""

from __future__ import annotations

import time
from collections import Counter

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.cms import cms_estimate, cms_table
from myhadoop_spark.streaming.cms_stream import (
    start_cms_stream,
    stream_estimate,
)

D, W = 4, 16


def _mk_terms(spark, tmp_path):
    rows = []
    for i in range(2000):
        if i % 3 == 0:
            rows.append((f"heavy{i % 2}",))
        else:
            rows.append((f"tail{i % 53}",))
    df = spark.createDataFrame(rows, "term string")
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    return src, Counter(t for (t,) in rows)


def _run(spark, src, path, ckpt):
    stream = (spark.readStream.schema("term string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_cms_stream(stream, path=path, checkpoint=ckpt,
                         depth=D, width=W)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        time.sleep(0.2)


def test_stream_equals_one_shot_bitwise(spark, tmp_path):
    src, true = _mk_terms(spark, tmp_path)
    path = str(tmp_path / "cms")
    _run(spark, src, path, str(tmp_path / "ck1"))
    meta_batch = spark.read.parquet(src)
    one_shot = {(r.j, r.bucket): r.c
                for r in cms_table(meta_batch, "term",
                                   depth=D, width=W).collect()}
    streamed = {(r.j, r.bucket): r.c
                for r in spark.read.parquet(
                    f"{path}/cms_v3").collect()}  # 4 files → batches 0-3
    assert streamed == one_shot
    # estimate face: est >= true for every term, meta-driven params
    terms = meta_batch.distinct()
    est = {r.term: r.est
           for r in stream_estimate(spark, path, terms).collect()}
    for t, c in true.items():
        assert est[t] >= c


def test_replay_idempotent_and_lineage_guard(spark, tmp_path):
    src, _ = _mk_terms(spark, tmp_path)
    path = str(tmp_path / "cms")
    ck = str(tmp_path / "ck1")
    _run(spark, src, path, ck)
    before = {(r.j, r.bucket): r.c
              for r in spark.read.parquet(f"{path}/cms_v3").collect()}
    # same checkpoint again: no new files → no state change
    _run(spark, src, path, ck)
    after = {(r.j, r.bucket): r.c
             for r in spark.read.parquet(f"{path}/cms_v3").collect()}
    assert after == before
    # fresh checkpoint against existing state = rewound lineage → loud
    import py4j.protocol

    with pytest.raises((RuntimeError, py4j.protocol.Py4JJavaError,
                        Exception)) as exc:
        _run(spark, src, path, str(tmp_path / "ck2"))
    assert "lineage" in str(exc.value)


def test_parameter_mismatch_refused(spark, tmp_path):
    src, _ = _mk_terms(spark, tmp_path)
    path = str(tmp_path / "cms")
    _run(spark, src, path, str(tmp_path / "ck1"))
    stream = (spark.readStream.schema("term string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_cms_stream(stream, path=path,
                         checkpoint=str(tmp_path / "ck3"),
                         depth=D, width=W * 2)
    with pytest.raises(Exception) as exc:
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            time.sleep(0.2)
    assert "incomparable" in str(exc.value)
