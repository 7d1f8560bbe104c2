"""The r14 materialization policy (myhadoop_spark/materialize.py):
one helper decides how load-bearing intermediates are pinned —
localCheckpoint locally, reliable checkpoint() under the cluster env
flag — with identical rows and truncated lineage on both paths."""

from __future__ import annotations

import contextlib
import io

import pytest

from myhadoop_spark.materialize import materialize, materialize_lazy


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_local_default_truncates_lineage(spark):
    df = spark.range(100).selectExpr("id", "id * 2 AS x")
    out = df.transform(materialize)
    # lineage truncated: the plan reads materialized rows, the
    # producing projection is gone
    assert "ExistingRDD" in _plan(out)
    assert sorted(r.x for r in out.collect()) == [2 * i for i in range(100)]


def test_lazy_form_truncates_on_first_use(spark):
    df = spark.range(50).selectExpr("id", "id + 1 AS y")
    out = df.transform(materialize_lazy)
    assert out.count() == 50
    assert "ExistingRDD" in _plan(out)


def test_reliable_flag_requires_checkpoint_dir(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("session already has a checkpoint dir")
    with pytest.raises(RuntimeError, match="SPARK_GRAFT_CHECKPOINT_DIR"):
        spark.range(10).transform(materialize)


def test_reliable_checkpoint_same_rows(spark, monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "ck"))
    df = spark.range(100).selectExpr("id", "id * 3 AS z")
    out = df.transform(materialize)
    # the reliable path writes RDD blocks to the checkpoint dir and
    # returns the same rows with truncated lineage
    assert "ExistingRDD" in _plan(out)
    assert sorted(r.z for r in out.collect()) == [3 * i for i in range(100)]
    ckdirs = list((tmp_path / "ck").rglob("part-*"))
    assert ckdirs, "reliable checkpoint wrote no blocks"
    lazy = df.transform(materialize_lazy)
    assert lazy.count() == 100
