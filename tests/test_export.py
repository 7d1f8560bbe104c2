"""Verifiable sharded export (operators/export.py): roundtrip,
layout-independence of the manifest, and tamper detection."""

from __future__ import annotations

import shutil

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.export import (
    export_shards,
    read_manifest,
    verify_export,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    return load(spark, SF_SMOKE, "documents").select("doc_id", "text", "lang")


def test_roundtrip_verifies_ok(spark, tmp_path):
    path = str(tmp_path / "exp")
    manifest = export_shards(_docs(spark), path)
    assert manifest["total_rows"] == 500
    assert read_manifest(spark, path) == manifest
    statuses = {r.status for r in verify_export(spark, path).collect()}
    assert statuses == {"ok"}
    # every row present exactly once across shards
    assert spark.read.parquet(path).count() == 500


def test_manifest_is_layout_independent(spark, tmp_path):
    m1 = export_shards(_docs(spark), str(tmp_path / "a"))
    m2 = export_shards(_docs(spark).repartition(7), str(tmp_path / "b"))
    assert m1 == m2


def test_tampered_shard_detected(spark, tmp_path):
    path = str(tmp_path / "exp")
    export_shards(_docs(spark), path)
    # inject a forged row into shard 3
    spark.createDataFrame([(99999, "forged row", "xx")],
                          "doc_id long, text string, lang string") \
        .coalesce(1).write.mode("append").parquet(f"{path}/shard=3")
    got = {r.shard: r.status for r in verify_export(spark, path).collect()}
    assert got[3] == "mismatch"
    assert all(s == "ok" for sh, s in got.items() if sh != 3)


def test_missing_shard_detected(spark, tmp_path):
    path = str(tmp_path / "exp")
    export_shards(_docs(spark), path)
    shutil.rmtree(f"{path}/shard=5")
    got = {r.shard: r.status for r in verify_export(spark, path).collect()}
    assert got[5] == "missing"
