"""Multimodal binary-column plumbing (SURVEY.md §2.3): schema, Arrow
batch shape, determinism, and the explicit codec stub."""

from __future__ import annotations

import pytest

from myhadoop_spark.sources.multimodal import (
    FEATURE_SCHEMA,
    decode_media,
    fake_media_df,
    frame_sample,
)


def test_media_schema_and_determinism(spark):
    df = fake_media_df(spark, 32)
    rows = {r["media_id"]: bytes(r["payload"]) for r in df.collect()}
    rows2 = {r["media_id"]: bytes(r["payload"]) for r in fake_media_df(spark, 32).collect()}
    assert rows == rows2  # deterministic payloads
    assert df.schema["payload"].dataType.typeName() == "binary"
    assert df.schema["meta"].dataType.typeName() == "struct"


def test_decode_features(spark):
    feats = decode_media(fake_media_df(spark, 32)).collect()
    assert len(feats) == 32
    assert {f.name for f in FEATURE_SCHEMA.fields} == set(feats[0].asDict())
    for r in feats:
        assert len(r["payload_sha"]) == 64
        assert len(r["feature"]) == 8
        if r["kind"] in ("image", "video"):
            assert r["width"] and r["width"] % 16 == 0
        else:
            assert r["width"] is None
        if r["kind"] in ("audio", "video"):
            assert r["duration_ms"] is not None


def test_decode_partition_invariance(spark):
    """mapInPandas output must not depend on batch/partition layout."""
    base = sorted(r["payload_sha"] for r in decode_media(fake_media_df(spark, 32)).collect())
    alt = sorted(r["payload_sha"]
                 for r in decode_media(fake_media_df(spark, 32).repartition(7)).collect())
    assert base == alt


def test_real_decode_is_explicit_stub(spark):
    with pytest.raises(Exception) as ei:
        decode_media(fake_media_df(spark, 4), fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_frame_sample_expands_video_rows(spark):
    media = fake_media_df(spark, 32)
    frames = frame_sample(media, every_n_bytes=64)
    rows = frames.collect()
    assert rows
    kinds = {r["kind"] for r in media.collect()}
    assert "video" in kinds
    per_media = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r["frame_offset"])
    for offsets in per_media.values():
        assert offsets == sorted(offsets) or sorted(offsets) == sorted(set(offsets))
