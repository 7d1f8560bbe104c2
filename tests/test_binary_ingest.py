"""binaryFile ingest path (sources/multimodal.read_media_dir) on real
files written to disk."""

from __future__ import annotations

import pytest

from myhadoop_spark.sources.multimodal import decode_media, read_media_dir


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    for i in range(4):
        (d / f"img_{i}.bin").write_bytes(bytes([i]) * (64 + i))
    (d / "notes.txt").write_text("not media")
    return d


def test_read_media_dir_globs_and_schemas(spark, media_dir):
    df = read_media_dir(spark, str(media_dir), glob="*.bin")
    rows = df.collect()
    assert len(rows) == 4  # txt excluded by glob
    for r in rows:
        assert r["meta"]["n_bytes"] == len(bytes(r["payload"]))
        assert r["meta"]["source_uri"].endswith(".bin")
        assert r["kind"] == "image"
    # ids are stable content-independent path hashes, unique
    assert len({r["media_id"] for r in rows}) == 4


def test_binary_ingest_feeds_decoder(spark, media_dir):
    feats = decode_media(read_media_dir(spark, str(media_dir), glob="*.bin"))
    rows = feats.collect()
    assert len(rows) == 4
    assert all(len(r["feature"]) == 8 for r in rows)
