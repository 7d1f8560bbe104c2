"""Mixed-media directory routing (sources/multimodal.sniff_media_kind
+ the three family decoders) and the video cross-set suppression face
(operators/video_fp.frame_match_probe): one binaryFile scan over a
directory holding PNG/BMP/PPM images, PCM WAVs, and animated GIFs,
kind-routed by magic bytes (pure JVM expression) into the real
decoders — the production crawl-ingest shape. r13: the image route
also carries baseline JPEGs (the lossy fourth format)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.video_fp import frame_match_probe
from myhadoop_spark.sources.audiogen import write_audio_corpus
from myhadoop_spark.sources.imagegen import (
    write_image_corpus,
    write_jpeg_corpus,
)
from myhadoop_spark.sources.multimodal import (
    decode_audio_grid,
    decode_image_grid,
    decode_video_grids,
    read_media_dir,
    sniff_media_kind,
)
from myhadoop_spark.sources.videogen import write_video_corpus

N_GROUPS, VARIANTS = 3, 4


def test_mixed_dir_sniff_and_route(spark, tmp_path):
    write_image_corpus(tmp_path, n_groups=N_GROUPS, variants=VARIANTS)
    write_jpeg_corpus(tmp_path, n_groups=1, variants=VARIANTS)
    write_audio_corpus(tmp_path, n_groups=N_GROUPS, variants=VARIANTS)
    write_video_corpus(tmp_path, n_groups=N_GROUPS, variants=VARIANTS)
    (tmp_path / "junk.bin").write_bytes(b"\x00\x01\x02\x03" * 8)

    media = (read_media_dir(spark, str(tmp_path))
             .withColumn("kind", sniff_media_kind("payload"))
             .localCheckpoint())
    n = N_GROUPS * VARIANTS
    n_img = n + VARIANTS                     # + the lossy JPEG group
    counts = {r.kind: r.n for r in
              media.groupBy("kind").agg(F.count("*").alias("n"))
              .collect()}
    assert counts == {"image": n_img, "audio": n, "video": n, None: 1}

    # each routed family decodes for real, end to end
    img = decode_image_grid(media.filter(F.col("kind") == "image"),
                            fake=False)
    assert img.count() == n_img and img.filter(
        F.size("grid") == 72).count() == n_img
    aud = decode_audio_grid(media.filter(F.col("kind") == "audio"),
                            fake=False)
    assert aud.count() == n and aud.filter(
        F.col("sample_rate") == 8000).count() == n
    vid = decode_video_grids(media.filter(F.col("kind") == "video"),
                             fake=False)
    assert vid.count() == n * 4  # 4 frames per GIF

    # routing an unknown payload into a real decoder fails loudly
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        decode_image_grid(media.filter(F.col("kind").isNull()),
                          fake=False).collect()


def test_sniff_is_jvm_side(spark):
    # no BatchEvalPython / Arrow eval in the sniff plan — pure codegen
    df = spark.range(4).select(
        F.sha2(F.col("id").cast("string"), 256).cast("binary")
        .alias("payload"))
    plan = (df.select(sniff_media_kind("payload").alias("kind"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# ------------------------------------------------ frame_match_probe


def test_frame_match_probe_requires_single_seen_video(spark):
    # probe 10 matches seen 0 at position 0 and seen 1 at position 1 —
    # two DIFFERENT seen videos, so min_shared=2 must NOT fire
    seen = spark.createDataFrame(
        [(0, 0, 7), (0, 1, 100), (1, 0, 200), (1, 1, 9)],
        "media_id long, frame_idx int, fhash long")
    probe = spark.createDataFrame(
        [(10, 0, 7), (10, 1, 9)],
        "media_id long, frame_idx int, fhash long")
    assert frame_match_probe(probe, seen, bits=64, max_hamming=1,
                             min_shared=2).count() == 0
    # but a seen video matching both positions fires exactly once
    seen2 = spark.createDataFrame(
        [(0, 0, 7), (0, 1, 9)],
        "media_id long, frame_idx int, fhash long")
    got = frame_match_probe(probe, seen2, bits=64, max_hamming=1,
                            min_shared=2).collect()
    assert [r.media_id for r in got] == [10]


def test_frame_match_probe_guards():
    with pytest.raises(ValueError, match="max_hamming"):
        frame_match_probe(None, None, bits=64, max_hamming=0)
    with pytest.raises(ValueError, match="min_shared"):
        frame_match_probe(None, None, bits=64, max_hamming=2,
                          min_shared=0)
