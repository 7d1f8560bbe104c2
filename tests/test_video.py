"""Video fingerprint family (operators/video_fp.py +
sources/multimodal.decode_video_grids + sources/videogen.py): LZW
codec round-trips (including table-overflow streams), GIF parse
round-trips against the generator, frame-sampling semantics, the
planted one-frame locality pin, an end-to-end on-disk real-codec
near-dup run, and guards."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.connected_components import (
    connected_components,
)
from myhadoop_spark.operators.phash import dhash64
from myhadoop_spark.operators.video_fp import frame_match_pairs
from myhadoop_spark.sources.multimodal import (
    _lzw_decode,
    _parse_gif,
    decode_video_grids,
    gray_grid,
    read_media_dir,
)
from myhadoop_spark.sources.videogen import (
    base_frames,
    encode_gif,
    lzw_encode,
    palette,
    perturb_frame_box,
    write_video_corpus,
)

# ----------------------------------------------------------- LZW codec


def test_lzw_roundtrip_repetitive():
    idx = ([5] * 400 + [1, 2, 3] * 200 + list(range(256)) * 2) * 2
    enc = lzw_encode(idx, 8)
    assert _lzw_decode(8, enc) == idx
    assert len(enc) < len(idx)  # genuinely compressed


def test_lzw_roundtrip_table_overflow():
    # long pseudo-random stream pushes the table through every width
    # growth (512/1024/2048/4096) and a mid-stream CLEAR
    idx = [(i * 2654435761 >> 7) % 256 for i in range(60000)]
    assert _lzw_decode(8, lzw_encode(idx, 8)) == idx


def test_lzw_truncated_stream_raises():
    enc = lzw_encode([1, 2, 3, 4], 8)
    with pytest.raises(ValueError, match="truncated|bad LZW"):
        _lzw_decode(8, enc[:2])


# ------------------------------------------------------ GIF round-trip


def test_gif_roundtrip_pixels():
    import numpy as np

    pal = palette()
    frames = base_frames(1, n_frames=3)
    w, h, out = _parse_gif(encode_gif(frames, pal))
    assert (w, h) == (36, 40) and len(out) == 3
    for f in range(3):
        expect = np.array([[pal[i] for i in row] for row in frames[f]],
                          dtype=np.uint8)
        assert (out[f] == expect).all()


def test_gif_perturbation_moves_one_frame_one_cell():
    pal = palette()
    frames = base_frames(0)
    pert = perturb_frame_box(frames, 2, 4, 5)
    _w, _h, a = _parse_gif(encode_gif(frames, pal))
    _w, _h, b = _parse_gif(encode_gif(pert, pal))
    for f in range(4):
        if f != 2:
            assert (a[f] == b[f]).all()
    ga, gb = gray_grid(a[2], 8, 9), gray_grid(b[2], 8, 9)
    assert sum(x != y for x, y in zip(ga, gb)) == 1


def test_gif_guards():
    with pytest.raises(ValueError, match="not a GIF"):
        _parse_gif(b"RIFF" + b"\x00" * 32)
    # interlace flag on the image descriptor refused loudly
    pal = palette()
    buf = bytearray(encode_gif(base_frames(0, n_frames=1), pal))
    img_at = buf.index(0x2C, 13 + 768)
    buf[img_at + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        _parse_gif(bytes(buf))


# ------------------------------------------------- decode + sampling


def test_decode_video_grids_fake_matches_digest(spark):
    df = spark.range(4).select(
        F.col("id").alias("media_id"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary")
        .alias("payload"))
    rows = decode_video_grids(df, fake=True).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for r in spark.range(4).collect():
        payload = hashlib.sha256(str(r.id).encode()).hexdigest().encode()
        d = hashlib.sha256(payload).digest()
        nf = 2 + d[4] % 3
        got = sorted(by_media[r.id], key=lambda x: x.frame_idx)
        assert [x.frame_idx for x in got] == list(range(nf))
        assert all(x.n_frames == nf for x in got)
        for f, x in enumerate(got):
            assert x.grid == [d[(i * 7 + 13 * f) % 32]
                              for i in range(72)]


def test_decode_video_grids_real_samples_evenly(spark, tmp_path):
    # 8-frame GIF, max_frames=4 -> sample positions 0,2,4,6
    pal = palette()
    frames = base_frames(7, n_frames=8)
    p = tmp_path / "v.gif"
    p.write_bytes(encode_gif(frames, pal))
    media = read_media_dir(spark, str(tmp_path), glob="*.gif",
                           kind="video")
    rows = sorted(decode_video_grids(media, max_frames=4, fake=False)
                  .collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
    assert all(r.n_frames == 8 for r in rows)
    import numpy as np

    for j, r in enumerate(rows):
        src = np.array([[pal[i] for i in row]
                        for row in frames[(j * 8) // 4]], dtype=np.uint8)
        assert r.grid == gray_grid(src, 8, 9)


def test_decode_video_grids_real_rejects_unknown_container(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"\x00\x00\x00 ftypisom" + b"\x00" * 16))],
        "media_id long, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|animated"):
        decode_video_grids(df, fake=False).collect()


# --------------------------------------------------- frame-match join


def test_frame_match_pairs_guards():
    with pytest.raises(ValueError, match="max_hamming"):
        frame_match_pairs(None, bits=64, max_hamming=0)
    with pytest.raises(ValueError, match="min_shared"):
        frame_match_pairs(None, bits=64, max_hamming=2, min_shared=0)


def test_frame_match_pairs_counts_positions_once(spark):
    # id 0 and 1: frames 0/1 identical, frame 2 differs by > hamming;
    # min_shared=2 keeps the pair with shared_frames == 2
    rows = [(0, 0, 7), (0, 1, 9), (0, 2, 0),
            (1, 0, 7), (1, 1, 9), (1, 2, -1)]
    df = spark.createDataFrame(
        rows, "media_id long, frame_idx int, fhash long")
    got = frame_match_pairs(df, bits=64, max_hamming=2,
                            min_shared=2).collect()
    assert len(got) == 1
    assert (got[0].id_a, got[0].id_b, got[0].shared_frames) == (0, 1, 2)
    # raising min_shared past the matches drops the pair
    assert frame_match_pairs(df, bits=64, max_hamming=2,
                             min_shared=3).count() == 0


def test_frame_match_pairs_positional_not_cross_frame(spark):
    # same fingerprints at DIFFERENT positions must not match
    rows = [(0, 0, 7), (0, 1, 9), (1, 0, 9), (1, 1, 7)]
    df = spark.createDataFrame(
        rows, "media_id long, frame_idx int, fhash long")
    assert frame_match_pairs(df, bits=64, max_hamming=1,
                             min_shared=1).count() == 0


def test_frame_match_pairs_max_bucket_guard(spark):
    rows = [(i, 0, 0) for i in range(12)]
    df = spark.createDataFrame(
        rows, "media_id long, frame_idx int, fhash long")
    with pytest.raises(Exception, match="max_bucket"):
        frame_match_pairs(df, bits=64, max_hamming=2, min_shared=1,
                          max_bucket=4).collect()


# ------------------------------------------- on-disk end-to-end (real)

N_GROUPS, VARIANTS = 5, 4


def test_on_disk_gif_decode_to_neardup_and_keep_one(spark, tmp_path):
    stats = write_video_corpus(tmp_path, n_groups=N_GROUPS,
                               variants=VARIANTS)
    assert stats["files"] == N_GROUPS * VARIANTS
    media = read_media_dir(spark, str(tmp_path), glob="*.gif",
                           kind="video")
    name = F.element_at(F.split(F.col("meta.source_uri"), "/"), -1)
    tagged = media.withColumn(
        "g", F.regexp_extract(name, r"g(\d+)_v(\d)", 1).cast("int")
    ).withColumn(
        "v", F.regexp_extract(name, r"g(\d+)_v(\d)", 2).cast("int"))
    grids = decode_video_grids(tagged, fake=False)
    hashed = (tagged.select("media_id", "g", "v")
              .join(grids.select(
                  "media_id", "frame_idx",
                  dhash64(F.col("grid")).alias("fhash")), "media_id")
              .localCheckpoint())
    assert hashed.count() == N_GROUPS * VARIANTS * 4

    tags = {r.media_id: (r.g, r.v)
            for r in hashed.select("media_id", "g", "v")
            .distinct().collect()}
    pairs = frame_match_pairs(
        hashed.select("media_id", "frame_idx", "fhash"),
        bits=64, max_hamming=2, min_shared=3)
    got = [(tags[r.id_a], tags[r.id_b], r.shared_frames)
           for r in pairs.collect()]
    # every surviving pair stays within its planted group, and every
    # group pairs completely (perturbed frames still match <= 2 bits)
    assert all(a[0] == b[0] for a, b, _s in got)
    assert len(got) == N_GROUPS * (VARIANTS * (VARIANTS - 1) // 2)
    for (_ga, va), (_gb, vb), s in got:
        if {va, vb} <= {0, VARIANTS - 1}:
            assert s == 4       # exact copies share all positions
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"),
                     F.col("id_b").alias("dst")))
    labels = {r.id: r.component for r in comp.collect()}
    by_group = {}
    for mid, (g, _v) in tags.items():
        by_group.setdefault(g, set()).add(labels[mid])
    assert all(len(s) == 1 for s in by_group.values())
    assert len({next(iter(s)) for s in by_group.values()}) == N_GROUPS
