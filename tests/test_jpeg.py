"""Baseline JPEG path (r13): pure-Python encoder (sources/imagegen.py,
ITU-T T.81 Annex K tables) and INDEPENDENT decoder
(sources/multimodal.py — all tables read from the bitstream), then the
full on-disk lossy rehearsal: .jpg files -> binaryFile ingest ->
decode_image_grid(fake=False) -> dhash64 -> Hamming join. The point of
the family: planted near-dups must survive a genuinely LOSSY codec —
the real-crawl shape the PNG/BMP/PPM corpora cannot rehearse.
"""

from __future__ import annotations

import itertools

import numpy as np
import pyspark.sql.functions as F
import pytest

from myhadoop_spark.operators.phash import dhash64
from myhadoop_spark.operators.simhash_join import hamming_pairs
from myhadoop_spark.sources.imagegen import (
    GRID_COLS,
    GRID_ROWS,
    encode_jpeg,
    perturb_box,
    smooth_image,
    write_jpeg_corpus,
)
from myhadoop_spark.sources.multimodal import (
    _parse_jpeg,
    decode_image_grid,
    gray_grid,
    read_media_dir,
    sniff_media_kind,
)


def _dhash_model(grid):
    bits = 0
    for r in range(8):
        for c in range(8):
            if grid[r * 9 + c] > grid[r * 9 + c + 1]:
                bits |= 1 << (r * 8 + c)
    return bits


# ---------------------------------------------------------------- codec


def test_flat_gray_roundtrip_exact():
    """A flat block is DC-only: quantize(16) at Q90 -> dequant -> IDCT
    must reproduce the level exactly (the quant-math pin — any scaling
    or normalization slip shifts every pixel)."""
    for level in (2, 60, 130, 240):
        img = [[(level, level, level)] * 36 for _ in range(40)]
        for sub in (False, True):
            w, h, rgb = _parse_jpeg(encode_jpeg(img, quality=90,
                                                subsample=sub))
            assert (w, h) == (36, 40)
            err = np.abs(rgb.astype(int) - level).max()
            assert err <= 1, (level, sub, err)


def test_smooth_roundtrip_within_quant_noise():
    """Smooth (per-box constant) content at Q90: per-pixel error stays
    within quantization noise and the phash box means move <= 2 — the
    property the near-dup family rests on."""
    img = smooth_image(3)
    orig = np.asarray(img, dtype=np.uint8)
    g_orig = gray_grid(orig, 8, 9)
    for sub in (False, True):
        w, h, rgb = _parse_jpeg(encode_jpeg(img, quality=90,
                                            subsample=sub))
        assert (w, h) == (36, 40)
        assert np.abs(rgb.astype(int) - orig.astype(int)).max() <= 16
        g_dec = gray_grid(rgb, 8, 9)
        assert max(abs(a - b) for a, b in zip(g_orig, g_dec)) <= 2


def test_odd_dimensions_and_restart_markers():
    """Non-multiple-of-16 dims exercise MCU padding + crop on both
    sides; restart_interval exercises DRI/RSTn segment decode with
    per-segment DC predictor reset."""
    img = smooth_image(5, h=37, w=41)
    buf = encode_jpeg(img, quality=85, subsample=True, restart_interval=2)
    assert b"\xff\xdd" in buf                       # DRI emitted
    assert any(bytes((0xFF, 0xD0 + i)) in buf for i in range(8))
    w, h, rgb = _parse_jpeg(buf)
    assert (w, h) == (41, 37)
    assert np.abs(rgb.astype(int)
                  - np.asarray(img, dtype=int)).max() <= 20


def test_byte_stuffing_roundtrip():
    """Find a corpus image whose entropy stream contains a stuffed
    0xFF00 and pin that decode still reproduces the smooth grid —
    the unstuffing path is live, not theoretical."""
    for seed in range(64):
        img = smooth_image(seed)
        buf = encode_jpeg(img, quality=95, subsample=False)
        body = buf[buf.index(b"\xff\xda"):]
        if b"\xff\x00" in body:
            _, _, rgb = _parse_jpeg(buf)
            g1 = gray_grid(np.asarray(img, dtype=np.uint8), 8, 9)
            g2 = gray_grid(rgb, 8, 9)
            assert max(abs(a - b) for a, b in zip(g1, g2)) <= 2
            return
    pytest.fail("no seed produced a stuffed 0xFF byte")


def test_decoder_rejects_non_baseline_and_garbage():
    with pytest.raises(NotImplementedError, match="SOF marker 0xC2"):
        _parse_jpeg(b"\xff\xd8\xff\xc2\x00\x0b" + b"\x00" * 9)
    with pytest.raises(ValueError, match="not a JPEG"):
        _parse_jpeg(b"P6\n1 1\n255\n\x00\x00\x00")
    buf = encode_jpeg(smooth_image(0), quality=90)
    with pytest.raises(ValueError):
        _parse_jpeg(buf[:len(buf) // 2])


def test_neardup_structure_survives_lossy_codec():
    """The family's reason to exist: one grid box repainted BEFORE
    encoding stays within dHash hamming 2 of its base AFTER the lossy
    round trip; different smooth bases stay far apart."""
    hashes = {}
    for g in range(4):
        base = smooth_image(g)
        bufs = [encode_jpeg(base, quality=90)]
        for v in range(1, 3):
            pert = perturb_box(base, (v * 3 + g) % GRID_ROWS,
                               (v * 5 + 2 * g) % GRID_COLS)
            bufs.append(encode_jpeg(pert, quality=90))
        hashes[g] = [
            _dhash_model(gray_grid(_parse_jpeg(b)[2], 8, 9))
            for b in bufs]
    for g, hs in hashes.items():
        for hv in hs[1:]:
            assert bin(hs[0] ^ hv).count("1") <= 2, g
    cross = min(bin(a ^ b).count("1")
                for ga, gb in itertools.combinations(hashes, 2)
                for a in hashes[ga] for b in hashes[gb])
    assert cross > 2, cross


# ------------------------------------------------------- Spark plumbing


def test_on_disk_jpeg_corpus_recovers_groups(spark, tmp_path):
    """write_jpeg_corpus -> binaryFile -> real decode -> dhash64 ->
    Hamming pairs: every pair stays inside one planted group, every
    (base, variant) pair is found, and the byte-exact copy lands at
    hamming 0 — the test_media_dir recovery contract THROUGH a lossy
    payload path."""
    n_groups, variants = 4, 4
    stats = write_jpeg_corpus(tmp_path, n_groups=n_groups,
                              variants=variants, quality=90)
    assert stats["files"] == n_groups * variants
    media = read_media_dir(spark, str(tmp_path))
    name = F.element_at(F.split(F.col("meta.source_uri"), "/"), -1)
    tagged = media.withColumn(
        "g", F.regexp_extract(name, r"g(\d+)_v(\d)", 1).cast("int")
    ).withColumn(
        "v", F.regexp_extract(name, r"g(\d+)_v(\d)", 2).cast("int"))
    grids = decode_image_grid(tagged, fake=False)
    hashed = (tagged.select("media_id", "g", "v")
              .join(grids.select(
                  "media_id", dhash64(F.col("grid")).alias("dhash")),
                  "media_id").localCheckpoint())
    assert hashed.count() == n_groups * variants

    tags = {r.media_id: (r.g, r.v) for r in hashed.collect()}
    pairs = hamming_pairs(hashed.select("media_id", "dhash"),
                          bits=64, max_hamming=2,
                          id_col="media_id", sim_col="dhash").collect()
    by_group: dict[int, set] = {}
    ham0 = set()
    for p in pairs:
        assert tags[p.id_a][0] == tags[p.id_b][0], p
        g = tags[p.id_a][0]
        vs = frozenset((tags[p.id_a][1], tags[p.id_b][1]))
        by_group.setdefault(g, set()).add(vs)
        if p.hamming == 0:
            ham0.add((g, vs))
    for g in range(n_groups):
        got = by_group.get(g, set())
        for v in range(1, variants):
            assert frozenset((0, v)) in got, (g, v, got)
        assert (g, frozenset((0, variants - 1))) in ham0


_SPARK_SAMPLE_IMAGES = \
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin"


@pytest.mark.skipif(
    not __import__("os").path.isdir(_SPARK_SAMPLE_IMAGES),
    reason="Spark distribution sample images not present")
def test_real_world_jpegs_match_jvm_imageio_decoder(spark):
    """CROSS-DECODER differential on real camera/libjpeg-produced
    JPEGs (the sample images shipped inside the Spark distribution):
    our pure-Python decode vs the JVM ImageIO decode
    (spark.read.format('image'), BGR byte buffer) must agree within
    rounding on every baseline image — 4:2:0 streams with real-world
    Huffman tables, APP segments, and saturated chroma edges (the
    triangular-upsampling case). Progressive samples raise at the
    documented plug-in point."""
    import glob
    import os

    import numpy as np

    paths = sorted(glob.glob(os.path.join(
        _SPARK_SAMPLE_IMAGES, "**", "*.jpg"), recursive=True))
    assert paths, "no sample jpegs found"
    n_baseline = n_progressive = 0
    for p in paths:
        buf = open(p, "rb").read()
        try:
            w, h, mine = _parse_jpeg(buf)
        except NotImplementedError:
            n_progressive += 1
            continue
        n_baseline += 1
        row = (spark.read.format("image").load(p)
               .select("image.*").collect()[0])
        assert (row.width, row.height) == (w, h), p
        ref = (np.frombuffer(bytes(row.data), dtype=np.uint8)
               .reshape(row.height, row.width, row.nChannels)[:, :, ::-1])
        d = np.abs(mine.astype(int) - ref.astype(int))
        assert d.max() <= 10, (p, int(d.max()))
        assert d.mean() <= 0.6, (p, float(d.mean()))
        assert (d > 2).mean() <= 0.001, (p, float((d > 2).mean()))
    assert n_baseline >= 5 and n_progressive >= 1, \
        (n_baseline, n_progressive)


def test_sniff_routes_jpeg_to_image_decoder(spark):
    """Magic-byte router classifies a JPEG payload as 'image' and the
    routed decode produces the same grid as a direct pure-Python
    decode — the mixed-directory path covers the fourth format."""
    buf = encode_jpeg(smooth_image(7), quality=90)
    df = spark.createDataFrame(
        [(1, buf), (2, b"\x00unknown")], "media_id long, payload binary")
    kinds = {r.media_id: r.kind for r in df.select(
        "media_id", sniff_media_kind("payload").alias("kind")).collect()}
    assert kinds == {1: "image", 2: None}
    grid = (decode_image_grid(df.filter(F.col("media_id") == 1),
                              fake=False)
            .select("grid").collect()[0].grid)
    assert grid == gray_grid(_parse_jpeg(buf)[2], 8, 9)
