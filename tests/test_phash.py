"""Perceptual-hash media near-dup (operators/phash.py +
sources/multimodal.decode_image_grid): pure-Python model parity for
aHash/dHash packing, REAL P6-PPM/24-bpp-BMP decode round-trips
against an independent integer model, an end-to-end real-codec
near-dup join, the keep-one face over the planted clusters, and
guards."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.phash import ahash64, dhash64, drop_last_column
from myhadoop_spark.operators.simhash_join import hamming_pairs
from myhadoop_spark.sources.multimodal import decode_image_grid

# ------------------------------------------------------ python models


def _mask(j):
    return (1 << j) if j < 63 else -(1 << 63)


def _py_dhash(grid, rows=8, cols=9):
    h = 0
    for r in range(rows):
        for c in range(cols - 1):
            if grid[r * cols + c] > grid[r * cols + c + 1]:
                h += _mask(r * (cols - 1) + c)
    return h


def _py_ahash(grid64):
    tot = sum(grid64)
    return sum(_mask(j) for j, p in enumerate(grid64) if p * 64 > tot)


def _py_gray_grid(rgb_rows, grid_rows, grid_cols):
    """Independent integer model of multimodal.gray_grid (no numpy)."""
    h, w = len(rgb_rows), len(rgb_rows[0])
    luma = [[(299 * r + 587 * g + 114 * b) // 1000 for (r, g, b) in row]
            for row in rgb_rows]
    out = []
    for gr in range(grid_rows):
        r0, r1 = (gr * h) // grid_rows, ((gr + 1) * h) // grid_rows
        r1 = max(r1, r0 + 1)
        for gc in range(grid_cols):
            c0, c1 = (gc * w) // grid_cols, ((gc + 1) * w) // grid_cols
            c1 = max(c1, c0 + 1)
            box = [luma[r][c] for r in range(r0, r1)
                   for c in range(c0, c1)]
            out.append(sum(box) // len(box))
    return out


# ------------------------------------------------- pure-python codecs


def _encode_ppm(rgb_rows):
    h, w = len(rgb_rows), len(rgb_rows[0])
    raster = b"".join(bytes(px) for row in rgb_rows for px in row)
    return f"P6\n# test\n{w} {h}\n255\n".encode() + raster


def _encode_bmp(rgb_rows):
    h, w = len(rgb_rows), len(rgb_rows[0])
    stride = ((w * 3 + 3) // 4) * 4
    raster = b""
    for row in reversed(rgb_rows):  # bottom-up
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)  # BGR
        raster += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    header = (b"BM" + (off + len(raster)).to_bytes(4, "little")
              + b"\x00" * 4 + off.to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + h.to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little")
              + len(raster).to_bytes(4, "little")
              + (0).to_bytes(4, "little") * 4)
    return header + raster


def _image(seed, h=40, w=36):
    return [[((r * 7 + c * 13 + seed) % 256,
              (r * 11 + c * 3 + 2 * seed) % 256,
              (r * 5 + c * 17 + 3 * seed) % 256)
             for c in range(w)] for r in range(h)]


# --------------------------------------------------------- hash model


def test_hash_model_parity_random_grids(spark):
    grids = [(i, [hashlib.sha256(f"{i}:{j}".encode()).digest()[0]
                  for j in range(72)]) for i in range(24)]
    df = spark.createDataFrame(grids, "media_id long, grid array<int>")
    got = {r["media_id"]: (r["a"], r["d"]) for r in df.select(
        "media_id",
        ahash64(drop_last_column(F.col("grid"), cols=9)).alias("a"),
        dhash64(F.col("grid"), rows=8, cols=9).alias("d")).collect()}
    for i, grid in grids:
        sub = [p for j, p in enumerate(grid) if j % 9 != 8]
        assert got[i] == (_py_ahash(sub), _py_dhash(grid)), i


def test_sign_bit_packing(spark):
    # a grid forcing bit 63 of the dhash: descending final row pair
    grid = [0] * 72
    grid[7 * 9 + 7] = 200  # row 7, col 7 > col 8 -> bit 63
    df = spark.createDataFrame([(1, grid)],
                               "media_id long, grid array<int>")
    val = df.select(dhash64(F.col("grid")).alias("d")).head()["d"]
    assert val < 0 and val == _py_dhash(grid)


# ----------------------------------------------------- real codecs


@pytest.mark.parametrize("codec", ["ppm", "bmp"])
def test_real_decode_matches_model(spark, codec):
    enc = _encode_ppm if codec == "ppm" else _encode_bmp
    rows = [(i, enc(_image(i))) for i in range(4)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: (r["width"], r["height"], list(r["grid"]))
           for r in decode_image_grid(df, grid_rows=8, grid_cols=9,
                                      fake=False).collect()}
    for i, _ in rows:
        assert got[i] == (36, 40, _py_gray_grid(_image(i), 8, 9)), i


def test_bmp_padding_and_odd_width(spark):
    # width 35 -> stride padding exercised (35*3=105, stride 108)
    img = _image(3, h=17, w=35)
    df = spark.createDataFrame([(1, _encode_bmp(img))],
                               "media_id long, payload binary")
    r = decode_image_grid(df, fake=False).head()
    assert (r["width"], r["height"]) == (35, 17)
    assert list(r["grid"]) == _py_gray_grid(img, 8, 9)


def test_real_codec_end_to_end_neardup(spark):
    """Two BMPs differing in ONE grid box are a dHash pair within
    hamming 2; an unrelated image joins nothing."""
    base = _image(1)
    near = [row[:] for row in base]
    for r in range(5):           # one 8x9 grid box is rows 0-4, cols 0-3
        for c in range(4):
            near[r][c] = (255, 255, 255)
    rows = [(0, _encode_bmp(base)), (1, _encode_bmp(near)),
            (2, _encode_bmp(_image(40)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    sh = decode_image_grid(df, fake=False).select(
        "media_id", dhash64(F.col("grid")).alias("dhash"))
    pairs = {(r["id_a"], r["id_b"])
             for r in hamming_pairs(sh, bits=64, max_hamming=2,
                                    id_col="media_id",
                                    sim_col="dhash").collect()}
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)


def test_unknown_codec_raises(spark):
    df = spark.createDataFrame([(1, b"GIF89a-not-supported")],
                               "media_id long, payload binary")
    with pytest.raises(Exception, match="plug in here"):
        decode_image_grid(df, fake=False).collect()


# ------------------------------------------------------ keep-one face


def test_keep_one_face_matches_model(spark):
    """media_neardup pairs → connected components → min-id keep-one,
    against an independent pure-Python rebuild of the planted grids
    (md5 pixels), brute-force hamming pairs, and union-find."""
    from myhadoop_spark.operators.connected_components import (
        connected_components,
    )
    from myhadoop_spark.queries.media import N_ND_GROUPS, _ND_V, media_neardup

    def pix(g, i):
        return int(hashlib.md5(f"{g}:{i}".encode()).hexdigest()[:2], 16)

    grids = {}
    for mid in range(N_ND_GROUPS * _ND_V):
        g, v = divmod(mid, _ND_V)
        grids[mid] = [
            (pix(g, i) + 128) % 256
            if v in (1, 2) and (7 * v + g) % 72 == i else pix(g, i)
            for i in range(72)]
    hashes = {m: _py_dhash(gr) for m, gr in grids.items()}
    ids = sorted(hashes)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = []
    for i in ids:
        for j in ids:
            if i < j and bin((hashes[i] ^ hashes[j])
                             & ((1 << 64) - 1)).count("1") <= 2:
                edges.append((i, j))
                parent[find(j)] = find(i)
    want = {}
    for i in ids:
        root = find(i)
        want.setdefault(root, []).append(i)
    want_rep = {i: min(members) for members in want.values()
                for i in members if len(members) > 1}

    pairs = media_neardup(spark, "").select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    assert ({tuple(r) for r in pairs.collect()} == set(edges))
    got = {r["id"]: r["component"]
           for r in connected_components(pairs).collect()}
    assert got == want_rep


# ------------------------------------------------------------ guards


def test_dim_guards():
    with pytest.raises(ValueError):
        dhash64(F.col("g"), rows=8, cols=8)
    with pytest.raises(ValueError):
        ahash64(F.col("g"), rows=8, cols=9)


def test_phash_plan_is_jvm_and_join_is_hash(spark):
    """dHash/aHash are pure JVM expressions (no BatchEvalPython in
    the hash projection) and the Hamming-ball join is a hash
    equi-join on (block, value) — never a cartesian product."""
    from myhadoop_spark.queries.media import media_neardup

    plan = (media_neardup(spark, "")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_media_ingest_stream_suppression(spark, tmp_path):
    """Media ingest suppression end to end: BMP payloads → real
    decode → dHash (bits=64) → the generic simhash dedup stream —
    exact copies and single-box near-dups of ACCEPTED media drop on
    arrival; unrelated media pass (the multimodal streaming face is
    the existing fingerprint stream, no new machinery)."""
    import time

    from myhadoop_spark.streaming.simhash_stream import (
        read_clean,
        start_simhash_dedup_stream,
    )

    base = _image(7)
    near = [row[:] for row in base]
    for r in range(5):
        for c in range(4):
            near[r][c] = (0, 0, 0)
    b1 = [(1, _encode_bmp(base)), (2, _encode_bmp(_image(30)))]
    b2 = [(10, _encode_bmp(base)),        # exact copy -> drops
          (11, _encode_bmp(near)),        # near-dup  -> drops
          (12, _encode_bmp(_image(60)))]  # new       -> survives
    src = str(tmp_path / "src")
    for rows in (b1, b2):
        (spark.createDataFrame(rows, "media_id long, payload binary")
         .coalesce(1).write.mode("append").parquet(src))
    stream = (spark.readStream
              .schema("media_id long, payload binary")
              .option("maxFilesPerTrigger", 1).parquet(src))
    fp = decode_image_grid(stream, fake=False).select(
        F.col("media_id").alias("doc_id"),
        dhash64(F.col("grid")).alias("simhash"))
    q = start_simhash_dedup_stream(
        fp, path=str(tmp_path / "st"),
        checkpoint=str(tmp_path / "ck"), bits=64, max_hamming=2)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        time.sleep(0.2)
    kept = {r["doc_id"]
            for r in read_clean(spark, str(tmp_path / "st")).collect()}
    assert kept == {1, 2, 12}


def _encode_png(rgb_rows, alpha=False, filters=(0,)):
    """Pure-Python PNG encoder for the decoder tests: applies the
    requested per-scanline filter types (0-4), so every unfilter
    path in the decoder is exercised against known pixels."""
    import zlib

    h, w = len(rgb_rows), len(rgb_rows[0])
    ch = 4 if alpha else 3
    raw = b""
    prev = [0] * (w * ch)
    for y, row in enumerate(rgb_rows):
        flat = []
        for px in row:
            flat += list(px) + ([255 - (y % 7)] if alpha else [])
        f = filters[y % len(filters)]
        line = bytearray()
        for x in range(w * ch):
            a = flat[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (a if pa <= pb and pa <= pc
                        else b if pb <= pc else c)
            line.append((flat[x] - pred) % 256)
        raw += bytes([f]) + bytes(line)
        prev = flat

    def chunk(typ, data):
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 6 if alpha else 2, 0, 0, 0]))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_decode_all_filter_types(spark):
    """Real PNG decode (stdlib zlib + scanline unfiltering): every
    filter type 0-4 round-trips to the known pixel grid."""
    img = _image(5)
    rows = [(0, _encode_png(img, filters=(0, 1, 2, 3, 4))),
            (1, _encode_png(img, filters=(4,))),
            (2, _encode_png(img, filters=(3, 4, 1)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    want = _py_gray_grid(img, 8, 9)
    got = {r["media_id"]: (r["width"], r["height"], list(r["grid"]))
           for r in decode_image_grid(df, fake=False).collect()}
    for i, _ in rows:
        assert got[i] == (36, 40, want), i


def test_png_rgba_alpha_dropped_and_guards(spark):
    """RGBA PNGs decode to the same grid as their RGB twin (alpha
    dropped); unsupported bit depth fails loudly."""
    img = _image(9)
    df = spark.createDataFrame(
        [(0, _encode_png(img, alpha=True, filters=(2, 4))),
         (1, _encode_png(img, alpha=False, filters=(1,)))],
        "media_id long, payload binary")
    got = {r["media_id"]: list(r["grid"])
           for r in decode_image_grid(df, fake=False).collect()}
    assert got[0] == got[1] == _py_gray_grid(img, 8, 9)

    bad = bytearray(_encode_png(img))
    bad[24] = 16  # IHDR bit depth byte
    df2 = spark.createDataFrame([(1, bytes(bad))],
                                "media_id long, payload binary")
    with pytest.raises(Exception, match="8-bit"):
        decode_image_grid(df2, fake=False).collect()
