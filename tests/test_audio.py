"""Audio fingerprint family (operators/audio_fp.py +
sources/multimodal.decode_audio_grid + sources/audiogen.py):
pure-Python model parity for the Haitsma–Kalker packing, REAL
RIFF/WAVE PCM decode round-trips against the stdlib ``wave`` writer,
the provable DC-offset locality pin, an end-to-end on-disk
real-codec near-dup run, and guards."""

from __future__ import annotations

import io
import wave

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.audio_fp import hk64
from myhadoop_spark.operators.connected_components import (
    connected_components,
)
from myhadoop_spark.operators.simhash_join import hamming_pairs
from myhadoop_spark.sources.audiogen import (
    base_signal,
    dc_offset_frame,
    encode_wav,
    write_audio_corpus,
)
from myhadoop_spark.sources.multimodal import (
    _parse_wav,
    band_energies,
    decode_audio_grid,
    read_media_dir,
)

# ------------------------------------------------------ python models


def _mask(j):
    return (1 << j) if j < 63 else -(1 << 63)


def _py_hk(grid, frames=9, bands=9):
    h = 0
    for n in range(frames - 1):
        for m in range(bands - 1):
            d = ((grid[(n + 1) * bands + m] - grid[(n + 1) * bands + m + 1])
                 - (grid[n * bands + m] - grid[n * bands + m + 1]))
            if d > 0:
                h += _mask(n * (bands - 1) + m)
    return h


def _hamming(a, b):
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def _fp(samples):
    _rate, _ch, mono = _parse_wav(encode_wav(samples))
    return _py_hk(band_energies(mono, 9, 9))


# --------------------------------------------------- hk64 model parity


def test_hk64_matches_python_model(spark):
    import hashlib

    grids = []
    for seed in range(24):
        d = hashlib.sha256(str(seed).encode()).digest()
        grids.append([d[(i * 11) % 32] * (1 + i % 3) for i in range(81)])
    df = spark.createDataFrame(
        [(i, g) for i, g in enumerate(grids)], "id long, g array<long>")
    got = {r.id: r.fp
           for r in df.select("id", hk64(F.col("g")).alias("fp")).collect()}
    for i, g in enumerate(grids):
        assert got[i] == _py_hk(g), f"grid {i} mismatch"


def test_hk64_shape_guard():
    with pytest.raises(ValueError, match="frames-1"):
        hk64(F.lit(None), frames=8, bands=8)


# ------------------------------------------------- WAV parse round-trip


def test_parse_wav_matches_stdlib_writer():
    samples = base_signal(3, n=1000)
    for channels in (1, 2):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(16000)
            frames = b"".join(
                int(s).to_bytes(2, "little", signed=True) * channels
                for s in samples)
            w.writeframes(frames)
        rate, ch, mono = _parse_wav(buf.getvalue())
        assert (rate, ch) == (16000, channels)
        assert list(mono) == samples


def test_parse_wav_stereo_floor_mean():
    # distinct channels: mean uses Python floor semantics
    left, right = [1, -1, 5], [2, -2, 6]
    frames = b"".join(
        int(a).to_bytes(2, "little", signed=True)
        + int(b).to_bytes(2, "little", signed=True)
        for a, b in zip(left, right))
    fmt = ((1).to_bytes(2, "little") + (2).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
           + (4).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(frames).to_bytes(4, "little") + frames)
    _rate, _ch, mono = _parse_wav(b"RIFF" + len(body).to_bytes(4, "little")
                                  + body)
    assert list(mono) == [1, -2, 5]  # (1+2)//2, (-1-2)//2, (5+6)//2


def test_parse_wav_guards():
    with pytest.raises(ValueError, match="RIFF"):
        _parse_wav(b"OggS" + b"\x00" * 64)
    # 8-bit PCM refused loudly
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    body = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + (4).to_bytes(4, "little") + b"\x00" * 4)
    with pytest.raises(ValueError, match="16-bit"):
        _parse_wav(b"RIFF" + len(body).to_bytes(4, "little") + body)
    with pytest.raises(ValueError, match="truncated"):
        _parse_wav(b"RIFF" + (4).to_bytes(4, "little") + b"WAVE")


# --------------------------------------------- planted locality (model)


def test_dc_offset_moves_at_most_two_bits():
    base = base_signal(0)
    f0 = _fp(base)
    for frame in (1, 2, 3):
        fv = _fp(dc_offset_frame(base, frame))
        assert _hamming(f0, fv) <= 2, f"frame {frame}"
    # unrelated signals are far apart
    assert _hamming(f0, _fp(base_signal(1))) > 4


# ------------------------------------------- on-disk end-to-end (real)

N_GROUPS, VARIANTS = 6, 4


def test_on_disk_wav_decode_to_neardup_and_keep_one(spark, tmp_path):
    stats = write_audio_corpus(tmp_path, n_groups=N_GROUPS,
                               variants=VARIANTS)
    assert stats["files"] == N_GROUPS * VARIANTS
    media = read_media_dir(spark, str(tmp_path), glob="*.wav",
                           kind="audio")
    name = F.element_at(F.split(F.col("meta.source_uri"), "/"), -1)
    tagged = media.withColumn(
        "g", F.regexp_extract(name, r"g(\d+)_v(\d)", 1).cast("int")
    ).withColumn(
        "v", F.regexp_extract(name, r"g(\d+)_v(\d)", 2).cast("int"))
    grids = decode_audio_grid(tagged, fake=False)
    hashed = (tagged.select("media_id", "g", "v")
              .join(grids.select(
                  "media_id", "sample_rate",
                  hk64(F.col("energies")).alias("afp")), "media_id")
              .localCheckpoint())
    assert hashed.count() == N_GROUPS * VARIANTS
    assert hashed.filter(F.col("sample_rate") == 8000).count() == \
        N_GROUPS * VARIANTS

    tags = {r.media_id: (r.g, r.v) for r in hashed.collect()}
    pairs = hamming_pairs(hashed.select("media_id", "afp"),
                          bits=64, max_hamming=4,
                          id_col="media_id", sim_col="afp")
    got = [(tags[r.id_a], tags[r.id_b], r.hamming)
           for r in pairs.collect()]
    # every pair stays within its planted group
    assert all(a[0] == b[0] for a, b, _h in got)
    # exact copies land at hamming 0, DC variants within 2 of base
    for (ga, va), (gb, vb), h in got:
        if {va, vb} == {0, VARIANTS - 1}:
            assert h == 0
        if 0 in (va, vb) and max(va, vb) in (1, 2):
            assert h <= 2
    # keep-one: components == planted groups
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"),
                     F.col("id_b").alias("dst")))
    labels = {r.id: r.component for r in comp.collect()}
    by_group = {}
    for mid, (g, _v) in tags.items():
        by_group.setdefault(g, set()).add(labels[mid])
    assert all(len(s) == 1 for s in by_group.values())
    assert len({next(iter(s)) for s in by_group.values()}) == N_GROUPS


def test_decode_audio_grid_fake_matches_digest(spark):
    import hashlib

    df = spark.range(4).select(
        F.col("id").alias("media_id"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary")
        .alias("payload"))
    rows = {r.media_id: r.energies
            for r in decode_audio_grid(df, fake=True).collect()}
    for r in spark.range(4).collect():
        payload = hashlib.sha256(
            str(r.id).encode()).hexdigest().encode()
        d = hashlib.sha256(payload).digest()
        assert rows[r.id] == [d[(i * 5) % 32] for i in range(81)]


def test_decode_audio_grid_real_rejects_unknown_codec(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"ID3\x03" + b"\x00" * 32))],
        "media_id long, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|RIFF/WAVE"):
        decode_audio_grid(df, fake=False).collect()
