"""Compression-ratio quality signals (operators/compression.py):
Python-model bitwise parity, behavioral bands, plan shape."""

from __future__ import annotations

import contextlib
import io
import math
import zlib

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.compression import (
    ZLIB_LEVEL,
    compression_signals,
    filter_by_compression,
)
from tests.conftest import SF_SMOKE


def _model(text: str):
    b = text.encode("utf-8")
    if not b:
        return (0, 0, 0.0, 0.0)
    z = len(zlib.compress(b, ZLIB_LEVEL))
    counts: dict[int, int] = {}
    for x in b:
        counts[x] = counts.get(x, 0) + 1
    n = len(b)
    ent = -sum((c / n) * math.log2(c / n) for c in counts.values())
    return (n, z, z / n, ent)


def test_signals_match_python_model_bitwise(spark):
    docs = (load(spark, SF_SMOKE, "documents")
            .select("doc_id", "text").limit(200).localCheckpoint())
    texts = {r.doc_id: r.text for r in docs.collect()}
    got = {r.doc_id: (r.n_bytes, r.z_bytes, r.compression_ratio,
                      r.byte_entropy)
           for r in compression_signals(docs).collect()}
    assert got == {i: _model(t) for i, t in texts.items()}


def test_behavioral_bands(spark):
    """Repetition compresses far below prose; uniform noise barely
    compresses; entropy brackets: 0 for a single repeated byte, near
    8 bits/byte for spread-out noise."""
    import random

    rng = random.Random(7)
    noise = "".join(chr(rng.randrange(0x21, 0x7F)) for _ in range(4000))
    prose = ("A riverbank settlement grew around the old grain mill, "
             "whose wheel still turned with the spring thaw. Traders "
             "arrived each Thursday carrying salt, dyed wool, and news "
             "from the coastal towns. Children learned letters in the "
             "chapel annex while their parents argued tariffs at the "
             "weigh-house. By autumn the orchard paths were pressed "
             "firm, and the miller counted sacks against a winter "
             "nobody could predict.")
    rows = [(0, "spam " * 1000),
            (1, prose),
            (2, noise),
            (3, "a" * 5000),
            (4, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r.doc_id: r for r in compression_signals(docs).collect()}
    assert sig[0].compression_ratio < 0.05            # pure repetition
    assert sig[3].compression_ratio < 0.01
    assert 0.3 < sig[1].compression_ratio < 0.9       # varied prose
    assert sig[2].compression_ratio > 0.7             # noise
    assert sig[1].compression_ratio < sig[2].compression_ratio
    assert sig[3].byte_entropy == 0.0
    assert sig[2].byte_entropy > 6.0
    assert sig[4].n_bytes == 0 and sig[4].compression_ratio == 0.0

    kept = {r.doc_id
            for r in filter_by_compression(
                docs, min_ratio=0.1,
                max_ratio=(sig[2].compression_ratio
                           + sig[1].compression_ratio) / 2).collect()}
    assert kept == {1, 4}  # prose survives; empty is the length gate's


def test_plan_is_arrow_and_narrow(spark):
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    for face in (compression_signals(docs),
                 filter_by_compression(docs)):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            face.explain("formatted")
        plan = buf.getvalue()
        assert "ArrowEvalPython" in plan, plan  # vectorized, not per-row
        assert "BatchEvalPython" not in plan, plan
        assert "Exchange" not in plan, plan      # narrow end to end
        assert "Join" not in plan, plan          # inline verdict, no rejoin
