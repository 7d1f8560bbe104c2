"""Property tests: Spark packing/layout primitives vs pure-Python models."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from myhadoop_spark.operators.layout import _spread16
from myhadoop_spark.operators.packing import pack_documents

CAP = 64


def _model_pack(sizes: dict[int, int], capacity: int):
    """Pure-Python mirror of pack_documents with n_buckets=1: chunk
    oversize docs, then FFD ordered by (tokens desc, doc_id, piece)."""
    full, pieces = [], []
    for doc_id in sorted(sizes):
        t = sizes[doc_id]
        if t <= 0:
            continue
        n_full, rem = divmod(t, capacity)
        piece_no = 0
        for _ in range(n_full):
            piece_no += 1
            full.append((doc_id, capacity))
        if rem:
            piece_no += 1
            pieces.append((rem, doc_id, piece_no))
    bins: list[dict] = []
    for tokens, doc_id, _piece in sorted(
            pieces, key=lambda p: (-p[0], p[1], p[2])):
        for b in bins:
            if b["free"] >= tokens:
                break
        else:
            b = {"free": capacity, "docs": [], "toks": []}
            bins.append(b)
        b["free"] -= tokens
        b["docs"].append(doc_id)
        b["toks"].append(tokens)
    return (sorted((d, t) for d, t in full),
            sorted((tuple(b["docs"]), tuple(b["toks"])) for b in bins))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.dictionaries(st.integers(0, 50), st.integers(0, 300),
                       min_size=1, max_size=25))
def test_pack_documents_matches_ffd_model(spark, sizes):
    df = spark.createDataFrame(
        [(d, t) for d, t in sizes.items()], "doc_id LONG, tokens LONG")
    packs = pack_documents(df, CAP, n_buckets=1).collect()
    got_full = sorted(
        (r.doc_ids[0], r.piece_tokens[0])
        for r in packs if r.pack_id.startswith("full"))
    got_bins = sorted(
        (tuple(r.doc_ids), tuple(r.piece_tokens))
        for r in packs if not r.pack_id.startswith("full"))
    assert (got_full, got_bins) == _model_pack(sizes, CAP)


def _pure_spread16(v: int) -> int:
    out = 0
    for i in range(16):
        out |= ((v >> i) & 1) << (2 * i)
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(0, 0xFFFF), min_size=1, max_size=50,
                unique=True))
def test_spread16_random_values(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v LONG")
    got = {r.v: r.s for r in
           df.select("v", _spread16(F.col("v")).alias("s")).collect()}
    assert got == {v: _pure_spread16(v) for v in vals}
