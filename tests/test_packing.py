"""Sequence packing: conservation, capacity, fill, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.packing import pack_documents, packing_stats
from tests.conftest import SF_SMOKE

CAP = 64


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id",
                    F.size(F.split(F.col("text"), r"\s+")).alias("tokens")))


def test_tokens_conserved_and_capacity_respected(spark, docs):
    packs = pack_documents(docs, CAP).cache()
    # capacity never exceeded, and total_tokens is the sum of its pieces
    bad = packs.filter(
        (F.col("total_tokens") > CAP)
        | (F.col("total_tokens")
           != F.aggregate("piece_tokens", F.lit(0).cast("long"),
                          lambda a, x: a + x))).count()
    assert bad == 0
    # every input token lands in exactly one pack-piece
    in_tokens = docs.agg(F.sum("tokens")).first()[0]
    out_tokens = packs.agg(F.sum("total_tokens")).first()[0]
    assert in_tokens == out_tokens
    # per-doc: pieces sum back to the doc's token count
    per_doc = (packs.select(F.explode(
                   F.arrays_zip("doc_ids", "piece_tokens")).alias("z"))
               .select(F.col("z.doc_ids").alias("doc_id"),
                       F.col("z.piece_tokens").alias("t"))
               .groupBy("doc_id").agg(F.sum("t").alias("t")))
    diff = (per_doc.join(docs, "doc_id", "full")
            .filter((F.col("t") != F.col("tokens"))
                    | F.col("t").isNull() | F.col("tokens").isNull())
            .count())
    assert diff == 0


def test_oversize_docs_split_into_full_chunks(spark):
    df = spark.createDataFrame(
        [(1, 150), (2, 64), (3, 10)], "doc_id LONG, tokens LONG")
    packs = pack_documents(df, CAP)
    rows = packs.collect()
    # doc 1: two full 64-chunks + a 22 remainder; doc 2: one full pack
    full = [r for r in rows if r.total_tokens == CAP and r.n_pieces == 1]
    assert len(full) == 3
    rest = [r for r in rows if r.total_tokens < CAP]
    assert sorted(t for r in rest for t in r.piece_tokens) == [10, 22]


def test_fill_ratio_reasonable(spark, docs):
    # avg doc ~45 whitespace tokens at cap 64: FFD should fill >85%
    # on every bucket except possibly the last open bin per bucket
    stats = packing_stats(pack_documents(docs, CAP), CAP)
    assert stats["mean_fill"] > 0.85
    assert stats["n_packs"] * CAP >= stats["tokens"]


def test_repartition_invariant(spark, docs):
    a = pack_documents(docs, CAP)
    b = pack_documents(docs.repartition(7), CAP)

    def canon(df):
        return sorted(
            (r.pack_id, tuple(r.doc_ids), tuple(r.piece_tokens))
            for r in df.collect())

    assert canon(a) == canon(b)


def test_zero_and_invalid(spark):
    df = spark.createDataFrame([(1, 0)], "doc_id LONG, tokens LONG")
    assert pack_documents(df, CAP).count() == 0
    with pytest.raises(ValueError):
        pack_documents(df, 0)


def test_source_quota_respected(spark):
    """With max_source_frac set, no multi-piece pack exceeds the per-
    source token cap; single-piece packs whose piece itself exceeds the
    cap are the documented exemption (quotas never drop data). Token
    conservation and determinism hold unchanged."""
    from pyspark.sql import functions as F

    from myhadoop_spark.operators.packing import pack_documents

    cap, frac = 1000, 0.6
    docs = (spark.range(400)
            .select(F.col("id").alias("doc_id"),
                    (F.col("id") * 37 % 400 + 20).alias("tokens"),
                    F.concat(F.lit("src"), (F.col("id") % 3))
                    .alias("source")))
    packs = pack_documents(docs, cap, source_col="source",
                           max_source_frac=frac)
    total_in = docs.agg(F.sum("tokens")).first()[0]
    total_out = packs.agg(F.sum("total_tokens")).first()[0]
    assert total_in == total_out
    src_of = {r["doc_id"]: r["source"] for r in docs.collect()}
    for p in packs.collect():
        if p["n_pieces"] == 1:
            continue  # exemption: one piece may alone exceed the cap
        by_src: dict[str, int] = {}
        for d, t in zip(p["doc_ids"], p["piece_tokens"]):
            by_src[src_of[d]] = by_src.get(src_of[d], 0) + t
        assert max(by_src.values()) <= int(frac * cap), p
    # determinism under repartitioning, quota active
    again = pack_documents(docs.repartition(7), cap, source_col="source",
                           max_source_frac=frac)
    a = sorted(map(tuple, packs.select("pack_id", "total_tokens").collect()))
    b = sorted(map(tuple, again.select("pack_id", "total_tokens").collect()))
    assert a == b


def test_quota_args_validated(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from myhadoop_spark.operators.packing import pack_documents

    docs = spark.range(5).select(F.col("id").alias("doc_id"),
                                 F.lit(10).alias("tokens"),
                                 F.lit("s").alias("source"))
    with _pytest.raises(ValueError, match="go together"):
        pack_documents(docs, 100, source_col="source")
    with _pytest.raises(ValueError, match="max_source_frac"):
        pack_documents(docs, 100, source_col="source", max_source_frac=1.5)
