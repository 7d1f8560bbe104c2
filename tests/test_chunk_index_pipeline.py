"""End-to-end chunk → embed → index integration: chunk the corpus
(operators/chunking.py), embed each chunk with the deterministic
hash-based stub (the multimodal convention — no embedding model ships
in this container; the Spark-side plumbing is the real artifact),
build the persistent IVF index over CHUNKS (operators/ivf_index.py),
and retrieve: a planted duplicated chunk must surface its twin as the
top neighbor through the pruned probe path."""

from __future__ import annotations

from pyspark.sql import functions as F

from myhadoop_spark.operators.chunking import chunk_documents
from myhadoop_spark.operators.ivf import _dot
from myhadoop_spark.operators.ivf_index import build_index, search_index

DIM = 16
C, V = 16, 4


def _stub_embedding(text_col: str = "text"):
    """Deterministic bag-of-hashes embedding: each token votes ±1 on
    DIM axes by hash — a real model would replace exactly this
    expression; everything downstream (norms, index, search) is
    model-agnostic. Near-identical token streams get near-identical
    vectors, which is all the retrieval test needs."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda t: t != F.lit(""))
    return F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: F.aggregate(
            toks, F.lit(0.0),
            lambda acc, t: acc
            + F.when(F.pmod(F.hash(t, d.cast("string")), F.lit(2)) == 0,
                     F.lit(1.0)).otherwise(F.lit(-1.0))))


def test_duplicated_chunk_retrieved_via_index(spark, tmp_path):
    # corpus: distinct docs plus doc 50 repeating doc 0's text with a
    # tiny suffix — its chunks are near-identical to doc 0's
    rows = [(i, " ".join(f"d{i}_{j}" for j in range(40)))
            for i in range(1, 50)]
    base = " ".join(f"shared_{j}" for j in range(40))
    rows.append((0, base))
    rows.append((50, base + " tail"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    chunks = (chunk_documents(docs, chunk_tokens=C, overlap=V)
              .withColumn("vec_id",
                          F.col("doc_id") * 1000 + F.col("chunk_id"))
              .withColumn("v", _stub_embedding()))
    emb = chunks.select("vec_id", "v").localCheckpoint()

    path = str(tmp_path / "chunk_idx")
    build_index(emb, path, k=8)

    # query with doc 0's first chunk; its twin is doc 50's first chunk
    q = (emb.filter(F.col("vec_id") == 0)
         .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
                 F.sqrt(_dot("v", "v")).alias("qnrm")))
    hits = search_index(spark, path, q, n_probe=2, top_k=3).collect()
    assert hits, "no neighbors returned"
    top = min(hits, key=lambda r: r.rn)
    assert top.neighbor_id == 50_000, hits  # doc 50, chunk 0
    assert top.cosine >= 0.99


def test_chunk_embeddings_are_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(30))) for i in range(20)],
        "doc_id long, text string")

    def run():
        return {r.vec_id: tuple(r.v) for r in
                (chunk_documents(docs, chunk_tokens=C, overlap=V)
                 .withColumn("vec_id",
                             F.col("doc_id") * 1000 + F.col("chunk_id"))
                 .withColumn("v", _stub_embedding())
                 .select("vec_id", "v").collect())}

    assert run() == run()
