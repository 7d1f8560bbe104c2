"""Hybrid-ingest embedding rehearsal (r6 item 8 / r8): the RAG
production loop driven end-to-end with REAL vector content — the
deterministic hashed-BoW embedder (streaming/hybrid_ingest.hashed_bow,
feature hashing, ±1 votes + bias axis) — at 10× the test fixture
(sf0.01 documents ≈ 10× sf0.001), closing the last untested seam:
until r8 the ``embed()`` hook was only exercised with a synthetic
projection.

Method: bootstrap the three indexes on a 20% seed, stream the rest in
10 batches, record per-batch {docs_in, survivors, chunks, wall_s}
(flat-cost check: wall must not trend with accumulated history), then
after the drain measure IVF retrieval quality: search_index top-5
under the stored centroids for 16 query chunks vs the EXACT
brute-force cosine top-5 over all indexed vectors (recall@5 — the ANN
quality the loop actually ships).

Appends to hybrid_ingest_study.tsv:

    engine  sf_dir  kind  batch_id  docs_in  survivors  chunks  wall_s
    engine  sf_dir  recall  -  n_queries  top_k  recall_at_5  -

Run: python scripts/hybrid_ingest_study.py [sf_dir] [n_batches]
(default /root/testdata/sf0.01 10)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.ivf_index import search_index
from myhadoop_spark.session import get_spark
from myhadoop_spark.streaming.hybrid_ingest import (
    bootstrap_hybrid,
    hashed_bow,
    start_hybrid_ingest_stream,
)

N_Q, TOP_K, DIM = 16, 5, 16


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("hybrid_ingest_study")
    out = Path("hybrid_ingest_study.tsv")
    if not out.exists():
        out.write_text("engine\tsf_dir\tkind\tbatch_id\tdocs_in\t"
                       "survivors\tchunks\twall_s\n")

    base = "/tmp/hybrid_ingest_study"
    os.system(f"rm -rf {base}")
    lsh, bm25, ivf = f"{base}/lsh", f"{base}/bm25", f"{base}/ivf"
    chunks_path = f"{base}/chunks"
    embed = hashed_bow(DIM)

    docs = (load(spark, sf_dir, "documents")
            .select("doc_id", "text").localCheckpoint())
    n = docs.count()
    seed_top = n // 5
    seed = docs.filter(F.col("doc_id") < seed_top)
    rest = docs.filter(F.col("doc_id") >= seed_top)
    seed_chunks = bootstrap_hybrid(seed, lsh_path=lsh, bm25_path=bm25,
                                   ivf_path=ivf, embed=embed, ivf_k=8)
    (seed_chunks.write.mode("overwrite")
     .parquet(f"{chunks_path}/batch_id=seed"))

    src = f"{base}/src"
    for i in range(n_batches):
        (rest.filter(F.pmod(F.col("doc_id"), F.lit(n_batches)) == i)
         .coalesce(1).write.parquet(f"{src}/b{i:02d}"))
    stats: list[dict] = []
    stream = (spark.readStream.schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    # threshold 0.8: the synthetic fixture's small shared vocabulary
    # makes unrelated docs signature-similar, and the default 0.5 gate
    # drops ~95% of them — a valid dedup outcome but a poor index-
    # growth rehearsal; 0.8 keeps the gate honest while letting the
    # stream actually build the three surfaces
    q = start_hybrid_ingest_stream(
        stream, lsh_path=lsh, bm25_path=bm25, ivf_path=ivf,
        chunks_path=chunks_path, checkpoint=f"{base}/ckpt",
        embed=embed, threshold=0.8, compact_every=4, stats=stats)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    with out.open("a") as f:
        for s in stats:
            f.write(f"myhadoop_spark\t{sf_dir}\tbatch\t{s['batch_id']}\t"
                    f"{s['docs_in']}\t{s['survivors']}\t{s['chunks']}\t"
                    f"{s['wall_s']}\n")
            print(s)

    # retrieval quality: IVF top-5 vs exact brute-force top-5 over the
    # stored vectors (the honest recall of what the loop shipped)
    emb = (spark.read.parquet(f"{ivf}/vectors")
           .select("vec_id", "v").distinct().localCheckpoint())
    queries = (emb.orderBy("vec_id").limit(N_Q)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("v").alias("qv"))
               .withColumn("qnrm", F.sqrt(F.aggregate(
                   F.zip_with("qv", "qv", lambda x, y: x * y),
                   F.lit(0.0), lambda a, x: a + x)))
               .localCheckpoint())
    got = search_index(spark, ivf, queries, n_probe=2, top_k=TOP_K)
    corpus = emb.withColumn("nrm", F.sqrt(F.aggregate(
        F.zip_with("v", "v", lambda x, y: x * y),
        F.lit(0.0), lambda a, x: a + x)))
    dots = (corpus.crossJoin(F.broadcast(queries))
            .filter(F.col("vec_id") != F.col("q_id"))
            .select("q_id", "vec_id",
                    (F.aggregate(F.zip_with("v", "qv",
                                            lambda x, y: x * y),
                                 F.lit(0.0), lambda a, x: a + x)
                     / (F.col("nrm") * F.col("qnrm"))).alias("cos")))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(),
                                           F.col("vec_id").asc())
    exact = (dots.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= TOP_K).select("q_id", "vec_id"))
    hits = got.select("q_id", F.col("neighbor_id").alias("vec_id")) \
        .join(exact, ["q_id", "vec_id"]).count()
    total = exact.count()
    recall = hits / total
    with out.open("a") as f:
        f.write(f"myhadoop_spark\t{sf_dir}\trecall\t-\t{N_Q}\t{TOP_K}\t"
                f"{recall:.4f}\t-\n")
    print(f"recall@{TOP_K} over {N_Q} queries: {recall:.4f} "
          f"({hits}/{total})")


if __name__ == "__main__":
    main()
