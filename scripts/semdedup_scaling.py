"""SemDeDup + classifier scale rehearsal (r4): cost curves for the two
new compute-heavy curation operators on deterministic synthetic inputs.

semdedup — the claim to verify: the intra-cluster pair join costs
sum(|cluster|^2), so with K clusters over n vectors wall should grow
~n^2/K, NOT n^2 with the constant of an all-pairs join; and doubling K
at fixed n should roughly halve the pair work. Synthetic vectors are a
pure hash function of (vec_id, dim) — deterministic, near-uniform on
the sphere — with every 10th vector a small perturbation of its
predecessor (a planted semantic dup).

classifier — the claim: training shuffles vocabulary-sized counts and
scoring is a broadcast join, so wall grows sub-linearly in documents
(job floor amortizes) and is independent of the seen-corpus history.

Appends to semdedup_scaling.tsv:

    engine  op  n  k  wall_s  rows_out

Run: python scripts/semdedup_scaling.py [counts...]  (default 2000 20000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.operators.classifier import (
    score_documents,
    train_token_weights,
)
from myhadoop_spark.operators.semdedup import semantic_dedup
from myhadoop_spark.session import get_spark
from myhadoop_spark.sources.synthetic import register as register_source

DIM = 32


def synthetic_vectors(spark, n: int):
    """Deterministic pseudo-random unit-ish vectors; every 10th vector
    is its predecessor plus a tiny deterministic perturbation (planted
    near-dup at cosine ~0.999)."""
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    seed = F.when(F.col("vec_id") % 10 == 0,
                  F.greatest(F.col("vec_id") - 1, F.lit(0))
                  ).otherwise(F.col("vec_id"))
    v = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: (F.pmod(F.hash(seed.cast("string"),
                                 d.cast("string")), F.lit(1000)).cast("double")
                   - F.lit(499.5)) / F.lit(500.0))
    bump = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: F.when(F.col("vec_id") % 10 == 0,
                         (F.pmod(F.hash(F.col("vec_id").cast("string"),
                                        d.cast("string")), F.lit(100))
                          .cast("double") - F.lit(49.5)) / F.lit(5000.0)
                         ).otherwise(F.lit(0.0)))
    return (base.select("vec_id", F.zip_with(v, bump,
                                             lambda a, b: a + b).alias("v"))
            .repartition(spark.sparkContext.defaultParallelism))


def skewed_vectors(spark, n: int):
    """The pathological shape the oversized-cluster guard exists for:
    90 % of vectors share one dominant axis (one macro k-means cluster)
    but spread across 8 sub-blobs (hash-assigned direction + small
    jitter). Intra-sub cosine ~1, inter-sub ~0.92 — at tau 0.95 only
    intra-sub pairs are dups, exactly what the sub-scope preserves."""
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    is_cold = F.col("vec_id") % 10 == 0
    subdir = F.pmod(F.hash(F.col("vec_id").cast("string")), F.lit(8))
    cold = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: (F.pmod(F.hash(F.col("vec_id").cast("string"),
                                 d.cast("string")), F.lit(1000)).cast("double")
                   - F.lit(499.5)) / F.lit(500.0))
    hot = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: (F.when(d == 0, 10.0).otherwise(0.0)
                   + F.when(d == subdir + 1, 3.0).otherwise(0.0)
                   + (F.pmod(F.hash(F.col("vec_id").cast("string"),
                                    d.cast("string")), F.lit(100))
                      .cast("double") - F.lit(49.5)) / F.lit(5000.0)))
    return (base.select(
        "vec_id", F.when(is_cold, cold).otherwise(hot).alias("v"))
        .repartition(spark.sparkContext.defaultParallelism))


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [2_000, 20_000]
    spark = get_spark("semdedup_scaling")
    register_source(spark)
    out = Path("semdedup_scaling.tsv")
    if not out.exists():
        out.write_text("engine\top\tn\tk\twall_s\trows_out\n")

    def record(op, n, k, wall, rows):
        line = f"myhadoop_spark\t{op}\t{n}\t{k}\t{wall:.3f}\t{rows}\n"
        with out.open("a") as f:
            f.write(line)
        print(line.strip())

    # warm-up (uncounted)
    semantic_dedup(synthetic_vectors(spark, 500).localCheckpoint(),
                   tau=0.9).count()

    for n in counts:
        vecs = synthetic_vectors(spark, n).localCheckpoint()
        for k in (16, 64):
            t0 = time.time()
            dropped = semantic_dedup(vecs, k_clusters=k, tau=0.9) \
                .filter("NOT keep").count()
            record("semdedup", n, k, time.time() - t0, dropped)

    # skew rehearsal (r5): the oversized-cluster guard under a planted
    # 90%-mass macro cluster. k_clusters=4 so the macro level CANNOT
    # dedicate a centroid per sub-blob (the production shape: K is
    # fixed, mass concentrates) — unguarded pays sum(cluster²) ~
    # (0.9n)², guarded sub-scopes it (k column = max_cluster_size)
    for n in (4_000, 8_000):
        vecs = skewed_vectors(spark, n).localCheckpoint()
        for cap, tag in ((None, "semdedup_skew_unguarded"),
                         (1_000, "semdedup_skew_guarded"),
                         # r6: DEFAULT call, no knob — the auto cap
                         # (max(512, ceil(1.5*n_reps/k))) must arm by
                         # itself
                         ("auto", "semdedup_skew_auto")):
            t0 = time.time()
            dropped = (semantic_dedup(vecs, k_clusters=4, tau=0.95,
                                      max_cluster_size=cap)
                       .filter("NOT keep").count())
            record(tag, n, 0 if cap in (None, "auto") else cap,
                   time.time() - t0, dropped)

    # classifier: synthetic docs; label = token-count heuristic
    for n in counts:
        docs = (spark.read.format("synthetic_docs")
                .option("rows", n).option("vocabSize", 20_000)
                .option("numPartitions",
                        spark.sparkContext.defaultParallelism)
                .load().select("doc_id", "text")
                .withColumn("label", F.size(F.split("text", r"\s+")) >= 40)
                .localCheckpoint())
        t0 = time.time()
        w = train_token_weights(docs.filter("doc_id % 2 = 0"))
        n_scored = score_documents(docs, w).count()
        record("classifier", n, 0, time.time() - t0, n_scored)
    spark.stop()


if __name__ == "__main__":
    main()
