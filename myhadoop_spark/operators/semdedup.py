"""SemDeDup — semantic deduplication of an embedding corpus (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication").

Exact semantic dedup is an all-pairs cosine problem — quadratic in the
corpus and unrunnable at 100 TB. SemDeDup's move: k-means-cluster the
embeddings first, then compare pairs only WITHIN a cluster. The
quadratic term drops from |corpus|^2 to sum(|cluster|^2) ~ |corpus|^2/K
for balanced clusters, and each cluster's pair join is an equi-join on
the cluster id — banded, never a cross join, the same shape as the
MinHash-LSH bucket join (queries/dedup.py).

Pipeline (all JVM-side Catalyst expressions; centroid training is the
one sanctioned bounded driver sample shared with IVF, operators/
ivf.py:28):

  1. deterministic sampled k-means → K centroid literals;
  2. every vector joins its argmax-dot cluster (narrow fold);
  3. intra-cluster self-join: x is DROPPED when some same-cluster y
     with higher keep-priority has cos(x, y) >= tau;
  4. keep-priority = (closer to the cluster centroid first, then lower
     vec_id) — each near-dup group keeps its most central member, a
     deterministic representative.

Skew note: a pathological cluster holding most of the corpus re-creates
the quadratic blow-up. Production guard: re-cluster oversized clusters
with a second k-means level (hierarchical IVF) or split them on a
hash-salt; at fixture scale the balanced-k-means assumption holds and
the guard is not wired in (documented, not silent — cluster sizes are
part of the operator's output).

Reference analog: none — §2.3 extension surface (SURVEY.md §2.3),
complementing embed_neardup (sign-LSH near-dup pairs) with
representative-keeping dedup semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from myhadoop_spark.operators.ivf import (
    _centroid_matrix,
    _dot,
    assign_buckets,
    train_centroids,
)

TAU = 0.35  # cosine threshold: pairs at or above are semantic dups.
# Calibrated to the synthetic fixture's cosine range (max pairwise cos
# ~0.51 — same calibration note as simsearch.ND_THRESHOLD); real
# embedding corpora sit near the paper's 0.9+.
K_CLUSTERS = 16


def semantic_dedup(emb: DataFrame, *, k_clusters: int = K_CLUSTERS,
                   iterations: int = 5, tau: float = TAU,
                   vec_col: str = "v", id_col: str = "vec_id") -> DataFrame:
    """(vec_id, cluster, csim, keep): cluster assignment, cosine to the
    assigned centroid, and whether the vector survives dedup. ``emb``
    needs (vec_id, v: array<double>); vectors are compared by cosine.
    """
    cents = train_centroids(emb, vec_col=vec_col, id_col=id_col,
                            k=k_clusters, iterations=iterations)
    mat = _centroid_matrix(cents)
    assigned = (
        assign_buckets(emb.withColumn(
            "_nrm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))),
            cents, vec_col=vec_col)
        .withColumnRenamed("bucket", "cluster")
        .withColumn("_cent", F.element_at(mat, F.col("cluster") + 1))
        .withColumn(
            "csim",
            _dot(F.col(vec_col), F.col("_cent"))
            / (F.col("_nrm")
               * F.sqrt(_dot(F.col("_cent"), F.col("_cent")))))
        .drop("_cent")
        # materialize once: the assignment subtree (K dot-product folds
        # per vector) feeds BOTH self-join sides and the final keep join,
        # and Catalyst has no cross-join subtree sharing — without the
        # checkpoint it evaluates 3x (the dedup_minhash precedent,
        # queries/dedup.py; at k=64 assignment dominates the rehearsal)
        .localCheckpoint())

    x = assigned.select(F.col(id_col).alias("x_id"), "cluster",
                        F.col(vec_col).alias("xv"),
                        F.col("_nrm").alias("xn"), F.col("csim").alias("xs"))
    y = assigned.select(F.col(id_col).alias("y_id"), "cluster",
                        F.col(vec_col).alias("yv"),
                        F.col("_nrm").alias("yn"), F.col("csim").alias("ys"))
    # y outranks x when (ys, -y_id) > (xs, -x_id): the most-central
    # member (lowest id on ties) of every near-dup group outranks the
    # rest and is the one kept
    dropped = (
        x.join(y, "cluster")
        .filter((F.col("ys") > F.col("xs"))
                | ((F.col("ys") == F.col("xs"))
                   & (F.col("y_id") < F.col("x_id"))))
        .filter(_dot(F.col("xv"), F.col("yv"))
                / (F.col("xn") * F.col("yn")) >= tau)
        .select(F.col("x_id").alias(id_col))
        .distinct())

    return (assigned.join(dropped.withColumn("_drop", F.lit(True)),
                          id_col, "left")
            .select(id_col, "cluster", "csim",
                    F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep")))
