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

Skew guards (r5 — a pathological cluster holding most of the corpus
re-creates the quadratic blow-up the operator exists to avoid):

  * **Exact-duplicate collapse, always on and OUTPUT-PRESERVING**: one
    window over (cluster, vector) keeps the min-id representative of
    every identical-vector group out of the pair join; non-reps are
    dropped by their own rep (same csim, lower id, cos(x, rep) =
    dot(v,v)/nrm² computed with the operator's exact arithmetic), and
    any drop a non-rep y could cause is also caused by rep(y) — same
    vector, same cosine, strictly higher priority — so restricting the
    join to reps changes nothing. The degenerate blob of n identical
    vectors costs n window rows instead of n² join rows, a case NO
    re-clustering can split (identical vectors argmax the same
    centroid at every level).
  * **Second-level k-means sub-scope, ON BY DEFAULT via
    max_cluster_size="auto"** (r6 — the 100 TB path must not depend on
    the caller knowing the knob): clusters whose REPRESENTATIVE count
    exceeds the cap get a second sampled-k-means assignment (one
    shared k_sub-centroid set trained on the oversized subset —
    hierarchical IVF), and the pair join scopes on (cluster, sub)
    instead of (cluster). This bounds sum(scope²) by cap·|corpus| at
    the declared cost of missing cross-sub pairs — near-identical
    vectors co-locate under any centroid set, so recall on real
    near-dups survives (tests/test_semdedup.py plants a 90 %-mass
    cluster and checks both the bound and the recall). The size probe
    is one k_clusters-row aggregate. The auto cap is
    max(512, ceil(1.5·n_reps/k_clusters)) — 1.5x a cluster's fair
    share arms the guard; the 512 floor keeps small corpora (where
    the quadratic term is harmless) on exact single-level semantics.
    Pass an int to set the cap directly, or None to disable.

Reference analog: none — §2.3 extension surface (SURVEY.md §2.3),
complementing embed_neardup (sign-LSH near-dup pairs) with
representative-keeping dedup semantics.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from myhadoop_spark.materialize import materialize
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
AUTO_CAP_FACTOR = 1.5  # "auto" arms at 1.5x a cluster's fair share:
#                        the quadratic term a cluster of size c·n/k
#                        contributes is c² balanced shares, and the
#                        skew rehearsal showed real skew can land at
#                        ~1.9x fair share (macro k-means splits a 90%
#                        planted mass) — a 2x factor never armed there
AUTO_CAP_FLOOR = 512   # below this, single-level quadratic is harmless
K_SUB_FLOOR = 16       # a derived sub-split below this under-splits:
#                        ceil(4·biggest/cap) is small exactly when the
#                        cap is large (the auto case), but the skewed
#                        mass may hold MANY blobs (r5 rehearsal: 4
#                        sub-centroids over 8 planted blobs recovered
#                        nothing; 16 finds all 8, measured sum(scope²)
#                        6.5M vs 13.8M unsplit on the skew fixture)


def semantic_dedup(emb: DataFrame, *, k_clusters: int = K_CLUSTERS,
                   iterations: int = 5, tau: float = TAU,
                   vec_col: str = "v", id_col: str = "vec_id",
                   max_cluster_size: int | str | None = "auto",
                   k_sub: int | None = None) -> DataFrame:
    """(vec_id, cluster, csim, keep): cluster assignment, cosine to the
    assigned centroid, and whether the vector survives dedup. ``emb``
    needs (vec_id, v: array<double>); vectors are compared by cosine.

    ``max_cluster_size`` arms the oversized-cluster guard: clusters
    with more than that many distinct-vector representatives are
    sub-scoped by a second k-means level so the intra-scope pair join
    stays bounded. The default "auto" derives the cap as
    max(512, ceil(1.5·n_reps/k_clusters)) from the size probe itself —
    no knob needed for the skew case to be survivable; an int sets the
    cap directly; None disables the guard (exact single-level
    semantics at any size). ``k_sub`` defaults to ceil(4 × largest
    oversized cluster / cap) — the INTENTIONAL 4x oversplit: k-means
    sub-splits are unbalanced, so splitting at exactly mass/cap pieces
    routinely leaves scopes above the cap — capped at 64, so the
    sub-centroid count tracks the skew mass instead of letting scopes
    regrow with n. The exact-duplicate collapse is always on
    (output-preserving for tau ≤ 1 — see module docstring).
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
        .transform(materialize))

    # exact-duplicate collapse: min-id representative per identical
    # vector group (identical vectors always share a cluster — same
    # argmax — so partitioning by (cluster, v) is (v) with a cheaper
    # shuffle key prefix)
    rep_w = Window.partitionBy("cluster", vec_col)
    collapsed = assigned.withColumn("_rep_id", F.min(id_col).over(rep_w))
    # non-reps: dropped by their own representative (same vector,
    # same csim, lower id => higher priority) iff cos(x, rep) =
    # dot(v, v)/nrm² clears tau — the identical arithmetic the pair
    # join would have used
    dropped_nonrep = (
        collapsed.filter(F.col(id_col) != F.col("_rep_id"))
        .filter(_dot(F.col(vec_col), F.col(vec_col))
                / (F.col("_nrm") * F.col("_nrm")) >= tau)
        .select(id_col))
    reps = collapsed.filter(F.col(id_col) == F.col("_rep_id")).drop("_rep_id")

    # oversized-cluster guard: sub-scope clusters whose rep count
    # exceeds the cap with a second k-means level. The size probe is a
    # k_clusters-row aggregate (bounded driver read, like the centroid
    # sample).
    scope = ["cluster"]
    if max_cluster_size is not None:
        sizes = {r["cluster"]: r["n"] for r in
                 (reps.groupBy("cluster")
                  .agg(F.count(F.lit(1)).alias("n")).collect())}
        if max_cluster_size == "auto":
            n_reps = sum(sizes.values())
            cap = max(AUTO_CAP_FLOOR,
                      math.ceil(AUTO_CAP_FACTOR * n_reps / k_clusters))
        else:
            cap = max_cluster_size
        over = sorted(c for c, n in sizes.items() if n > cap)
        if over:
            if k_sub is None:
                # 4x the mass ratio: k-means sub-splits are not
                # balanced, so splitting at exactly mass/cap pieces
                # routinely leaves scopes above cap (measured on the
                # skew rehearsal: 4 sub-centroids over 8 planted blobs
                # recovered nothing); oversplitting is cheap — each
                # oversized-cluster member pays k_sub extra dot folds
                biggest = max(sizes[c] for c in over)
                k_sub = min(64, max(K_SUB_FLOOR,
                                    -(-4 * biggest // cap)))
            sub_cents = train_centroids(
                reps.filter(F.col("cluster").isin(over)),
                vec_col=vec_col, id_col=id_col, k=k_sub,
                iterations=iterations)
            reps = (assign_buckets(reps, sub_cents, vec_col=vec_col)
                    .withColumn("sub",
                                F.when(F.col("cluster").isin(over),
                                       F.col("bucket"))
                                .otherwise(F.lit(0)))
                    .drop("bucket")
                    .transform(materialize))  # k_sub folds feed both join sides
            scope = ["cluster", "sub"]

    x = reps.select(F.col(id_col).alias("x_id"), *scope,
                    F.col(vec_col).alias("xv"),
                    F.col("_nrm").alias("xn"), F.col("csim").alias("xs"))
    y = reps.select(F.col(id_col).alias("y_id"), *scope,
                    F.col(vec_col).alias("yv"),
                    F.col("_nrm").alias("yn"), F.col("csim").alias("ys"))
    # y outranks x when (ys, -y_id) > (xs, -x_id): the most-central
    # member (lowest id on ties) of every near-dup group outranks the
    # rest and is the one kept
    dropped = (
        x.join(y, scope)
        .filter((F.col("ys") > F.col("xs"))
                | ((F.col("ys") == F.col("xs"))
                   & (F.col("y_id") < F.col("x_id"))))
        .filter(_dot(F.col("xv"), F.col("yv"))
                / (F.col("xn") * F.col("yn")) >= tau)
        .select(F.col("x_id").alias(id_col))
        .unionByName(dropped_nonrep)
        .distinct())

    return (assigned.join(dropped.withColumn("_drop", F.lit(True)),
                          id_col, "left")
            .select(id_col, "cluster", "csim",
                    F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep")))
