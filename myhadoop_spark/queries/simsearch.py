"""Similarity search over the ``embeddings`` table (SURVEY.md §2.4 #16).

Two paths:
  simsearch_exact  brute-force cosine top-k for a small query set —
                   correct baseline, broadcast the queries, never the corpus
  simsearch_lsh    sign-random-projection LSH bucketing → per-bucket top-k —
                   the 100 TB path (candidate set ∝ bucket size, not corpus)
  embed_neardup    cosine > τ near-duplicate pairs, blocked by label

Float determinism: all dot products are left-fold double accumulations
over double-cast elements, matching DuckDB's list_dot_product on
double lists — results are bitwise identical across engines, so even
top-k membership agrees. Output cosines are floor-truncated to 6 decimals
(floor(x*1e6)/1e6) — truncation of identical doubles is identical,
unlike round-half rules which differ between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.registry import register

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 5


def _as_double(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _trunc6(c: Column) -> Column:
    return F.floor(c * F.lit(1e6)) / F.lit(1e6)


_SQL_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


@register(
    "simsearch_exact",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_SQL_V} AS v,
                      sqrt(list_dot_product({_SQL_V}, {_SQL_V})) AS nrm
               FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM e
          WHERE vec_id < {N_QUERIES}),
    p AS (SELECT q_id, vec_id,
                 list_dot_product(v, qv) / (nrm * qnrm) AS cos
          FROM e CROSS JOIN q WHERE vec_id <> q_id),
    r AS (SELECT q_id, vec_id AS neighbor_id, cos,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, vec_id ASC) AS rn
          FROM p)
    SELECT q_id, neighbor_id, CAST(rn AS INT) AS rn,
           floor(cos * 1e6) / 1e6 AS cosine
    FROM r WHERE rn <= {TOP_K}
    """,
    tags=("simsearch", "extension"),
)
def simsearch_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors (vec_id < 5).

    The query side is tiny and broadcast; the corpus streams through one
    narrow stage. Per-query top-k via window row_number — at scale this is
    a partial top-k per partition then a k·|Q|-row final (TakeOrdered
    semantics through AQE), never a global sort of all scores."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v"))
    emb = emb.withColumn("nrm", F.sqrt(_dot("v", "v")))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"))
    pairs = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id",
                (_dot("v", "qv") / (F.col("nrm") * F.col("qnrm"))).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rn",
                _trunc6(F.col("cos")).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# sign-random-projection LSH (the scale path)
# ---------------------------------------------------------------------------

# multi-table sign-random-projection LSH: T tables × P planes. Single-table
# sign-LSH has poor recall on high-dim random vectors (bucket match prob
# (1-θ/π)^planes); the union over T independent tables restores it while
# keeping per-table candidate sets small. Hyperplane weight for
# (table t, plane p, dim d) = sin(1 + (t*P + p)*997 + d) — a fixed closed
# form, no stored model, identical on every executor.
N_TABLES = 8
N_PLANES = 4


def _lsh_buckets_expr(vcol: str, dim: int = 64) -> Column:
    """array of N_TABLES bucket ids for a vector column. The hyperplane
    weights sin(1 + plane_index*997 + d) are row constants — they are
    precomputed in Python and inlined as literal arrays (like
    operators/ivf.py), not re-evaluated per row×table×plane×dim."""
    import math

    planes = [
        [math.sin(1 + (t * N_PLANES + p) * 997 + d) for d in range(dim)]
        for t in range(N_TABLES) for p in range(N_PLANES)
    ]
    w = F.array(*[F.array(*[F.lit(x) for x in row]) for row in planes])
    v = F.col(vcol)
    return F.transform(
        F.sequence(F.lit(0), F.lit(N_TABLES - 1)),
        lambda t: F.aggregate(
            F.sequence(F.lit(0), F.lit(N_PLANES - 1)),
            F.lit(0).cast("long"),
            lambda acc, p: acc + F.when(
                F.aggregate(
                    F.zip_with(v, F.element_at(w, t * N_PLANES + p + 1),
                               lambda x, ww: x * ww),
                    F.lit(0.0), lambda a, x: a + x) > 0,
                F.pow(F.lit(2.0), p.cast("double")).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
    )


@register("simsearch_lsh", oracle=None, tags=("simsearch", "extension", "lsh"))
def simsearch_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via multi-table sign-random-projection LSH: a corpus
    vector is a candidate for a query iff they share a bucket in ANY of
    the 8 tables (4 planes each). Candidates are deduped before scoring,
    so each pair's cosine is computed once. Approximate — recall vs
    simsearch_exact is bound-checked in tests/test_approx.py.

    Scale: the corpus is exploded to 8 (table, bucket) rows per vector —
    a constant blow-up shuffled on (table, bucket); per-bucket candidate
    lists stay ∝ corpus/2^planes per table. No cross join at any size."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v"))
    emb = emb.withColumn("nrm", F.sqrt(_dot("v", "v")))
    emb = emb.withColumn("buckets", _lsh_buckets_expr("v"))
    tagged = emb.select(
        "vec_id", "v", "nrm",
        F.posexplode("buckets").alias("t", "bucket"))
    q = tagged.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("t").alias("qt"),
        F.col("bucket").alias("qbucket"))
    cand_ids = (
        tagged.select("vec_id", "t", "bucket")
        .join(F.broadcast(q),
              (F.col("t") == F.col("qt")) & (F.col("bucket") == F.col("qbucket")))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
    )
    qvec = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"))
    scored = (
        cand_ids.join(emb.select("vec_id", "v", "nrm"), "vec_id")
        .join(F.broadcast(qvec), "q_id")
        .select("q_id", "vec_id",
                (_dot("v", "qv") / (F.col("nrm") * F.col("qnrm"))).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rn",
                _trunc6(F.col("cos")).alias("cosine"))
    )


@register("simsearch_ivf", oracle=None, tags=("simsearch", "extension", "ivf"))
def simsearch_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via an IVF index (operators/ivf.py): 16 sampled-k-means
    centroids partition the corpus; each query scores only its 4 nearest
    buckets (~25% of the corpus at any scale). Deterministic training →
    reproducible results; recall vs simsearch_exact is bound-checked in
    tests/test_approx.py."""
    from myhadoop_spark.operators.ivf import ivf_topk, train_centroids

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v"))
    emb = emb.withColumn("nrm", F.sqrt(_dot("v", "v")))
    cents = train_centroids(emb, k=16, iterations=5)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"))
    return ivf_topk(emb, q, cents, top_k=TOP_K)


@register(
    "embed_neardup",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, {_SQL_V} AS v,
                      sqrt(list_dot_product({_SQL_V}, {_SQL_V})) AS nrm
               FROM embeddings)
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           floor(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) * 1e6) / 1e6
             AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.3
    """,
    tags=("simsearch", "dedup", "extension"),
)
def embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.3 — calibrated to the
    synthetic fixture's cosine distribution), blocked by `label` — the
    blocking key stands in for an LSH bucket at scale."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v"))
    emb = emb.withColumn("nrm", F.sqrt(_dot("v", "v")))
    a = emb.select(F.col("vec_id").alias("id1"), F.col("label").alias("lab"),
                   F.col("v").alias("v1"), F.col("nrm").alias("n1"))
    b = emb.select(F.col("vec_id").alias("id2"), F.col("label").alias("lab2"),
                   F.col("v").alias("v2"), F.col("nrm").alias("n2"))
    pairs = (
        a.join(b, (F.col("lab") == F.col("lab2")) & (F.col("id1") < F.col("id2")))
        .select("id1", "id2",
                (_dot("v1", "v2") / (F.col("n1") * F.col("n2"))).alias("cos"))
    )
    return (
        pairs.filter(F.col("cos") >= 0.3)
        .select("id1", "id2", _trunc6(F.col("cos")).alias("cosine"))
    )
