"""Product quantization (PQ) for the IVF index — the memory-bound ANN
scale path.

IVF (operators/ivf.py) bounds the CANDIDATE count; PQ bounds the BYTES
per candidate: each vector is encoded as M sub-space codebook indices
(M small ints) plus its scalar norm, so the searchable index holds
~M+8 bytes per vector instead of dim×8 — at 100 TB of raw embeddings
the index shrinks ~50× and fits the aggregate memory of a cluster that
the raw vectors never would. This is the FAISS IVFADC design (Jégou,
Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI 2011) re-expressed as Catalyst expressions.

Pieces:
  train_pq_codebooks  per-sub-space deterministic sampled k-means
                      (same bounded-sample discipline as
                      ivf.train_centroids — the driver never holds
                      corpus-sized data)
  pq_encode           vector → M codes, an argmin fold per sub-space;
                      pure expressions, no UDF
  pq_index            the compact searchable relation
                      (id, bucket, codes, nrm) — raw vectors DROPPED
  ivfpq_topk          IVF probe → ADC scoring (per-query lookup table,
                      one element_at per sub-space) → top-R shortlist
                      → exact re-rank of R·k candidates against the
                      raw vectors (standard two-stage refine; only the
                      shortlist ever touches a raw vector again)

Search cost per (query, candidate): M array lookups + M adds — no
dim-length dot product until the re-rank, which touches R·k rows per
query, independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

import numpy as np

from myhadoop_spark.operators.ivf import (
    _bounded_sample, _centroid_matrix, _dot, _lloyd,
    assign_buckets, probe_buckets)


def train_pq_codebooks(emb: DataFrame, vec_col: str = "v",
                       id_col: str = "vec_id", m: int = 16, k_sub: int = 16,
                       iterations: int = 5,
                       sample_cap: int = 4096) -> list[list[list[float]]]:
    """M codebooks, each k_sub × (dim/M): deterministic Lloyd k-means
    per sub-space over the same bounded sample discipline as
    ivf.train_centroids (shared `_bounded_sample` + `_lloyd`; FAISS
    trains PQ on a sample too). dim must divide evenly by m.

    Default m=16 for the 64-dim fixture (4-dim sub-spaces): measured at
    sf0.01, m=16 reaches the IVF probe-recall ceiling (0.88) already at
    refine=4, while m=8 needs refine=16 to get there — the coarser
    quantization must be bought back with a longer exact-re-rank
    shortlist. 16 codes + a norm is still ~32× smaller than the raw
    64×8-byte vector."""
    sample = _bounded_sample(emb, vec_col, id_col, sample_cap)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    return [_lloyd(sample[:, j * d_sub:(j + 1) * d_sub], k_sub, iterations)
            for j in range(m)]


def residual_col(vec_col: str, bucket_col: str,
                 cents: list[list[float]]) -> Column:
    """v − centroid(bucket): the residual the FAISS IVFADC design
    actually quantizes — residual magnitudes are much smaller than raw
    vectors once the coarse quantizer has soaked up the bucket mean,
    so the same k_sub codebook entries cover them more densely."""
    mat = _centroid_matrix(cents)
    return F.zip_with(F.col(vec_col),
                      F.element_at(mat, F.col(bucket_col) + 1),
                      lambda x, y: x - y)


def train_residual_codebooks(emb: DataFrame, cents: list[list[float]],
                             vec_col: str = "v", id_col: str = "vec_id",
                             m: int = 16, k_sub: int = 16,
                             iterations: int = 5,
                             sample_cap: int = 4096
                             ) -> list[list[list[float]]]:
    """PQ codebooks trained on RESIDUALS (v − assigned centroid) of
    the bounded sample — the IVFADC discipline. Assignment mirrors
    assign_buckets\' dot-argmax (ties, measure-zero on real floats,
    may pick a different bucket than the lexicographic struct max —
    harmless for codebook training). Use with
    ``pq_index_residual`` / ``ivfpq_topk(..., residual=True)``."""
    sample = _bounded_sample(emb, vec_col, id_col, sample_cap)
    c = np.array(cents, dtype=np.float64)
    assign = (sample @ c.T).argmax(axis=1)
    res = sample - c[assign]
    dim = res.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    return [_lloyd(res[:, j * d_sub:(j + 1) * d_sub], k_sub, iterations)
            for j in range(m)]


def _sub_code(mat: Column, sub: Column, k_sub: int) -> Column:
    """argmin (squared L2) of one sub-vector against one codebook —
    (d2, idx) structs + array_min, the single-evaluation pattern from
    ivf.assign_buckets. (A separate closure per sub-space: PySpark
    derives lambda arity from the Python signature, so the
    default-arg-capture idiom would be mis-read as a 3-arg lambda.)"""
    return F.array_min(F.transform(
        F.sequence(F.lit(0), F.lit(k_sub - 1)),
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(sub, F.element_at(mat, c + 1),
                           lambda x, y: (x - y) * (x - y)),
                F.lit(0.0), lambda acc, x: acc + x).alias("d2"),
            c.alias("idx")),
    ))["idx"]


def pq_encode(emb: DataFrame, books: list[list[list[float]]],
              vec_col: str = "v") -> DataFrame:
    """Append `codes`: for each sub-space j, the index of the codebook
    centroid nearest (squared L2) to the vector's j-th sub-vector.
    Unrolled over j in Python (M is a compile-time constant) so each
    sub-space is its own compact argmin fold, small enough to stay
    inside whole-stage codegen (a single fused M·k_sub·d_sub
    expression would trip the codegen size heuristics — see ROADMAP
    negative results)."""
    m = len(books)
    k_sub = len(books[0])
    d_sub = len(books[0][0])
    code_cols = [
        _sub_code(_centroid_matrix(books[j]),
                  F.slice(F.col(vec_col), j * d_sub + 1, d_sub), k_sub)
        for j in range(m)
    ]
    return emb.withColumn("codes", F.array(*code_cols))


def pq_index(emb: DataFrame, cents: list[list[float]],
             books: list[list[list[float]]], id_col: str = "vec_id",
             vec_col: str = "v", nrm_col: str = "nrm") -> DataFrame:
    """The compact searchable index: (id, bucket, codes, nrm). The raw
    vector column is dropped — this relation is what lives in memory at
    scale (~M+8 bytes/vector vs dim×8 raw)."""
    return pq_encode(assign_buckets(emb, cents, vec_col=vec_col), books,
                     vec_col=vec_col).select(id_col, "bucket", "codes",
                                             nrm_col)


def pq_index_residual(emb: DataFrame, cents: list[list[float]],
                      books: list[list[list[float]]],
                      id_col: str = "vec_id", vec_col: str = "v",
                      nrm_col: str = "nrm") -> DataFrame:
    """The compact index with codes over RESIDUALS — same schema and
    byte footprint as pq_index; the bucket id is no longer just a
    candidate filter but part of the value decomposition
    dot(q,v) = dot(q,c_bucket) + dot(q,residual)."""
    assigned = (assign_buckets(emb, cents, vec_col=vec_col)
                .withColumn("_rv", residual_col(vec_col, "bucket", cents)))
    return pq_encode(assigned, books, vec_col="_rv").select(
        id_col, "bucket", "codes", nrm_col)


def _query_lut(books: list[list[list[float]]],
               qvec_col: str = "qv") -> Column:
    """Per-query ADC lookup table: lut[j][c] = dot(q_sub_j, books[j][c])
    — array<array<double>>, M×k_sub entries, computed once per query."""
    m = len(books)
    k_sub = len(books[0])
    d_sub = len(books[0][0])
    return F.array(*[
        _sub_lut(_centroid_matrix(books[j]),
                 F.slice(F.col(qvec_col), j * d_sub + 1, d_sub), k_sub)
        for j in range(m)
    ])


def _sub_lut(mat: Column, sub: Column, k_sub: int) -> Column:
    return F.transform(F.sequence(F.lit(0), F.lit(k_sub - 1)),
                       lambda c: _dot(sub, F.element_at(mat, c + 1)))


def ivfpq_topk(emb: DataFrame, queries: DataFrame,
               cents: list[list[float]],
               books: list[list[list[float]]], top_k: int = 5,
               refine: int = 4, residual: bool = False) -> DataFrame:
    """queries[q_id, qv, qnrm] × emb[vec_id, v, nrm] → per-query top-k
    EXACT cosines, searched through the compact PQ index.

    Stage 1 (index scan): probed-bucket equi-join against the
    (id, bucket, codes, nrm) index; approximate dot = Σ_j lut[j][code_j]
    (M lookups + adds per pair — never a dim-length product); keep the
    top refine·top_k per query by approximate cosine.
    Stage 2 (refine): join the shortlist — refine·top_k·|Q| rows,
    independent of corpus size — back to the raw vectors for exact
    cosine, then exact top-k. Output schema matches ivf_topk /
    simsearch_exact so recall is directly comparable.

    ``residual=True`` (books from train_residual_codebooks): the
    approximate dot decomposes as dot(q, c_bucket) + Σ_j lut[j][code_j]
    — one extra per-(query, bucket) centroid dot computed on the tiny
    probed relation, never per candidate. Measured
    (pq_residual_study.tsv, sf0.01): in the memory-tight regime
    residual coding is the clear win — m=8/refine=4 recall 0.72 vs
    0.56 raw — while at m=16 or refine=16 both reach the 0.88 IVF
    probe ceiling (raw converging slightly faster at m=16/refine=4);
    use residual when m is the binding budget, which at 100 TB it is."""
    index = (pq_index_residual(emb, cents, books) if residual
             else pq_index(emb, cents, books))
    probed = probe_buckets(queries, cents).withColumn(
        "lut", _query_lut(books))
    if residual:
        mat = _centroid_matrix(cents)
        probed = probed.withColumn(
            "qc_dot",
            _dot(F.col("qv"), F.element_at(mat, F.col("bucket") + 1)))
    adc = F.aggregate(
        F.zip_with(F.col("codes"), F.col("lut"),
                   lambda c, lut_j: F.element_at(lut_j, c.cast("int") + 1)),
        F.lit(0.0), lambda acc, x: acc + x)
    short_w = Window.partitionBy("q_id").orderBy(
        F.col("approx_cos").desc(), F.col("vec_id").asc())
    shortlist = (
        index.join(F.broadcast(probed), "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id",
                (((F.col("qc_dot") + adc) if residual else adc)
                 / (F.col("nrm") * F.col("qnrm"))).alias("approx_cos"))
        # no dedup needed: assign_buckets gives each vector exactly one
        # bucket and probe_buckets emits n_probe DISTINCT buckets per
        # query, so (q_id, vec_id) is already unique — a distinct here
        # would shuffle the largest intermediate for nothing
        .withColumn("srn", F.row_number().over(short_w))
        .filter(F.col("srn") <= refine * top_k)
        .select("q_id", "vec_id")
    )
    qside = queries.select("q_id", "qv", "qnrm")
    exact = (
        shortlist.join(emb.select("vec_id", "v", "nrm"), "vec_id")
        .join(F.broadcast(qside), "q_id")
        .select("q_id", "vec_id",
                (_dot(F.col("v"), F.col("qv"))
                 / (F.col("nrm") * F.col("qnrm"))).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(),
                                           F.col("vec_id").asc())
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rn",
                (F.floor(F.col("cos") * 1e6) / 1e6).alias("cosine"))
    )
