"""MMR — Maximal Marginal Relevance re-ranking (Carbonell &
Goldstein, SIGIR 1998): picks k results that are RELEVANT but not
REDUNDANT, the standard diversification step between a retriever
(BM25 / ANN / RRF hybrid) and a RAG context window:

    pick argmax_d  λ·rel(d) − (1−λ)·max_{s∈S} cos(d, s)

iterated k times over the already-selected set S (first pick = pure
relevance).

Scale shape: MMR is inherently sequential in k, so it must NEVER run
over a corpus — it runs over each query's BOUNDED candidate list (the
retriever's top-N, N ≲ a few hundred), grouped by query id:
``groupBy(query).applyInPandas`` gives per-query parallelism across
the cluster while each group does O(N·k) vectorized numpy work on one
executor. The candidate bound is the contract — the operator refuses
groups larger than ``max_candidates`` rather than silently going
quadratic (the repo's max_bucket discipline).

Determinism: groups are re-sorted by id before the argmax loop, so the
selection is partitioning- and arrival-order-free; numpy float64 ops
on identical inputs are bit-stable on a given platform, and ties pick
the smallest id (numpy argmax takes the FIRST max after the sort).
No SQL twin (iterative argmax is not expressible as one ANSI query) —
correctness is pinned by exact Python-model parity and invariant tests
(tests/test_mmr.py), the SemDeDup/BPE precedent.

Reference analog: none — §2.3 extension surface (RAG retrieval
family, same group as operators/bm25.py's RRF fusion).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CANDIDATES = 4096

_OUT_SCHEMA = ("query_id long, rank int, doc_id long, "
               "relevance double, mmr_score double")


def _mmr_group(pdf: pd.DataFrame, k: int, lam: float,
               max_candidates: int) -> pd.DataFrame:
    import numpy as np

    if len(pdf) > max_candidates:
        raise ValueError(
            f"MMR group of {len(pdf)} exceeds max_candidates="
            f"{max_candidates}: bound the retriever's top-N first")
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    v = np.asarray([np.asarray(x, dtype=np.float64)
                    for x in pdf["vec"]], dtype=np.float64)
    nrm = np.sqrt((v * v).sum(axis=1))
    nrm[nrm == 0.0] = 1.0  # zero vectors: cos ≡ 0, never NaN
    v = v / nrm[:, None]
    rel = pdf["relevance"].to_numpy(dtype=np.float64)
    n = len(pdf)
    picked: list[int] = []
    sel_scores: list[float] = []
    max_sim = np.zeros(n)  # empty selected set → diversity term 0
    alive = np.ones(n, dtype=bool)
    for r in range(min(k, n)):
        score = lam * rel - (1.0 - lam) * max_sim
        score[~alive] = -np.inf
        i = int(np.argmax(score))
        picked.append(i)
        sel_scores.append(float(score[i]))
        alive[i] = False
        sims = v @ v[i]
        # first pick REPLACES the zero placeholder (a true max over the
        # now-nonempty set may be negative); later picks fold in
        max_sim = sims if r == 0 else np.maximum(max_sim, sims)
    out = pdf.iloc[picked][["query_id", "doc_id", "relevance"]].copy()
    out["rank"] = range(1, len(picked) + 1)
    out["mmr_score"] = sel_scores
    return out[["query_id", "rank", "doc_id", "relevance", "mmr_score"]]


def mmr_rerank(candidates: DataFrame, k: int, *, lam: float = 0.7,
               query_col: str = "query_id", id_col: str = "doc_id",
               vec_col: str = "vec", score_col: str = "relevance",
               max_candidates: int = MAX_CANDIDATES) -> DataFrame:
    """Diversified top-k per query from a bounded candidate table
    (query, id, vec array<numeric>, relevance). Returns
    (query_id, rank, doc_id, relevance, mmr_score) — rank 1 is the
    highest-relevance candidate; later ranks trade relevance against
    max cosine similarity to everything already picked."""
    cands = candidates.select(
        F.col(query_col).cast("long").alias("query_id"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.transform(F.col(vec_col),
                    lambda x: x.cast("double")).alias("vec"),
        F.col(score_col).cast("double").alias("relevance"))

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        return _mmr_group(pdf, k, lam, max_candidates)

    return cands.groupBy("query_id").applyInPandas(apply, _OUT_SCHEMA)
