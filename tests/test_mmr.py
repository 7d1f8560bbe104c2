"""MMR re-ranking (operators/mmr.py): independent Python-model parity
(plain-loop reference, tolerance 1e-9 on scores, exact on the picked
sequence), diversity semantics (a redundant near-duplicate of the top
hit is deferred below a less-relevant-but-novel candidate), λ edge
cases, partitioning invariance, the candidate bound, and the
registered rows-only query's shape."""

from __future__ import annotations

from math import sqrt

import pytest

from myhadoop_spark.operators.mmr import mmr_rerank
from tests.conftest import SF_SMOKE

# one query, hand-built geometry:
#   doc 1: relevance 0.95, direction e1          (the top hit)
#   doc 2: relevance 0.94, direction e1 (dup!)   (near-copy of doc 1)
#   doc 3: relevance 0.60, direction e2          (novel)
#   doc 4: relevance 0.50, direction -e1         (novel, anti-aligned)
CANDS = [
    (7, 1, [1.0, 0.0, 0.0], 0.95),
    (7, 2, [0.999, 0.01, 0.0], 0.94),
    (7, 3, [0.0, 1.0, 0.0], 0.60),
    (7, 4, [-1.0, 0.0, 0.0], 0.50),
]
SCHEMA = ("query_id long, doc_id long, vec array<double>, "
          "relevance double")


def _py_mmr(rows, k, lam):
    """Independent plain-loop reference (no numpy)."""
    rows = sorted(rows, key=lambda r: r[1])
    vecs = []
    for _, _, v, _ in rows:
        n = sqrt(sum(x * x for x in v)) or 1.0
        vecs.append([x / n for x in v])
    rel = [r[3] for r in rows]
    alive = [True] * len(rows)
    max_sim = [0.0] * len(rows)
    picked, scores = [], []
    for it in range(min(k, len(rows))):
        best_i, best_s = None, None
        for i in range(len(rows)):
            if not alive[i]:
                continue
            s = lam * rel[i] - (1.0 - lam) * max_sim[i]
            if best_s is None or s > best_s:
                best_i, best_s = i, s
        picked.append(rows[best_i][1])
        scores.append(best_s)
        alive[best_i] = False
        for i in range(len(rows)):
            sim = sum(a * b for a, b in zip(vecs[i], vecs[best_i]))
            max_sim[i] = sim if it == 0 else max(max_sim[i], sim)
    return picked, scores


def _run(spark, rows, k, lam):
    df = spark.createDataFrame(rows, SCHEMA)
    out = (mmr_rerank(df, k, lam=lam)
           .orderBy("query_id", "rank").collect())
    return ([r.doc_id for r in out], [r.mmr_score for r in out])


def test_python_model_parity(spark):
    for lam in (0.0, 0.3, 0.7, 1.0):
        got_ids, got_scores = _run(spark, CANDS, 4, lam)
        want_ids, want_scores = _py_mmr(CANDS, 4, lam)
        assert got_ids == want_ids, lam
        for g, w in zip(got_scores, want_scores):
            assert abs(g - w) < 1e-9, lam


def test_redundant_duplicate_deferred(spark):
    ids, _ = _run(spark, CANDS, 3, lam=0.7)
    # doc 2 is a near-copy of the already-picked doc 1: both novel
    # directions must jump it despite far less relevance (doc 4 first —
    # anti-alignment is maximal novelty, cos = −1)
    assert ids == [1, 4, 3]
    assert 2 not in ids


def test_lambda_one_is_pure_relevance(spark):
    ids, _ = _run(spark, CANDS, 4, lam=1.0)
    assert ids == [1, 2, 3, 4]  # relevance order, diversity ignored


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(CANDS * 1, SCHEMA)
    a = (mmr_rerank(df, 4, lam=0.7).orderBy("rank").collect())
    b = (mmr_rerank(df.repartition(8), 4, lam=0.7)
         .orderBy("rank").collect())
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_candidate_bound_enforced(spark):
    rows = [(1, i, [float(i), 1.0], 0.5) for i in range(20)]
    df = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(Exception, match="max_candidates"):
        mmr_rerank(df, 3, max_candidates=10).collect()


def test_registered_query_shape(spark):
    from myhadoop_spark import registry

    out = registry.get("mmr_diversify").fn(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) == 5 * 10  # N_QUERIES × k
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, 11)), q
        top = min(rs, key=lambda r: r.rank)
        # rank 1 = the pure top-relevance hit
        assert top.relevance == max(r.relevance for r in rs), q
        assert len({r.doc_id for r in rs}) == len(rs), q
