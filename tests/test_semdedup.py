"""SemDeDup (operators/semdedup.py) vs an exact pure-Python model that
replicates the operator's arithmetic ORDER (sequential left-fold dots),
so keep/drop decisions must match bit-for-bit — plus dedup-quality and
plan assertions."""

from __future__ import annotations

import contextlib
import io
import math

from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.ivf import train_centroids
from myhadoop_spark.operators.semdedup import TAU, semantic_dedup
from tests.conftest import SF_SMOKE


def _seq_dot(a, b):
    """Sequential left-fold sum — F.aggregate's evaluation order."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _model(vecs: dict[int, list[float]], cents: list[list[float]],
           tau: float):
    """Pure-Python SemDeDup with the operator's exact rules: argmax-dot
    assignment (ties -> larger index, array_max struct semantics),
    priority (csim desc, id asc), intra-cluster cosine >= tau."""
    nrm = {i: math.sqrt(_seq_dot(v, v)) for i, v in vecs.items()}
    cnrm = [math.sqrt(_seq_dot(c, c)) for c in cents]
    cluster, csim = {}, {}
    for i, v in vecs.items():
        scores = [_seq_dot(v, c) for c in cents]
        b = max(range(len(cents)), key=lambda j: (scores[j], j))
        cluster[i] = b
        csim[i] = _seq_dot(v, cents[b]) / (nrm[i] * cnrm[b])
    dropped = set()
    ids = sorted(vecs)
    for x in ids:
        for y in ids:
            if x == y or cluster[x] != cluster[y]:
                continue
            if not ((csim[y], -y) > (csim[x], -x)):
                continue
            cos = _seq_dot(vecs[x], vecs[y]) / (nrm[x] * nrm[y])
            if cos >= tau:
                dropped.add(x)
                break
    return cluster, dropped


def _fixture_emb(spark):
    return (load(spark, SF_SMOKE, "embeddings")
            .select("vec_id",
                    F.transform("embedding", lambda x: x.cast("double"))
                    .alias("v")))


def test_matches_python_model_exactly(spark):
    emb = _fixture_emb(spark)
    vecs = {r.vec_id: list(r.v) for r in emb.collect()}
    cents = train_centroids(emb)
    cluster, dropped = _model(vecs, cents, TAU)

    out = {r.vec_id: r for r in semantic_dedup(emb).collect()}
    assert set(out) == set(vecs)
    for i, r in out.items():
        assert r.cluster == cluster[i], (i, r.cluster, cluster[i])
        assert r.keep == (i not in dropped), (i, r.keep)


def test_dedup_quality_vs_exact_all_pairs(spark):
    """The cluster restriction may miss cross-cluster near-dups; assert
    the intra-cluster drops are a SUBSET of the exhaustive-tau drop
    candidates and that recall is reasonable on the fixture."""
    emb = _fixture_emb(spark)
    vecs = {r.vec_id: list(r.v) for r in emb.collect()}
    nrm = {i: math.sqrt(_seq_dot(v, v)) for i, v in vecs.items()}
    ids = sorted(vecs)
    has_dup_partner = {
        x for x in ids for y in ids if x != y
        and _seq_dot(vecs[x], vecs[y]) / (nrm[x] * nrm[y]) >= TAU}
    out = semantic_dedup(emb).collect()
    dropped = {r.vec_id for r in out if not r.keep}
    assert dropped <= has_dup_partner  # never drops a non-duplicate
    # the fixture has dup-tau pairs, so a working clustered pass must
    # find SOME of them (cross-cluster pairs are the approximation's
    # declared miss — at fixture tau the partner graph spans clusters,
    # so no tight recall bound is honest here; the model-parity test
    # pins the per-vector decisions exactly)
    assert has_dup_partner and dropped


def test_plan_is_cluster_banded(spark):
    emb = _fixture_emb(spark)
    plan_io = io.StringIO()
    with contextlib.redirect_stdout(plan_io):
        semantic_dedup(emb).explain("formatted")
    plan = plan_io.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
