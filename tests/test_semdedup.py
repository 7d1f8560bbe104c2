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


def _guard_fixture(spark):
    """90 % of the corpus in ONE macro region (four sub-blobs sharing a
    dominant axis, near-identical within a blob), 10 % scattered far —
    the pathological shape where single-level k-means hands one cluster
    the quadratic pair join. Plus exact duplicates (every 10th hot
    vector repeated under a higher id) to exercise the collapse."""
    rows = []
    dim = 8
    vid = 0
    hot = []
    # blob membership interleaved across ids so the deterministic
    # first-k-ids k-means init sees one vector from each sub-blob
    for i in range(90):
        for j in range(4):
            v = [0.0] * dim
            v[0] = 10.0
            v[1 + j] = 3.0
            v[5] = 0.001 * i
            rows.append((vid, v))
            hot.append(vid)
            vid += 1
    for i in range(40):
        v = [0.0] * dim
        v[6] = 5.0 + i
        v[7] = -3.0 * (i % 7)
        rows.append((vid, v))
        vid += 1
    dups = [(1000 + k, list(rows[h][1])) for k, h in
            enumerate(hot[::10])]  # exact copies, higher ids
    return (spark.createDataFrame(rows + dups, "vec_id long, v array<double>"),
            set(hot), {i for i, _ in dups})


def test_oversized_cluster_guard_matches_two_level_model(spark):
    """max_cluster_size armed: keep/drop must equal a pure-Python
    two-level model (collapse → size probe → shared sub-k-means →
    (cluster, sub)-scoped pair rule), the hot cluster must actually
    split, and every planted exact duplicate must fall to the
    collapse."""
    K, KSUB, CAP = 4, 4, 50
    emb, hot_ids, dup_ids = _guard_fixture(spark)
    vecs = {r.vec_id: list(r.v) for r in emb.collect()}
    ids = sorted(vecs)
    cents = train_centroids(emb, k=K)

    # ---- model: level 1 (assignment identical to _model) ----
    nrm = {i: math.sqrt(_seq_dot(v, v)) for i, v in vecs.items()}
    cnrm = [math.sqrt(_seq_dot(c, c)) for c in cents]
    cluster, csim = {}, {}
    for i, v in vecs.items():
        scores = [_seq_dot(v, c) for c in cents]
        b = max(range(K), key=lambda j: (scores[j], j))
        cluster[i] = b
        csim[i] = _seq_dot(v, cents[b]) / (nrm[i] * cnrm[b])

    # ---- collapse: min-id rep per identical vector ----
    rep: dict[int, int] = {}
    groups: dict[tuple, list[int]] = {}
    for i in ids:
        groups.setdefault((cluster[i], tuple(vecs[i])), []).append(i)
    for g in groups.values():
        r0 = min(g)
        for i in g:
            rep[i] = r0
    dropped = {i for i in ids if rep[i] != i
               and _seq_dot(vecs[i], vecs[i]) / (nrm[i] * nrm[i]) >= TAU}
    reps_ids = [i for i in ids if rep[i] == i]

    # ---- size probe + shared sub-k-means over the oversized subset ----
    from collections import Counter
    sizes = Counter(cluster[i] for i in reps_ids)
    over = sorted(c for c, s in sizes.items() if s > CAP)
    assert over, "fixture must produce an oversized cluster"
    over_rows = [(i, vecs[i]) for i in reps_ids if cluster[i] in over]
    sub_cents = train_centroids(
        spark.createDataFrame(over_rows, "vec_id long, v array<double>"),
        k=KSUB)
    sub = {i: 0 for i in reps_ids}
    for i, v in over_rows:
        scores = [_seq_dot(v, c) for c in sub_cents]
        sub[i] = max(range(KSUB), key=lambda j: (scores[j], j))

    # the guard must bite: the hot cluster splits into >= 2 sub-scopes,
    # and the dominant scope shrinks well below the unguarded cluster
    hot_cluster = max(sizes, key=lambda c: sizes[c])
    hot_scopes = Counter(sub[i] for i in reps_ids
                         if cluster[i] == hot_cluster)
    assert len(hot_scopes) >= 2, hot_scopes
    assert max(hot_scopes.values()) < sizes[hot_cluster]

    # ---- (cluster, sub)-scoped pair rule among reps ----
    for x in reps_ids:
        for y in reps_ids:
            if x == y or cluster[x] != cluster[y] or sub[x] != sub[y]:
                continue
            if not ((csim[y], -y) > (csim[x], -x)):
                continue
            if (_seq_dot(vecs[x], vecs[y]) / (nrm[x] * nrm[y])) >= TAU:
                dropped.add(x)
                break

    out = {r.vec_id: r for r in
           semantic_dedup(emb, k_clusters=K, max_cluster_size=CAP,
                          k_sub=KSUB).collect()}
    assert set(out) == set(ids)
    for i in ids:
        assert out[i].cluster == cluster[i], i
        assert out[i].keep == (i not in dropped), i
    # every planted exact duplicate dies in the collapse
    assert dup_ids <= {i for i in ids if not out[i].keep}


def test_guard_off_is_single_level(spark):
    """Below the 512-rep auto floor the default stays exact
    single-level — and max_cluster_size=None pins single-level
    semantics explicitly at ANY size (the collapse is
    output-preserving)."""
    emb, _, _ = _guard_fixture(spark)
    vecs = {r.vec_id: list(r.v) for r in emb.collect()}
    cents = train_centroids(emb, k=4)
    cluster, dropped = _model(vecs, cents, TAU)
    for kwargs in ({}, {"max_cluster_size": None}):
        out = {r.vec_id: r for r in
               semantic_dedup(emb, k_clusters=4, **kwargs).collect()}
        for i in vecs:
            assert out[i].cluster == cluster[i], i
            assert out[i].keep == (i not in dropped), i


def test_auto_cap_arms_without_knob(spark):
    """Past the 512-rep floor, the DEFAULT call must arm the guard on a
    planted 90%-mass cluster by itself (the 100 TB path can't depend on
    the caller knowing the knob) and equal the explicitly-capped path
    — which test_oversized_cluster_guard_matches_two_level_model pins
    against the pure-Python two-level model."""
    from myhadoop_spark.operators.semdedup import (
        AUTO_CAP_FACTOR,
        AUTO_CAP_FLOOR,
    )

    K = 4
    # the _guard_fixture shape scaled past the floor: 1080 hot vectors
    # in one macro region (four sub-blobs), 120 cold, exact dups
    rows, hot = [], []
    vid = 0
    for i in range(270):
        for j in range(4):
            v = [0.0] * 8
            v[0], v[1 + j], v[5] = 10.0, 3.0, 0.001 * i
            rows.append((vid, v))
            hot.append(vid)
            vid += 1
    for i in range(120):
        v = [0.0] * 8
        v[6], v[7] = 5.0 + i, -3.0 * (i % 7)
        rows.append((vid, v))
        vid += 1
    dups = [(5000 + k, list(rows[h][1])) for k, h in
            enumerate(hot[::10])]
    emb = spark.createDataFrame(rows + dups,
                                "vec_id long, v array<double>")

    auto = {r.vec_id: (r.cluster, r.keep) for r in
            semantic_dedup(emb, k_clusters=K, tau=0.95).collect()}

    # reproduce the auto derivation from the operator's own outputs:
    # reps = min-id per identical (cluster, vector) group
    vecs = {i: tuple(v) for i, v in rows + dups}
    groups: dict[tuple, list[int]] = {}
    for i, (c, _) in auto.items():
        groups.setdefault((c, vecs[i]), []).append(i)
    from collections import Counter
    cluster_sizes = Counter(auto[min(g)][0] for g in groups.values())
    n_reps = len(groups)
    cap = max(AUTO_CAP_FLOOR, -(-AUTO_CAP_FACTOR * n_reps // K))
    assert max(cluster_sizes.values()) > cap >= AUTO_CAP_FLOOR, \
        (cluster_sizes, cap)  # the fixture genuinely arms the guard

    explicit = {r.vec_id: (r.cluster, r.keep) for r in
                semantic_dedup(emb, k_clusters=K, tau=0.95,
                               max_cluster_size=cap).collect()}
    assert auto == explicit
    # and the guard changed work shape vs single-level is already
    # covered by the scale rehearsal; here pin that dups still die
    assert all(not auto[i][1] for i, _ in dups)


def test_plan_is_cluster_banded(spark):
    emb = _fixture_emb(spark)
    plan_io = io.StringIO()
    with contextlib.redirect_stdout(plan_io):
        semantic_dedup(emb).explain("formatted")
    plan = plan_io.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_guard_is_repartition_invariant(spark):
    """Every guard stage (bounded sample, collapse window, size probe,
    sub-assignment, pair scope) is deterministic by construction —
    keep/drop must not depend on the input's partitioning."""
    emb, _, _ = _guard_fixture(spark)
    outs = []
    for parts in (3, 17):
        out = {r.vec_id: (r.cluster, r.keep)
               for r in semantic_dedup(emb.repartition(parts),
                                       k_clusters=4, max_cluster_size=50,
                                       k_sub=4).collect()}
        outs.append(out)
    assert outs[0] == outs[1]
