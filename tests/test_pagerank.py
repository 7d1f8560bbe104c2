"""PageRank (operators/pagerank.py): numpy power-iteration parity on a
graph with a dangling node, conservation of rank mass, analytic
two-node cycle, bitwise repartition invariance of the deterministic
fold mode, and convergence telemetry."""

from __future__ import annotations

import numpy as np

from myhadoop_spark.operators.pagerank import pagerank
import pytest

# 1 → 2, 1 → 3, 2 → 3, 3 → 1, 4 → 3, and 5 is DANGLING (in-edges only)
EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 5)]
D = 0.85


def _numpy_pr(edges, n_iter, damping=D):
    ids = sorted({u for e in edges for u in e})
    ix = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    deg = np.zeros(n)
    for u, _ in edges:
        deg[ix[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = r[deg == 0].sum()
        s = np.zeros(n)
        for u, v in edges:
            s[ix[v]] += r[ix[u]] / deg[ix[u]]
        r = (1 - damping) / n + damping * (s + dangling / n)
    return {v: r[ix[v]] for v in ids}


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_numpy_parity_with_dangling(spark):
    for det in (False, True):
        got = {r.id: r.rank
               for r in pagerank(_edges_df(spark), max_iterations=12,
                                 tol=0.0, deterministic=det).collect()}
        want = _numpy_pr(EDGES, 12)
        assert set(got) == set(want)
        for v in want:
            assert abs(got[v] - want[v]) < 1e-9, (det, v)


def test_rank_mass_conserved(spark):
    ranks = pagerank(_edges_df(spark), max_iterations=8).collect()
    assert abs(sum(r.rank for r in ranks) - 1.0) < 1e-9


def test_two_node_cycle_analytic(spark):
    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r.id: r.rank for r in pagerank(df, max_iterations=50).collect()}
    assert abs(got[1] - 0.5) < 1e-12 and abs(got[2] - 0.5) < 1e-12


def test_deterministic_mode_partitioning_bitwise(spark):
    df = _edges_df(spark)
    a = sorted((r.id, r.rank)
               for r in pagerank(df, max_iterations=6, tol=0.0,
                                 deterministic=True).collect())
    b = sorted((r.id, r.rank)
               for r in pagerank(df.repartition(7), max_iterations=6,
                                 tol=0.0,
                                 deterministic=True).collect())
    assert a == b  # exact float equality — the fold has one order


def test_deterministic_multi_dangling_bitwise(spark):
    # ≥2 dangling nodes: the per-iteration dangling-mass SCALAR is an
    # unordered float sum without the ordered fold — it feeds every
    # rank, so a partition-order change would shift all ranks (the r8
    # ADVICE finding; the original graph has only one dangling node)
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 5), (4, 6), (1, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")  # 5,6,7 dangle
    runs = []
    for parts in (1, 3, 11):
        got = sorted(
            (r.id, r.rank)
            for r in pagerank(df.repartition(parts), max_iterations=7,
                              tol=0.0, deterministic=True).collect())
        runs.append(got)
    assert runs[0] == runs[1] == runs[2]   # exact float equality
    want = _numpy_pr(edges, 7)
    for v, rank in runs[0]:
        assert abs(rank - want[v]) < 1e-9


@pytest.mark.slow  # r14: heavy parity battery (fast twin stays in the default tier)
def test_deterministic_tol_stop_partitioning_stable(spark):
    # the stop decision must come from the SAME ordered-fold l1 on any
    # partitioning: same iteration count and bitwise-equal ranks when
    # tol actually fires mid-run
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 5), (4, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {}
    for parts in (2, 9):
        stats: dict = {}
        ranks = sorted(
            (r.id, r.rank)
            for r in pagerank(df.repartition(parts), max_iterations=60,
                              tol=1e-6, deterministic=True,
                              stats=stats).collect())
        out[parts] = (stats["iterations"], ranks)
    assert out[2] == out[9]
    assert out[2][0] < 60                    # tol actually fired


def test_convergence_telemetry(spark):
    stats: dict = {}
    pagerank(_edges_df(spark), max_iterations=60, tol=1e-4,
             stats=stats)
    # L1 contracts ≤ damping per iteration: 1e-4 needs ~O(50) rounds
    assert stats["iterations"] < 60          # converged before the cap
    curve = stats["l1_curve"]
    assert curve[-1] < 1e-4
    assert curve[0] > curve[-1]              # decay
