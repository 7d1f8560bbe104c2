"""k-core decomposition (operators/kcore.py): pure-Python peeling
model parity on generated graphs, hand-built structures (cliques,
chains, stars, clique+tail), exact core numbers, guards."""

from __future__ import annotations

import pytest

from myhadoop_spark.operators.kcore import core_numbers, kcore


def _py_kcore(edges, k):
    """Reference peel: dict id -> degree of the k-core."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < k]:
            for u in adj[v]:
                adj[u].discard(v)
            del adj[v]
            changed = True
    return {v: len(ns) for v, ns in adj.items()}


def _py_cores(edges):
    out: dict[int, int] = {}
    k = 1
    while True:
        core = _py_kcore(edges, k)
        if not core:
            return out
        for v in core:
            out[v] = k
        k += 1


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _lcg_graph(n, m, salt):
    return [(((i * 2654435761 + salt) % n),
             ((i * 40503 + salt * 7) % n)) for i in range(m)]


def test_model_parity_random_graphs(spark):
    for n, m, salt in [(30, 50, 1), (50, 120, 2), (25, 90, 3)]:
        edges = _lcg_graph(n, m, salt)
        df = _df(spark, edges)
        for k in (2, 3, 4):
            want = _py_kcore(edges, k)
            got = {r["id"]: r["degree"]
                   for r in kcore(df, k).collect()}
            assert got == want, (n, m, salt, k)


def test_known_structures(spark):
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(4, 10), (10, 11), (11, 12)]
    df = _df(spark, clique + tail)
    # K5 is a 4-core; the tail peels away at k=2
    got = {r["id"]: r["degree"] for r in kcore(df, 4).collect()}
    assert got == {i: 4 for i in range(5)}
    assert {r["id"] for r in kcore(df, 2).collect()} == set(range(5))
    # chain: every vertex has core 1; k=2 core is empty
    chain = _df(spark, [(i, i + 1) for i in range(6)])
    assert kcore(chain, 2).count() == 0
    assert kcore(chain, 1).count() == 7


def test_core_numbers_exact(spark):
    edges = _lcg_graph(30, 70, 9)
    got = {r["id"]: r["core"]
           for r in core_numbers(_df(spark, edges)).collect()}
    assert got == _py_cores(edges)


def test_self_loops_dropped_and_guard(spark):
    df = _df(spark, [(1, 1), (1, 2)])
    assert {r["id"] for r in kcore(df, 1).collect()} == {1, 2}
    with pytest.raises(ValueError):
        kcore(df, 0)


def test_stats_iterations(spark):
    stats: dict = {}
    kcore(_df(spark, [(i, i + 1) for i in range(8)]), 2, stats=stats)
    assert stats["iterations"] >= 2  # chains peel from both ends


def test_core_numbers_input_shrinks_per_k(spark):
    """core_numbers peels each k from the PREVIOUS core's surviving
    edge set — the per-k input is monotone non-increasing and the
    labels still match the pure-Python model (containment property:
    k-core(G) == k-core((k-1)-core(G)))."""
    # a 5-clique with a chain tail: 3-core = the clique, chain peels
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(4, 10), (10, 11), (11, 12)]
    edges = clique + tail
    stats: dict = {}
    got = {r["id"]: r["core"]
           for r in core_numbers(_df(spark, edges),
                                 stats=stats).collect()}
    assert got == _py_cores(edges)
    counts = [n for _, n in stats["edges_per_k"]]
    assert counts == sorted(counts, reverse=True)
    # the k=4 peel starts from the 3-core (the clique), not the full
    # graph: the clique (degree 4 everywhere) survives k=3 and k=4
    # intact and empties at k=5
    ks = dict(stats["edges_per_k"])
    assert ks[3] == 20 and ks[4] == 20 and ks[5] == 0


def test_hindex_fixpoint_matches_peeling(spark):
    """core_numbers_hindex (one h-index fixpoint) ≡ core_numbers
    (per-k peels) ≡ the pure-Python model on random graphs and
    hand-built structures — two independent algorithms, one truth."""
    from myhadoop_spark.operators.kcore import core_numbers_hindex

    cases = [_lcg_graph(30, 70, 9), _lcg_graph(40, 90, 4),
             [(a, b) for a in range(5) for b in range(a + 1, 5)]
             + [(4, 10), (10, 11)],
             [(1, 1), (1, 2)],       # self-loop dropped
             [(i, i + 1) for i in range(9)]]  # chain: all core 1
    for edges in cases:
        want = _py_cores(edges)
        stats: dict = {}
        got = {r["id"]: r["core"]
               for r in core_numbers_hindex(_df(spark, edges),
                                            stats=stats).collect()}
        assert got == want, edges[:5]
        assert stats["iterations"] >= 1


def test_hindex_empty_graph(spark):
    from myhadoop_spark.operators.kcore import core_numbers_hindex

    df = spark.createDataFrame([], "src long, dst long")
    assert core_numbers_hindex(df).count() == 0
