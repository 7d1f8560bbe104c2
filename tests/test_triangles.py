"""Triangle counting (operators/triangles.py): brute-force parity on
pseudo-random graphs, exactly-once emission, multi-edge/self-loop
immunity, hub-graph correctness (the degree-ordering case), and the
plan shape."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from myhadoop_spark.operators.triangles import (
    oriented_edges,
    triangles,
    vertex_triangle_counts,
)


def _brute_triangles(edges):
    adj = set()
    nodes = set()
    for u, v in edges:
        if u != v:
            adj.add((min(u, v), max(u, v)))
            nodes.update((u, v))
    return {(a, b, c) for a, b, c in itertools.combinations(
        sorted(nodes), 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj}


def _rand_graph(n, m, seed=7):
    # deterministic LCG — no RNG imports needed
    x, out = seed, []
    for _ in range(m):
        x = (x * 1103515245 + 12345) % (1 << 31)
        u = x % n
        x = (x * 1103515245 + 12345) % (1 << 31)
        v = x % n
        out.append((u, v))
    return out


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_brute_force_parity_random_graphs(spark):
    for n, m in ((12, 40), (25, 120), (8, 60)):
        edges = _rand_graph(n, m)
        got = {tuple(sorted((r.a, r.b, r.c)))
               for r in triangles(_df(spark, edges)).collect()}
        rows = triangles(_df(spark, edges)).collect()
        assert len(rows) == len(got)        # exactly once per triangle
        assert got == _brute_triangles(edges), (n, m)


def test_hub_graph(spark):
    # star + one rim edge: exactly one triangle through the hub; the
    # hub's high degree must not double-count or lose it
    edges = [(0, i) for i in range(1, 10)] + [(1, 2)]
    t = triangles(_df(spark, edges)).collect()
    assert len(t) == 1
    assert sorted((t[0].a, t[0].b, t[0].c)) == [0, 1, 2]
    counts = {r.id: r.triangles
              for r in vertex_triangle_counts(_df(spark, edges)).collect()}
    assert counts == {0: 1, 1: 1, 2: 1}


def test_multi_edges_self_loops_and_direction_collapse(spark):
    edges = [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (1, 3), (3, 3)]
    t = triangles(_df(spark, edges)).collect()
    assert len(t) == 1                      # set semantics
    o = oriented_edges(_df(spark, edges)).collect()
    assert len(o) == 3                      # 3 canonical edges
    assert len({(r.a, r.b) for r in o}) == 3


def test_orientation_is_low_to_high_degree(spark):
    edges = [(0, i) for i in range(1, 6)] + [(1, 2)]
    o = {(r.a, r.b) for r in oriented_edges(_df(spark, edges)).collect()}
    # hub 0 has degree 5 — every star edge points INTO it
    assert all(b == 0 for a, b in o if 0 in (a, b))


def test_plan_has_no_cartesian(spark):
    df = _df(spark, _rand_graph(10, 30))
    plan = (triangles(df)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Cartesian" not in plan and "NestedLoop" not in plan
