"""Connected components on crafted graphs + the dedup-cluster contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myhadoop_spark import registry
from myhadoop_spark.operators.connected_components import connected_components
from tests.conftest import SF_SMOKE


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    return {r["id"]: r["component"]
            for r in connected_components(df).collect()}


def test_chain_collapses_to_min(spark):
    # 0-1-2-3-4 chain: diameter 4, everything labels to 0
    got = _cc(spark, [(i, i + 1) for i in range(4)])
    assert got == {i: 0 for i in range(5)}


def test_disjoint_components(spark):
    got = _cc(spark, [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22)])
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_star_and_cycle(spark):
    edges = [(5, i) for i in (6, 7, 8)] + [(100, 101), (101, 102), (102, 100)]
    got = _cc(spark, edges)
    assert {got[5], got[6], got[7], got[8]} == {5}
    assert {got[100], got[101], got[102]} == {100}


def test_self_edge_isolated_node(spark):
    got = _cc(spark, [(9, 9)])
    assert got == {9: 9}


def test_dedup_clusters_query(spark):
    """Cluster assignment must be consistent with the near-dup pairs:
    endpoints of every pair share a component, and the representative is
    the cluster minimum."""
    pairs = registry.get("embed_neardup").fn(spark, SF_SMOKE).collect()
    clusters = {r["id"]: r["component"]
                for r in registry.get("dedup_clusters").fn(spark, SF_SMOKE).collect()}
    assert clusters, "no clusters produced"
    for p in pairs:
        assert clusters[p["id1"]] == clusters[p["id2"]], p
    for vid, comp in clusters.items():
        assert comp <= vid
        assert clusters[comp] == comp  # representative labels itself


# --- contraction variant (large-star/small-star, Kiveris et al.) ---

from myhadoop_spark.operators.connected_components import (  # noqa: E402
    connected_components_contraction,
)


def _ccc(spark, edges, stats=None):
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    return {r["id"]: r["component"]
            for r in connected_components_contraction(df, stats=stats).collect()}


def test_contraction_crafted_graphs(spark):
    assert _ccc(spark, [(i, i + 1) for i in range(4)]) == \
        {i: 0 for i in range(5)}
    assert _ccc(spark, [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22)]) == \
        {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    got = _ccc(spark, [(5, i) for i in (6, 7, 8)]
               + [(100, 101), (101, 102), (102, 100)])
    assert {got[5], got[6], got[7], got[8]} == {5}
    assert {got[100], got[101], got[102]} == {100}
    assert _ccc(spark, [(9, 9)]) == {9: 9}


def test_contraction_edge_set_contracts(spark):
    """On a long chain the maintained edge set must SHRINK round over
    round toward the star forest — the property label propagation
    lacks (it re-shuffles the full edge set every round)."""
    stats: dict = {}
    got = _ccc(spark, [(i, i + 1) for i in range(63)], stats=stats)
    assert got == {i: 0 for i in range(64)}
    curve = stats["edge_curve"]
    assert curve[-1] == 63          # final star: one edge per non-root
    assert stats["iterations"] >= 2


def test_contraction_equals_propagation_random(spark):
    """Deterministic pseudo-random graphs (id arithmetic, no RNG):
    both algorithms must produce the identical labeling."""
    from myhadoop_spark.operators.connected_components import (
        connected_components,
    )

    for n, m, salt in [(40, 30, 1), (60, 80, 2), (25, 12, 3)]:
        edges = [(((i * 2654435761 + salt) % n),
                  ((i * 40503 + salt * 7) % n)) for i in range(m)]
        df = spark.createDataFrame(edges, "src LONG, dst LONG")
        want = {r["id"]: r["component"]
                for r in connected_components(df).collect()}
        got = {r["id"]: r["component"]
               for r in connected_components_contraction(df).collect()}
        assert got == want, (n, m, salt)


def test_cluster_split_is_leakage_safe(spark):
    """No near-dup pair may straddle a split boundary, every embedding
    row gets exactly one split, and isolated vectors self-represent."""
    split = {r["vec_id"]: (r["component"], r["split"])
             for r in registry.get("cluster_split").fn(spark, SF_SMOKE)
             .collect()}
    pairs = registry.get("embed_neardup").fn(spark, SF_SMOKE).collect()
    assert pairs and split
    for p in pairs:
        assert split[p["id1"]][1] == split[p["id2"]][1], p
        assert split[p["id1"]][0] == split[p["id2"]][0], p
    from myhadoop_spark.catalog import load
    n_emb = load(spark, SF_SMOKE, "embeddings").count()
    assert len(split) == n_emb
    assert {s for _, s in split.values()} <= {"train", "val", "test"}
    clustered = {vid for vid, (comp, _) in split.items() if comp != vid}
    in_pairs = {p["id1"] for p in pairs} | {p["id2"] for p in pairs}
    assert clustered <= in_pairs  # isolated vectors self-represent


def test_cluster_keep_best_invariants(spark):
    """The representative is the arg-max quality member (ties to the
    smallest id), singletons self-represent, members partition the
    scored corpus, and the kept-corpus face keeps exactly one doc per
    cluster."""
    rows = registry.get("cluster_keep_best").fn(spark, SF_SMOKE).collect()
    scores = {r["doc_id"]: r["score"]
              for r in registry.get("quality_filter").fn(spark, SF_SMOKE)
              .select("doc_id", "score").collect()}
    pairs = registry.get("dedup_minhash").fn(spark, SF_SMOKE).collect()
    # rebuild the member sets from the pair graph (union-find)
    parent = {d: d for d in scores}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        a, b = find(p["doc1"]), find(p["doc2"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    members: dict[int, list[int]] = {}
    for d in scores:
        members.setdefault(find(d), []).append(d)
    assert sum(r["n_members"] for r in rows) == len(scores)
    by_comp = {r["component"]: r for r in rows}
    assert set(by_comp) == set(members)
    for comp, mem in members.items():
        r = by_comp[comp]
        assert r["n_members"] == len(mem)
        best = min(mem, key=lambda d: (-scores[d], d))
        assert r["keep_id"] == best, (comp, mem)
        assert r["keep_score"] == scores[best]
