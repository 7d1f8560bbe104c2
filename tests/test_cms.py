"""Count-Min Sketch (operators/cms.py): Python-model parity (same md5
buckets), the absolute est >= true guarantee, exact mergeability,
weighted build, partitioning invariance, and exactness at full width."""

from __future__ import annotations

import hashlib
from collections import Counter

from pyspark.sql import functions as F

from myhadoop_spark.operators.cms import cms_estimate, cms_merge, cms_table

WORDS = (["alpha"] * 40 + ["beta"] * 25 + ["gamma"] * 12 + ["delta"] * 5
         + ["epsilon", "zeta", "eta", "theta", "iota", "kappa"] * 2)
D, W = 4, 8


def _bucket(term: str, j: int, width: int) -> int:
    return int(hashlib.md5(f"{j}:{term}".encode()).hexdigest()[:8],
               16) % width


def _model(counts: Counter, depth: int, width: int):
    cms = {}
    for term, c in counts.items():
        for j in range(depth):
            k = (j, _bucket(term, j, width))
            cms[k] = cms.get(k, 0) + c
    return cms


def _occ(spark, words):
    return spark.createDataFrame([(w,) for w in words], "term string")


def test_sketch_matches_python_model(spark):
    got = {(r.j, r.bucket): r.c
           for r in cms_table(_occ(spark, WORDS), "term",
                              depth=D, width=W).collect()}
    assert got == _model(Counter(WORDS), D, W)


def test_estimate_never_undercounts(spark):
    occ = _occ(spark, WORDS)
    cms = cms_table(occ, "term", depth=D, width=W)
    exact = Counter(WORDS)
    terms = occ.distinct()
    est = {r.term: r.est
           for r in cms_estimate(cms, terms, "term",
                                 depth=D, width=W).collect()}
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)
    # undersized width ⇒ at least one real collision overcount
    assert any(est[t] > exact[t] for t in exact)


def test_full_width_is_exact(spark):
    occ = _occ(spark, WORDS)
    cms = cms_table(occ, "term", depth=D, width=1 << 20)
    est = {r.term: r.est
           for r in cms_estimate(cms, occ.distinct(), "term",
                                 depth=D, width=1 << 20).collect()}
    assert est == dict(Counter(WORDS))


def test_merge_equals_union_bitwise(spark):
    a, b = WORDS[: len(WORDS) // 2], WORDS[len(WORDS) // 2:]
    merged = cms_merge(
        cms_table(_occ(spark, a), "term", depth=D, width=W),
        cms_table(_occ(spark, b), "term", depth=D, width=W))
    union = cms_table(_occ(spark, WORDS), "term", depth=D, width=W)
    as_map = lambda df: {(r.j, r.bucket): r.c for r in df.collect()}
    assert as_map(merged) == as_map(union)


def test_weighted_build_and_partitioning_invariance(spark):
    pre = spark.createDataFrame(
        sorted(Counter(WORDS).items()), "term string, n long")
    weighted = cms_table(pre, "term", depth=D, width=W, count_col="n")
    plain = cms_table(_occ(spark, WORDS).repartition(11), "term",
                      depth=D, width=W)
    as_map = lambda df: {(r.j, r.bucket): r.c for r in df.collect()}
    assert as_map(weighted) == as_map(plain)


def test_cms_verified_topk_brackets_truth(spark):
    """The r10 composition (VERDICT item 8): for every MG survivor,
    mg_est ≤ true ≤ cms_est and true ∈ [lo, hi] with the interval no
    wider than the MG decrement bound — CMS deliberately undersized
    (4×32) so collisions are live and min(cms_est, mg_est+err) is a
    real refinement on at least one side."""
    from myhadoop_spark.operators.cms import cms_verified_topk

    rows = [(f"t{i % 40}",) for i in range(3000)] \
        + [("hot",)] * 500 + [("warm",)] * 200
    df = spark.createDataFrame(rows, "term string").repartition(8)
    true = {r["term"]: r["c"] for r in
            df.groupBy("term").agg(F.count("*").alias("c")).collect()}
    out = cms_verified_topk(df, "term", k=10, capacity=16,
                            depth=4, width=32).collect()
    # uniform-tail counters die in MG decrements: survivors may be
    # fewer than k, but the true heavies always survive and lead
    assert 2 <= len(out) <= 10
    assert out[0]["term"] == "hot" and out[1]["term"] == "warm"
    for r in out:
        t = true[r["term"]]
        assert r["mg_est"] <= t, r          # MG never overcounts
        assert r["cms_est"] >= t, r         # CMS never undercounts
        assert r["lo"] <= t <= r["hi"], r   # certified bracket
        assert r["hi"] - r["lo"] <= r["err_bound"], r
        assert r["hi"] == min(r["cms_est"],
                              r["mg_est"] + r["err_bound"]), r
    # determinism across partitionings
    again = cms_verified_topk(df.repartition(8), "term", k=10,
                              capacity=16, depth=4, width=32).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]
