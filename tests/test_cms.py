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
