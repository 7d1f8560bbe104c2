"""SimHash Hamming-ball join (operators/simhash_join.py): exact
recall vs brute force on generated fingerprints, pigeonhole block
boundaries for non-divisible widths, the loud hot-bucket guard, and
the no-cartesian plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.simhash_join import (
    _block_bounds,
    hamming_pairs,
)
from tests.test_plans import plan_of


def _brute(vals, k):
    out = []
    ids = sorted(vals)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(vals[a] ^ vals[b]).count("1")
            if h <= k:
                out.append((a, b, h))
    return sorted(out)


def _df(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in vals.items()], "doc_id long, simhash long")


def test_exact_recall_generated(spark):
    # LCG fingerprints + planted near-pairs at every radius
    vals = {i: (i * 2654435761 + 17) % (1 << 32) for i in range(60)}
    for i in range(0, 60, 9):  # plant a partner at distance i%4
        d = i % 4
        v = vals[i]
        for j in range(d):
            v ^= 1 << ((i * 7 + j * 11) % 32)
        vals[1000 + i] = v
    df = _df(spark, vals)
    for k in (1, 2, 3):
        got = sorted(map(tuple,
                         hamming_pairs(df, max_hamming=k).collect()))
        assert got == _brute(vals, k), k


def test_block_bounds_cover_all_bits(spark):
    for bits, blocks in ((32, 3), (32, 4), (64, 3), (17, 5)):
        bounds = _block_bounds(bits, blocks)
        assert sum(w for _, w in bounds) == bits
        assert bounds[0][0] == 0
        for (s1, w1), (s2, _) in zip(bounds, bounds[1:]):
            assert s1 + w1 == s2


def test_hot_bucket_guard_is_loud(spark):
    # 50 identical fingerprints: every block bucket holds 50
    df = _df(spark, {i: 12345 for i in range(50)})
    with pytest.raises(RuntimeError, match="quadratic"):
        hamming_pairs(df, max_hamming=2, max_bucket=10)
    # without the cap the pairs are still exact (all 1225, hamming 0)
    assert hamming_pairs(df, max_hamming=2).count() == 50 * 49 // 2


def test_guards_and_plan(spark):
    df = _df(spark, {1: 3})
    with pytest.raises(ValueError):
        hamming_pairs(df, max_hamming=0)
    with pytest.raises(ValueError):
        hamming_pairs(df, max_hamming=32)
    plan = plan_of(spark, "simhash_neardup")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
