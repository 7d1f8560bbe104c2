"""Budgeted quality selection (operators/budget_select.py): banded
plan ≡ single-window spec across budgets × bandings × tie-salts,
boundary semantics, guards, and the tie-salt band spread."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.budget_select import (
    budget_select,
    budget_select_window,
    fraction_budget,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, score long, n_tokens long")


def _skewed(spark, n=400):
    # LCG scores with a heavy mode at 100, token counts 1..40
    rows = [(i,
             100 if i % 3 else (i * 48271) % 997,
             1 + (i * 69621) % 40)
            for i in range(n)]
    return _docs(spark, rows)


@pytest.mark.slow  # r14: heavy parity battery (fast twin stays in the default tier)
def test_banded_equals_window_sweep(spark):
    d = _skewed(spark).localCheckpoint()
    total = d.agg(F.sum("n_tokens")).head()[0]
    for budget in (0, total // 10, total // 3, total // 2, total,
                   total + 5):
        want = sorted(map(tuple,
                          budget_select_window(d, budget).collect()))
        for bands in (1, 4, 32, 101):
            got = sorted(map(tuple,
                             budget_select(d, budget,
                                           bands=bands).collect()))
            assert got == want, (budget, bands)


def test_point_mass_still_bitwise(spark):
    """All-equal scores: the banded plan degenerates to one band (the
    documented point-mass case) but stays bitwise-correct — ties
    break by id, so the kept set is the id-prefix."""
    d = _docs(spark, [(i, 42, 3) for i in range(500)])
    got = sorted(r["doc_id"]
                 for r in budget_select(d, 300, bands=16).collect())
    assert got == list(range(100))  # 300 tokens / 3 per doc


def test_boundary_semantics(spark):
    d = _docs(spark, [(1, 10, 5), (2, 9, 5), (3, 8, 5)])
    # budget 7: doc1 (before=0 < 7) and doc2 (before=5 < 7) kept,
    # doc3 (before=10) dropped — the straddling doc2 IS included
    kept = {r["doc_id"] for r in budget_select(d, 7).collect()}
    assert kept == {1, 2}
    assert budget_select(d, 0).count() == 0
    assert budget_select(d, 15).count() == 3
    # ties broken by id: equal scores keep the smaller ids first
    t = _docs(spark, [(5, 1, 4), (2, 1, 4), (9, 1, 4)])
    assert {r["doc_id"] for r in budget_select(t, 8).collect()} == {2, 5}


def test_fraction_budget_exact(spark):
    d = _docs(spark, [(1, 1, 7), (2, 1, 8)])  # 15 tokens
    assert fraction_budget(d, 1, 2).head()["budget"] == 7
    assert fraction_budget(d, 2, 3).head()["budget"] == 10
    got = {r["doc_id"]
           for r in budget_select(d, fraction_budget(d, 1, 2)).collect()}
    assert got == {1}  # 7-token budget: doc1 (before=0) only


def test_partitioning_invariance(spark):
    d = _skewed(spark, 300)
    a = sorted(map(tuple, budget_select(d, 2000, bands=8).collect()))
    b = sorted(map(tuple, budget_select(d.repartition(11), 2000,
                                        bands=8).collect()))
    assert a == b


def test_whole_bands_skip_the_sort(spark):
    """The physical plan sorts ONLY the straddling band: with a huge
    spread and a mid corpus budget, the window branch receives fewer
    rows than the kept set (whole bands bypass it)."""
    d = _skewed(spark).localCheckpoint()
    total = d.agg(F.sum("n_tokens")).head()[0]
    kept = budget_select(d, total // 2, bands=32)
    want = budget_select_window(d, total // 2)
    assert sorted(map(tuple, kept.collect())) \
        == sorted(map(tuple, want.collect()))
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan  # the boundary branch exists


def test_guards(spark):
    d = _docs(spark, [(1, 1, 1)])
    with pytest.raises(ValueError):
        budget_select(d, 10, bands=0)
    with pytest.raises(ValueError):
        budget_select(d, -1)
    with pytest.raises(ValueError):
        fraction_budget(d, 1, 0)


def test_budget_table_one_row_contract(spark):
    """A DataFrame budget must have exactly one row: a multi-row (or
    empty) budget table fails loudly instead of silently duplicating
    (or dropping) every document through the crossJoin."""
    d = _docs(spark, [(i, i, 2) for i in range(10)])
    ok = spark.createDataFrame([(8,)], "budget long")
    want = sorted(map(tuple, budget_select(d, 8).collect()))
    assert sorted(map(tuple, budget_select(d, ok).collect())) == want
    multi = spark.createDataFrame([(8,), (9,)], "budget long")
    with pytest.raises(Exception, match="1-row"):
        budget_select(d, multi).collect()
    empty = spark.createDataFrame([], "budget long")
    with pytest.raises(Exception, match="1-row"):
        budget_select(d, empty).collect()


# ------------------------------------------------- quantized variant

def _py_quant(rows, budget, q):
    """Model: order by (quantized label, md5 rank, id), greedy prefix
    — labels shifted non-negative exactly as the operator does."""
    import hashlib

    smax = max(s for _, s, _ in rows)

    def rk(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8],
                   16) % 1_000_000

    out, before = [], 0
    for i, s, t in sorted(rows,
                          key=lambda r: ((smax - r[1]) // q,
                                         rk(r[0]), r[0])):
        if before < budget:
            out.append((i, s, t))
        before += t
    return sorted(out)


@pytest.mark.slow  # r14: heavy parity battery (fast twin stays in the default tier)
def test_quantized_matches_model_and_splits_point_mass(spark):
    from myhadoop_spark.operators.budget_select import (
        quantized_budget_select,
    )

    # heavy mode at score 100 + dispersed tail (the degeneracy shape)
    rows = [(i, 100 if i % 3 else (i * 48271) % 997, 1 + (i % 5))
            for i in range(300)]
    df = _docs(spark, rows)
    total = sum(t for _, _, t in rows)
    for budget in (0, total // 4, total // 2, total + 1):
        for q, bands in ((50, 4), (200, 16), (1, 8)):
            got = sorted(map(tuple, quantized_budget_select(
                df, budget, q=q, bands=bands).collect()))
            assert got == _py_quant(rows, budget, q), (budget, q, bands)


def test_quantized_uniform_scores_fill_budget(spark):
    from myhadoop_spark.operators.budget_select import (
        quantized_budget_select,
    )

    # ALL-equal scores: one label, the whole corpus is the boundary —
    # the hash prefix fills the budget exactly and deterministically
    rows = [(i, 42, 3) for i in range(400)]
    df = _docs(spark, rows)
    got = sorted(map(tuple, quantized_budget_select(
        df, 300, q=10, bands=16).collect()))
    assert got == _py_quant(rows, 300, 10)
    assert len(got) == 100  # 300 tokens / 3 per doc


def test_quantized_guards(spark):
    from myhadoop_spark.operators.budget_select import (
        quantized_budget_select,
    )

    d = _docs(spark, [(1, 1, 1)])
    with pytest.raises(ValueError):
        quantized_budget_select(d, 1, q=0)
    with pytest.raises(ValueError):
        quantized_budget_select(d, 1, q=1, bands=0)
