"""PPJoin prefix filtering (operators/ppjoin.py): exact recall vs a
brute-force Python model, candidate pruning on skewed gram
frequencies, and the banded (equi-join) plan shape."""

from __future__ import annotations

import contextlib
import io
import random

from pyspark.sql import functions as F

from myhadoop_spark.operators.ppjoin import jaccard_pairs, prefix_candidates

TAU = 0.6


def _mk_sets(rng: random.Random, n: int = 40):
    """Gram sets over a skewed vocabulary (low ids common, high ids
    rare) with injected high-overlap pairs."""
    sets = []
    for _ in range(n):
        size = rng.randrange(15, 40)
        s = {rng.randrange(1, 30) for _ in range(size // 2)}
        s |= {rng.randrange(30, 5000) for _ in range(size - len(s))}
        sets.append(sorted(s))
    for src, dst in [(0, 1), (2, 3), (4, 5)]:
        keep = rng.randrange(0, 3)
        sets[dst] = sorted(set(sets[src]) | set(sets[dst][:keep]))
    return sets


def _brute(sets, tau):
    out = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = set(sets[i]), set(sets[j])
            jac = len(a & b) / len(a | b)
            if jac >= tau:
                out[(i, j)] = jac
    return out


def _df(spark, sets):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(sets)],
        "doc_id long, grams array<long>")


def test_exact_recall_vs_brute_force(spark):
    rng = random.Random(5)
    sets = _mk_sets(rng)
    want = _brute(sets, TAU)
    got = {(r.doc1, r.doc2): r.jaccard
           for r in jaccard_pairs(_df(spark, sets), TAU).collect()}
    assert set(got) == set(want), (set(want) - set(got),
                                   set(got) - set(want))
    for k, j in want.items():
        assert abs(got[k] - j) < 1e-12
    assert want  # the fixture must contain qualifying pairs


def test_candidates_are_superset_of_answers_and_pruned(spark):
    rng = random.Random(6)
    sets = _mk_sets(rng)
    df = _df(spark, sets)
    cand = {(r.doc1, r.doc2)
            for r in prefix_candidates(df, TAU).collect()}
    assert set(_brute(sets, TAU)) <= cand
    n = len(sets)
    assert len(cand) < n * (n - 1) // 2  # actually prunes something


def test_plan_is_banded_not_cartesian(spark):
    rng = random.Random(7)
    df = _df(spark, _mk_sets(rng, n=10))
    plan_io = io.StringIO()
    with contextlib.redirect_stdout(plan_io):
        prefix_candidates(df, TAU).explain("formatted")
    plan = plan_io.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
