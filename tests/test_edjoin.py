"""Ed-Join edit-distance similarity join (operators/edjoin.py):
brute-force recall pin, short-string / duplicate-gram edge cases,
python-model property test, and the no-cartesian plan assertion.
(The DuckDB differential for the `edit_dist_join` query rides
tests/test_correctness.py via the registry.)"""

from __future__ import annotations

import contextlib
import io

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from myhadoop_spark.operators.edjoin import edit_distance_pairs
import pytest


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows: list[tuple[int, str]], d: int) -> set[tuple[int, int, int]]:
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            dist = _lev(sa, sb)
            if dist <= d:
                lo, hi = min(ia, ib), max(ia, ib)
                out.add((lo, hi, dist))
    return out


def _run(spark, rows, d, q=2):
    df = spark.createDataFrame(rows, "id long, s string")
    got = edit_distance_pairs(df, "id", "s", max_dist=d, q=q)
    return {tuple(r) for r in got.collect()}


FIXTURE = [
    (1, "small ring Brand#2 ECONOMY"),
    (2, "small ring Brand#3 ECONOMY"),    # 1 edit from #1
    (3, "small rings Brand#2 ECONOMY"),   # 1 insert from #1
    (4, "large bolt Brand#2 ECONOMY"),    # 4 edits from #1
    (5, "small ring Brand#2 ECONOMY"),    # identical to #1
    (6, ""),                              # empty (short block)
    (7, "a"),                             # short, 1 edit from empty
    (8, "ab"),                            # short
    (9, "ba"),                            # short, 2 edits from "ab"
    (10, "xy"),                           # short, shares NO gram with 8/9
    (11, "aaaa"),                         # duplicate grams
    (12, "aaab"),                         # duplicate grams, 1 edit from 11
    (13, "abcdef"),                       # long boundary (len = q*(d+1))
    (14, "abcxef"),                       # 1 sub from 13
]


def test_matches_brute_force_on_adversarial_fixture(spark):
    for d in (0, 1, 2, 3):
        got = _run(spark, FIXTURE, d)
        want = _brute(FIXTURE, d)
        assert got == want, (d, got ^ want)


def test_null_strings_dropped(spark):
    rows = [(1, "abc"), (2, None), (3, "abd")]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {tuple(r) for r in
           edit_distance_pairs(df, "id", "s", max_dist=1).collect()}
    assert got == {(1, 3, 1)}


def test_q3_same_output(spark):
    # the gram width is a cost knob, never a semantics knob
    got2 = _run(spark, FIXTURE, 2, q=2)
    got3 = _run(spark, FIXTURE, 2, q=3)
    assert got2 == got3


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(alphabet="abc", max_size=7),
                min_size=0, max_size=12))
@pytest.mark.slow  # r14: heavy parity battery (fast twin stays in the default tier)
def test_matches_python_model(spark, strings):
    rows = [(i, s) for i, s in enumerate(strings)]
    got = _run(spark, rows, 2)
    want = _brute(rows, 2)
    assert got == want


def test_candidate_dedup_plans_without_pair_exchange(spark):
    """r13 (optimization): under the broadcast budget the long tier's
    pair dedup runs IN-STAGE — the stream side is hash-partitioned by
    id, the build side broadcasts, and HashPartitioning(id_a)
    satisfies the dedup aggregate's clustering, so no exchange keyed
    on the candidate pair may appear (the candidate multiset never
    crosses the network)."""
    import re

    from myhadoop_spark.operators.edjoin import edit_distance_candidates

    df = spark.createDataFrame(
        [(i, f"part name number {i:04d}") for i in range(200)],
        "id long, s string")
    out = edit_distance_candidates(df, "id", "s", max_dist=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert not re.search(r"hashpartitioning\(id_a", plan), plan


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(FIXTURE, "id long, s string")
    out = edit_distance_pairs(df, "id", "s", max_dist=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_short_heavy_recall_and_pruning(spark):
    """The r7 verdict's short-string finding: a short-heavy corpus
    (product-code shape, len 3-6 at d=2/q=2 — every string below the
    q-gram pigeonhole) must (a) keep exact recall through the r8
    mid-tier character-prefix filter and (b) generate FEWER candidates
    than the content-blind all-pairs-within-length block it replaced."""
    import hashlib

    from myhadoop_spark.operators.edjoin import edit_distance_candidates

    rows = []
    for i in range(120):
        h = hashlib.sha1(str(i).encode()).hexdigest()
        rows.append((i, h[:3 + i % 4].upper()))  # len 3..6, distinct-ish
    rows = list({s: (i, s) for i, s in rows}.values())

    got = _run(spark, rows, 2)
    want = _brute(rows, 2)
    assert got == want

    df = spark.createDataFrame(rows, "id long, s string")
    n_cand = edit_distance_candidates(df, "id", "s", max_dist=2).count()
    # the content-blind bound: every pair within +-2 length
    by_len: dict[int, int] = {}
    for _, s in rows:
        by_len[len(s)] = by_len.get(len(s), 0) + 1
    blind = sum(
        by_len[a] * (by_len[a] - 1) // 2
        + sum(by_len[a] * by_len.get(a + k, 0) for k in (1, 2))
        for a in by_len)
    assert n_cand < blind * 0.7, (n_cand, blind)


def test_dist_matches_builtin(spark):
    # the emitted dist is Spark's levenshtein verbatim (the oracle
    # contract); spot-check the verify join kept the right value
    rows = [(1, "kitten"), (2, "sitten"), (3, "sitting")]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {tuple(r) for r in
           edit_distance_pairs(df, "id", "s", max_dist=3).collect()}
    assert got == {(1, 2, 1), (1, 3, 3), (2, 3, 2)}
