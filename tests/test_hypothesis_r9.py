"""Property-based tests for the r9 operators: UniMax allocation vs
the sequential loop on generated corpora, interval-overlap join vs
brute force on generated intervals, and CMS vs the hashed-Counter
model on generated token streams."""

from __future__ import annotations

import hashlib
import itertools
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from myhadoop_spark.operators.cms import cms_estimate, cms_table
from myhadoop_spark.operators.interval_join import interval_overlap_join
from myhadoop_spark.operators.unimax import unimax_allocate

import pytest

# r14 (VERDICT r13 item 1): heavy parity/property battery — the
# slow tier; see pytest.ini. Run with -m "slow or not slow".
pytestmark = pytest.mark.slow

_lang_sizes = st.dictionaries(
    st.sampled_from(["en", "de", "fr", "zh", "hi", "sw"]),
    st.integers(min_value=0, max_value=10_000),
    min_size=1, max_size=6)


def _loop_unimax(sizes, budget, cap):
    caps = {l: s * cap for l, s in sizes.items()}
    remaining, k, out = budget, len(caps), {}
    for lang in sorted(caps, key=lambda l: (caps[l], l)):
        out[lang] = min(caps[lang], remaining // k)
        remaining -= out[lang]
        k -= 1
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_lang_sizes, st.integers(min_value=0, max_value=50_000),
       st.integers(min_value=1, max_value=3))
def test_unimax_closed_form_equals_loop(spark, sizes, budget, cap):
    rows = [(l, i, s) for i, (l, s) in enumerate(sorted(sizes.items()))]
    dt = spark.createDataFrame(rows, "lang string, doc_id long, n_tokens long")
    got = {r.lang: r.alloc
           for r in unimax_allocate(dt, total_budget=budget,
                                    epoch_cap=cap).collect()}
    assert got == _loop_unimax(sizes, budget, cap)


_iv = st.tuples(st.integers(min_value=0, max_value=200),
                st.integers(min_value=1, max_value=60))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_iv, min_size=1, max_size=25),
       st.lists(_iv, min_size=1, max_size=25),
       st.sampled_from([3, 16, 128]))
def test_interval_join_equals_brute_force(spark, lo_a, lo_b, width):
    a = [(i, lo, lo + d) for i, (lo, d) in enumerate(lo_a)]
    b = [(1000 + i, lo, lo + d) for i, (lo, d) in enumerate(lo_b)]
    da = spark.createDataFrame(a, "id long, lo long, hi long")
    db = spark.createDataFrame(b, "id long, lo long, hi long")
    rows = interval_overlap_join(da, db, bucket_width=width).collect()
    got = [(r.a_id, r.b_id) for r in rows]
    assert len(got) == len(set(got))
    want = {(ia, ib)
            for (ia, alo, ahi), (ib, blo, bhi) in itertools.product(a, b)
            if alo < bhi and blo < ahi}
    assert set(got) == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.sampled_from(["a", "b", "c", "dd", "e"]),
                min_size=1, max_size=60))
def test_cms_model_parity_and_floor(spark, words):
    d, w = 3, 4
    occ = spark.createDataFrame([(x,) for x in words], "term string")
    cms = {(r.j, r.bucket): r.c
           for r in cms_table(occ, "term", depth=d, width=w).collect()}
    model: dict = {}
    for term, c in Counter(words).items():
        for j in range(d):
            b = int(hashlib.md5(f"{j}:{term}".encode()).hexdigest()[:8],
                    16) % w
            model[(j, b)] = model.get((j, b), 0) + c
    assert cms == model
    est = {r.term: r.est
           for r in cms_estimate(cms_table(occ, "term", depth=d, width=w),
                                 occ.distinct(), "term",
                                 depth=d, width=w).collect()}
    for term, c in Counter(words).items():
        assert est[term] >= c
