"""Property-based tests for the r10 operators: the banded two-level
prefix-sum selections (UniMax + domain cap) vs their spec windows on
generated skew, URL canonicalization laws (idempotence, tracking-set
independence), and langid's dense-argmax model on generated corpora."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from myhadoop_spark.operators.unimax import (
    unimax_allocate,
    unimax_select,
    unimax_select_window,
)
from myhadoop_spark.operators.url_dedup import (
    canonical_url,
    domain_cap,
    domain_cap_window,
)

import pytest

# r14 (VERDICT r13 item 1): heavy parity/property battery — the
# slow tier; see pytest.ini. Run with -m "slow or not slow".
pytestmark = pytest.mark.slow


def _rank(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1_000_000


# --- banded unimax selection ≡ spec window on generated corpora -------

_corpus = st.lists(
    st.tuples(st.sampled_from(["en", "de", "zh"]),
              st.integers(min_value=0, max_value=400)),
    min_size=1, max_size=60)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_corpus, st.integers(min_value=0, max_value=100),
       st.sampled_from([1, 5, 77]))
def test_banded_unimax_select_equals_window(spark, docs, pct, bands):
    rows = [(lang, i, n) for i, (lang, n) in enumerate(docs)]
    dt = spark.createDataFrame(
        rows, "lang string, doc_id long, n_tokens long")
    total = sum(n for _, _, n in rows)
    alloc = unimax_allocate(dt, total_budget=total * pct // 100)
    got = sorted(map(tuple, unimax_select(dt, alloc, bands=bands).collect()))
    want = sorted(map(tuple, unimax_select_window(dt, alloc).collect()))
    assert got == want


# --- banded domain cap ≡ spec window, and ≡ the python prefix model ---

_domains = st.lists(
    st.sampled_from(["a.com", "b.com", "hot.com"]),
    min_size=1, max_size=80)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_domains, st.integers(min_value=0, max_value=30),
       st.sampled_from([1, 4, 50]))
def test_banded_domain_cap_equals_window_and_model(spark, doms, cap,
                                                   bands):
    rows = [(i, d) for i, d in enumerate(doms)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    got = sorted(r.doc_id for r in
                 domain_cap(df, cap=cap, bands=bands).collect())
    want = sorted(r.doc_id for r in
                  domain_cap_window(df, cap=cap).collect())
    assert got == want
    # independent python model: per-domain (md5-rank, id) prefix
    by_dom: dict[str, list[int]] = {}
    for i, d in rows:
        by_dom.setdefault(d, []).append(i)
    model = sorted(
        i for d, ids in by_dom.items()
        for i in sorted(ids, key=lambda x: (_rank(x), x))[:cap])
    assert got == model


# --- URL canonicalization laws ----------------------------------------

_path_chars = st.text(
    alphabet=st.sampled_from("abcXYZ019-._~"), min_size=0, max_size=8)
_urls = st.builds(
    lambda scheme, www, host, port, path, params, frag:
        f"{scheme}{www}{host}.com{port}/{path}"
        + ("?" + "&".join(params) if params else "")
        + frag,
    st.sampled_from(["http://", "HTTPS://", ""]),
    st.sampled_from(["www.", ""]),
    st.sampled_from(["ex", "Ex", "sub.ex"]),
    st.sampled_from([":80", ":443", ":8080", ""]),
    _path_chars,
    st.lists(st.sampled_from(["id=1", "q=Zz", "utm_source=t",
                              "gclid=9", "utm_campaign=c"]),
             max_size=4),
    st.sampled_from(["", "#frag", "#a/b?c"]))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_urls, min_size=1, max_size=12, unique=True))
def test_canonical_url_laws(spark, urls):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    out = df.select(
        F.col("u"),
        canonical_url(F.col("u")).alias("c1"),
        canonical_url(canonical_url(F.col("u"))).alias("c2")).collect()
    for r in out:
        # idempotence: canonicalizing a canonical form is a no-op
        assert r["c2"] == r["c1"], r["u"]
        # no canonical form retains scheme/www/default port/fragment/
        # tracking params
        assert "://" not in r["c1"] and "#" not in r["c1"], r["u"]
        assert not r["c1"].startswith("www."), r["u"]
        assert ":80/" not in r["c1"] and not r["c1"].endswith(":80")
        assert "utm_" not in r["c1"] and "gclid" not in r["c1"], r["u"]
        # the registrable tail always survives
        assert "ex.com" in r["c1"], (r["u"], r["c1"])
