"""URL blocklist/keyword filtering (operators/url_filter.py): score
ground truths (presence not occurrence-count), blocklist anti-join
semantics, stage skippability, guards, and the plan shape (compiled
expression — no UDF; broadcast anti join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.url_filter import score_urls, url_filter


def _docs(spark):
    rows = [
        (1, "good.com", "good.com/page"),
        (2, "good.com", "good.com/a/x?id=1"),      # both keywords
        (3, "good.com", "good.com/a/a/a/a"),       # one keyword, repeated
        (4, "bad.com", "bad.com/clean"),           # blocklisted
        (5, "other.com", "other.com/p?id=2"),      # one keyword
    ]
    return spark.createDataFrame(
        rows, "doc_id long, domain string, canon_url string")


KW = (("/a/", 2), ("?id=", 1))


def test_score_is_presence_not_count(spark):
    got = {r["doc_id"]: r["url_score"] for r in
           score_urls(_docs(spark), KW).collect()}
    # doc 3 repeats '/a/' but scores it once
    assert got == {1: 0, 2: 3, 3: 2, 4: 0, 5: 1}


def test_filter_stages_and_skippability(spark):
    docs = _docs(spark)
    bl = spark.createDataFrame([("bad.com",)], "domain string")
    out = url_filter(docs, blocked_domains=bl, keywords=KW, threshold=3)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3, 5]
    # blocklist only
    out2 = url_filter(docs, blocked_domains=bl)
    assert sorted(r["doc_id"] for r in out2.collect()) == [1, 2, 3, 5]
    # keywords only; keep_score=False drops the column
    out3 = url_filter(docs, keywords=KW, threshold=2, keep_score=False)
    assert sorted(r["doc_id"] for r in out3.collect()) == [1, 4, 5]
    assert "url_score" not in out3.columns
    # no stages: identity
    assert url_filter(docs).count() == docs.count()


def test_guards(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="threshold"):
        url_filter(docs, keywords=KW)
    with pytest.raises(ValueError, match="keyword"):
        score_urls(docs, [("", 1)])
    with pytest.raises(ValueError, match="keyword"):
        score_urls(docs, [("x", -1)])


def test_plan_compiled_expression_and_broadcast(spark):
    import contextlib
    import io

    docs = _docs(spark)
    bl = spark.createDataFrame([("bad.com",)], "domain string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        url_filter(docs, blocked_domains=bl, keywords=KW,
                   threshold=3).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan      # no Python in the path
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan        # anti join broadcasts
    assert "LeftAnti" in plan
    # non-broadcast escape hatch for 4.6M-domain lists
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        url_filter(docs, blocked_domains=bl,
                   broadcast_blocklist=False).explain("formatted")
    assert "LeftAnti" in buf2.getvalue()


def test_domain_quality_drop_face(spark):
    """The doc-level face of domain_quality: a semi-join on kept
    domains keeps exactly the docs of kept domains — and a domain's
    verdict overrides its individual docs (some dropped docs have
    positive predictions)."""
    from myhadoop_spark import registry
    from tests.conftest import SF_SMOKE

    rep = {r["domain"]: r
           for r in registry.get("domain_quality").fn(spark, SF_SMOKE)
           .collect()}
    kept_domains = {d for d, r in rep.items() if r["kept"]}
    assert 0 < len(kept_domains) < len(rep)  # the threshold splits
    n_docs_kept = sum(r["n_docs"] for d, r in rep.items()
                      if d in kept_domains)
    assert n_docs_kept == sum(
        r["n_docs"] for r in rep.values() if r["kept"])
    # dropped domains still contain individually-positive docs — the
    # domain verdict is a POLICY, not a per-doc re-score
    assert any(r["n_pos"] > 0 and not r["kept"] for r in rep.values())
