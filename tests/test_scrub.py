"""PII scrubbing: DuckDB differential on the fixture corpus + crafted
edge cases + reconciliation with doc_metrics' counters."""

from __future__ import annotations

from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.scrub import (
    DEFAULT_RULES,
    scrub_report,
    scrub_text,
)
from myhadoop_spark.oracle import duck_connection
from tests.conftest import SF_SMOKE

_DUCK_CHAIN = """
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(text, 'https?://[^\\s]+', '<URL>', 'g'),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
         '\\+?\\d{1,3}[-. ]\\d{2,4}[-. ]\\d{3,4}[-. ]\\d{3,4}\\b',
         '<PHONE>', 'g') AS scrubbed
"""

# the fixture corpus contains NO pii spans (verified: zero URL/email
# matches at every sf — doc_metrics' counters are all-zero columns), so
# a fixture-only differential would be vacuous for replacements; inject
# pii-bearing rows alongside it so the differential exercises both the
# no-false-positive path (fixture) and every rule (injected)
_PII_ROWS = [
    (1_000_001, "contact a.b+tag@ex-ample.co.uk or https://x.y/z?u=me@p.com"),
    (1_000_002, "node 192.168.0.1 answered from 10.0.255.254 fast"),
    (1_000_003, "dial +44-20-7946-0958 or 1-800-555-1234 today"),
    (1_000_004, "mixed http://a.b/c then c.d@e.fg then 8.8.8.8 end"),
]


def test_scrub_matches_duckdb_on_fixture_plus_pii(spark):
    """Bitwise parity with DuckDB's regexp_replace chain over the whole
    fixture corpus (no false positives — the corpus is span-free) PLUS
    injected pii rows (every rule fires)."""
    import pandas as pd

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(_PII_ROWS, "doc_id LONG, text STRING")
    union = docs.unionByName(extra)
    got = {r["doc_id"]: r["s"] for r in
           union.select("doc_id", scrub_text("text").alias("s")).collect()}
    con = duck_connection(SF_SMOKE)
    try:
        pii_pdf = pd.DataFrame(_PII_ROWS, columns=["doc_id", "text"])
        con.register("pii_rows", pii_pdf)
        want = dict(con.execute(f"""
            SELECT doc_id, {_DUCK_CHAIN}
            FROM (SELECT doc_id, text FROM documents
                  UNION ALL SELECT doc_id, text FROM pii_rows)
        """).fetchall())
    finally:
        con.close()
    assert got == want
    # non-vacuity: the injected rows actually changed
    for doc_id, _ in _PII_ROWS:
        assert got[doc_id] != dict(_PII_ROWS)[doc_id]
    # and the fixture rows are untouched (span-free corpus)
    fixture_changed = sum(
        1 for r in docs.select((scrub_text("text") != F.col("text"))
                               .alias("c")).collect() if r["c"])
    assert fixture_changed == 0


def test_crafted_edge_cases(spark):
    rows = [
        (1, "mail me at a.b+tag@ex-ample.co.uk today"),
        (2, "see https://x.y/z?a=1&u=me@place.com trailing"),
        (3, "server 10.0.255.1 port open"),
        (4, "call +1-800-555-1234 now"),
        (5, "no pii here"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r["s"] for r in
           df.select("doc_id", scrub_text("text").alias("s")).collect()}
    assert got[1] == "mail me at <EMAIL> today"
    # URL rule runs first, swallowing the embedded email
    assert got[2] == "see <URL> trailing"
    assert got[3] == "server <IP> port open"
    assert got[4] == "call <PHONE> now"
    assert got[5] == "no pii here"
    assert got[6] == ""
    # audit counters attribute in rule order: the URL-embedded email of
    # row 2 counts as URL only
    rep = {r["doc_id"]: (r["n_url"], r["n_email"], r["n_ip"], r["n_phone"])
           for r in df.select("doc_id", *scrub_report("text")).collect()}
    assert rep[1] == (0, 1, 0, 0)
    assert rep[2] == (1, 0, 0, 0)
    assert rep[3] == (0, 0, 1, 0)
    assert rep[4] == (0, 0, 0, 1)
    assert rep[5] == (0, 0, 0, 0)


def test_report_reconciles_with_doc_metrics(spark):
    """The scrub audit's URL/email counters equal doc_metrics' pinned
    counters on the same corpus (same patterns, counted pre-scrub)."""
    from myhadoop_spark import registry

    docs = load(spark, SF_SMOKE, "documents")
    rep = {r["doc_id"]: (r["n_url"], r["n_email"]) for r in
           docs.select("doc_id", *scrub_report("text")).collect()}
    dm = {r["doc_id"]: (r["n_urls"], r["n_emails"]) for r in
          registry.get("doc_metrics").fn(spark, SF_SMOKE)
          .select("doc_id", "n_urls", "n_emails").collect()}
    assert rep == dm


def test_scrub_is_narrow_plan(spark):
    """The whole chain must stay one codegen projection over the scan —
    no exchange, no Python."""
    import contextlib
    import io

    docs = load(spark, SF_SMOKE, "documents")
    df = docs.select("doc_id", scrub_text("text").alias("s"),
                     *scrub_report("text"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_idempotent(spark):
    """Scrubbing already-scrubbed text is a no-op (placeholders match no
    rule) — safe to re-run in a resumed pipeline."""
    docs = load(spark, SF_SMOKE, "documents")
    once = docs.select("doc_id", scrub_text("text").alias("t"))
    twice = once.select("doc_id", scrub_text("t").alias("t"))
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
