"""Misra-Gries heavy hitters: error bounds vs exact counts, merge
correctness, and the summary-size guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.heavy_hitters import (
    heavy_hitters_topk,
    mg_summaries,
)

N = 60_000
CAPACITY = 64


@pytest.fixture(scope="module")
def zipf_terms(spark):
    """Zipf-ish skew without RNG: term id = id mod (id-dependent cap) —
    term_j frequency ~ N/(j+1)-shaped tail with few dominant heads."""
    return (spark.range(N)
            .select(F.concat(
                F.lit("t"),
                (F.col("id") % (F.col("id") % 97 + 3)).cast("string"))
                .alias("term"))
            .repartition(8))


def test_bounds_hold_for_every_term(spark, zipf_terms):
    exact = {r["term"]: r["n"] for r in
             zipf_terms.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    top = heavy_hitters_topk(zipf_terms, k=10, capacity=CAPACITY).collect()
    assert len(top) == 10
    err = top[0]["err_bound"]
    assert err > 0
    for r in top:
        t = exact[r["term"]]
        assert r["est"] <= t <= r["est"] + err, (r, t)


def test_true_heavy_hitters_survive(spark, zipf_terms):
    """Every term with true count > err_bound must be present in the
    merged summary (the MG survival guarantee, summed across
    partitions)."""
    exact = {r["term"]: r["n"] for r in
             zipf_terms.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    s = mg_summaries(zipf_terms, capacity=CAPACITY)
    merged = {r["term"] for r in s.select("term").distinct().collect()}
    err = (heavy_hitters_topk(zipf_terms, k=1, capacity=CAPACITY)
           .first()["err_bound"])
    for t, n in exact.items():
        if n > err:
            assert t in merged, (t, n, err)


def test_topk_matches_exact_on_dominant_heads(spark, zipf_terms):
    """The terms whose exact counts clear err_bound by a margin must
    appear in the approximate top-k, in exact-count order."""
    exact = sorted(
        ((r["n"], r["term"]) for r in zipf_terms.groupBy("term")
         .agg(F.count(F.lit(1)).alias("n")).collect()), reverse=True)
    top = heavy_hitters_topk(zipf_terms, k=10, capacity=CAPACITY).collect()
    err = top[0]["err_bound"]
    approx_terms = [r["term"] for r in top]
    # heads separated from the k+1-th true count by > err are guaranteed
    kth = exact[10][0] if len(exact) > 10 else 0
    for n, t in exact[:10]:
        if n - kth > err:
            assert t in approx_terms, (t, n, err)


def test_summary_is_bounded(spark, zipf_terms):
    s = mg_summaries(zipf_terms, capacity=CAPACITY)
    per_part = (s.groupBy("part_id").agg(F.count(F.lit(1)).alias("n"))
                .collect())
    assert per_part
    for r in per_part:
        assert r["n"] <= CAPACITY, r
    # total bound rows: partitions x capacity, not vocabulary size
    assert s.count() <= 8 * CAPACITY


def test_exact_when_capacity_exceeds_vocab(spark):
    """With capacity > distinct terms, MG degenerates to exact counting
    and err contributions are pure integer-division floor — top-k counts
    equal the exact groupBy."""
    df = (spark.range(3_000)
          .select((F.col("id") % 7).cast("string").alias("term"))
          .repartition(4))
    exact = {r["term"]: r["n"] for r in
             df.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()}
    top = heavy_hitters_topk(df, k=7, capacity=1000).collect()
    assert {r["term"]: r["est"] for r in top} == exact


def test_emptied_partition_still_feeds_error_bound(spark):
    """capacity=1 over a perfectly alternating [a, b] stream ends every
    decrement-all with an empty counter table; the partition must still
    contribute its total to err_bound (r3 advice: the bound was silently
    dropping such partitions, breaking est <= true <= est + err)."""
    df = (spark.range(1_000)
          .select(F.when(F.col("id") % 2 == 0, "a").otherwise("b")
                  .alias("term"))
          .repartition(4))
    s = mg_summaries(df, capacity=1)
    rows = s.collect()
    # every non-empty partition is represented, counters or not
    assert {r["part_id"] for r in rows} and \
        sum({r["part_id"]: r["part_total"] for r in rows}.values()) == 1_000
    exact = {r["term"]: r["n"] for r in
             df.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()}
    top = heavy_hitters_topk(df, k=2, capacity=1).collect()
    # sentinel NULL terms never surface in the top-k output
    assert all(r["term"] is not None for r in top)
    for r in top:
        assert r["est"] <= exact[r["term"]] <= r["est"] + r["err_bound"], r


def test_bounds_and_head_on_zipf_corpus(spark):
    """The same guarantees over a REALISTIC token stream: the r5
    Zipfian synthetic corpus (log-uniform rank draw — an actual
    heavy-head vocabulary, not the arithmetic mod pattern above).
    Bounds must hold per term and the recovered head must be the true
    head (w0 leads; the top-5 estimates clear err_bound)."""
    from myhadoop_spark.sources.synthetic import register

    register(spark)
    toks = (spark.read.format("synthetic_docs")
            .option("rows", 4000).option("vocabSize", 20_000)
            .option("zipf", "true").option("numPartitions", 8)
            .load()
            .select(F.explode(F.split("text", " ")).alias("term")))
    exact = {r["term"]: r["n"] for r in
             toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    top = heavy_hitters_topk(toks, k=10, capacity=CAPACITY).collect()
    err = top[0]["err_bound"]
    for r in top:
        t = exact[r["term"]]
        assert r["est"] <= t <= r["est"] + err, (r, t)
    # the true head is recovered in order
    assert top[0]["term"] == "w0"
    true_top = sorted(exact, key=lambda t: (-exact[t], t))[:3]
    assert [r["term"] for r in top[:3]] == true_top
    # the head is a genuine heavy hitter, not noise around the bound
    assert top[0]["est"] > err
