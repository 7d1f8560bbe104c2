"""Fuzzy benchmark decontamination (queries/fuzzy_decontam.py):
drop-face semantics, guaranteed catch of verbatim copies, threshold
monotonicity, broadcast plan pins."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from myhadoop_spark.queries.dedup import _hashed_token_sets
from myhadoop_spark.queries.fuzzy_decontam import (
    fuzzy_contaminated,
    fuzzy_decontam,
)
from tests.test_plans import plan_of

BENCH_ROWS = [(1001, "alpha beta gamma delta epsilon zeta"),
              (1002, "one two three four five six seven")]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_verbatim_copy_always_caught_and_dropped(spark):
    corpus = _df(spark, [
        (1, "alpha beta gamma delta epsilon zeta"),   # verbatim bench
        (2, "alpha beta gamma delta epsilon theta"),  # 5/7 jaccard hit
        (3, "totally unrelated words live here now"),
    ])
    bench = _df(spark, BENCH_ROWS)
    clean = fuzzy_decontam(spark, corpus, bench)
    kept = {r["doc_id"] for r in clean.collect()}
    # identical token sets have identical band signatures -> the LSH
    # candidate is GUARANTEED, so a verbatim copy can never slip
    assert 1 not in kept
    assert 2 not in kept  # jaccard 5/7 > 0.5, bands share
    assert 3 in kept


def test_report_jaccard_values(spark):
    corpus = _df(spark, [(1, "alpha beta gamma delta epsilon zeta")])
    bench = _df(spark, BENCH_ROWS)
    cs = _hashed_token_sets(spark, "", docs=corpus)
    bs = _hashed_token_sets(spark, "", docs=bench)
    hits = fuzzy_contaminated(spark, cs, bs).collect()
    assert len(hits) == 1
    assert hits[0]["bench_id"] == 1001
    assert hits[0]["jaccard"] == 1.0


def test_threshold_monotone(spark):
    corpus = _df(spark, [
        (i, " ".join(f"w{j}" for j in range(i, i + 8)))
        for i in range(1, 30)])
    bench = _df(spark, [(999, " ".join(f"w{j}" for j in range(5, 13)))])
    cs = _hashed_token_sets(spark, "", docs=corpus)
    bs = _hashed_token_sets(spark, "", docs=bench)
    lo = fuzzy_contaminated(spark, cs, bs, threshold=0.2).count()
    hi = fuzzy_contaminated(spark, cs, bs, threshold=0.8).count()
    assert hi <= lo
    assert lo >= 1  # doc 5 IS the bench doc verbatim


def test_empty_bench_keeps_everything(spark):
    corpus = _df(spark, [(1, "a b c"), (2, "d e f")])
    # a bench doc with no tokens contributes no signatures at all
    bench = _df(spark, [(9, "")])
    clean = fuzzy_decontam(spark, corpus, bench)
    assert clean.count() == 2


def test_plan_broadcasts_bench_and_no_cartesian(spark):
    plan = plan_of(spark, "fuzzy_decontam")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # the bench side (bands + sets) rides broadcast joins
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 2, plan
