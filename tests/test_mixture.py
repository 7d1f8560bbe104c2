"""Mixture sampling: composition accuracy, determinism, nesting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.mixture import (
    achieved_mixture,
    mixture_sample,
    plan_mixture,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    """documents with a whitespace token count (the inventory currency)."""
    d = load(spark, SF_SMOKE, "documents")
    toks = F.size(F.filter(F.split(F.col("text"), r"\s+"),
                           lambda t: t != F.lit("")))
    return d.select("doc_id", "source", toks.cast("long").alias("tokens"))


def _sources(docs):
    return [r["source"] for r in docs.select("source").distinct().collect()]


def test_plan_rates_feasible(spark, docs):
    srcs = _sources(docs)
    assert len(srcs) >= 2, "fixture has a single source — test is vacuous"
    weights = {s: 1.0 for s in srcs}
    plan = plan_mixture(docs, weights)
    assert any(abs(p["rate"] - 1.0) < 1e-12 for p in plan.values()), (
        "feasible budget must saturate the scarcest source")
    for p in plan.values():
        assert 0 < p["rate"] <= 1.0


def test_achieved_composition_tracks_targets(spark, docs):
    srcs = sorted(_sources(docs))
    # skewed targets: first source gets 2 shares, the rest 1
    weights = {s: (2.0 if i == 0 else 1.0) for i, s in enumerate(srcs)}
    total_w = sum(weights.values())
    sampled = mixture_sample(docs, weights)
    got = achieved_mixture(sampled)
    for s in srcs:
        target = weights[s] / total_w
        # hash-acceptance sampling on a 500-doc fixture: generous but
        # non-vacuous tolerance (exactness comes with corpus size)
        assert abs(got.get(s, 0.0) - target) < 0.12, (s, got, target)


def test_deterministic_and_repartition_invariant(spark, docs):
    srcs = _sources(docs)
    weights = {s: 1.0 for s in srcs}
    a = sorted(r["doc_id"] for r in mixture_sample(docs, weights).collect())
    b = sorted(r["doc_id"] for r in
               mixture_sample(docs.repartition(13), weights).collect())
    assert a == b and a


def test_nested_budgets_are_subsets(spark, docs):
    srcs = _sources(docs)
    weights = {s: 1.0 for s in srcs}
    full_budget = sum(p["target_tokens"]
                      for p in plan_mixture(docs, weights).values())
    big = {r["doc_id"] for r in mixture_sample(docs, weights).collect()}
    small = {r["doc_id"] for r in
             mixture_sample(docs, weights,
                            token_budget=int(full_budget // 2)).collect()}
    assert small <= big
    assert len(small) < len(big)


def test_unknown_source_rejected(spark, docs):
    with pytest.raises(ValueError, match="absent"):
        plan_mixture(docs, {"no_such_source": 1.0})
    with pytest.raises(ValueError, match="non-positive"):
        plan_mixture(docs, {"x": 0.0})


def test_acceptance_hash_nonnegative_at_int_min(spark):
    """The acceptance uniform must stay in [0, 1) even where hash()
    lands on Integer.MIN_VALUE, where abs() overflows negative (r3
    advice) — pinned on the literal plus a sweep of real ids."""
    from myhadoop_spark.operators.mixture import _DENOM

    row = spark.range(1).select(
        (F.pmod(F.lit(-2147483648), F.lit(_DENOM)) / _DENOM).alias("u")
    ).collect()[0]
    assert 0.0 <= row["u"] < 1.0
    us = (spark.range(50_000)
          .select((F.pmod(F.hash(F.col("id").cast("string"),
                                 F.lit("mixture")), F.lit(_DENOM))
                   / _DENOM).alias("u"))
          .agg(F.min("u").alias("lo"), F.max("u").alias("hi"))
          .collect()[0])
    assert 0.0 <= us["lo"] and us["hi"] < 1.0
