"""Bloom-filter membership (operators/bloom.py): no-false-negative
guarantee, bounded false positives, mergeability, and the broadcast
probe plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

import pytest

from myhadoop_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
    bloom_probe_sharded,
)


def _items(spark, lo: int, hi: int):
    return (spark.range(lo, hi)
            .select(F.concat(F.lit("item-"), F.col("id")).alias("val")))


def test_no_false_negatives(spark):
    seen = _items(spark, 0, 1000)
    bloom = bloom_build(seen, "val")
    probed = bloom_probe(seen, "val", bloom, id_cols=["val"])
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_false_positive_rate_bounded(spark):
    """n=1000, m=2^20, k=5 → theoretical FP ~ (1-e^(-kn/m))^k ≈ 2e-12;
    assert the observed rate on 10k disjoint probes is far under the
    1% design point."""
    bloom = bloom_build(_items(spark, 0, 1000), "val")
    novel = (spark.range(0, 10_000)
             .select(F.concat(F.lit("other-"), F.col("id")).alias("val")))
    fp = bloom_probe(novel, "val", bloom, id_cols=["val"]) \
        .filter(F.col("bloom_hit")).count()
    assert fp / 10_000 < 0.01


def test_filter_is_mergeable(spark):
    """OR-merging two independently built filters equals building one
    over the union — the property that makes incremental/streaming
    maintenance correct."""
    fa = bloom_build(_items(spark, 0, 500), "val")
    fb = bloom_build(_items(spark, 500, 1000), "val")
    merged = (fa.unionByName(fb)
              .groupBy("word_idx").agg(F.bit_or("word").alias("word")))
    direct = bloom_build(_items(spark, 0, 1000), "val")
    sym_diff = (merged.join(direct, ["word_idx", "word"], "full")
                .filter(F.col("word_idx").isNull() | F.col("word").isNull()))
    assert merged.count() == direct.count()
    assert (merged.exceptAll(direct).count() == 0
            and direct.exceptAll(merged).count() == 0)
    _ = sym_diff


def test_probe_plan_broadcasts_filter(spark):
    bloom = bloom_build(_items(spark, 0, 100), "val")
    plan_io = io.StringIO()
    with contextlib.redirect_stdout(plan_io):
        bloom_probe(_items(spark, 0, 200), "val", bloom,
                    id_cols=["val"]).explain("formatted")
    plan = plan_io.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


@pytest.mark.slow  # r14: heavy parity battery (fast twin stays in the default tier)
def test_sharded_probe_equals_single_filter(spark):
    """The 12 GB-filter code path: range-sharding the word table and
    AND-combining per-shard verdicts must answer EXACTLY like the
    whole-filter broadcast — same ids, same hit booleans — on a probe
    mix of seen, novel, and boundary values, for several shard counts
    (including one that doesn't divide the word count)."""
    bloom = bloom_build(_items(spark, 0, 1000), "val")
    mixed = (_items(spark, 500, 1500)  # 500 seen + 500 novel
             .unionByName(_items(spark, 0, 3)))
    single = {r.val: r.bloom_hit
              for r in bloom_probe(mixed, "val", bloom,
                                   id_cols=["val"]).collect()}
    for n_shards in (2, 7, 32):
        sharded = {r.val: r.bloom_hit
                   for r in bloom_probe_sharded(
                       mixed, "val", bloom, n_shards=n_shards,
                       id_cols=["val"]).collect()}
        assert sharded == single, n_shards


def test_sharded_probe_no_false_negatives(spark):
    seen = _items(spark, 0, 1000)
    bloom = bloom_build(seen, "val")
    probed = bloom_probe_sharded(seen, "val", bloom, n_shards=4,
                                 id_cols=["val"])
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_gate_query_semantics(spark):
    """The registered bloom_dedup query: every seen doc hits (no false
    negatives); the summary checksums are consistent across the rows."""
    from myhadoop_spark.registry import get
    from tests.conftest import SF_SMOKE

    out = get("bloom_dedup").fn(spark, SF_SMOKE).collect()
    assert len(out) == 500
    seen_hits = [r.bloom_hit for r in out if r.doc_id % 5 != 0]
    assert all(seen_hits)
    assert len({(r.filter_xor, r.n_bits_set) for r in out}) == 1
    assert out[0].n_bits_set > 0
