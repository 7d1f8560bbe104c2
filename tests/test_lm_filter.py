"""Bigram-LM perplexity filter (operators/lm_filter.py): Python-model
parity (fold order mirrored; ln/exp ulp-tolerant), bitwise
repartition invariance, the filter face, OOV smoothing, and plan
shape. The cross-engine DuckDB differential is the registered ungated
query ``lm_perplexity`` (tests/test_correctness.py)."""

from __future__ import annotations

import contextlib
import io
from collections import Counter
from math import exp, log

from pyspark.sql import functions as F

from myhadoop_spark.operators.lm_filter import (
    ALPHA,
    lm_quality_filter,
    score_perplexity,
    train_bigram_lm,
)

REF = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "a cat and a dog"),
    (3, "the the the"),
    (4, ""),                       # empty ref doc: ignored in counts
]
CAND = [
    (10, "the cat sat on the mat"),          # in-domain: low ppl
    (11, "the dog sat"),
    (12, "zebra quark flux"),                # fully OOV: high ppl
    (13, "the zebra"),                       # seen w1, unseen bigram
    (14, "single"),                          # < 2 tokens: omitted
    (15, ""),                                # empty: omitted
]


def _model(ref_rows, cand_rows, alpha=ALPHA):
    toks = lambda t: [w for w in t.split() if w]  # noqa: E731
    uni: Counter = Counter()
    big: Counter = Counter()
    for _, t in ref_rows:
        ws = toks(t)
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    v = float(len(uni))
    out = {}
    for i, t in cand_rows:
        ws = toks(t)
        if len(ws) < 2:
            continue
        acc = 0.0
        for a, b in zip(ws, ws[1:]):
            lp = log((float(big.get((a, b), 0)) + alpha)
                     / (float(uni.get(a, 0)) + (alpha * v)))
            acc = acc + lp
        out[i] = (len(ws) - 1, exp(-acc / float(len(ws) - 1)))
    return out


def _score(spark, ref, cand, **kw):
    lm = train_bigram_lm(spark.createDataFrame(ref,
                                               "doc_id long, text string"))
    docs = spark.createDataFrame(cand, "doc_id long, text string")
    return {r.doc_id: (r.n_bigrams, r.ppl)
            for r in score_perplexity(docs, lm, **kw).collect()}


def test_matches_python_model(spark):
    want = _model(REF, CAND)
    got = _score(spark, REF, CAND)
    assert set(got) == set(want)
    for i, (nb, ppl) in want.items():
        assert got[i][0] == nb
        # ln/exp may differ in the last ulp between JVM and libm — the
        # numbers are otherwise the same computation in the same order
        assert abs(got[i][1] - ppl) <= 1e-9 * max(1.0, ppl), (i, got[i], ppl)
    assert 14 not in got and 15 not in got
    # semantics: in-domain beats OOV
    assert got[10][1] < got[12][1]
    assert got[13][1] > got[10][1]


def test_bitwise_repartition_invariance(spark):
    """The position-ordered fold makes the SPARK-side result exactly
    reproducible under any partitioning — the determinism contract."""
    lm = train_bigram_lm(spark.createDataFrame(REF,
                                               "doc_id long, text string"))
    docs = spark.createDataFrame(CAND, "doc_id long, text string")
    a = {r.doc_id: (r.n_bigrams, r.ppl)
         for r in score_perplexity(docs, lm).collect()}
    b = {r.doc_id: (r.n_bigrams, r.ppl)
         for r in score_perplexity(docs.repartition(13), lm,
                                   broadcast_lm=True).collect()}
    assert a == b  # BITWISE


def test_filter_face(spark):
    lm = train_bigram_lm(spark.createDataFrame(REF,
                                               "doc_id long, text string"))
    docs = spark.createDataFrame(CAND, "doc_id long, text string")
    scored = {r.doc_id: r.ppl
              for r in score_perplexity(docs, lm).collect()}
    cut = scored[11]  # keep docs at or below doc 11's perplexity
    kept = lm_quality_filter(docs, lm, max_ppl=cut).collect()
    assert {r.doc_id for r in kept} == \
        {i for i, p in scored.items() if p <= cut}
    row = {r.doc_id: r for r in kept}
    assert set(row[10].asDict()) == {"doc_id", "text", "ppl"}
    assert row[10].ppl == scored[10]


def test_broadcast_plan_has_no_candidate_shuffle(spark):
    """broadcast_lm=True: both count joins must be broadcast hash
    joins — no hash-partition Exchange of the candidate bigrams."""
    lm = train_bigram_lm(spark.createDataFrame(REF,
                                               "doc_id long, text string"))
    docs = spark.createDataFrame(CAND, "doc_id long, text string")
    plan_io = io.StringIO()
    with contextlib.redirect_stdout(plan_io):
        score_perplexity(docs, lm, broadcast_lm=True).explain("formatted")
    plan = plan_io.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only hash exchange is the final per-doc aggregation
    hash_ex = [ln for ln in plan.splitlines()
               if "Exchange hashpartitioning" in ln]
    assert len(hash_ex) <= 1, hash_ex


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_word = st.sampled_from(["a", "b", "c", "dd", "eee"])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(_word, max_size=10), min_size=1, max_size=6),
       st.lists(st.lists(_word, max_size=10), min_size=1, max_size=6))
def test_property_matches_model(spark, ref_tokens, cand_tokens):
    ref = [(i, " ".join(ts)) for i, ts in enumerate(ref_tokens)]
    cand = [(100 + i, " ".join(ts)) for i, ts in enumerate(cand_tokens)]
    if not any(len(ts) > 0 for ts in ref_tokens):
        return  # vocabulary empty → no LM to train
    want = _model(ref, cand)
    got = _score(spark, ref, cand)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) <= 1e-9 * max(1.0, want[i][1])


def test_save_load_roundtrip_bitwise(spark, tmp_path):
    from myhadoop_spark.operators.lm_filter import load_lm, save_lm

    lm = train_bigram_lm(spark.createDataFrame(REF,
                                               "doc_id long, text string"))
    save_lm(lm, str(tmp_path / "lm"))
    lm2 = load_lm(spark, str(tmp_path / "lm"))
    assert lm2["vocab_size"] == lm["vocab_size"]
    docs = spark.createDataFrame(CAND, "doc_id long, text string")
    a = {r.doc_id: (r.n_bigrams, r.ppl)
         for r in score_perplexity(docs, lm).collect()}
    b = {r.doc_id: (r.n_bigrams, r.ppl)
         for r in score_perplexity(docs, lm2, broadcast_lm=True).collect()}
    assert a == b  # BITWISE across the persistence round-trip


def test_streaming_scoring_matches_batch(spark, tmp_path):
    """Micro-batched scoring through the stream face must equal
    batch scoring of the same documents, bitwise."""
    import time

    from myhadoop_spark.operators.lm_filter import start_lm_scoring_stream

    lm = train_bigram_lm(spark.createDataFrame(REF,
                                               "doc_id long, text string"))
    docs = spark.createDataFrame(CAND, "doc_id long, text string")
    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = str(tmp_path / "scored")
    q = start_lm_scoring_stream(stream, lm, out_path=out,
                                checkpoint=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        time.sleep(0.2)

    got = {r.doc_id: (r.n_bigrams, r.ppl)
           for r in spark.read.parquet(out).collect()}
    want = {r.doc_id: (r.n_bigrams, r.ppl)
            for r in score_perplexity(docs, lm).collect()}
    assert got == want  # BITWISE


def test_empty_reference_corpus_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="no tokens"):
        train_bigram_lm(spark.createDataFrame(
            [(0, ""), (1, "   ")], "doc_id long, text string"))


def test_streaming_scoring_replay_is_idempotent(spark, tmp_path):
    """Re-delivering a batch (foreachBatch at-least-once) must not
    double-emit: each batch lands as an overwritten batch_id dir."""
    import time

    from myhadoop_spark.operators.lm_filter import start_lm_scoring_stream

    lm = train_bigram_lm(spark.createDataFrame(REF,
                                               "doc_id long, text string"))
    docs = spark.createDataFrame(CAND, "doc_id long, text string")
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    out = str(tmp_path / "scored")

    def run(ckpt):
        stream = (spark.readStream.schema("doc_id long, text string")
                  .parquet(src))
        q = start_lm_scoring_stream(stream, lm, out_path=out,
                                    checkpoint=str(tmp_path / ckpt))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            time.sleep(0.2)

    run("ckpt1")
    first = sorted((r.doc_id, r.n_bigrams, r.ppl)
                   for r in spark.read.parquet(out)
                   .select("doc_id", "n_bigrams", "ppl").collect())
    run("ckpt2")  # fresh checkpoint => the same batch 0 is REPLAYED
    again = sorted((r.doc_id, r.n_bigrams, r.ppl)
                   for r in spark.read.parquet(out)
                   .select("doc_id", "n_bigrams", "ppl").collect())
    assert again == first  # no duplicates — idempotent emit


def test_ccnet_buckets_value_monotone(spark):
    """CCNet tertile labels are VALUE-monotone per language: every
    head ppl <= threshold < every middle ppl, and every middle <= t2 <
    every tail (ties at a threshold all land on the lower bucket)."""
    from myhadoop_spark.queries.lm import ccnet_buckets
    from tests.conftest import SF_SMOKE

    rows = ccnet_buckets(spark, SF_SMOKE).collect()
    assert {r.bucket for r in rows} == {"head", "middle", "tail"}
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, {}).setdefault(r.bucket, []).append(r.ppl)
    for lang, buckets in by_lang.items():
        hi_head = max(buckets.get("head", [float("-inf")]))
        lo_mid = min(buckets.get("middle", [float("inf")]))
        hi_mid = max(buckets.get("middle", [float("-inf")]))
        lo_tail = min(buckets.get("tail", [float("inf")]))
        assert hi_head < lo_mid or not buckets.get("middle"), lang
        assert hi_mid < lo_tail or not buckets.get("tail"), lang
