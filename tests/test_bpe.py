"""BPE tokenizer (operators/bpe.py): exact training parity with a
pure-Python reference (deterministic tie-break), UDF-vs-driver encode
equality, reconstruction invariant, Arrow plan, and composition with
the packing budget."""

from __future__ import annotations

import contextlib
import io
from collections import Counter

from pyspark.sql import functions as F

import pytest

from myhadoop_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_token_counts,
    encode_word,
    train_bpe,
)

CORPUS = [
    (0, "low lower lowest low low"),
    (1, "newer newest new low"),
    (2, "widest wide wider low lowest"),
    (3, ""),
]


def _train_model(rows, n_merges):
    words = Counter()
    for _, t in rows:
        words.update(w for w in t.split() if w)
    vocab = {w: list(w) + [END] for w in words}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            c = words[w]
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += c
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_training_matches_python_model_exactly(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = train_bpe(docs, n_merges=24)
    want = _train_model(CORPUS, 24)
    assert got == want  # EXACT merge list, order and all
    assert len(got) > 5


def test_encode_udf_equals_driver_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=16)
    got = {r.doc_id: r.bpe_tokens
           for r in bpe_encode(docs, merges).collect()}
    for i, t in CORPUS:
        want = [tok for w in t.split() if w
                for tok in encode_word(w, merges)]
        assert got[i] == want, i


def test_reconstruction_invariant(spark):
    """Joining a word's BPE tokens and stripping the end marker must
    reproduce the original text words — BPE is a segmentation, never
    lossy."""
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=16)
    for r in bpe_encode(docs, merges).collect():
        rebuilt = "".join(r.bpe_tokens).replace(END, " ").split()
        assert rebuilt == [w for w in
                           dict(CORPUS)[r.doc_id].split() if w]


def test_encode_plan_is_arrow(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    plan_io = io.StringIO()
    with contextlib.redirect_stdout(plan_io):
        bpe_encode(docs, [("l", "o")]).explain("formatted")
    plan = plan_io.getvalue()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_token_counts_compose_with_packing(spark):
    """BPE counts are a packing budget like any other: every pack's
    summed BPE tokens respects the budget (single-piece exemption
    aside) — the operators compose."""
    from myhadoop_spark.operators.packing import pack_documents

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=16)
    counts = bpe_token_counts(docs, merges).withColumnRenamed(
        "n_bpe_tokens", "tokens")
    packs = pack_documents(counts.filter(F.col("tokens") > 0),
                           capacity=12).collect()
    assert packs
    total_in = {r.doc_id: r.tokens
                for r in counts.filter(F.col("tokens") > 0).collect()}
    assert sum(r.total_tokens for r in packs) == sum(total_in.values())
    for r in packs:
        assert r.total_tokens <= 12


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_word = st.text(alphabet="abcd", min_size=1, max_size=6)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(_word, min_size=1, max_size=8),
                min_size=1, max_size=5))
@pytest.mark.slow  # r14: heavy parity battery (fast twin stays in the default tier)
def test_property_training_and_encoding_match_model(spark, doc_words):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(doc_words)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=10)
    assert merges == _train_model(rows, 10)
    got = {r.doc_id: r.bpe_tokens
           for r in bpe_encode(docs, merges).collect()}
    for i, t in rows:
        assert got[i] == [tok for w in t.split()
                          for tok in encode_word(w, merges)]


def test_unicode_whitespace_segmentation_matches_training(spark):
    """Training tokenizes with the engine-wide Java \\s+ (ASCII-only),
    so NBSP is a word CHARACTER; the encode UDF must segment the same
    way — 'foo\\xa0bar' is ONE trained word, not two."""
    nbsp_word = "foo\u00a0bar"
    rows = [(0, f"{nbsp_word} {nbsp_word} baz")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=8)
    got = bpe_encode(docs, merges).collect()[0].bpe_tokens
    want = (encode_word(nbsp_word, merges) * 2
            + encode_word("baz", merges))
    assert got == want
