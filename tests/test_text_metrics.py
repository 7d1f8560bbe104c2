"""Edge-case tests for the doc_metrics repetition + winnowing helpers.

The sf fixtures exercise the happy path through the DuckDB oracle; this
file pins the narrow-expression helpers against a pure-Python model on
inputs the fixtures don't contain: empty text, text shorter than the
k-gram / window sizes, and degenerate all-equal strings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myhadoop_spark.queries.text import (
    _WIN_K, _WIN_M, _WIN_POWERS, _WIN_W,
    _kgram_hashes, _max_run, _window_mins,
)


def py_winnow(text: str) -> list[int]:
    codes = [ord(c) for c in text]
    kh = [
        sum(codes[i + j] * p for j, p in enumerate(_WIN_POWERS)) % _WIN_M
        for i in range(len(codes) - _WIN_K + 1)
    ]
    return [min(kh[i:i + _WIN_W]) for i in range(len(kh) - _WIN_W + 1)]


def py_max_run(seq: str | list) -> int:
    best = run = 0
    prev = object()
    for x in seq:
        run = run + 1 if x == prev else 1
        best = max(best, run)
        prev = x
    return best


TEXTS = [
    "",                      # empty
    "a",                     # shorter than k
    "abcd",                  # k-1 chars: no grams
    "abcde",                 # exactly k: one gram, no full window
    "abcdefgh",              # k+w-1: exactly one window
    "aaaaaaaaaa",            # degenerate equal chars
    "the quick brown fox jumps over the lazy dog",
    "naïve café — unicode",  # non-ASCII code points
]


def _winnow_df(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "id int, text string")
    codes = F.transform(
        F.filter(F.split("text", ""), lambda c: c != F.lit("")), F.ascii)
    return (df.withColumn("_codes", codes)
              .withColumn("_kh", _kgram_hashes(F.col("_codes")))
              .withColumn("sel", _window_mins(F.col("_kh"))))


def test_winnow_matches_python_model(spark):
    rows = {r["id"]: r["sel"] for r in _winnow_df(spark).collect()}
    for i, t in enumerate(TEXTS):
        assert rows[i] == py_winnow(t), (t, rows[i], py_winnow(t))


def test_winnow_degenerate_text_is_single_fingerprint(spark):
    rows = {r["id"]: r["sel"] for r in _winnow_df(spark).collect()}
    sel = rows[TEXTS.index("aaaaaaaaaa")]
    assert len(set(sel)) == 1  # one distinct fingerprint for aaaa...


def test_max_run_matches_python_model(spark):
    strs = ["", "a", "ab", "aab", "abba", "aaab", "xxyyyx", "aaaaaaaa"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strs)],
                               "id int, s string")
    chars = F.filter(F.split("s", ""), lambda c: c != F.lit(""))
    got = {r["id"]: r["m"]
           for r in df.select("id", _max_run(chars).alias("m")).collect()}
    for i, s in enumerate(strs):
        assert got[i] == py_max_run(s), (s, got[i])


def test_max_run_over_sorted_tokens_is_max_multiplicity(spark):
    toks = [["b", "a", "b", "c", "b"], [], ["x"], ["y", "y"]]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(toks)],
                               "id int, toks array<string>")
    got = {r["id"]: r["m"]
           for r in df.select(
               "id", _max_run(F.array_sort("toks")).alias("m")).collect()}
    expect = [3, 0, 1, 2]
    for i, e in enumerate(expect):
        assert got[i] == e, (toks[i], got[i])
