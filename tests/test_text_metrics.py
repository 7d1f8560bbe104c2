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


def test_pattern_counters_vs_duckdb_on_crafted_text(spark):
    """The fixture corpus contains no URLs/emails/non-ASCII, so the
    oracle run only proves 0 == 0; this pins the Java-vs-RE2 regex
    parity on text that actually exercises the counters."""
    import duckdb

    from myhadoop_spark.queries.text import (
        _CLEAN_ASCII_RE, _EMAIL_RE, _URL_RE)

    texts = [
        "visit https://example.com/x?q=1 and http://a.b now",
        "mail me: first.last+tag@sub.example.org or bad@@x",
        "naïve café — ünïcödé",
        "mixed http://u.io text bob@x.co tail\tline\nnext",
        "",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "id int, text string")
    got = {r["id"]: (r["u"], r["e"], r["f"]) for r in df.select(
        "id",
        F.regexp_count("text", F.lit(_URL_RE)).cast("bigint").alias("u"),
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("bigint").alias("e"),
        F.when(F.length("text") == 0, F.lit(0.0)).otherwise(
            F.length(F.regexp_replace("text", _CLEAN_ASCII_RE, ""))
            .cast("double") / F.length("text").cast("double")).alias("f"),
    ).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        u, e, f = con.execute(f"""
            SELECT CAST(len(regexp_extract_all(?, '{_URL_RE}')) AS BIGINT),
                   CAST(len(regexp_extract_all(?, '{_EMAIL_RE}')) AS BIGINT),
                   CASE WHEN length(?) = 0 THEN 0.0
                        ELSE CAST(length(regexp_replace(?,
                               '{_CLEAN_ASCII_RE}', '', 'g')) AS DOUBLE)
                             / CAST(length(?) AS DOUBLE) END
            """, [t] * 5).fetchone()
        assert got[i] == (u, e, f), (t, got[i], (u, e, f))
    # and the counters really fire on this input
    assert sum(u for u, _, _ in got.values()) >= 3
    assert sum(e for _, e, _ in got.values()) >= 2
    assert any(f > 0 for _, _, f in got.values())
