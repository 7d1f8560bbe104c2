"""Boilerplate span removal (operators/boilerplate.py): hand-built
ground truth, overlap-of-spans semantics, threshold edges, short/empty
docs, and partitioning invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from myhadoop_spark.operators.boilerplate import (
    boilerplate_grams,
    strip_boilerplate,
)

# "visit our site" appears in 3 docs (df=3 as bigrams "visit our",
# "our site"); unique content differs per doc
DOCS = [
    (1, "alpha beta visit our site gamma"),
    (2, "visit our site delta epsilon"),
    (3, "zeta visit our site"),
    (4, "alpha gamma delta"),           # no boilerplate
    (5, "x"),                           # shorter than the shingle
    (6, ""),                            # empty
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_ground_truth_strip(spark):
    out = {r.doc_id: (r.n_removed, r.clean_text)
           for r in strip_boilerplate(_df(spark), n=2,
                                      min_df=3).collect()}
    # "visit our" and "our site" both have df=3 → positions of
    # visit/our/site are covered in docs 1-3 (overlapping spans merge)
    assert out[1] == (3, "alpha beta gamma")
    assert out[2] == (3, "delta epsilon")
    assert out[3] == (3, "zeta")
    assert out[4] == (0, "alpha gamma delta")
    assert out[5] == (0, "x")
    assert out[6] == (0, "")


def test_threshold_edges(spark):
    df = _df(spark)
    # min_df above any df: nothing stripped, text round-trips
    out = {r.doc_id: r.clean_text
           for r in strip_boilerplate(df, n=2, min_df=4).collect()}
    assert out[1] == "alpha beta visit our site gamma"
    # min_df=1: every bigram is "boilerplate" → docs with >=2 tokens
    # are fully stripped
    out1 = {r.doc_id: (r.n_removed, r.clean_text)
            for r in strip_boilerplate(df, n=2, min_df=1).collect()}
    assert out1[1] == (6, "")
    assert out1[5] == (0, "x")  # shorter than a shingle: untouched


def test_boilerplate_grams_df_counts(spark):
    got = {r.g: r.df for r in
           boilerplate_grams(_df(spark), n=2, min_df=2).collect()}
    assert got == {"visit our": 3, "our site": 3}


def test_partitioning_invariance(spark):
    df = _df(spark)
    a = sorted(map(tuple, strip_boilerplate(df, n=2, min_df=3)
                   .select("doc_id", "n_removed", "clean_text")
                   .collect()))
    b = sorted(map(tuple,
                   strip_boilerplate(df.repartition(5), n=2, min_df=3)
                   .select("doc_id", "n_removed", "clean_text")
                   .collect()))
    assert a == b


def test_duplicate_occurrences_count_one_doc(spark):
    # df counts DISTINCT docs: repeating the shingle inside one doc
    # must not reach min_df=2
    docs = spark.createDataFrame(
        [(1, "spam ham spam ham spam ham"), (2, "other words here")],
        "doc_id long, text string")
    assert boilerplate_grams(docs, n=2, min_df=2).count() == 0
