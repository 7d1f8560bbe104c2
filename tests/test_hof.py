"""let-binding combinator (operators/hof.py): value semantics are
transparent (let(v, f) == f(v) including NULL flow), and the r13
rewrites that adopted it (word_lines, clean_lines, within_doc_dedup)
stay bitwise-equal to the straight-line expression shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from myhadoop_spark.operators.hof import let


def test_let_is_value_transparent(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "")], "id long, s string")
    out = df.select(
        "id",
        let(F.split("s", " "),
            lambda a: F.struct(F.size(a).alias("n"),
                               F.array_join(a, "|").alias("j"),
                               F.concat(F.array_join(a, "|"), F.lit("+"),
                                        F.size(a).cast("string"))
                               .alias("both"))).alias("s2"),
    ).select("id", "s2.*").orderBy("id").collect()
    assert [(r.n, r.j, r.both) for r in out] == [
        (3, "a|b|c", "a|b|c+3"),
        (None, None, None),  # NULL input flows through unchanged
        (1, "", "+1"),
    ]


def test_let_nested_binding(spark):
    df = spark.createDataFrame([("x y x z",)], "s string")
    # outer binds the token array, inner binds the distinct array;
    # both referenced multiple times
    expr = let(
        F.split("s", " "),
        lambda toks: let(
            F.array_distinct(toks),
            lambda d: F.struct(
                F.size(toks).alias("n"),
                F.size(d).alias("nd"),
                F.array_join(d, ",").alias("dj"))))
    r = df.select(expr.alias("o")).select("o.*").head()
    assert (r.n, r.nd, r.dj) == (4, 3, "x,y,z")


def test_within_doc_dedup_max_lines_guard(spark):
    from myhadoop_spark.operators.line_dedup import within_doc_dedup

    docs = spark.createDataFrame(
        [(1, ["a", "b", "a", "c"])], "doc_id long, _l array<string>")
    ok = within_doc_dedup(docs, lines_col="_l", max_lines=4).head()
    assert (ok.n_lines, ok.n_kept, ok.clean_text) == (4, 3, "a\nb\nc")
    with pytest.raises(Exception, match="max_lines"):
        within_doc_dedup(docs, lines_col="_l", max_lines=3).collect()
    with pytest.raises(ValueError, match="max_lines"):
        within_doc_dedup(docs, lines_col="_l", max_lines=0)


def test_within_doc_dedup_guard_survives_pruning(spark):
    # column pruning must not drop the in-plan assert: selecting a
    # single base column still trips the guard (the budget 1-row
    # contract pattern)
    from myhadoop_spark.operators.line_dedup import within_doc_dedup

    docs = spark.createDataFrame(
        [(1, ["a", "b", "a", "c"])], "doc_id long, _l array<string>")
    out = within_doc_dedup(docs, lines_col="_l", max_lines=3)
    with pytest.raises(Exception, match="max_lines"):
        out.select("doc_id").collect()
