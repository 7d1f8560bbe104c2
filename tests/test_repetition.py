"""Pins for the Gopher repetition battery (queries/repetition.py).

The sf fixtures exercise the happy path through the DuckDB oracle
(`repetition_metrics` is an ungated differential); this file pins the
fold semantics on inputs the fixtures don't contain — tie-breaks
between equally-frequent grams, documents shorter than n, empty text,
and degenerate all-equal token streams — against a pure-Python model of
the oracle's ``ORDER BY c DESC, g DESC`` / ``SUM(c) FILTER (c > 1)``
semantics, plus the narrow-plan contract.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from myhadoop_spark.queries.repetition import (
    DUP_NS, TOP_NS, _dup_fold, _grams, _top_fold,
)


def py_grams(tokens: list[str], n: int) -> list[str]:
    return [" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]


def py_top(tokens: list[str], n: int) -> tuple[int, str]:
    c = Counter(py_grams(tokens, n))
    if not c:
        return 0, ""
    # oracle pick: ORDER BY c DESC, g DESC LIMIT 1
    cnt, gram = max((v, g) for g, v in c.items())
    return cnt, gram


def py_dup(tokens: list[str], n: int) -> int:
    return sum(v for v in Counter(py_grams(tokens, n)).values() if v > 1)


TEXTS = [
    "",                                   # empty
    "one",                                # shorter than every n
    "a b a b a b",                        # period-2 repetition
    "x y x z x y x z",                    # tie: "x y" vs "x z" (2-grams tie)
    "b a b a a b a b",                    # tie where larger gram appears first
    "w w w w w w w w w w",                # degenerate equal tokens
    "the quick brown fox jumps over the lazy dog the quick brown fox",
    "p q r p q r p q r p q r",            # long-period repetition, n=3 heavy
]


def _df(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "id int, text string")
    df = df.withColumn(
        "_toks", F.filter(F.split("text", r"\s+"), lambda t: t != F.lit("")))
    for n in (*TOP_NS, *DUP_NS):
        df = (df.withColumn(f"_top{n}",
                            _top_fold(F.array_sort(_grams(F.col("_toks"), n))))
                .withColumn(f"_dup{n}",
                            _dup_fold(F.array_sort(_grams(F.col("_toks"), n)))))
    return df


def test_folds_match_python_model(spark):
    rows = {r["id"]: r for r in _df(spark).collect()}
    for i, text in enumerate(TEXTS):
        toks = text.split()
        r = rows[i]
        for n in (*TOP_NS, *DUP_NS):
            cnt, gram = py_top(toks, n)
            assert r[f"_top{n}"]["cnt"] == cnt, (i, n, r[f"_top{n}"])
            assert r[f"_top{n}"]["gram"] == gram, (i, n, r[f"_top{n}"])
            assert r[f"_dup{n}"] == py_dup(toks, n), (i, n)


def test_tie_break_is_count_desc_gram_desc(spark):
    """doc 3: 2-grams 'x y' and 'x z' both occur 2×; the oracle picks the
    lexicographically LARGER gram on count ties."""
    r = {x["id"]: x for x in _df(spark).collect()}[3]
    toks = TEXTS[3].split()
    cnt, gram = py_top(toks, 2)
    ties = [g for g, v in Counter(py_grams(toks, 2)).items() if v == cnt]
    assert len(ties) > 1, "fixture must actually contain a tie"
    assert gram == max(ties)
    assert r["_top2"]["gram"] == max(ties)


def test_repetition_plan_is_narrow(spark):
    """One widening round-robin exchange at most (catalog.load_wide on
    the single-split fixture — a no-op on real multi-file data), zero
    Python eval nodes: the battery is a single narrow codegen pass."""
    import contextlib
    import io
    import re

    from myhadoop_spark import registry
    from tests.conftest import SF_SMOKE

    df = registry.get("repetition_metrics").fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 1, plan
    assert "RoundRobin" in plan or n_exchanges == 0, plan
