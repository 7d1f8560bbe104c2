"""Data-quality constraints (operators/constraints.py): planted
violations counted exactly, three-valued logic, and the one-scan
discipline for the row-level battery."""

from __future__ import annotations

import contextlib
import io

from myhadoop_spark.operators.constraints import (
    accepted_values,
    check_constraints,
    foreign_key,
    in_range,
    matches,
    not_null,
    satisfies,
    unique,
)


def _df(spark):
    rows = [
        (1, 10.0, "O", "a@x.io"),
        (2, -5.0, "F", "bad"),        # range violation + pattern
        (3, None, "Z", None),         # range(NULL) + status + pattern
        (None, 20.0, "O", "c@y.org"),  # null key (+ fk)
        (1, 30.0, "P", "d@z.net"),    # duplicate key
    ]
    return spark.createDataFrame(
        rows, "k int, price double, status string, email string")


def test_planted_violations_counted_exactly(spark):
    df = _df(spark)
    ref = spark.createDataFrame([(1,), (3,)], "rk int")
    suite = [
        not_null("k"),
        in_range("price", 0, 100),
        accepted_values("status", ["O", "F", "P"]),
        matches("email", r"^[^@]+@[^@]+\.[a-z]+$"),
        satisfies("price_lt_25", "price < 25"),
        unique("k"),
        foreign_key("k", ref, "rk"),
    ]
    got = {r.constraint: (r.violations, r.n_rows, r.passed)
           for r in check_constraints(df, suite).collect()}
    assert got == {
        "not_null(k)": (1, 5, False),
        "in_range(price, 0, 100)": (2, 5, False),   # -5 and NULL
        "accepted_values(status)": (1, 5, False),
        "matches(email)": (2, 5, False),            # 'bad' and NULL
        # price<25: rows 30.0 and NULL fail (NULL predicate violates)
        "satisfies(price_lt_25)": (2, 5, False),
        "unique(k)": (1, 5, False),                 # one duplicated 1
        # k=2 missing from ref, NULL k violates
        "foreign_key(k)": (2, 5, False),
    }


def test_clean_table_passes(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)],
                               "k int, price double")
    rep = check_constraints(df, [not_null("k"), in_range("price", 0, 9),
                                 unique("k")]).collect()
    assert all(r.passed and r.violations == 0 for r in rep)
    # suite order preserved in the report
    assert [r.constraint for r in rep] == [
        "not_null(k)", "in_range(price, 0, 9)", "unique(k)"]


def test_row_battery_is_one_scan(spark):
    """Every row-level constraint folds into ONE aggregation over ONE
    scan — never a job per check (the Deequ unified-computation
    claim, asserted on the physical plan of the combined agg)."""
    from pyspark.sql import functions as F

    df = _df(spark)
    row_cs = [not_null("k"), in_range("price", 0, 100),
              accepted_values("status", ["O", "F", "P"]),
              matches("email", r".+@.+")]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_, _, cond) in enumerate(row_cs):
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"_v{i}"))
    plan_df = df.agg(*aggs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    import re

    scan_nodes = re.findall(r"^\(\d+\) Scan", plan, re.M)
    assert len(scan_nodes) == 1, plan
    assert "HashAggregate" in plan, plan