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
        # one duplicated 1 + the NULL-key row (unknown keys cannot be
        # attested unique — the COUNT(DISTINCT) convention)
        "unique(k)": (2, 5, False),
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
    claim, asserted on the PRODUCTION aggregation the checker runs,
    operators/constraints.py::row_battery)."""
    from myhadoop_spark.operators.constraints import row_battery

    df = _df(spark)
    plan_df = row_battery(df, [
        not_null("k"), in_range("price", 0, 100),
        accepted_values("status", ["O", "F", "P"]),
        matches("email", r".+@.+")])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    import re

    scan_nodes = re.findall(r"^\(\d+\) Scan", plan, re.M)
    assert len(scan_nodes) == 1, plan
    assert "HashAggregate" in plan, plan


def test_empty_table_reports_zero_violations(spark):
    """An empty input (routine for a partition-scoped gate) must
    report passed suites, not crash on NULL sums."""
    df = spark.createDataFrame([], "k int, price double")
    rep = check_constraints(df, [not_null("k"),
                                 in_range("price", 0, 9),
                                 unique("k")]).collect()
    assert [(r.violations, r.n_rows, r.passed) for r in rep] == \
        [(0, 0, True)] * 3


def test_duplicate_constraint_names_rejected(spark):
    import pytest

    df = _df(spark)
    with pytest.raises(ValueError, match="duplicate constraint names"):
        check_constraints(df, [satisfies("x", "price > 0"),
                               satisfies("x", "k > 0")])