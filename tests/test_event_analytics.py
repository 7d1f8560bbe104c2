"""Event analytics (queries/event_analytics.py): the ordered-funnel
strictness contract and the retention-triangle semantics on hand-built
event streams (the fixture-level DuckDB differentials run in
tests/test_correctness.py via the ungated-oracle path)."""

from __future__ import annotations

import datetime as dt

import myhadoop_spark.queries.event_analytics as ea
from pyspark.sql import functions as F

SCHEMA = "user_id long, event_type string, ts timestamp"
T0 = dt.datetime(2024, 1, 1)


def _t(h):
    return T0 + dt.timedelta(hours=h)


def _run_funnel(spark, monkeypatch, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    monkeypatch.setattr(ea, "load", lambda s, d, t: df)
    return {r.step_name: r.n_users
            for r in ea.funnel_steps(spark, "ignored").collect()}


def test_funnel_requires_strict_order(spark, monkeypatch):
    rows = [
        # user 1 completes the whole funnel in order
        (1, "view", _t(0)), (1, "click", _t(1)), (1, "purchase", _t(2)),
        # user 2 purchases BEFORE clicking: the early purchase is dead
        # (not after their first click), but the click itself — after
        # the view — still advances them to step 2
        (2, "view", _t(0)), (2, "purchase", _t(1)), (2, "click", _t(2)),
        # user 3 clicks before viewing: the pre-view click is dead, but
        # a later click after the view still advances them
        (3, "click", _t(0)), (3, "view", _t(1)), (3, "click", _t(2)),
        # user 4 only views
        (4, "view", _t(0)),
        # user 5 never views: contributes nothing, even with a purchase
        (5, "purchase", _t(0)),
    ]
    got = _run_funnel(spark, monkeypatch, rows)
    assert got == {"view": 4, "click": 3, "purchase": 1}


def test_funnel_same_timestamp_does_not_advance(spark, monkeypatch):
    """ts > prev is STRICT: a click at exactly the first-view instant
    is not 'after' it."""
    rows = [(1, "view", _t(0)), (1, "click", _t(0))]
    got = _run_funnel(spark, monkeypatch, rows)
    assert got == {"view": 1, "click": 0, "purchase": 0}


def test_cohort_retention_triangle(spark, monkeypatch):
    rows = [
        # user 1: first seen day 0, active days 0 and 2
        (1, "view", _t(1)), (1, "click", _t(48 + 3)),
        # user 2: first seen day 0, active day 0 only (two events)
        (2, "view", _t(2)), (2, "view", _t(3)),
        # user 3: first seen day 1, active days 1 and 2
        (3, "view", _t(25)), (3, "view", _t(49)),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    monkeypatch.setattr(ea, "load", lambda s, d, t: df)
    got = {(str(r.cohort), r.day_offset): r.n_users
           for r in ea.cohort_retention(spark, "ignored").collect()}
    assert got == {
        ("2024-01-01", 0): 2,   # users 1 and 2 on their cohort day
        ("2024-01-01", 2): 1,   # user 1 returns two days later
        ("2024-01-02", 0): 1,   # user 3's cohort day
        ("2024-01-02", 1): 1,   # user 3 returns next day
    }


def test_funnel_plan_shares_one_partitioning(spark, monkeypatch):
    """Every aggregate/join in the cascade keys on user_id, so the
    whole plan must not re-shuffle per step on anything else."""
    rows = [(i % 5, t, _t(i)) for i, t in
            enumerate(["view", "click", "purchase"] * 10)]
    df = spark.createDataFrame(rows, SCHEMA)
    monkeypatch.setattr(ea, "load", lambda s, d, t: df)
    plan = (ea.funnel_steps(spark, "x")
            ._jdf.queryExecution().executedPlan().toString())
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "user_id" in ln, ln


def test_rollup_anomaly_flags_planted_spike(spark):
    """A flat 10-events-per-hour series with one 100-event hour: only
    the spike hour is flagged (positive z), and the hours AFTER it are
    not dragged into false alarms by their contaminated baseline
    (24-bucket window dilutes one spike below the threshold)."""
    import datetime as dt

    from myhadoop_spark.queries.event_analytics import (
        _ANOM_W,
        rollup_anomaly,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(80):
        n = 100 if h == 50 else 10
        for i in range(n):
            rows.append((eid, t0 + dt.timedelta(hours=h, minutes=i % 60),
                         eid % 7, "tick", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

    import myhadoop_spark.catalog as catalog

    orig = catalog.load
    try:
        catalog.load = lambda s, sf, name: df  # the query's one input
        import myhadoop_spark.queries.event_analytics as ea

        ea_load = ea.load
        ea.load = lambda s, sf, name: df
        try:
            out = rollup_anomaly(spark, "unused").collect()
        finally:
            ea.load = ea_load
    finally:
        catalog.load = orig
    flagged = {(r.bucket.hour + (r.bucket.day - 1) * 24): r.z
               for r in out}
    assert 50 in flagged and flagged[50] > 2.0
    assert all(h == 50 for h in flagged), flagged
    # warm-up hours (incomplete trailing window) are never scored
    assert all(h >= _ANOM_W for h in flagged)
