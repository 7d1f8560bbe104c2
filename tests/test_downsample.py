"""LTTB downsampling (operators/downsample.py): parity with an
independently-written reference, endpoint/shape invariants, spike
preservation, and composition with the continuous-aggregate rollup."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from myhadoop_spark.operators.downsample import lttb


def _ref_lttb(points, n_out):
    """Independent reference (written from the paper, not the
    operator): returns the selected (ts, value) list."""
    pts = sorted(points)
    n = len(pts)
    if n_out >= n:
        return pts
    out = [pts[0]]
    every = (n - 2) / (n_out - 2)
    a = 0
    for i in range(n_out - 2):
        r0, r1 = int(i * every) + 1, min(int((i + 1) * every) + 1, n - 1)
        n0, n1 = r1, min(int((i + 2) * every) + 1, n)
        if n1 <= n0:
            n0, n1 = n - 1, n
        cx = sum(p[0] for p in pts[n0:n1]) / (n1 - n0)
        cy = sum(p[1] for p in pts[n0:n1]) / (n1 - n0)
        ax, ay = pts[a]
        best, area_best = r0, -1.0
        for j in range(r0, r1):
            area = abs((ax - cx) * (pts[j][1] - ay)
                       - (ax - pts[j][0]) * (cy - ay))
            if area > area_best:
                best, area_best = j, area
        out.append(pts[best])
        a = best
    out.append(pts[-1])
    return out


def _series(n, f):
    return [(float(i), f(i)) for i in range(n)]


def test_matches_reference_and_keeps_endpoints(spark):
    pts = _series(200, lambda i: math.sin(i / 7.0) * 10 + (i % 13))
    rows = [("k", t, v) for t, v in pts]
    df = spark.createDataFrame(rows, "key string, ts double, value double")
    got = sorted((r.ts, r.value) for r in lttb(df, n_out=20).collect())
    want = sorted(_ref_lttb(pts, 20))
    assert got == want
    assert len(got) == 20
    assert got[0] == pts[0] and got[-1] == pts[-1]


def test_short_series_pass_through_and_keys_independent(spark):
    rows = ([("a", float(i), float(i)) for i in range(5)]
            + [("b", float(i), math.cos(i / 3.0)) for i in range(100)])
    df = spark.createDataFrame(rows, "key string, ts double, value double")
    out = lttb(df, n_out=10).collect()
    a = sorted((r.ts, r.value) for r in out if r.key == "a")
    b = [(r.ts, r.value) for r in out if r.key == "b"]
    assert len(a) == 5  # shorter than n_out: untouched
    assert len(b) == 10
    assert sorted(b) == sorted(
        _ref_lttb([(float(i), math.cos(i / 3.0)) for i in range(100)], 10))


def test_spike_is_preserved(spark):
    """The reason LTTB exists: a single extreme spike must survive
    aggressive downsampling (naive bucket-means would flatten it)."""
    pts = [(float(i), 1.0) for i in range(500)]
    pts[250] = (250.0, 1000.0)
    df = spark.createDataFrame([("k", t, v) for t, v in pts],
                               "key string, ts double, value double")
    got = {(r.ts, r.value) for r in lttb(df, n_out=12).collect()}
    assert (250.0, 1000.0) in got


def test_composes_with_rollup(spark, tmp_path):
    """The deployment shape: downsample the ROLLUP (bounded per-key
    series), not raw events."""
    from myhadoop_spark.catalog import load
    from myhadoop_spark.operators.continuous_agg import (
        query_rollup,
        refresh_rollup,
    )
    from tests.conftest import SF_SMOKE

    events = load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "rollup")
    refresh_rollup(events, path)
    # bucket passed AS A TIMESTAMP — lttb coerces internally (the
    # review-found crash mode), output keeps the timestamp type
    roll = (query_rollup(spark, events, path)
            .select(F.col("event_type").alias("key"),
                    F.col("bucket").alias("ts"),
                    F.col("n_events").cast("double").alias("value")))
    per_key_in = {r.key: r.n for r in
                  roll.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
                  .collect()}
    out = lttb(roll, n_out=10).collect()
    per_key_out = {}
    for r in out:
        per_key_out[r.key] = per_key_out.get(r.key, 0) + 1
    assert per_key_out == {k: min(10, n) for k, n in per_key_in.items()}
    in_pts = {(r.key, r.ts, r.value) for r in roll.collect()}
    assert all((r.key, r.ts, r.value) in in_pts for r in out)
