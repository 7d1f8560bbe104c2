"""Continuous aggregate / hypertable rollup (operators/continuous_agg):
the refresh-schedule invariant — after any sequence of incremental
refreshes whose late arrivals respect the horizon, the query face
equals the one-shot aggregation over all events — plus between-refresh
freshness, bucket-atomic refresh behavior, and the pruned scale shape.

Values are integer-valued doubles so double sums are order-exact
(monetary data would use the DECIMAL convention, functions/money.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from myhadoop_spark.operators.continuous_agg import (
    _bucketed,
    query_rollup,
    read_watermark,
    refresh_rollup,
)

SCHEMA = "ts timestamp, user_id long, event_type string, value double"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(minutes: int, user: int, etype: str, value: float):
    return (T0 + dt.timedelta(minutes=minutes), user, etype, value)


def _canon(df):
    return {(r.bucket, r.event_type):
            (r.n_events, r.sum_value, r.min_value, r.max_value,
             r.approx_users)
            for r in df.collect()}


def test_incremental_refreshes_equal_one_shot(spark, tmp_path):
    path = str(tmp_path / "rollup")
    batch1 = [_ev(m, m % 7, t, float(m % 11))
              for m in range(0, 120, 5) for t in ("click", "view")]
    batch2 = ([_ev(m, m % 5, "click", float(m % 3))
               for m in range(120, 180, 7)]
              + [_ev(100, 99, "view", 42.0)])  # late, within the horizon

    df1 = spark.createDataFrame(batch1, SCHEMA)
    refresh_rollup(df1, path)
    assert read_watermark(spark, path) is not None

    all_events = spark.createDataFrame(batch1 + batch2, SCHEMA)
    refresh_rollup(all_events, path)

    got = _canon(query_rollup(spark, all_events, path))
    want = _canon(_bucketed(all_events, "1 hour", ["event_type"]))
    assert got == want and got


def test_query_is_fresh_between_refreshes(spark, tmp_path):
    """Events arriving AFTER the last refresh must still appear in the
    query face (the raw-tail union)."""
    path = str(tmp_path / "rollup")
    batch1 = [_ev(m, m, "click", 1.0) for m in range(0, 120, 10)]
    df1 = spark.createDataFrame(batch1, SCHEMA)
    refresh_rollup(df1, path)

    batch2 = [_ev(m, m, "click", 2.0) for m in range(120, 200, 10)]
    all_events = spark.createDataFrame(batch1 + batch2, SCHEMA)
    got = _canon(query_rollup(spark, all_events, path))  # NO refresh
    want = _canon(_bucketed(all_events, "1 hour", ["event_type"]))
    assert got == want


def test_refresh_touches_only_stale_buckets(spark, tmp_path):
    """The second refresh must rewrite only buckets at/after the
    watermark's bucket floor — old partitions keep their files
    (bucket-atomic dynamic overwrite)."""
    from pathlib import Path

    path = str(tmp_path / "rollup")
    batch1 = [_ev(m, m, "click", 1.0) for m in range(0, 240, 10)]
    refresh_rollup(spark.createDataFrame(batch1, SCHEMA), path)
    parts = sorted(p.name for p in Path(path, "table").iterdir()
                   if p.name.startswith("bucket="))
    mtimes = {p: (Path(path, "table", p).stat().st_mtime_ns)
              for p in parts}
    assert len(parts) == 4  # 4 hourly buckets

    batch2 = [_ev(m, m, "click", 3.0) for m in range(240, 300, 10)]
    import time
    time.sleep(0.05)
    refresh_rollup(spark.createDataFrame(batch1 + batch2, SCHEMA), path)
    parts2 = sorted(p.name for p in Path(path, "table").iterdir()
                    if p.name.startswith("bucket="))
    assert len(parts2) == 5
    # the first two buckets (well before the watermark floor) untouched
    for p in parts[:2]:
        assert Path(path, "table", p).stat().st_mtime_ns == mtimes[p], p


def test_fixture_events_roundtrip(spark, tmp_path):
    """The real events fixture through the same invariant: split by
    event_id parity as two arrival waves (ts order ignored — the
    horizon logic must still converge after the final refresh because
    refresh recomputes from the bucket floor of the stored watermark,
    and the second wave re-reads everything at/after it)."""
    from myhadoop_spark.catalog import load
    from tests.conftest import SF_SMOKE

    ev = (load(spark, SF_SMOKE, "events")
          .select("ts", "user_id", "event_type",
                  F.col("value").cast("double").alias("value")))
    path = str(tmp_path / "rollup")
    # wave 1: the chronologically FIRST half (a valid arrival order)
    cutoff = ev.agg(F.expr("percentile(CAST(ts AS DOUBLE), 0.5)")).first()[0]
    wave1 = ev.filter(F.col("ts").cast("double") <= cutoff)
    refresh_rollup(wave1, path, bucket="6 hours", lateness="1 hour")
    refresh_rollup(ev, path, bucket="6 hours", lateness="1 hour")
    got = _canon(query_rollup(spark, ev, path, bucket="6 hours"))
    want = _canon(_bucketed(ev, "6 hours", ["event_type"]))
    assert got == want and len(want) > 4


def test_streaming_maintenance_equals_one_shot(spark, tmp_path):
    """The stream face: micro-batched arrival (including an
    out-of-order batch within the horizon) must leave a rollup whose
    query face equals the one-shot aggregation."""
    from myhadoop_spark.operators.continuous_agg import start_rollup_stream

    b1 = [_ev(m, m % 7, "click", float(m % 11)) for m in range(0, 120, 5)]
    b2 = ([_ev(m, m % 5, "view", float(m % 3)) for m in range(120, 180, 7)]
          + [_ev(100, 99, "view", 42.0)])  # late, within horizon
    src = str(tmp_path / "src")
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(
        f"{src}/w1")
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(
        f"{src}/w2")

    path = str(tmp_path / "rollup")
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    q = start_rollup_stream(stream, path=path,
                            checkpoint=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    all_events = spark.createDataFrame(b1 + b2, SCHEMA)
    got = _canon(query_rollup(spark, all_events, path))
    want = _canon(_bucketed(all_events, "1 hour", ["event_type"]))
    assert got == want and got
