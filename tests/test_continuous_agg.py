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

import pytest

# r14 (VERDICT r13 item 1): heavy parity/property battery — the
# slow tier; see pytest.ini. Run with -m "slow or not slow".
pytestmark = pytest.mark.slow

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

    def _round_sum(canon):
        # the fixture's values are decimal-valued doubles, so the sum
        # is only reproducible up to float reassociation between the
        # materialized and one-shot aggregation trees (~1e-14 relative;
        # monetary exactness is the DECIMAL convention's job,
        # functions/money.py) — every other column stays bitwise
        return {k: (v[0], round(v[1], 9), *v[2:]) for k, v in canon.items()}

    got = _round_sum(_canon(query_rollup(spark, ev, path, bucket="6 hours")))
    want = _round_sum(_canon(_bucketed(ev, "6 hours", ["event_type"])))
    assert got == want and len(want) > 4


def test_query_rollup_is_action_free_and_pruned(spark, tmp_path):
    """The read face must launch ZERO Spark jobs before the returned
    DataFrame executes (watermark/retention are driver-side file reads,
    the floor is a constant-folded expression, the rollup schema is
    supplied explicitly), and the plan must show (a) the ts floor
    pushed into the raw scan and (b) static partition pruning on the
    rollup table's bucket partitions."""
    path = str(tmp_path / "rollup")
    rows = [_ev(m, m % 7, "click", float(m % 11)) for m in range(0, 300, 5)]
    spark.createDataFrame(rows, SCHEMA).write.parquet(str(tmp_path / "ev"))
    ev = spark.read.parquet(str(tmp_path / "ev"))
    refresh_rollup(ev, path)

    sc = spark.sparkContext
    j0 = sc._jsc.sc().dagScheduler().nextJobId()
    q = query_rollup(spark, ev, path)
    j1 = sc._jsc.sc().dagScheduler().nextJobId()
    assert j1 - j0 == 0, "query_rollup ran a driver job before execution"

    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(ts," in plan  # raw-tail scan pushdown
    pf = [ln for ln in plan.splitlines()
          if "PartitionFilters" in ln and "bucket" in ln.split(
              "PartitionFilters")[1][:80]]
    assert any("<" in ln.split("PartitionFilters")[1][:120] for ln in pf), \
        "rollup scan not partition-pruned by the watermark floor"
    assert _canon(q) == _canon(_bucketed(ev, "1 hour", ["event_type"]))


def test_retention_drop_buckets(spark, tmp_path):
    """drop_buckets_before: partitions below the floor are physically
    deleted, the query face over the retained window equals the
    one-shot aggregation over the same window, and a smaller horizon
    is a monotonic no-op."""
    from pathlib import Path

    from myhadoop_spark.operators.continuous_agg import (
        drop_buckets_before,
        read_retention,
    )

    path = str(tmp_path / "rollup")
    rows = [_ev(m, m % 7, t, float(m % 11))
            for m in range(0, 360, 5) for t in ("click", "view")]
    all_events = spark.createDataFrame(rows, SCHEMA)
    refresh_rollup(all_events, path)
    assert len(list(Path(path, "table").glob("bucket=*"))) == 6

    horizon = str(T0 + dt.timedelta(hours=2))
    res = drop_buckets_before(spark, path, horizon)
    assert res["dropped"] == 2
    assert len(list(Path(path, "table").glob("bucket=*"))) == 4

    got = _canon(query_rollup(spark, all_events, path))
    retained = all_events.filter(F.col("ts") >= F.lit(horizon))
    want = _canon(_bucketed(retained, "1 hour", ["event_type"]))
    assert got == want and len(want) == 8  # 4 buckets x 2 types

    # monotonic: shrinking the horizon is a no-op
    res2 = drop_buckets_before(spark, path, str(T0 + dt.timedelta(hours=1)))
    assert res2["dropped"] == 0
    assert read_retention(spark, path) == res["retain_from"]


def test_streaming_raw_store_is_pruned_and_swept(spark, tmp_path):
    """The streaming face's scale contract: the raw landing store is
    partitioned by time bucket, each refresh reads only the tail
    directories (bounded listing), and the sweep deletes directories
    below the watermark floor — so per-batch raw_dirs/raw_files stay
    FLAT as batch history accumulates, and the final rollup still
    equals the one-shot aggregation."""
    from pathlib import Path

    from myhadoop_spark.operators.continuous_agg import start_rollup_stream

    n_batches = 12
    src = str(tmp_path / "src")
    waves = []
    for b in range(n_batches):
        wave = [_ev(b * 60 + m, (b * 7 + m) % 5, "click", float(m % 11))
                for m in range(0, 60, 5)]
        waves.append(wave)
        spark.createDataFrame(wave, SCHEMA).coalesce(1).write.parquet(
            f"{src}/w{b:02d}")

    path = str(tmp_path / "rollup")
    stats: list[dict] = []
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    q = start_rollup_stream(stream, path=path,
                            checkpoint=str(tmp_path / "ckpt"),
                            stats=stats)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(stats) == n_batches
    # flat-cost: once the watermark is established, every refresh reads
    # a bounded tail (the floor bucket + the new batch's buckets), not
    # the accumulated history
    tail_dirs = [s["raw_dirs"] for s in stats[2:]]
    assert max(tail_dirs) <= 3, stats
    assert max(s["raw_files"] for s in stats[2:]) <= 6, stats
    assert sum(s["swept"] for s in stats) >= n_batches - 4
    # the landing store holds only the unswept tail
    left = list(Path(path, "raw").glob("raw_bucket=*"))
    assert len(left) <= 3, [p.name for p in left]

    all_events = spark.createDataFrame(
        [e for w in waves for e in w], SCHEMA)
    got = _canon(query_rollup(spark, all_events, path))
    want = _canon(_bucketed(all_events, "1 hour", ["event_type"]))
    assert got == want and len(want) == n_batches


def test_hierarchical_rollup_is_exact(spark, tmp_path):
    """The coarse (daily) rollup maintained FROM the fine (hourly) one
    must equal the one-shot daily aggregation of the raw stream —
    bitwise, INCLUDING approx_users: HLL sketch union is register-max
    associative, so merging per-hour sketches yields the one-shot
    sketch state."""
    from myhadoop_spark.operators.continuous_agg import refresh_coarser

    fine = str(tmp_path / "hourly")
    coarse = str(tmp_path / "daily")
    rows = [_ev(m, (m * 7) % 23, t, float(m % 11))
            for m in range(0, 3 * 24 * 60, 17) for t in ("click", "view")]
    all_events = spark.createDataFrame(rows, SCHEMA)
    refresh_rollup(all_events, fine)
    refresh_coarser(spark, fine, coarse, dst_bucket="1 day")

    got = _canon(spark.read.parquet(f"{coarse}/table")
                 .select("bucket", "event_type", "n_events", "sum_value",
                         "min_value", "max_value", "approx_users"))
    want = _canon(_bucketed(all_events, "1 day", ["event_type"]))
    assert got == want and len(want) == 6  # 3 days x 2 types


def test_hierarchical_incremental_and_fresh_face(spark, tmp_path):
    """Staged fine refreshes (with an in-horizon late arrival) and
    coarse refreshes after each: the coarse level's query face equals
    the one-shot daily aggregation, old coarse partitions untouched by
    the second refresh."""
    from pathlib import Path

    from myhadoop_spark.operators.continuous_agg import refresh_coarser

    fine = str(tmp_path / "hourly")
    coarse = str(tmp_path / "daily")
    wave1 = [_ev(m, m % 9, "click", float(m % 5))
             for m in range(0, 2 * 24 * 60, 13)]
    wave2 = ([_ev(m, m % 4, "click", float(m % 3))
              for m in range(2 * 24 * 60, 3 * 24 * 60, 11)]
             + [_ev(2 * 24 * 60 - 10, 99, "click", 42.0)])  # late, in horizon

    df1 = spark.createDataFrame(wave1, SCHEMA)
    refresh_rollup(df1, fine)
    refresh_coarser(spark, fine, coarse, dst_bucket="1 day")
    day_parts = sorted(p.name for p in Path(coarse, "table").iterdir()
                       if p.name.startswith("bucket="))
    mtimes = {p: Path(coarse, "table", p).stat().st_mtime_ns
              for p in day_parts}
    assert len(day_parts) == 2

    import time

    time.sleep(0.05)
    all_events = spark.createDataFrame(wave1 + wave2, SCHEMA)
    refresh_rollup(all_events, fine)
    refresh_coarser(spark, fine, coarse, dst_bucket="1 day")
    # day 0 closed well before the coarse floor: byte-untouched
    assert (Path(coarse, "table", day_parts[0]).stat().st_mtime_ns
            == mtimes[day_parts[0]])

    got = _canon(query_rollup(spark, all_events, coarse,
                              bucket="1 day"))
    want = _canon(_bucketed(all_events, "1 day", ["event_type"]))
    assert got == want and len(want) == 3


def test_streaming_maintains_hierarchy(spark, tmp_path):
    """coarse_path in the stream face: the daily level is maintained
    from the hourly one every coarse_every batches, and ends equal to
    the one-shot daily aggregation (skipped batches are absorbed via
    the recorded fine watermark)."""
    from myhadoop_spark.operators.continuous_agg import start_rollup_stream

    n_batches = 6
    src = str(tmp_path / "src")
    waves = []
    for b in range(n_batches):
        wave = [_ev(b * 12 * 60 + m, (b + m) % 7, "click", float(m % 5))
                for m in range(0, 12 * 60, 45)]
        waves.append(wave)
        spark.createDataFrame(wave, SCHEMA).coalesce(1).write.parquet(
            f"{src}/w{b:02d}")

    fine = str(tmp_path / "hourly")
    coarse = str(tmp_path / "daily")
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    q = start_rollup_stream(stream, path=fine,
                            checkpoint=str(tmp_path / "ckpt"),
                            coarse_path=coarse, coarse_every=2)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    all_events = spark.createDataFrame(
        [e for w in waves for e in w], SCHEMA)
    got = _canon(query_rollup(spark, all_events, coarse, bucket="1 day"))
    want = _canon(_bucketed(all_events, "1 day", ["event_type"]))
    assert got == want and len(want) == 3  # 6 half-day batches = 3 days


def test_retention_clamped_by_hierarchy(spark, tmp_path):
    """retention + coarse_path combined (the r6 review's corruption
    finding): an aggressive fine-level retention must NOT reach into
    the coarse recompute window — the daily table still equals the
    one-shot daily aggregation, and the raw sweep keeps directories
    back to the coarse floor so the coarse query face over the raw
    store alone is exact too."""
    from pathlib import Path

    from myhadoop_spark.operators.continuous_agg import start_rollup_stream

    n_batches = 8
    src = str(tmp_path / "src")
    waves = []
    for b in range(n_batches):
        wave = [_ev(b * 6 * 60 + m, (b + m) % 6, "click", float(m % 5))
                for m in range(0, 6 * 60, 20)]
        waves.append(wave)
        spark.createDataFrame(wave, SCHEMA).coalesce(1).write.parquet(
            f"{src}/w{b:02d}")

    fine = str(tmp_path / "hourly")
    coarse = str(tmp_path / "daily")
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    # retention of 2 hours is far inside the 1-day coarse window: the
    # clamp must hold fine buckets back to the coarse floor anyway
    q = start_rollup_stream(stream, path=fine,
                            checkpoint=str(tmp_path / "ckpt"),
                            retention="2 hours",
                            coarse_path=coarse, coarse_every=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    all_events = spark.createDataFrame(
        [e for w in waves for e in w], SCHEMA)
    got = _canon(query_rollup(spark, all_events, coarse, bucket="1 day"))
    want = _canon(_bucketed(all_events, "1 day", ["event_type"]))
    assert got == want and len(want) == 2  # 8 quarter-day batches

    # closed day 0 WAS dropped from the fine level (retention still
    # bites outside the coarse window)...
    fine_parts = [p.name for p in Path(fine, "table").glob("bucket=*")]
    assert len(fine_parts) < 48
    # ...and the coarse query face needs only the RAW STORE for its
    # in-progress day: the sweep kept raw back to the coarse floor
    raw = (spark.read.option("basePath", f"{fine}/raw")
           .parquet(f"{fine}/raw").drop("raw_bucket", "batch_id"))
    got_raw = _canon(query_rollup(spark, raw, coarse, bucket="1 day"))
    assert got_raw == want


def test_sweep_clamped_to_coarse_watermark(spark, tmp_path):
    """The r7 verdict's wrong-answer window: with coarse_every > 1 the
    fine watermark can cross a COARSE bucket boundary on a batch that
    skips refresh_coarser. The raw sweep must floor at the COARSE
    watermark (which lags at the previous coarse refresh), not the
    fine one — otherwise it deletes raw directories the coarse query
    face's raw tail still needs, and the in-progress coarse bucket
    undercounts until the next coarse refresh.

    Five 6-hour batches, coarse_every=2: coarse refreshes run after
    batches 1 and 3; batch 4 crosses the day-1 boundary WITHOUT a
    coarse refresh. The coarse face served from the raw store alone
    must still equal the one-shot daily aggregation."""
    from pathlib import Path

    from myhadoop_spark.operators.continuous_agg import start_rollup_stream

    n_batches = 5  # ends on a batch where refresh_coarser is SKIPPED
    src = str(tmp_path / "src")
    waves = []
    for b in range(n_batches):
        wave = [_ev(b * 6 * 60 + m, (b + m) % 6, "click", float(m % 5))
                for m in range(0, 6 * 60, 20)]
        waves.append(wave)
        spark.createDataFrame(wave, SCHEMA).coalesce(1).write.parquet(
            f"{src}/w{b:02d}")

    fine = str(tmp_path / "hourly")
    coarse = str(tmp_path / "daily")
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    q = start_rollup_stream(stream, path=fine,
                            checkpoint=str(tmp_path / "ckpt"),
                            coarse_path=coarse, coarse_every=2)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # the sweep must have kept every raw dir the coarse face can read:
    # coarse wm recorded at batch 3 is ~23.5h → coarse floor = day 0,
    # so NOTHING below day 0 exists to sweep and all dirs survive
    raw_dirs = list(Path(fine, "raw").glob("raw_bucket=*"))
    assert raw_dirs, "raw store was swept past the coarse watermark"

    all_events = spark.createDataFrame(
        [e for w in waves for e in w], SCHEMA)
    want = _canon(_bucketed(all_events, "1 day", ["event_type"]))

    # the documented coarse monitoring face: raw STORE only (no replay
    # of history) — this is what the unclamped sweep corrupted
    raw = (spark.read.option("basePath", f"{fine}/raw")
           .parquet(f"{fine}/raw").drop("raw_bucket", "batch_id"))
    got_raw = _canon(query_rollup(spark, raw, coarse, bucket="1 day"))
    assert got_raw == want and len(want) == 2


def test_streaming_retention_drops_old_buckets(spark, tmp_path):
    """retention='N hours' in the stream face: rollup buckets older
    than watermark − N are dropped as the stream advances, and the
    query face over the retained window equals the one-shot
    aggregation over the same window."""
    from pathlib import Path

    from myhadoop_spark.operators.continuous_agg import (
        read_retention,
        read_watermark,
        start_rollup_stream,
    )

    n_batches = 8
    src = str(tmp_path / "src")
    waves = []
    for b in range(n_batches):
        wave = [_ev(b * 60 + m, m, "click", float(m % 7))
                for m in range(0, 60, 5)]
        waves.append(wave)
        spark.createDataFrame(wave, SCHEMA).coalesce(1).write.parquet(
            f"{src}/w{b:02d}")

    path = str(tmp_path / "rollup")
    stats: list[dict] = []
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    q = start_rollup_stream(stream, path=path,
                            checkpoint=str(tmp_path / "ckpt"),
                            retention="3 hours", stats=stats)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert sum(s["dropped"] for s in stats) >= 3  # old buckets fell
    retain = read_retention(spark, path)
    assert retain is not None and read_watermark(spark, path) > retain
    kept = sorted(p.name for p in Path(path, "table").glob("bucket=*"))
    assert 0 < len(kept) <= 4, kept  # ~3h horizon + the tail bucket

    all_events = spark.createDataFrame(
        [e for w in waves for e in w], SCHEMA)
    got = _canon(query_rollup(spark, all_events, path))
    retained = all_events.filter(F.col("ts") >= F.lit(retain))
    want = _canon(_bucketed(retained, "1 hour", ["event_type"]))
    assert got == want and got


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
