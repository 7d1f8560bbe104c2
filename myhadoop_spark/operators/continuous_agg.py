"""Continuous aggregate (hypertable rollup) — the TimescaleDB
continuous-aggregate / materialized-rollup pattern: a time-bucketed
aggregate TABLE maintained incrementally, plus a query face that
serves materialized buckets and computes only the un-materialized tail
from raw events.

Why it exists at 100 TB: dashboards and monitors re-ask the same
bucketed aggregation endlessly; recomputing it from the raw event
stream re-scans the corpus every time. The rollup table holds one row
per (bucket, key) — orders of magnitude smaller — and each refresh
touches only the buckets new events could have changed.

Mechanics:

  * the rollup lives at ``<path>/table`` partitioned by ``bucket``
    (dynamic-partition-overwrite refreshes are bucket-atomic — the
    same idempotent-backfill discipline tests/test_formats.py pins);
  * ``<path>/_watermark`` stores the refresh high-watermark = max
    event ts seen minus the ``lateness`` horizon, MONOTONIC across
    refreshes (an all-late batch cannot drag it backwards — the same
    contract as a streaming watermark). It is a single file read and
    written through the Hadoop FileSystem API: no Spark job, works on
    any scheme (hdfs://, s3a://), and the write is tmp+rename so a
    crash leaves the previous watermark intact (replay then re-runs an
    idempotent whole-bucket refresh and converges);
  * ``refresh_rollup`` reads ONLY events with ts >= the bucket-aligned
    floor of the watermark (a constant-folded, pushed-down scan
    predicate — the floor is derived as a Catalyst expression on the
    watermark literal, zero driver jobs), recomputes the buckets they
    touch from scratch (whole-bucket recompute: any aggregate is
    legal, no mergeability requirement), and overwrites exactly those
    bucket partitions;
  * events later than the horizon are the documented miss — the same
    contract as a streaming watermark (streaming/windows.py); size
    ``lateness`` to the source's disorder bound;
  * ``query_rollup`` unions the materialized buckets (pruned to
    bucket < watermark-floor — static partition pruning on the rollup
    table) with an on-the-fly aggregation of the RAW tail (events at
    or past the floor), so reads are always fresh between refreshes.
    The face is ACTION-FREE: no driver job runs before the returned
    DataFrame executes (the watermark is a driver-side file read);
  * ``drop_buckets_before`` is the retention policy (the TimescaleDB
    pattern pairs continuous aggregates with retention): it deletes
    rollup bucket partitions older than a horizon partition-atomically
    and records the floor in ``<path>/_retention``, which the query
    face mirrors so rollup reads and raw-tail reads agree on the
    retained window.

Correctness invariant (tested): after ANY refresh schedule whose
late arrivals respect the horizon, query_rollup ≡ the one-shot
groupBy over all retained events, bitwise.

Streaming face scale shape: each micro-batch lands under
``<path>/raw`` partitioned by ``raw_bucket`` (epoch seconds of the
event's time bucket) THEN ``batch_id`` — replay overwrites the same
(raw_bucket, batch_id) leaves via dynamic partition overwrite, so the
landing is idempotent, while the refresh read selects raw_bucket
directories at/after the watermark floor by a bounded DRIVER-SIDE
listing of the top level only (no footer reads over history), and
``sweep_raw_store`` deletes raw_bucket directories strictly older
than the floor after every refresh (they can never be read again:
the watermark is monotonic). Per-batch cost is therefore bounded by
events-since-watermark — listing, footers, and bytes — independent
of how many batches have accumulated (rehearsed in
scripts/rollup_stream_study.py / rollup_stream_study.tsv).

Reference analog: none — §2.3 extension surface (SURVEY.md §2.3); the
brief's "hypertable rollup" example.
"""

from __future__ import annotations

import datetime as dt
import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.fsutil import (
    count_data_files,
    hadoop_fs,
    list_partition_dirs,
    read_small_file,
    write_small_file,
)

BUCKET = "1 hour"
LATENESS = "30 minutes"

_ROLLUP_COLS = ["n_events", "sum_value", "min_value", "max_value",
                "approx_users", "users_sketch"]

_INTERVAL_UNITS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400,
                   "week": 604800}


def _parse_interval(s: str) -> dt.timedelta:
    """'30 minutes' / '1 hour' / '2 days' → timedelta. Pure driver-side
    arithmetic (no tz/alignment subtleties — unlike bucket FLOORS,
    which stay Catalyst expressions so they match F.window exactly)."""
    m = re.fullmatch(r"\s*(\d+)\s+(second|minute|hour|day|week)s?\s*",
                     s.lower())
    if not m:
        raise ValueError(f"unsupported interval: {s!r}")
    return dt.timedelta(seconds=int(m.group(1)) * _INTERVAL_UNITS[m.group(2)])


def _agg_exprs():
    """The rollup's aggregate battery. Every column is MERGEABLE so a
    coarser rollup re-aggregates exactly from a finer one
    (``refresh_coarser`` — the TimescaleDB hierarchical-caggs
    pattern): count/sum add, min/max fold, avg stays decomposed as
    sum+count, and the distinct-user estimate is carried as a
    DataSketches HLL sketch (``users_sketch``) whose register state
    is max-merge-associative — the union of per-hour sketches IS the
    one-shot sketch, so ``approx_users`` (its estimate) is identical
    at every level of the hierarchy."""
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.hll_sketch_agg("user_id").alias("users_sketch"),
    ]


def _with_estimate(df: DataFrame, keys: list[str]) -> DataFrame:
    return (df.withColumn("approx_users",
                          F.hll_sketch_estimate("users_sketch"))
            .select("bucket", *keys, *_ROLLUP_COLS))


def _bucketed(events: DataFrame, bucket: str, keys: list[str]) -> DataFrame:
    return _with_estimate(
        events
        .withColumn("bucket", F.window("ts", bucket)["start"])
        .groupBy("bucket", *keys)
        .agg(*_agg_exprs()), keys)


def _coarse_bucketed(rollup_rows: DataFrame, dst_bucket: str,
                     keys: list[str]) -> DataFrame:
    """Re-aggregate fine rollup rows into coarser buckets — exact for
    every battery column (see _agg_exprs): this is rollup-from-rollup,
    never a raw-event scan."""
    return _with_estimate(
        rollup_rows
        .withColumn("bucket", F.window("bucket", dst_bucket)["start"])
        .groupBy("bucket", *keys)
        .agg(F.sum("n_events").alias("n_events"),
             F.sum("sum_value").alias("sum_value"),
             F.min("min_value").alias("min_value"),
             F.max("max_value").alias("max_value"),
             F.hll_union_agg("users_sketch").alias("users_sketch")),
        keys)


def _floor_expr(ts: str, bucket: str):
    """The bucket-aligned floor of a timestamp literal, as a Catalyst
    expression: window() on a foldable literal constant-folds after the
    TimeWindowing rewrite, so filters against it become plain literal
    comparisons — pushed down to the scan, zero driver jobs, and
    guaranteed to align exactly like F.window on the data side."""
    return F.window(F.lit(ts).cast("timestamp"), bucket)["start"]


def _tail_of(events: DataFrame, floor) -> DataFrame:
    """events at/after a bucket floor expression. ts >= floor is
    EQUIVALENT to bucket(ts) >= floor because the floor is
    bucket-aligned — stated on ts so the predicate reaches the scan."""
    return (events.withColumn("_f", floor)
            .filter(F.col("ts") >= F.col("_f")).drop("_f"))


# ---------------------------------------------------------------- fs


def read_watermark(spark: SparkSession, path: str):
    raw = read_small_file(spark, f"{path}/_watermark")
    return None if raw is None else json.loads(raw)["watermark"]


def _write_watermark(spark: SparkSession, path: str, wm: str) -> None:
    write_small_file(spark, f"{path}/_watermark",
                     json.dumps({"watermark": wm}))


def read_retention(spark: SparkSession, path: str):
    raw = read_small_file(spark, f"{path}/_retention")
    return None if raw is None else json.loads(raw)["retain_from"]


# ----------------------------------------------------------- refresh


def refresh_rollup(events: DataFrame, path: str, *,
                   bucket: str = BUCKET, keys: list[str] | None = None,
                   lateness: str = LATENESS) -> dict:
    """Incrementally refresh the rollup at ``path`` from ``events``
    (needs ts + the key/value columns). Returns refresh stats."""
    keys = keys if keys is not None else ["event_type"]
    spark = events.sparkSession
    wm = read_watermark(spark, path)
    if wm is None:
        fresh = events
    else:
        # read from the BUCKET-ALIGNED floor of the watermark: a bucket
        # straddling the watermark must be recomputed from ALL its
        # events, not just the post-watermark slice. The floor is a
        # constant-folded expression → pushed-down ts predicate.
        fresh = _tail_of(events, _floor_expr(wm, bucket))

    stale = _bucketed(fresh, bucket, keys)
    # bucket-atomic: dynamic partition overwrite replaces exactly the
    # recomputed buckets, leaving all others untouched
    (stale.repartition("bucket")
     .write.partitionBy("bucket")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(f"{path}/table"))

    bounds = fresh.agg(F.max("ts").alias("mx"),
                       F.count(F.lit(1)).alias("n")).first()
    if bounds["mx"] is not None:
        new_wm = str(bounds["mx"] - _parse_interval(lateness))
        # MONOTONIC: an all-late (but in-horizon) batch must not drag
        # the watermark backwards — retention already swept below it.
        # str(datetime) is 'YYYY-MM-DD HH:MM:SS[.ffffff]', which
        # compares correctly as a string.
        if wm is None or new_wm > wm:
            _write_watermark(spark, path, new_wm)
    return {"events_read": int(bounds["n"]),
            "watermark": read_watermark(spark, path)}


def _rollup_schema(events: DataFrame, keys: list[str]):
    """The rollup table's exact schema, derived from the events schema
    (key columns) + the fixed aggregate battery — handed to the read so
    the query face skips parquet schema inference (its one driver
    job)."""
    from pyspark.sql import types as T

    return T.StructType(
        [T.StructField("bucket", T.TimestampType())]
        + [events.schema[k] for k in keys]
        + [T.StructField("n_events", T.LongType()),
           T.StructField("sum_value", T.DoubleType()),
           T.StructField("min_value", T.DoubleType()),
           T.StructField("max_value", T.DoubleType()),
           T.StructField("approx_users", T.LongType()),
           T.StructField("users_sketch", T.BinaryType())])


def query_rollup(spark: SparkSession, events: DataFrame, path: str, *,
                 bucket: str = BUCKET,
                 keys: list[str] | None = None) -> DataFrame:
    """The always-fresh read face: materialized buckets strictly below
    the watermark's bucket floor UNION the raw-tail aggregation of
    everything at/after it (tail buckets may still change, and the
    floor bucket may be partially materialized — recomputing the whole
    tail from raw makes each bucket appear exactly once, exact).

    ACTION-FREE: the watermark/retention reads are driver-side file
    reads, the floor comparisons are constant-folded literals — no
    Spark job runs until the returned DataFrame is executed, and the
    bucket < floor filter partition-prunes the rollup scan."""
    keys = keys if keys is not None else ["event_type"]
    wm = read_watermark(spark, path)
    retain = read_retention(spark, path)
    if retain is not None:
        # mirror retention on the raw side: dropped buckets stay dropped
        # even when the caller hands us the full unretained history
        events = _tail_of(events, _floor_expr(retain, bucket))
    if wm is None:
        return _bucketed(events, bucket, keys)
    floor = _floor_expr(wm, bucket)
    tail = _bucketed(_tail_of(events, floor), bucket, keys)
    materialized = (spark.read.schema(_rollup_schema(events, keys))
                    .parquet(f"{path}/table")
                    .withColumn("_f", floor)
                    .filter(F.col("bucket") < F.col("_f")).drop("_f")
                    .select("bucket", *keys, *_ROLLUP_COLS))
    if retain is not None:
        materialized = (materialized.withColumn("_r", _floor_expr(retain,
                                                                  bucket))
                        .filter(F.col("bucket") >= F.col("_r")).drop("_r"))
    return materialized.unionByName(tail)


# --------------------------------------------------------- retention


def drop_buckets_before(spark: SparkSession, path: str, before_ts: str, *,
                        bucket: str = BUCKET) -> dict:
    """Retention policy: delete rollup bucket partitions strictly older
    than the bucket floor of ``before_ts`` — partition-atomic directory
    deletes, mirrored in the query face via ``<path>/_retention`` (the
    TimescaleDB drop_chunks analog). Monotonic: a smaller horizon than
    the recorded one is a no-op. Returns {dropped, retain_from}."""
    floor = (spark.range(1).select(_floor_expr(before_ts, bucket)
                                   .alias("f")).first()["f"])
    prev = read_retention(spark, path)
    if prev is not None and str(floor) < prev:
        return {"dropped": 0, "retain_from": prev}
    # equal horizon re-runs the delete pass (idempotent) so a crash
    # between the floor write below and the deletes is repairable
    from urllib.parse import unquote

    # record the floor FIRST: once _retention carries it the query face
    # already excludes the doomed buckets, so a crash mid-delete leaves
    # orphan directories that are never read and that the next drop
    # (any horizon ≥ this one) removes — the reverse order would lose
    # buckets from the query face until the drop is re-run
    write_small_file(spark, f"{path}/_retention",
                     json.dumps({"retain_from": str(floor)}))
    fs, _ = hadoop_fs(spark, f"{path}/table")
    jvm = spark._jvm
    dropped = 0
    for val, uri in list_partition_dirs(spark, f"{path}/table", "bucket"):
        try:
            part_ts = dt.datetime.fromisoformat(unquote(val))
        except ValueError:
            continue
        if part_ts < dt.datetime.fromisoformat(str(floor)):
            fs.delete(jvm.org.apache.hadoop.fs.Path(uri), True)
            dropped += 1
    return {"dropped": dropped, "retain_from": str(floor)}


# --------------------------------------------------------- hierarchy


def refresh_coarser(spark: SparkSession, src_path: str, dst_path: str, *,
                    dst_bucket: str = "1 day",
                    keys: list[str] | None = None) -> dict:
    """Maintain a COARSER rollup from a finer one (TimescaleDB
    hierarchical continuous aggregates): the day table re-aggregates
    hour rows, never raw events — every battery column is mergeable
    (_agg_exprs), including the distinct-user estimate via HLL sketch
    union, so the hierarchy is EXACT: the coarse table equals the
    one-shot coarse aggregation of the raw stream, bitwise (tested).

    Incrementality mirrors refresh_rollup one level up: the coarse
    watermark records the fine watermark at the last coarse refresh;
    a refresh re-reads only fine buckets at/after its own bucket-
    aligned floor (static partition pruning on the fine table's bucket
    partitions — constant-folded expression, zero extra driver jobs)
    and dynamic-overwrites exactly the recomputed coarse buckets.
    query_rollup(…, dst_path, bucket=dst_bucket) serves the coarse
    level with the same always-fresh raw-tail face."""
    keys = keys if keys is not None else ["event_type"]
    src_wm = read_watermark(spark, src_path)
    dst_wm = read_watermark(spark, dst_path)
    fine = spark.read.parquet(f"{src_path}/table")
    if dst_wm is not None:
        fine = (fine.withColumn("_f", _floor_expr(dst_wm, dst_bucket))
                .filter(F.col("bucket") >= F.col("_f")).drop("_f"))
    stale = _coarse_bucketed(fine, dst_bucket, keys)
    (stale.repartition("bucket")
     .write.partitionBy("bucket")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(f"{dst_path}/table"))
    if src_wm is not None and (dst_wm is None or src_wm > dst_wm):
        _write_watermark(spark, dst_path, src_wm)
    return {"watermark": read_watermark(spark, dst_path)}


# --------------------------------------------------------- streaming


def _raw_floor_epoch(spark: SparkSession, wm: str, bucket: str) -> int:
    """Epoch seconds of the watermark's bucket floor (one tiny
    driver job per micro-batch — maintenance context, not query path).
    Epoch seconds make raw_bucket partition directory names clean
    integers, comparable driver-side without timestamp-escape
    parsing."""
    return int(spark.range(1)
               .select(F.unix_timestamp(_floor_expr(wm, bucket))
                       .alias("e")).first()["e"])


def _list_raw_buckets(spark: SparkSession,
                      raw_path: str) -> list[tuple[int, str]]:
    """[(epoch, uri)] for the raw store's top-level raw_bucket=N
    directories — bounded by the sweep, never a recursive walk."""
    return sorted((int(v), u) for v, u in
                  list_partition_dirs(spark, raw_path, "raw_bucket"))


def read_raw_store(spark: SparkSession, path: str, *,
                   bucket: str = BUCKET,
                   empty_schema=None) -> tuple[DataFrame, dict]:
    """The refresh's view of the raw landing store: ONLY raw_bucket
    directories at/after the watermark floor, selected by the bounded
    driver-side listing and read with basePath — Spark lists and
    footer-reads just those directories, so per-refresh scan metadata
    is independent of accumulated history. Returns (df, stats).
    ``empty_schema`` shapes the empty result when nothing is selected
    (e.g. a batch entirely beyond the lateness horizon landed below
    the floor); defaults to the module's standard event battery."""
    wm = read_watermark(spark, path)
    dirs = _list_raw_buckets(spark, f"{path}/raw")
    if wm is not None:
        floor = _raw_floor_epoch(spark, wm, bucket)
        dirs = [(e, u) for e, u in dirs if e >= floor]
    if not dirs:
        return (spark.createDataFrame(
            [], empty_schema
            or "ts timestamp, user_id long, event_type string, "
               "value double"), {"raw_dirs": 0, "raw_files": 0})
    n_files = count_data_files(spark, [u for _, u in dirs])
    df = (spark.read.option("basePath", f"{path}/raw")
          .parquet(*[u for _, u in dirs])
          .drop("raw_bucket", "batch_id"))
    return df, {"raw_dirs": len(dirs), "raw_files": n_files}


def sweep_raw_store(spark: SparkSession, path: str, *,
                    bucket: str = BUCKET,
                    watermark: str | None = None) -> int:
    """Delete raw_bucket directories STRICTLY below the watermark's
    bucket floor: the watermark is monotonic and refresh reads only
    ts >= floor, so swept directories can never be read again. This is
    what bounds the landing store — and every refresh's listing — to
    the lateness horizon instead of the full stream history. Returns
    the number of directories deleted.

    ``watermark`` overrides the stored fine watermark — the stream
    face passes a CLAMPED value when a hierarchy is armed, because the
    coarse query face's raw tail reaches back to the coarse level's
    own (lagging) watermark floor, not the fine one's."""
    wm = watermark if watermark is not None else read_watermark(spark, path)
    if wm is None:
        return 0
    floor = _raw_floor_epoch(spark, wm, bucket)
    fs, _ = hadoop_fs(spark, f"{path}/raw")
    jvm = spark._jvm
    swept = 0
    for epoch, uri in _list_raw_buckets(spark, f"{path}/raw"):
        if epoch < floor:
            fs.delete(jvm.org.apache.hadoop.fs.Path(uri), True)
            swept += 1
    return swept


def start_rollup_stream(stream_events: DataFrame, *, path: str,
                        checkpoint: str, bucket: str = BUCKET,
                        keys: list[str] | None = None,
                        lateness: str = LATENESS,
                        sweep: bool = True,
                        retention: str | None = None,
                        coarse_path: str | None = None,
                        coarse_bucket: str = "1 day",
                        coarse_every: int = 1,
                        stats: list | None = None):
    """Streaming face: maintain the rollup from an event stream, one
    incremental refresh per micro-batch (foreachBatch — the refresh
    needs the watermark file and dynamic-partition overwrite, which
    the built-in streaming sinks don't do).

    Per batch: (1) land the batch under ``<path>/raw`` partitioned by
    raw_bucket (epoch secs of the event's time bucket) then batch_id —
    dynamic partition overwrite rewrites exactly the replayed batch's
    (raw_bucket, batch_id) leaves, so crash replay is idempotent;
    (2) refresh from the PRUNED raw view (read_raw_store: only
    raw_bucket dirs at/after the watermark floor, selected by one
    bounded top-level listing); (3) sweep raw_bucket dirs below the
    floor (sweep=False keeps them for audit/replump). Whole-bucket
    recompute makes re-application converge, the same discipline as
    streaming/bloom_ingest.py.

    ``retention='N days'`` pairs the continuous aggregate with its
    retention policy (the TimescaleDB drop_chunks discipline): after
    each refresh, rollup buckets older than watermark − retention are
    dropped partition-atomically and the floor is mirrored into the
    query face. The horizon rides the MONOTONIC watermark, so drops
    never race a refresh that could still rewrite the bucket; the drop
    is skipped entirely while the bucket-aligned horizon is unchanged
    (no per-batch metadata churn). When a hierarchy is armed the
    horizon is additionally CLAMPED to the coarse level's recompute
    floor — refresh_coarser rebuilds every coarse bucket at/after
    coarse-floor(coarse watermark) from the fine rows, so fine buckets
    inside that window must survive regardless of the requested
    retention or the coarse aggregates would silently undercount.

    ``coarse_path`` maintains a HIERARCHICAL coarser level from the
    same stream: refresh_coarser runs after every ``coarse_every``-th
    batch (the coarse table re-aggregates fine ROWS, so skipped
    batches cost nothing — the next coarse refresh absorbs them via
    the recorded fine watermark). With a hierarchy armed, the raw
    sweep keeps directories back to the COARSE bucket floor (not the
    fine one), so the documented coarse query face —
    query_rollup(raw-store events, coarse_path, bucket=coarse_bucket)
    — always finds the raw tail its in-progress coarse bucket needs.

    ``stats``: pass a list to receive one dict per processed batch —
    {batch_id, events_read, raw_dirs, raw_files, swept, dropped} — the
    backpressure/flat-cost monitoring face (rehearsed in
    scripts/rollup_stream_study.py)."""
    retention_td = _parse_interval(retention) if retention else None
    last_horizon: dict[str, str | None] = {"h": None}

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        # idempotent landing: replays rewrite the same
        # (raw_bucket, batch_id) leaf partitions only
        (batch
         .withColumn("raw_bucket",
                     F.unix_timestamp(F.window("ts", bucket)["start"]))
         .withColumn("batch_id", F.lit(batch_id))
         .repartition("raw_bucket")
         .write.partitionBy("raw_bucket", "batch_id")
         .option("partitionOverwriteMode", "dynamic")
         .mode("overwrite").parquet(f"{path}/raw"))
        raw, read_stats = read_raw_store(spark, path, bucket=bucket,
                                         empty_schema=batch.schema)
        refresh_stats = refresh_rollup(raw, path, bucket=bucket, keys=keys,
                                       lateness=lateness)
        # with a hierarchy, sweep at COARSE granularity AND clamp to the
        # COARSE watermark: the coarse query face's raw tail reaches
        # back to coarse-floor(coarse watermark), which lags the fine
        # watermark between coarse refreshes (coarse_every > 1) — a
        # fine watermark crossing a coarse bucket boundary on a batch
        # that skips refresh_coarser must NOT delete raw dirs the
        # coarse face still needs. No coarse watermark yet → no sweep
        # (nothing is provably unreadable by the coarse face).
        swept = 0
        if sweep:
            if coarse_path:
                dst_wm = read_watermark(spark, coarse_path)
                if dst_wm is not None:
                    fine_wm = refresh_stats["watermark"]
                    clamped = (dst_wm if fine_wm is None
                               else min(fine_wm, dst_wm))
                    swept = sweep_raw_store(spark, path,
                                            bucket=coarse_bucket,
                                            watermark=clamped)
            else:
                swept = sweep_raw_store(spark, path, bucket=bucket)
        if coarse_path and (batch_id + 1) % coarse_every == 0:
            refresh_coarser(spark, path, coarse_path,
                            dst_bucket=coarse_bucket, keys=keys)
        dropped = 0
        if retention_td is not None:
            wm = refresh_stats["watermark"]
            if wm is not None:
                horizon = str(dt.datetime.fromisoformat(wm) - retention_td)
                if coarse_path:
                    # clamp: fine buckets inside the coarse recompute
                    # window (>= coarse-floor of the coarse watermark)
                    # feed future refresh_coarser runs — dropping them
                    # would permanently undercount the coarse bucket
                    dst_wm = read_watermark(spark, coarse_path)
                    if dst_wm is None:
                        horizon = None
                    else:
                        cf = str(spark.range(1).select(
                            _floor_expr(dst_wm, coarse_bucket)
                            .alias("f")).first()["f"])
                        horizon = min(horizon, cf)
                if horizon is not None and horizon != last_horizon["h"]:
                    dropped = drop_buckets_before(
                        spark, path, horizon, bucket=bucket)["dropped"]
                    last_horizon["h"] = horizon
        if stats is not None:
            stats.append({"batch_id": batch_id,
                          "events_read": refresh_stats["events_read"],
                          "raw_dirs": read_stats["raw_dirs"],
                          "raw_files": read_stats["raw_files"],
                          "swept": swept, "dropped": dropped})

    return (stream_events.writeStream
            .foreachBatch(_process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
