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
    event ts seen minus the ``lateness`` horizon;
  * ``refresh_rollup`` reads ONLY events with ts >= watermark (a
    pushed-down scan predicate), recomputes the buckets they touch
    from scratch (whole-bucket recompute: any aggregate is legal, no
    mergeability requirement), and overwrites exactly those bucket
    partitions;
  * events later than the horizon are the documented miss — the same
    contract as a streaming watermark (streaming/windows.py); size
    ``lateness`` to the source's disorder bound;
  * ``query_rollup`` unions the materialized buckets with an on-the-fly
    aggregation of the RAW tail (events past the watermark), so reads
    are always fresh even between refreshes.

Correctness invariant (tested): after ANY refresh schedule whose
late arrivals respect the horizon, query_rollup ≡ the one-shot
groupBy over all events, bitwise.

Scale shape: refresh shuffle ∝ events-since-watermark (bounded by
arrival rate × refresh interval, not corpus size); the query face
scans rollup partitions (pruned by bucket predicate) + the raw tail
slice only. Reference analog: none — §2.3 extension surface
(SURVEY.md §2.3); the brief's "hypertable rollup" example.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET = "1 hour"
LATENESS = "30 minutes"


def _agg_exprs():
    """The rollup's aggregate battery: recomputable per bucket from the
    raw slice (whole-bucket recompute ⇒ no mergeability constraint;
    avg intentionally kept as sum+count so rollup rows can be further
    re-aggregated exactly)."""
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    ]


def _bucketed(events: DataFrame, bucket: str, keys: list[str]) -> DataFrame:
    return (events
            .withColumn("bucket", F.window("ts", bucket)["start"])
            .groupBy("bucket", *keys)
            .agg(*_agg_exprs()))


def read_watermark(spark: SparkSession, path: str):
    try:
        raw = spark.read.text(f"{path}/_watermark").collect()[0].value
        return json.loads(raw)["watermark"]
    except Exception:
        return None


def _write_watermark(spark: SparkSession, path: str, wm: str) -> None:
    (spark.createDataFrame([(json.dumps({"watermark": wm}),)], "value string")
     .coalesce(1).write.mode("overwrite").text(f"{path}/_watermark"))


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
        # events, not just the post-watermark slice
        wm_bucket = (spark.range(1)
                     .select(F.window(F.lit(wm).cast("timestamp"),
                                      bucket)["start"].alias("b"))
                     .first()["b"])
        fresh = events.filter(F.col("ts") >= wm_bucket)

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
        new_wm = (spark.range(1)
                  .select((F.lit(bounds["mx"]).cast("timestamp")
                           - F.expr(f"INTERVAL {lateness}")).alias("w"))
                  .first()["w"])
        _write_watermark(spark, path, str(new_wm))
    return {"events_read": int(bounds["n"]),
            "watermark": read_watermark(spark, path)}


def query_rollup(spark: SparkSession, events: DataFrame, path: str, *,
                 bucket: str = BUCKET,
                 keys: list[str] | None = None) -> DataFrame:
    """The always-fresh read face: materialized buckets UNION the
    aggregation of raw events past the watermark. Buckets that straddle
    the watermark come from the raw side (they may still change), so
    each bucket appears exactly once."""
    keys = keys if keys is not None else ["event_type"]
    wm = read_watermark(spark, path)
    if wm is None:
        return _bucketed(events, bucket, keys)
    tail = _bucketed(events.filter(F.col("ts") >= wm), bucket, keys)
    # the first tail bucket may be partially materialized — recompute
    # it fully from raw and exclude it from the materialized side
    materialized = (spark.read.parquet(f"{path}/table")
                    .join(tail.select("bucket").distinct(), "bucket",
                          "left_anti")
                    .select("bucket", *keys, *[
                        c for c in ["n_events", "sum_value", "min_value",
                                    "max_value", "approx_users"]]))
    # tail buckets recomputed from ALL their events (the watermark sits
    # at most one lateness-horizon behind max ts, and refresh recomputes
    # whole buckets, so raw >= watermark covers every tail bucket's rows
    # only if the bucket starts after the watermark — recompute instead
    # from the bucket start to be exact)
    first_tail = tail.agg(F.min("bucket")).first()[0]
    if first_tail is not None:
        tail = _bucketed(events.filter(F.col("ts") >= first_tail),
                         bucket, keys)
    return materialized.unionByName(tail)


def start_rollup_stream(stream_events: DataFrame, *, path: str,
                        checkpoint: str, bucket: str = BUCKET,
                        keys: list[str] | None = None,
                        lateness: str = LATENESS):
    """Streaming face: maintain the rollup from an event stream, one
    incremental refresh per micro-batch (foreachBatch — the refresh
    needs the watermark file and dynamic-partition overwrite, which
    the built-in streaming sinks don't do).

    The cross-batch contract mirrors refresh semantics: a batch's
    events refresh every bucket they touch from the ACCUMULATED raw
    store (the refresh recomputes whole buckets, so the per-batch
    DataFrame must carry all events at/after the watermark floor — the
    helper materializes each batch into ``<path>/raw`` first and
    refreshes from that store, keeping refresh reads pruned by the
    pushed-down ts predicate). Batch replay after a crash overwrites
    the same raw batch directory and re-runs an idempotent refresh —
    whole-bucket recompute makes re-application converge, the same
    discipline as streaming/bloom_ingest.py."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        # idempotent landing: replays rewrite the same directory
        batch.write.mode("overwrite").parquet(
            f"{path}/raw/batch_id={batch_id}")
        raw = spark.read.parquet(f"{path}/raw")
        refresh_rollup(raw, path, bucket=bucket, keys=keys,
                       lateness=lateness)

    return (stream_events.writeStream
            .foreachBatch(_process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
