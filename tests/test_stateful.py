"""applyInPandasWithState operator: cross-batch state must converge to
the batch ground truth exactly (integer-cents accumulation)."""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.streaming.stateful import running_user_totals
from myhadoop_spark.streaming.windows import read_event_stream
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def replay_dir(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("stateful_src")
    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n = raw.count()
    step = n // 3 + 1
    staging = tmp_path_factory.mktemp("stateful_staging")
    for i in range(3):
        (raw.filter((F.col("event_id") >= i * step)
                    & (F.col("event_id") < (i + 1) * step))
         .coalesce(1).write.mode("overwrite").parquet(f"{staging}/b{i}"))
    now = time.time()
    for i, f in enumerate(sorted(Path(staging).glob("b*/part-*.parquet"))):
        dst = src / f"{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    return str(src)


def test_stateful_with_ttl_still_converges_within_horizon(spark, replay_dir):
    """With the TTL configured but wider than any idle gap in the data,
    totals must equal the no-TTL result (eviction must not fire early).
    The default 24h TTL WOULD legitimately evict here — the fixture has
    multi-day batch boundaries — so the test pins a 90-day TTL."""
    stream = read_event_stream(spark, replay_dir)
    q = (
        running_user_totals(stream, watermark="1 hour",
                            idle_ttl_ms=90 * 24 * 3600 * 1000)
        .writeStream.outputMode("update")
        .format("memory").queryName("user_totals_ttl")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["user_id"]: (r["n_events"], r["sum_value_cents"])
        for r in spark.sql("""
            SELECT user_id, max(n_events) AS n_events,
                   max(sum_value_cents) AS sum_value_cents
            FROM user_totals_ttl GROUP BY user_id
        """).collect()
    }
    expected = {
        r["user_id"]: (r["n"], r["cents"])
        for r in (
            load(spark, SF_SMOKE, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
        ).collect()
    }
    assert got == expected


def test_stateful_running_totals_converge_to_batch(spark, replay_dir):
    stream = read_event_stream(spark, replay_dir)
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory").queryName("user_totals")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode appends one row per (user, batch); the running totals
    # are monotone, so the final state per user is the max
    got = {
        r["user_id"]: (r["n_events"], r["sum_value_cents"])
        for r in spark.sql("""
            SELECT user_id, max(n_events) AS n_events,
                   max(sum_value_cents) AS sum_value_cents
            FROM user_totals GROUP BY user_id
        """).collect()
    }
    expected = {
        r["user_id"]: (r["n"], r["cents"])
        for r in (
            load(spark, SF_SMOKE, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
        ).collect()
    }
    assert got == expected
