"""Stream-stream join with event-time constraint: purchases joined to
the same user's views within the preceding hour, checked against the
equivalent batch join."""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.streaming.windows import read_event_stream
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def replay(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("ssj_src")
    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    staging = tmp_path_factory.mktemp("ssj_staging")
    n = raw.count()
    step = n // 2 + 1
    for i in range(2):
        (raw.filter((F.col("event_id") >= i * step)
                    & (F.col("event_id") < (i + 1) * step))
         .coalesce(1).write.mode("overwrite").parquet(f"{staging}/b{i}"))
    now = time.time()
    for i, f in enumerate(sorted(Path(staging).glob("b*/part-*.parquet"))):
        dst = src / f"{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    return str(src)


def _purchases(df):
    return (df.filter(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("p_id"),
                    F.col("user_id").alias("p_user"),
                    F.col("ts").alias("p_ts")))


def _views(df):
    return (df.filter(F.col("event_type") == "view")
            .select(F.col("event_id").alias("v_id"),
                    F.col("user_id").alias("v_user"),
                    F.col("ts").alias("v_ts")))


def test_stream_stream_join_matches_batch(spark, replay):
    p = _purchases(read_event_stream(spark, replay)).withWatermark("p_ts", "2 hours")
    v = _views(read_event_stream(spark, replay)).withWatermark("v_ts", "2 hours")
    joined = p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") < F.col("p_ts")),
    )
    q = (joined.writeStream.outputMode("append")
         .format("memory").queryName("ssj_out").start())
    try:
        q.processAllAvailable()
        got = {(r["p_id"], r["v_id"])
               for r in spark.sql("SELECT p_id, v_id FROM ssj_out").collect()}
    finally:
        q.stop()
    ev = load(spark, SF_SMOKE, "events")
    bp, bv = _purchases(ev), _views(ev)
    expected = {
        (r["p_id"], r["v_id"])
        for r in bp.join(
            bv,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("v_ts") < F.col("p_ts")),
        ).select("p_id", "v_id").collect()
    }
    assert got == expected
    assert got, "join produced no pairs — vacuous test"
