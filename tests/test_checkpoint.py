"""Streaming durability: a windowed aggregation writing to a parquet
sink with checkpointing must resume after a stop/restart and process
late-arriving files exactly once."""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.streaming.windows import read_event_stream
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def split_files(spark, tmp_path_factory):
    staging = tmp_path_factory.mktemp("ckpt_staging")
    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n = raw.count()
    step = n // 2 + 1
    files = []
    for i in range(2):
        (raw.filter((F.col("event_id") >= i * step)
                    & (F.col("event_id") < (i + 1) * step))
         .coalesce(1).write.mode("overwrite").parquet(f"{staging}/b{i}"))
        files.append(next(Path(f"{staging}/b{i}").glob("part-*.parquet")))
    return files


def test_restart_from_checkpoint_is_exactly_once(spark, split_files,
                                                 tmp_path_factory):
    src = tmp_path_factory.mktemp("ckpt_src")
    out = str(tmp_path_factory.mktemp("ckpt_out")) + "/data"
    ckpt = str(tmp_path_factory.mktemp("ckpt_meta"))

    def start():
        counts = (
            read_event_stream(spark, str(src))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # complete-mode agg → parquet isn't supported; use foreachBatch
        # (the production exactly-once pattern) to overwrite per epoch
        def sink(df, epoch_id):
            df.write.mode("overwrite").parquet(out)

        return (counts.writeStream.outputMode("complete")
                .option("checkpointLocation", ckpt)
                .foreachBatch(sink).start())

    # batch 1
    dst = src / "000.parquet"
    shutil.copy(split_files[0], dst)
    os.utime(dst, (time.time() - 60, time.time() - 60))
    q = start()
    q.processAllAvailable()
    q.stop()
    first = {r["event_type"]: r["n"]
             for r in spark.read.parquet(out).collect()}
    n_first = spark.read.parquet(str(split_files[0])).count()
    assert sum(first.values()) == n_first

    # restart with a second file arriving late
    dst2 = src / "001.parquet"
    shutil.copy(split_files[1], dst2)
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    final = {r["event_type"]: r["n"]
             for r in spark.read.parquet(out).collect()}
    # exactly-once: totals equal the full batch count, nothing doubled
    n_all = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert sum(final.values()) == n_all
    batch = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
             .groupBy("event_type").count().collect())
    assert final == {r["event_type"]: r["count"] for r in batch}
