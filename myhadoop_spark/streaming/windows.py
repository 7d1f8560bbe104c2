"""Structured Streaming operators over the events stream.

The reference is strictly batch (one job at a time,
/root/reference/namenode.py:375); streaming is the engine extension
mandated by SURVEY.md §1.5/§2.4 #15. Batch-checkable twins of these live
in queries/streaming_batch.py — Spark's window()/session_window semantics
are shared between the two engines' modes, which is what lets the DuckDB
oracle validate the streaming logic.

At scale: the parquet file source here stands in for Kafka; watermark
bounds state, and the windowed aggregation state is partitioned by
(window, event_type) — the same shuffle key as the batch plan.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from myhadoop_spark.catalog import _normalize_events_ts, tune
from myhadoop_spark.functions.money import dec


def read_event_stream(spark: SparkSession, source_dir: str,
                      max_files_per_trigger: int = 1) -> DataFrame:
    """File-based event stream: each parquet file in source_dir is a
    micro-batch (maxFilesPerTrigger=1 replays files one at a time, which
    is what exercises watermark advancement across batches).

    Structured Streaming needs an explicit schema, but pinning one is how
    round 2 died (fixture drifted int64-ns → timestamp[us] under a
    hard-coded LongType assumption): instead, take the schema from a
    one-file batch read of the same directory — a driver-side footer read,
    no data scan — then apply the same ts normalization as catalog.load,
    so stream and batch twins agree under ANY fixture encoding. If the
    directory holds no parquet yet (a stream defined before its producer
    first writes — normal for ingest pipelines), fall back to the pinned
    default events schema; a drifted fixture will still be re-inferred on
    any non-empty directory."""
    tune(spark)
    try:
        schema = spark.read.parquet(source_dir).schema
    except AnalysisException:
        schema = T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ])
    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )
    return _normalize_events_ts(raw) if "ts" in raw.columns else raw


def tumbling_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event type with watermark-bounded
    state. Streaming twin of queries/streaming_batch.stream_window minus
    exact countDistinct (unsupported in streaming aggs — the streaming
    surface uses approx_count_distinct instead)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"),
                "event_type", "n_events", "sum_value", "approx_users")
    )


def sessionized(events: DataFrame, gap: str = "10 minutes",
                watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap-based), watermark-bounded."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(dec("value")).cast("double").alias("sum_value"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("session_start"),
                F.col("w.end").cast("timestamp_ntz").alias("session_end"),
                "user_id", "n_events", "sum_value")
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming face of the dedup_exact operator."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id", "ts"])


def run_to_memory(df: DataFrame, table: str,
                  output_mode: str = "complete") -> StreamingQuery:
    """Drive a streaming aggregation to a memory sink synchronously
    (test/smoke harness; production would use kafka/parquet sinks)."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory").queryName(table)
        .start()
    )
    q.processAllAvailable()
    return q
