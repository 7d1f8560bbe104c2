"""Incremental corpus ingestion: stream → MERGE-upserted table.

The training-data shape this serves: documents arrive continuously
(crawl batches, re-crawls of the same URL, metadata corrections) and
the serving table must hold exactly one current row per document id.
Append-only sinks can't express that; this wires Structured Streaming's
``foreachBatch`` to the lakehouse ``upsert_table`` MERGE so each
micro-batch upserts by key.

Exactly-once story (the part worth being precise about): Structured
Streaming guarantees each micro-batch is delivered to ``foreachBatch``
*at least* once after a crash — the same (batch_id, data) can replay.
End-to-end exactly-once therefore needs the batch write to be
idempotent, and MERGE-by-key is: replaying an upsert of the same rows
rewrites identical values (asserted in tests/test_lakehouse.py and
tests/test_stream_ingest.py).  This is the standard foreachBatch +
MERGE idempotent-sink pattern, and it scales: each micro-batch costs
one shuffle on the key; with the Delta backend the target side prunes
to the files containing matched keys.

Within a micro-batch, arrival order is not a total order — if a batch
can carry several versions of one key, pass ``version_col`` so the
upsert deterministically keeps the highest-version row per key
(event-time wins, not file-listing order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from myhadoop_spark.operators.lakehouse import upsert_table


def latest_per_key(batch: DataFrame, key: str, version_col: str,
                   tiebreak: tuple[str, ...] = ()) -> DataFrame:
    """Collapse a batch to one row per key: max version wins; supply
    ``tiebreak`` columns to make equal-version picks deterministic."""
    w = Window.partitionBy(key).orderBy(
        F.col(version_col).desc(), *[F.col(c).desc() for c in tiebreak])
    return (batch
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn"))


def start_stream_upsert(stream_df: DataFrame, path: str, key: str,
                        checkpoint: str, version_col: str | None = None,
                        tiebreak: tuple[str, ...] = ()):
    """Start a streaming query that MERGEs every micro-batch into the
    table at ``path``.  Returns the StreamingQuery handle."""
    spark = stream_df.sparkSession

    def sink(batch: DataFrame, _batch_id: int) -> None:
        if version_col is not None:
            batch = latest_per_key(batch, key, version_col, tiebreak)
        upsert_table(spark, path, batch, key)

    return (stream_df.writeStream
            .outputMode("update")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(sink)
            .start())
