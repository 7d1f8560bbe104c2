"""Incrementally-maintained materialized JOIN view — the missing
sibling of the continuous aggregate (operators/continuous_agg.py
maintains an AGGREGATE incrementally; this maintains an equi-JOIN):
V = A ⋈ B kept up to date as append-only deltas arrive, without ever
re-joining the full sources.

Delta algebra (append-only sources — the log/dimension-feed case;
updates/deletes belong to the MERGE/SCD2 surface, operators/merge.py):

    ΔV  =  ΔA ⋈ (B_old ∪ ΔB)  ∪  A_old ⋈ ΔB
        =  ΔA ⋈ B_new         ∪  A_old ⋈ ΔB

so one refresh joins each HISTORY mirror exactly once against a
BROADCAST delta — the persistent-index probe pattern
(operators/lsh_index.py): history is scanned, never shuffled, and the
output exchange is bounded by the new matches, not by history.

Layout (all three tables partitioned by ``append_id`` and maintained
with dynamic-partition overwrite, so a crash-replayed batch REWRITES
its own partitions — exact idempotence, the bloom_ingest emit
discipline):

  * ``<path>/left``, ``<path>/right`` — mirrors of the source rows;
  * ``<path>/view``  — the materialized join rows of each refresh.

The refresh reads mirrors EXCLUDING the current append_id (a crashed
batch's partial writes must not join the batch against itself — the
lsh_index replay guard).

Invariant (tested, bitwise vs a DuckDB join): after ANY append
schedule, ``query_view`` ≡ the one-shot A_total ⋈ B_total.

At 100 TB: the per-refresh history scan is the documented cost (same
trade as the LSH probe); bucket the mirrors on the join key via the
bucketed-table layout (tests/test_bucketing.py) when repeated
refreshes dominate, or bound mirror scans with partition-level
retention when the join key is time-correlated.

Reference analog: none — §2.3 extension surface (SURVEY.md §2.3);
standard incremental view maintenance (delta rules for SPJ views,
Gupta & Mumick's classic formulation) restricted to append-only
inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _write_part(df: DataFrame, path: str, append_id: str) -> None:
    (df.withColumn("append_id", F.lit(append_id))
     .write.partitionBy("append_id")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(path))


def _read_excluding(spark: SparkSession, path: str, schema: str,
                    append_id: str) -> DataFrame:
    return (spark.read.schema(schema + ", append_id string")
            .option("basePath", path).parquet(path)
            .filter(F.col("append_id") != append_id)
            .drop("append_id"))


def _schemas(left: DataFrame, right: DataFrame, key: str) -> tuple:
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(
            f"left/right share non-key columns {sorted(overlap)}; "
            "rename before building the view (the materialized rows "
            "carry both sides' columns flat)")
    return (", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                      for f in left.schema.fields),
            ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                      for f in right.schema.fields))


def build_join_view(left: DataFrame, right: DataFrame, path: str, *,
                    key: str, append_id: str = "base") -> None:
    """One-shot initialization: mirrors + the full join."""
    _schemas(left, right, key)  # validate column contract
    _write_part(left, f"{path}/left", append_id)
    _write_part(right, f"{path}/right", append_id)
    _write_part(left.join(right, key), f"{path}/view", append_id)


def refresh_join_view(path: str, *, key: str, append_id: str,
                      delta_left: DataFrame | None = None,
                      delta_right: DataFrame | None = None,
                      spark: SparkSession | None = None) -> DataFrame:
    """Apply one batch of appends; returns the delta view rows (also
    persisted under ``<path>/view/append_id=<id>``).

    ΔV = ΔA ⋈ B_new ∪ A_old ⋈ ΔB — each mirror scanned once, deltas
    broadcast, replay-exact via the append_id exclusion + dynamic
    overwrite. Either delta may be None/empty."""
    src = delta_left if delta_left is not None else delta_right
    if src is None:
        raise ValueError("at least one delta side is required")
    spark = spark or src.sparkSession
    dl_schema, dr_schema = None, None
    if delta_left is not None and delta_right is not None:
        dl_schema, dr_schema = _schemas(delta_left, delta_right, key)
    # mirrors as of BEFORE this batch (replay guard)
    if dl_schema is None:
        # derive schemas from the stored mirrors via a 1-row read
        probe = spark.read.option("basePath", f"{path}/left").parquet(
            f"{path}/left").drop("append_id")
        dl_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                              for f in probe.schema.fields)
        probe_r = spark.read.option("basePath", f"{path}/right").parquet(
            f"{path}/right").drop("append_id")
        dr_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                              for f in probe_r.schema.fields)
    left_old = _read_excluding(spark, f"{path}/left", dl_schema,
                               append_id)
    right_old = _read_excluding(spark, f"{path}/right", dr_schema,
                                append_id)

    parts = []
    if delta_left is not None:
        right_new = (right_old if delta_right is None
                     else right_old.unionByName(delta_right))
        parts.append(F.broadcast(delta_left).join(right_new, key))
    if delta_right is not None:
        parts.append(left_old.join(F.broadcast(delta_right), key))
    delta_view = parts[0]
    for p in parts[1:]:
        delta_view = delta_view.unionByName(p)
    # persist the delta view FIRST (readers see it only once its
    # partition lands), then the mirrors — a crash between the writes
    # replays into identical partition overwrites
    _write_part(delta_view, f"{path}/view", append_id)
    if delta_left is not None:
        _write_part(delta_left, f"{path}/left", append_id)
    if delta_right is not None:
        _write_part(delta_right, f"{path}/right", append_id)
    return delta_view


def query_view(spark: SparkSession, path: str) -> DataFrame:
    """The materialized view: union of every refresh's delta rows."""
    return (spark.read.option("basePath", f"{path}/view")
            .parquet(f"{path}/view").drop("append_id"))


def start_join_view_stream(stream_left: DataFrame, *, path: str,
                           key: str, checkpoint: str):
    """Streaming face: each micro-batch of LEFT-side appends refreshes
    the view (dimension-side appends keep using refresh_join_view
    directly — the fact-stream / dimension-feed asymmetry). Replay of
    a crashed batch rewrites its own append_id partitions — exact
    idempotence, inherited from refresh_join_view."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        refresh_join_view(path, key=key, append_id=f"b{batch_id}",
                          delta_left=batch)

    return (stream_left.writeStream
            .foreachBatch(_process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
