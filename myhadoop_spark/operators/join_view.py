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
refreshes dominate.

Store lifecycle (every long-running append-maintained table needs
one — the ivf_index/bm25_index discipline):

  * ``compact_join_view`` folds committed ``append_id`` partitions
    into a single GENERATION partition (``gen-N``) per table, so
    partition count and file count stay flat over an unbounded
    refresh schedule instead of growing one directory per refresh
    (rehearsed in scripts/join_view_study.py). The fold is
    crash-safe: the new generation is written BESIDE the live data,
    a per-table ``_compact`` manifest flips readers atomically
    (tmp+rename, the fsutil idiom), and source/stale directories are
    deleted only after the flip — every crash window leaves readers
    on a complete, non-duplicated view, and re-running converges;
  * ``drop_view_appends`` is partition-level retention for
    time-correlated keys (appends arrive in time order, so the
    oldest append_ids ARE the expired window): the dropped ids are
    recorded in ``<path>/_dropped`` FIRST — the query face and every
    refresh exclude them immediately, the drop_buckets_before
    discipline — then the directories are deleted across all three
    tables; a crash mid-delete re-runs idempotently and compaction's
    cleanup sweep also removes leftovers. Run retention at least as
    often as compaction: once an append_id is folded into a
    generation its rows can only be retired by dropping the whole
    generation;
  * ``append_id`` namespaces: ``stream-*`` (streaming-face batches)
    and ``gen-*`` (compaction generations) are RESERVED — manual
    refreshes with such ids are rejected so a caller cannot silently
    overwrite a stream batch's partitions or masquerade as a live
    generation.

Reference analog: none — §2.3 extension surface (SURVEY.md §2.3);
standard incremental view maintenance (delta rules for SPJ views,
Gupta & Mumick's classic formulation) restricted to append-only
inputs.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.fsutil import (
    count_data_files,
    hadoop_fs,
    list_partition_dirs,
    read_small_file,
    write_small_file,
)

_STREAM_NS = "stream-"
_GEN_NS = "gen-"
_SIDES = ("view", "left", "right")


def _check_append_id(append_id: str) -> None:
    for ns, owner in ((_STREAM_NS, "start_join_view_stream"),
                      (_GEN_NS, "compact_join_view")):
        if append_id.startswith(ns):
            raise ValueError(
                f"append_id {append_id!r} is in the reserved "
                f"{ns}* namespace ({owner} names its partitions "
                "there); reusing it would silently overwrite them")


def _write_part(df: DataFrame, path: str, append_id: str) -> None:
    (df.withColumn("append_id", F.lit(append_id))
     .write.partitionBy("append_id")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(path))


def _read_manifest(spark: SparkSession, tpath: str) -> dict:
    raw = read_small_file(spark, f"{tpath}/_compact")
    return json.loads(raw) if raw is not None else {"live": None,
                                                    "folded": []}


def _read_dropped(spark: SparkSession, path: str) -> list[str]:
    raw = read_small_file(spark, f"{path}/_dropped")
    return json.loads(raw)["dropped"] if raw is not None else []


def _excluded_ids(spark: SparkSession, tpath: str,
                  dropped: list[str]) -> set[str]:
    """append_ids a reader of ``tpath`` must skip: non-live generation
    directories (incomplete folds / pre-flip leftovers), ids already
    folded into the live generation but not yet swept, and retired
    (dropped) ids whose deletes may not have landed yet. Empty in the
    steady state — the filter is elided entirely then."""
    man = _read_manifest(spark, tpath)
    stale = {v for v, _ in list_partition_dirs(spark, tpath, "append_id")
             if v.startswith(_GEN_NS) and v != man["live"]}
    return stale | set(man["folded"]) | set(dropped)


def _read_excluding(spark: SparkSession, path: str, schema: str,
                    append_id: str) -> DataFrame:
    df = (spark.read.schema(schema + ", append_id string")
          .option("basePath", path).parquet(path)
          .filter(F.col("append_id") != append_id))
    root = path.rsplit("/", 1)[0]
    excl = _excluded_ids(spark, path, _read_dropped(spark, root))
    if excl:
        df = df.filter(~F.col("append_id").isin(sorted(excl)))
    return df.drop("append_id")


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
    _check_append_id(append_id)
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
    overwrite. Either delta may be None/empty. ``stream-*`` and
    ``gen-*`` ids are reserved (module docstring)."""
    _check_append_id(append_id)
    return _refresh(path, key=key, append_id=append_id,
                    delta_left=delta_left, delta_right=delta_right,
                    spark=spark)


def _refresh(path: str, *, key: str, append_id: str,
             delta_left: DataFrame | None = None,
             delta_right: DataFrame | None = None,
             spark: SparkSession | None = None) -> DataFrame:
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
    """The materialized view: union of every refresh's delta rows
    (generation partitions after compaction), minus anything the
    lifecycle manifests exclude. ACTION-FREE: the manifest reads and
    the stale-generation listing are bounded driver-side file
    operations — no Spark job before the returned frame executes."""
    df = (spark.read.option("basePath", f"{path}/view")
          .parquet(f"{path}/view"))
    excl = _excluded_ids(spark, f"{path}/view",
                         _read_dropped(spark, path))
    if excl:
        df = df.filter(~F.col("append_id").isin(sorted(excl)))
    return df.drop("append_id")


# --------------------------------------------------------- lifecycle


def compact_join_view(spark: SparkSession, path: str, *,
                      keep: tuple[str, ...] = (),
                      files_per_gen: int = 4,
                      max_rows_per_file: int = 1_000_000) -> dict:
    """Fold each table's committed append_id partitions into one new
    GENERATION partition (``gen-N``) so directory/file counts stay
    flat over an unbounded refresh schedule.

    Crash-safe fold, per table: (1) cleanup — delete directories
    readers already exclude (stale generations, swept-fold leftovers,
    dropped ids); (2) write the new generation BESIDE the live data
    (readers still exclude it: not yet the manifest's live id);
    (3) flip ``_compact`` atomically (tmp+rename) — readers now serve
    the new generation and exclude its sources; (4) delete the source
    directories (crash here → step 1 of the next run finishes the
    sweep). Every window leaves exactly one complete copy visible.

    ``keep`` ids are never folded — the streaming face passes the
    in-flight batch id so a replayed batch's append_id-exclusion
    guard (and its dynamic-overwrite rewrite) still work.

    At scale: the fold reads only the folded partitions
    (partition-pruned basePath read), writes ``files_per_gen``
    parallel output files (re-split by ``max_rows_per_file``), and
    untouched ``keep`` partitions are never opened."""
    dropped = _read_dropped(spark, path)
    stats: dict[str, dict] = {}
    for side in _SIDES:
        tpath = f"{path}/{side}"
        fs, _ = hadoop_fs(spark, tpath)
        jvm = spark._jvm
        man = _read_manifest(spark, tpath)
        excl = _excluded_ids(spark, tpath, dropped)
        on_disk = list_partition_dirs(spark, tpath, "append_id")
        # (1) cleanup: anything excluded is invisible to readers and
        # can never become visible again — safe to sweep first
        for v, u in on_disk:
            if v in excl:
                fs.delete(jvm.org.apache.hadoop.fs.Path(u), True)
        live = [(v, u) for v, u in on_disk if v not in excl]
        sources = [(v, u) for v, u in live if v not in keep]
        if len(sources) <= 1:
            stats[side] = {"folded": 0, "files_before": 0,
                           "files_after": 0}
            continue
        gens = [int(v[len(_GEN_NS):]) for v, _ in on_disk
                if v.startswith(_GEN_NS) and v[len(_GEN_NS):].isdigit()]
        nxt = f"{_GEN_NS}{max(gens, default=0) + 1}"
        uris = [u for _, u in sources]
        before = count_data_files(spark, uris)
        # (2) write the new generation beside the live data
        (spark.read.option("basePath", tpath).parquet(*uris)
         .withColumn("append_id", F.lit(nxt))
         .repartition(files_per_gen)
         .write.partitionBy("append_id")
         .option("partitionOverwriteMode", "dynamic")
         .option("maxRecordsPerFile", max_rows_per_file)
         .mode("overwrite").parquet(tpath))
        # (3) atomic flip: readers move to the generation, excluding
        # its sources even while their directories still exist
        folded = sorted({v for v, _ in sources}
                        | {v for v in man["folded"]
                           if v in {d for d, _ in on_disk}})
        write_small_file(spark, f"{tpath}/_compact",
                         json.dumps({"live": nxt, "folded": folded}))
        # (4) sweep the folded sources
        for _, u in sources:
            fs.delete(jvm.org.apache.hadoop.fs.Path(u), True)
        after = count_data_files(spark, [f"{tpath}/append_id={nxt}"])
        stats[side] = {"folded": len(sources), "files_before": before,
                       "files_after": after}
    return stats


def drop_view_appends(spark: SparkSession, path: str,
                      append_ids: list[str]) -> dict:
    """Partition-level retention: retire whole refreshes (or whole
    generations) from the view and both mirrors. The retired ids are
    recorded in ``<path>/_dropped`` FIRST — the query face and every
    subsequent refresh exclude them from that moment, so a crash
    mid-delete never serves doomed rows (the drop_buckets_before
    discipline) — then the directories are deleted partition-
    atomically. Idempotent: re-running finishes a partial delete, and
    compaction's cleanup sweep also removes leftovers. Returns
    {deleted_dirs, dropped_ids}."""
    prev = _read_dropped(spark, path)
    on_disk: set[str] = set()
    listings = {}
    for side in _SIDES:
        listings[side] = list_partition_dirs(spark, f"{path}/{side}",
                                             "append_id")
        on_disk |= {v for v, _ in listings[side]}
    # prune manifest entries whose directories are fully gone
    doomed = set(append_ids) | (set(prev) & on_disk)
    write_small_file(spark, f"{path}/_dropped",
                     json.dumps({"dropped": sorted(doomed)}))
    deleted = 0
    jvm = spark._jvm
    for side in _SIDES:
        fs, _ = hadoop_fs(spark, f"{path}/{side}")
        for v, u in listings[side]:
            if v in doomed:
                fs.delete(jvm.org.apache.hadoop.fs.Path(u), True)
                deleted += 1
    return {"deleted_dirs": deleted, "dropped_ids": sorted(doomed)}


def start_join_view_stream(stream_left: DataFrame, *, path: str,
                           key: str, checkpoint: str,
                           compact_every: int | None = None):
    """Streaming face: each micro-batch of LEFT-side appends refreshes
    the view (dimension-side appends keep using refresh_join_view
    directly — the fact-stream / dimension-feed asymmetry). Replay of
    a crashed batch rewrites its own append_id partitions — exact
    idempotence, inherited from the refresh. Batch ids live in the
    reserved ``stream-*`` namespace; manual refreshes cannot collide
    with them (_check_append_id).

    ``compact_every=N`` folds the store every N batches, keeping the
    in-flight batch un-folded so crash replay stays exact; without
    it a long-running stream accumulates one directory per refresh
    (the pre-compaction IVF fragmentation shape,
    scripts/join_view_study.py)."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        aid = f"{_STREAM_NS}{batch_id}"
        _refresh(path, key=key, append_id=aid, delta_left=batch)
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_join_view(batch.sparkSession, path, keep=(aid,))

    return (stream_left.writeStream
            .foreachBatch(_process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
