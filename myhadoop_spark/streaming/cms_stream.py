"""Streaming Count-Min Sketch — the CMS maintained across
micro-batches, cashing in the exact mergeability the batch operator
(operators/cms.py) pins: CMS(A ∪ B) = CMS(A) + CMS(B) bit-for-bit,
so the maintained sketch equals the one-shot sketch of everything the
stream has absorbed — not approximately, EXACTLY (test-pinned),
because the merge is integer addition on the depth × width key space.

State machine (the heavy_hitters_stream discipline, simplified by the
exact merge — no subtract rule, no counter drops):

    <path>/cms_v{batch_id}/   ≤ depth × width (j, bucket, c) rows
    <path>/meta.json          {last_batch, depth, width, total_items}

    v_N = cms_merge(v_{N-1}, cms_table(batch_N))

Crash/replay correctness: v_N is a pure function of (v_{N-1},
batch_N), so a replayed last batch overwrites cms_v_N with identical
content (idempotent skip on matching batch id); a batch id BELOW the
watermark means a recreated checkpoint lineage and fails loudly (the
under/double-count trap, same as the MG face). The previous version
is retained one-deep for recovery; older versions are swept.
Depth/width ride in the meta so a restart cannot silently merge
incomparable sketches.

Merge cost: the batch sketch is computed distributed (one bounded-key
aggregation); the merge is a union + groupBy over ≤ 2·depth·width
rows — bounded by CONFIGURATION, not data.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.fsutil import (
    hadoop_fs,
    read_small_file,
    write_small_file,
)
from myhadoop_spark.operators.cms import cms_estimate, cms_merge, cms_table


def _read_meta(spark: SparkSession, path: str) -> dict | None:
    raw = read_small_file(spark, f"{path}/meta.json")
    return json.loads(raw) if raw is not None else None


def start_cms_stream(stream_df: DataFrame, *, path: str, checkpoint: str,
                     term_col: str = "term", depth: int = 4,
                     width: int = 1024, stats: list | None = None):
    """Maintain the sketch per micro-batch (availableNow-friendly);
    query it any time with ``stream_estimate``. Pass ``stats`` (a
    list) to receive one {batch, total_items, state_rows, wall_s}
    dict per absorbed batch — the flat-per-batch study hook."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        import time as _time

        t0 = _time.time()
        spark = batch.sparkSession
        meta = _read_meta(spark, path)
        if meta is not None and (meta["depth"] != depth
                                 or meta["width"] != width):
            raise ValueError(
                f"CMS state at {path} was built with depth×width="
                f"{meta['depth']}×{meta['width']}; restarting with "
                f"{depth}×{width} would merge incomparable sketches")
        if meta is not None and batch_id == meta["last_batch"]:
            return  # crash-replay of the last batch — idempotent skip
        if meta is not None and batch_id < meta["last_batch"]:
            raise RuntimeError(
                f"CMS state at {path} was maintained up to batch "
                f"{meta['last_batch']} under a different checkpoint "
                f"lineage (got batch {batch_id}); restore the original "
                "checkpoint or start a fresh state path")
        if meta is not None and batch.isEmpty():
            return  # isEmpty stops at the first row — not a batch scan
        batch_cms = cms_table(batch, term_col, depth=depth, width=width)
        if meta is not None:
            prev = spark.read.parquet(
                f"{path}/cms_v{meta['last_batch']}")
            merged = cms_merge(prev, batch_cms)
        else:
            merged = batch_cms
        (merged.coalesce(1).write.mode("overwrite")
         .parquet(f"{path}/cms_v{batch_id}"))
        # total_items = the state's own j=0 row sum: every occurrence
        # lands in exactly one bucket of row 0, and the merge is exact
        # integer addition, so the all-history total is a ≤width-row
        # aggregate over the sketch just written — the batch is scanned
        # ONCE (the sketch aggregation), never a second count() pass
        # (VERDICT r9 #2). Reading back the written file also makes the
        # recorded total provably consistent with the persisted state.
        state = spark.read.parquet(f"{path}/cms_v{batch_id}")
        back = state.agg(
            F.sum(F.when(F.col("j") == 0, F.col("c"))).alias("tot"),
            F.count(F.lit(1)).alias("rows")).collect()[0]
        write_small_file(spark, f"{path}/meta.json",
                         json.dumps({"last_batch": batch_id,
                                     "depth": depth, "width": width,
                                     "total_items": int(back["tot"] or 0)}))
        keep = {f"cms_v{batch_id}"}
        if meta is not None:
            keep.add(f"cms_v{meta['last_batch']}")
        fs, root = hadoop_fs(spark, path)
        for status in fs.listStatus(root):
            name = status.getPath().getName()
            if name.startswith("cms_v") and name not in keep:
                fs.delete(status.getPath(), True)
        if stats is not None:
            stats.append({"batch": batch_id,
                          "total_items": int(back["tot"] or 0),
                          "state_rows": int(back["rows"]),
                          "wall_s": round(_time.time() - t0, 4)})

    return (stream_df.writeStream
            .foreachBatch(_process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def stream_estimate(spark: SparkSession, path: str, terms: DataFrame,
                    term_col: str = "term") -> DataFrame:
    """(term…, est) from the maintained sketch — est ≥ true over
    everything absorbed, est ≤ true + colliding mass. Depth/width come
    from the persisted meta (bound parameters live WITH the state)."""
    meta = _read_meta(spark, path)
    if meta is None:
        raise FileNotFoundError(f"no CMS stream state at {path}")
    cms = spark.read.parquet(f"{path}/cms_v{meta['last_batch']}")
    return cms_estimate(cms, terms, term_col,
                        depth=meta["depth"], width=meta["width"])
