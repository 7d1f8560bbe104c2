"""Streaming continuous-aggregate rehearsal (r6): the flat-per-batch
claim, measured — NOT assumed — across >=50 accumulated micro-batches.

The r5 design landed every micro-batch under <path>/raw/batch_id=N and
re-read the WHOLE store each refresh: per-batch listing + footer reads
grew linearly with history (the r5 verdict's #1 finding). The r6 store
is partitioned raw_bucket (epoch secs of the event's time bucket) then
batch_id; each refresh selects only tail directories via one bounded
driver-side top-level listing, and the post-refresh sweep deletes
directories below the (monotonic) watermark floor. This script drives
a 50-batch in-order stream through that face and records the per-batch
series the operator's stats hook exposes:

    rollup_stream_study.tsv:
    engine  batch  cum_rows  events_read  raw_dirs  raw_files  \
        input_bytes  wall_s

Flatness criteria (the r5 verdict's "done" bar): events_read, raw_dirs,
raw_files, and input_bytes must NOT trend upward with batch index —
batch 50 costs what batch 5 cost, despite 10x the accumulated history.

Run: python scripts/rollup_stream_study.py [n_batches] [rows_per_batch]
(default 50 20000)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.operators.continuous_agg import start_rollup_stream
from myhadoop_spark.session import get_spark


def batch_events(spark, n: int, batch: int, minutes: int = 60):
    """n deterministic events inside batch's own [batch*1h, +1h) hour —
    an in-order stream (the realistic arrival shape; late arrivals are
    the tests' job, tests/test_continuous_agg.py)."""
    base = 1_700_000_000 + batch * minutes * 60
    return (spark.range(n)
            .select(F.timestamp_seconds(
                F.lit(base) + F.pmod(F.hash(F.col("id").cast("string")),
                                     F.lit(minutes * 60))).alias("ts"),
                (F.col("id") % 1000).alias("user_id"),
                F.when(F.col("id") % 3 == 0, "click")
                .otherwise("view").alias("event_type"),
                (F.col("id") % 17).cast("double").alias("value")))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("rollup_stream_study")
    from scripts.ivf_index_study import InputMeter

    meter = InputMeter(spark)
    base = "/tmp/rollup_stream_study"
    os.system(f"rm -rf {base}")
    src = f"{base}/src"
    for b in range(n_batches):
        (batch_events(spark, per_batch, b).coalesce(1)
         .write.parquet(f"{src}/w{b:03d}"))

    out = Path("rollup_stream_study.tsv")
    out.write_text("engine\tbatch\tcum_rows\tevents_read\traw_dirs\t"
                   "raw_files\tinput_bytes\twall_s\n")

    walls: list[float] = []
    bytes_per_batch: list[int] = []
    last = {"t": 0.0}

    # the stats hook runs driver-side at the end of each foreachBatch —
    # piggyback exact per-batch wall + executor inputBytes deltas on it
    class TimingList(list):
        def append(self, item):  # noqa: A003
            now = time.time()
            walls.append(now - last["t"])
            last["t"] = now
            bytes_per_batch.append(meter.delta())
            super().append(item)

    stats = TimingList()
    meter.delta()
    stream = (spark.readStream
              .schema("ts timestamp, user_id long, event_type string, "
                      "value double")
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    last["t"] = time.time()
    q = start_rollup_stream(stream, path=f"{base}/rollup",
                            checkpoint=f"{base}/ckpt", stats=stats)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    cum = 0
    with out.open("a") as f:
        for i, s in enumerate(stats):
            cum += per_batch
            line = (f"myhadoop_spark\t{s['batch_id']}\t{cum}\t"
                    f"{s['events_read']}\t{s['raw_dirs']}\t"
                    f"{s['raw_files']}\t{bytes_per_batch[i]}\t"
                    f"{walls[i]:.3f}\n")
            f.write(line)
    head = stats[2:7]
    tail = stats[-5:]

    def _avg(rows, k):
        return sum(r[k] for r in rows) / len(rows)

    print(f"batches={len(stats)} cum_rows={cum}")
    for k in ("events_read", "raw_dirs", "raw_files"):
        print(f"{k}: early(3-7)={_avg(head, k):.1f} "
              f"last5={_avg(tail, k):.1f}")
    print(f"wall: early={sum(walls[2:7])/5:.2f}s last5="
          f"{sum(walls[-5:])/5:.2f}s")
    print(f"input_bytes: early={sum(bytes_per_batch[2:7])/5:.0f} "
          f"last5={sum(bytes_per_batch[-5:])/5:.0f}")
    os.system(f"rm -rf {base}")
    spark.stop()


if __name__ == "__main__":
    main()
