"""Streaming-CMS rehearsal: the flat-per-batch claim, measured.

The maintained sketch's state is depth × width integers regardless of
how much the stream has absorbed, so batch N must cost what batch 5
cost — no history re-read, no state growth. This drives an
n_batches-file stream through start_cms_stream (maxFilesPerTrigger=1)
and records the operator's own stats hook:

    cms_stream_study.tsv:
    engine  batch  total_items  state_rows  wall_s

Flatness criteria: state_rows pinned ≤ depth × width at EVERY batch
(the whole point of a sketch), wall_s flat in batch index while
total_items grows linearly.

Run: python scripts/cms_stream_study.py [n_batches] [rows_per_batch]
(default 40 20000)
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.session import get_spark
from myhadoop_spark.streaming.cms_stream import start_cms_stream

D, W = 4, 1024


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("cms_stream_study")
    out = Path("cms_stream_study.tsv")
    if not out.exists():
        out.write_text("engine\tbatch\ttotal_items\tstate_rows\twall_s\n")

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        # one file per batch; Zipf-ish vocabulary via modular skew
        for b in range(n_batches):
            (spark.range(rows)
             .select(F.concat(
                 F.lit("t"),
                 (F.pmod(F.hash((F.col("id") + b * rows).cast("string")),
                         F.lit(5000)) % (F.lit(1)
                                         + F.pmod(F.col("id"), F.lit(200))))
                 .cast("string")).alias("term"))
             .coalesce(1).write.mode("append").parquet(src))
        stats: list = []
        stream = (spark.readStream.schema("term string")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_cms_stream(stream, path=f"{tmp}/cms",
                             checkpoint=f"{tmp}/ck",
                             depth=D, width=W, stats=stats)
        q.processAllAvailable()
        q.stop()
        time.sleep(0.3)
        with out.open("a") as f:
            for s in stats:
                assert s["state_rows"] <= D * W, s
                f.write(f"myhadoop_spark\t{s['batch']}\t{s['total_items']}"
                        f"\t{s['state_rows']}\t{s['wall_s']}\n")
                print(s)
    spark.stop()


if __name__ == "__main__":
    main()
