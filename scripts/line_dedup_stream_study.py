"""Streaming line-dedup rehearsal: per-batch wall must stay flat
while batches accumulate — the maintained state is the distinct
line-key set, and with a realistic crawl mix (shared boilerplate
lines recur; unique lines drawn from a bounded pool) the seen set
saturates, so each batch pays one batch-sized explode + one
hash-partitioned anti-join against the seen table + one distinct
union, never a corpus-sized pass.

Appends: engine  batch  docs_in  docs_kept  seen  wall_s
(the money shape is wall_s flat from batch ~2 on while total docs
processed grows linearly; seen saturates toward the line pool size.)

Run: python scripts/line_dedup_stream_study.py [n_batches] [per_batch]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.operators.line_filter import split_lines
from myhadoop_spark.session import get_spark
from myhadoop_spark.streaming.line_dedup_stream import (
    start_line_dedup_stream,
)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    spark = get_spark("line_dedup_stream_study")
    out = Path("line_dedup_stream_study.tsv")
    if not out.exists():
        out.write_text("engine\tbatch\tdocs_in\tdocs_kept\tseen\twall_s\n")

    work = tempfile.mkdtemp(prefix="ldstream_study_")
    src = f"{work}/src"
    try:
        # one parquet file per micro-batch: each doc = one of 8 chrome
        # lines (duplicates corpus-wide) + 3 lines from a 50k pool
        # (some recur across batches, the crawl shape) — LCG, no RNG
        chrome = [" ".join(f"c{t}_{k}" for k in range(5))
                  for t in range(8)]
        for b in range(n_batches):
            rows = []
            for i in range(per_batch):
                g = b * per_batch + i
                x = g * 1103515245 + 12345
                ls = [chrome[i % 8]] + [
                    f"line {(x // (j + 1)) % 50_000} body {j}"
                    for j in range(3)]
                if i % 10 == 0:  # 10% of docs carry fresh content
                    ls.append(f"uniq {g} tail")
                rows.append((g, "\n".join(ls)))
            df = spark.createDataFrame(rows, "doc_id long, text string")
            df.coalesce(1).write.mode("append").parquet(src)

        stats: list = []
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1).parquet(src)
                  .withColumn("_l", split_lines("text", r"\n")))
        q = start_line_dedup_stream(
            stream, path=f"{work}/state", checkpoint=f"{work}/ck",
            lines_col_name="_l", stats=stats)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            time.sleep(0.2)

        prog = {int(p["batchId"]): float(p["batchDuration"]) / 1000.0
                for p in (q.recentProgress or []) if "batchId" in p}
        with out.open("a") as f:
            for s in stats:
                w = prog.get(s["batch"], float("nan"))
                f.write(f"myhadoop_spark\t{s['batch']}\t{s['docs_in']}\t"
                        f"{s['docs_kept']}\t{s['seen']}\t{w:.3f}\n")
                print(s, f"wall={w:.3f}")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
