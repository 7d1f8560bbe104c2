"""Streaming boilerplate-strip rehearsal: per-batch wall must stay
flat while batches accumulate — the maintained state is the (g, df)
shingle-vocabulary table, and with a realistic template corpus the
vocabulary saturates (chrome shingles repeat; filler grows slowly),
so each batch pays one batch-sized explode + one vocab-sized merge,
never a corpus-sized pass.

Appends: engine  batch  docs  vocab  boiler  wall_s
(vocab = maintained df-table rows, boiler = rows at df >= min_df; the
money shape is wall_s flat from batch ~2 on while docs-processed
grows linearly.)

Run: python scripts/boilerplate_stream_study.py [n_batches] [per_batch]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from myhadoop_spark.session import get_spark
from myhadoop_spark.streaming.boilerplate_stream import (
    start_boilerplate_stream,
)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    min_df = 50
    spark = get_spark("boilerplate_stream_study")
    out = Path("boilerplate_stream_study.tsv")
    if not out.exists():
        out.write_text("engine\tbatch\tdocs\tvocab\tboiler\twall_s\n")

    work = tempfile.mkdtemp(prefix="bpstream_study_")
    src = f"{work}/src"
    try:
        # one parquet file per micro-batch: every doc carries one of 8
        # chrome templates (boilerplate candidates) plus unique filler
        # drawn from a RECURRING word pool (vocab saturates, as in a
        # real crawl) — LCG on the row index, no RNG
        chrome = [" ".join(f"c{t}_{k}" for k in range(6))
                  for t in range(8)]
        for b in range(n_batches):
            rows = []
            for i in range(per_batch):
                x = (b * per_batch + i) * 1103515245 + 12345
                words = " ".join(
                    f"w{(x // (j + 1)) % 2000}" for j in range(10))
                rows.append((b * per_batch + i,
                             f"{chrome[i % 8]} {words}"))
            df = spark.createDataFrame(rows, "doc_id long, text string")
            df.coalesce(1).write.mode("append").parquet(src)

        stats: list = []
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_boilerplate_stream(
            stream, path=f"{work}/state", checkpoint=f"{work}/ck",
            min_df=min_df, n=2, stats=stats)
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
                f.write(f"myhadoop_spark\t{s['batch']}\t{s['docs']}\t"
                        f"{s['vocab']}\t{s['boiler']}\t{w:.3f}\n")
                print(s, f"wall={w:.3f}")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
