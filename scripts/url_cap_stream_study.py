"""Streaming domain-cap rehearsal: per-batch wall must stay flat and
the counts state bounded by live domains while batches accumulate —
the state is (domain, kept) rows, never corpus-sized, and each batch
pays one banded cap + one domain-sized count merge.

Appends: engine  batch  kept_total  domains  wall_s
(kept_total saturates at domains × cap once every budget is spent —
the flat tail is the money shape: post-saturation batches cost the
same as early ones because the probe is budget-table-sized.)

Run: python scripts/url_cap_stream_study.py [n_batches] [per_batch]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from myhadoop_spark.session import get_spark
from myhadoop_spark.streaming.url_cap_stream import start_domain_cap_stream


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    cap = 2_000
    spark = get_spark("url_cap_stream_study")
    out = Path("url_cap_stream_study.tsv")
    if not out.exists():
        out.write_text("engine\tbatch\tkept_total\tdomains\twall_s\n")

    work = tempfile.mkdtemp(prefix="urlcap_study_")
    src = f"{work}/src"
    try:
        # one parquet file per micro-batch; 50 domains, one hot
        for b in range(n_batches):
            rows = [(b * per_batch + i,
                     "hot.com" if i % 4 != 0
                     else f"t{i % 49}.com")
                    for i in range(per_batch)]
            df = spark.createDataFrame(rows, "doc_id long, domain string")
            df.coalesce(1).write.mode("append").parquet(src)

        stats: list = []
        stream = (spark.readStream.schema("doc_id long, domain string")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_domain_cap_stream(
            stream, path=f"{work}/state", checkpoint=f"{work}/ck",
            cap=cap, stats=stats)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            time.sleep(0.2)

        # per-batch walls from Spark's own progress records
        prog = {int(p["batchId"]): float(p["batchDuration"]) / 1000.0
                for p in (q.recentProgress or []) if "batchId" in p}
        with out.open("a") as f:
            for s in stats:
                w = prog.get(s["batch"], float("nan"))
                f.write(f"myhadoop_spark\t{s['batch']}\t{s['kept']}\t"
                        f"{s['domains']}\t{w:.3f}\n")
                print(s, f"wall={w:.3f}")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
