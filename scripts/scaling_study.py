"""Scaling study — the engine's reproduction of the reference's actual
benchmark matrix plus a scale-factor sweep.

Part A (reference parity bench): WordCount over the reference's own
corpus volumes 512/768/1024/2048 (/root/reference/run_client_times.py:8
ran exactly this workload on 16 datanodes; the corpus lives at
/root/reference/fs/input/wordcount/). One engine number per volume.

Part B (scale sweep): headline queries at sf0.001/0.01/0.1 — wall time
vs data size, the near-linearity evidence for the 100 TB argument.

Writes scaling_study.tsv; prints a summary.
Usage: python scripts/scaling_study.py [reps]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from myhadoop_spark import registry
from myhadoop_spark.mapreduce import run_wordcount_fast
from myhadoop_spark.session import get_spark

REF_CORPUS = Path("/root/reference/fs/input/wordcount")
VOLUMES = ["512", "768", "1024", "2048"]
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
HEADLINE = ["wc", "agg_q1", "join_multi", "window_fns", "simhash",
            "stream_window", "topk", "dedup_minhash", "ngram_jaccard",
            "embed_neardup"]


def timed(fn, reps: int) -> float:
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return round(statistics.median(times), 3)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("scaling-study")
    rows = []

    if REF_CORPUS.exists():
        # warm-up
        run_wordcount_fast(spark, str(REF_CORPUS / "512")).count()
        for vol in VOLUMES:
            path = REF_CORPUS / vol
            if not path.exists():
                continue
            mib = sum(f.stat().st_size for f in path.iterdir()) / 2**20
            t = timed(lambda: run_wordcount_fast(spark, str(path))
                      .write.format("noop").mode("overwrite").save(), reps)
            rows.append(("ref_wordcount", vol, f"{mib:.1f}MiB", t))
            print(f"ref_wordcount\t{vol}\t{mib:.1f}MiB\t{t}s")

    for name in HEADLINE:
        fn = registry.get(name).fn
        fn(spark, SF_DIRS[0]).write.format("noop").mode("overwrite").save()
        for sf_dir in SF_DIRS:
            sf = Path(sf_dir).name
            t = timed(lambda: fn(spark, sf_dir)
                      .write.format("noop").mode("overwrite").save(), reps)
            rows.append((name, sf, "", t))
            print(f"{name}\t{sf}\t\t{t}s")

    with open("scaling_study.tsv", "w") as f:
        f.write("workload\tvolume\tsize\twall_s\n")
        for r in rows:
            f.write("\t".join(map(str, r)) + "\n")

    # scaling factors sf0.01→sf0.1 (10× data)
    by = {(r[0], r[1]): r[3] for r in rows}
    print("\n10x-data scaling factors (sf0.01 -> sf0.1; linear would be <=10):")
    for name in HEADLINE:
        a, b = by.get((name, "sf0.01")), by.get((name, "sf0.1"))
        if a and b and a > 0:
            print(f"  {name}: {b/a:.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
