"""Global-index scale rehearsal: the id assignment must stay one range
shuffle + a #partitions-bounded driver collect as the data grows.

Runs assign_global_index on the deterministic synthetic document
source at 1× and 10× the sf0.1 corpus row count, recording wall
seconds and shuffle-write bytes. Appends:

    engine  n_docs  op  wall_s  shuffle_write_bytes  rows_out

What the curve must show (and why it holds by construction):
  * shuffle bytes grow ∝ rows (ONE range exchange of the key columns —
    never the quadratic/window alternative, which would funnel every
    row through one partition);
  * the driver-side state is the per-partition count list — its size
    is the PARTITION count at both scales, not the row count (printed
    as n_parts for the record).

Run: python scripts/indexing_scaling.py [doc_counts...]  (default 5000 50000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import StageMeter
from myhadoop_spark.operators.indexing import assign_global_index
from myhadoop_spark.session import get_spark
from myhadoop_spark.sources.synthetic import register as register_source


def synthetic_docs(spark, n: int):
    return (spark.read.format("synthetic_docs")
            .option("rows", n)
            .option("vocabSize", 20_000)
            .option("dupEvery", 10)
            .load())


def main() -> None:
    import os

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    counts = [int(a) for a in sys.argv[1:]] or [5_000, 50_000]
    spark = get_spark("indexing_scaling")
    register_source(spark)
    meter = StageMeter(spark)
    out = Path("indexing_scaling.tsv")
    if not out.exists():
        out.write_text(
            "engine\tn_docs\top\twall_s\tshuffle_write_bytes\trows_out\n")

    assign_global_index(synthetic_docs(spark, 1_000),
                        ["doc_id"]).count()  # warm-up

    for n in counts:
        docs = synthetic_docs(spark, n).select("doc_id", "gen_partition")
        meter.delta()
        t0 = time.time()
        idx = assign_global_index(docs, ["gen_partition", "doc_id"])
        rows = idx.count()
        wall = time.time() - t0
        shuffled = meter.delta()["shuffle_write_bytes"]
        n_parts = spark.sparkContext.defaultParallelism
        line = (f"myhadoop_spark\t{n}\tglobal_index(parts={n_parts})\t"
                f"{wall:.3f}\t{shuffled}\t{rows}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip())

    spark.stop()


if __name__ == "__main__":
    main()
