"""PageRank scale rehearsal: per-iteration cost must be one
ranks⋈edges join + one groupBy — linear in |E| — with plan size flat
in the iteration count (the lineage cuts).

Runs 5 pinned iterations (tol=0) over deterministic synthetic graphs
(hash-derived endpoints, avg out-degree 10) at 1× and 10× the edge
count, recording wall seconds and shuffle-write bytes. Appends:

    engine  n_edges  op  wall_s  shuffle_write_bytes  rows_out

What the curve must show (and why it holds by construction):
  * shuffle bytes grow ∝ edges (every iteration shuffles the
    contribution stream and the rank vector, never anything
    quadratic);
  * wall grows sub-linearly at fixed iterations (per-stage scheduling
    floor amortizes into real work as partitions fill).

Run: python scripts/pagerank_scaling.py [edge_counts...]
(default 30000 300000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bench import StageMeter
from myhadoop_spark.operators.pagerank import pagerank
from myhadoop_spark.session import get_spark

ITERS = 5


def synthetic_edges(spark, n_edges: int):
    """Deterministic pseudo-random digraph: n_nodes = n_edges/10
    (avg out-degree 10), endpoints from xxhash64 of the edge id —
    reproducible on any partitioning, includes dangling nodes (those
    drawn only as destinations)."""
    n_nodes = max(n_edges // 10, 2)
    return (spark.range(n_edges)
            .select(F.pmod(F.xxhash64(F.col("id")),
                           F.lit(n_nodes)).alias("src"),
                    F.pmod(F.xxhash64(F.col("id"), F.lit(1)),
                           F.lit(n_nodes)).alias("dst")))


def main() -> None:
    import os

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    counts = [int(a) for a in sys.argv[1:]] or [30_000, 300_000]
    spark = get_spark("pagerank_scaling")
    meter = StageMeter(spark)
    out = Path("pagerank_scaling.tsv")
    if not out.exists():
        out.write_text(
            "engine\tn_edges\top\twall_s\tshuffle_write_bytes\trows_out\n")

    pagerank(synthetic_edges(spark, 1_000), max_iterations=2,
             tol=0.0).count()  # warm-up

    for n in counts:
        edges = synthetic_edges(spark, n)
        meter.delta()
        t0 = time.time()
        stats: dict = {}
        ranks = pagerank(edges, max_iterations=ITERS, tol=0.0,
                         stats=stats)
        rows = ranks.count()
        wall = time.time() - t0
        shuffled = meter.delta()["shuffle_write_bytes"]
        line = (f"myhadoop_spark\t{n}\tpagerank(iters={ITERS})\t"
                f"{wall:.3f}\t{shuffled}\t{rows}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip(), "l1_curve:", [round(x, 6)
                                          for x in stats["l1_curve"]])

    spark.stop()


if __name__ == "__main__":
    main()
