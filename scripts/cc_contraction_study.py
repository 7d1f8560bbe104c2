"""Contraction-vs-propagation CC study (r6).

ROADMAP's open candidate from the r2 negative results: label
ACCELERATION (shortcutting variants) lost to the materialized
pointer-jumping loop, leaving graph CONTRACTION
(large-star/small-star) as the untried alternative. This study runs
both algorithms on the cc_scaling synthetic graphs (90% 10-node
clusters + 10% 100-node chains — the near-dup shape) and records,
for contraction, the PER-ROUND EDGE CURVE: the property that matters
at 100 TB is that contraction's per-round shuffle is ∝ the shrinking
edge set while propagation re-shuffles the full |E| every round.

Appends to cc_contraction_study.tsv:

    engine  scale  n_edges  algo  iterations  wall_s  edge_curve

Run: python scripts/cc_contraction_study.py [scales...]  (default 1 10 100)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.operators import connected_components as cc_mod
from myhadoop_spark.session import get_spark
from scripts.cc_scaling import BASE_EDGES, synth_edges


def synth_cliques(spark: SparkSession, scale: int):
    """Dense near-dup shape: 10-node CLIQUES (45 edges each) — what an
    LSH cluster of mutual near-duplicates actually looks like. The
    star forest is 9 edges per clique, so contraction shrinks the
    maintained edge set 5×; the path-shaped cc_scaling fixture can't
    show that (paths are already tree-sized)."""
    n_cliques = BASE_EDGES * scale // 45
    nodes = spark.range(n_cliques * 10).select(
        F.col("id").alias("a"), (F.col("id") / 10).cast("long").alias("blk"))
    other = nodes.select(F.col("a").alias("b"), "blk")
    return (nodes.join(other, "blk")
            .filter(F.col("a") < F.col("b"))
            .select(F.col("a").alias("src"), F.col("b").alias("dst")))


def main() -> None:
    import os
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    shapes = tuple(os.environ.get("CC_STUDY_SHAPES",
                                  "path,clique").split(","))
    spark = get_spark("cc_contraction_study")
    out = Path("cc_contraction_study.tsv")
    if not out.exists():
        out.write_text("engine\tscale\tshape\tn_edges\talgo\titerations\t"
                       "wall_s\tedge_curve\n")
    for scale, shape in [(s, sh) for s in scales for sh in shapes]:
        gen = synth_edges if shape == "path" else synth_cliques
        edges = gen(spark, scale).localCheckpoint()
        n_edges = edges.count()
        runs = {}
        for algo, fn in (
                ("propagation", cc_mod.connected_components),
                ("contraction", cc_mod.connected_components_contraction)):
            stats: dict = {}
            t0 = time.time()
            labels = fn(edges, stats=stats)
            n = labels.count()
            wall = time.time() - t0
            runs[algo] = {r["id"]: r["component"]
                          for r in labels.collect()} if scale <= 10 else n
            # comparable per-round shuffled-row curves (r14, VERDICT
            # r13 item 5): propagation re-shuffles the full symmetrized
            # edge set every round (constant |sym| × iterations);
            # contraction's curve is its recorded shrinking edge set.
            # bytes ≈ rows × 16 (two longs) either way.
            if "edge_curve" not in stats and "sym_rows" in stats:
                stats["edge_curve"] = ([stats["sym_rows"]]
                                       * stats["iterations"])
            curve = ",".join(str(c) for c in stats.get("edge_curve", []))
            line = (f"myhadoop_spark\t{scale}\t{shape}\t{n_edges}\t{algo}\t"
                    f"{stats['iterations']}\t{wall:.2f}\t{curve}\n")
            with out.open("a") as f:
                f.write(line)
            print(line.strip())
        # cross-check: identical labelings (full dict at small scale,
        # node count otherwise)
        assert runs["propagation"] == runs["contraction"], (scale, shape)
    spark.stop()


if __name__ == "__main__":
    main()
