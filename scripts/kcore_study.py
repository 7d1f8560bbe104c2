"""k-core incremental-peel study (r12).

VERDICT r11 #2: ``core_numbers`` used to re-peel from the FULL edge
set for every k — an avoidable ~k_max× repeated-scan multiplier. The
fix peels each k from the (k−1)-core's surviving edges (containment:
k-core(G) = k-core((k−1)-core(G))). This study runs core_numbers on
synthetic dedup-shaped graphs (many small cliques + a few dense
families + chain tails) and records the PER-K SURVIVING EDGE CURVE —
the property that matters at 100 TB is that the k-th peel's input is
the previous core, not the original graph.

Also runs core_numbers_hindex on the same graphs: the h-index
fixpoint does the WHOLE decomposition in one loop (rounds = its
convergence depth) where the peel hierarchy pays one loop per k —
the rounds comparison is the 100 TB scheduling-cost story.

Appends to kcore_study.tsv:

    engine  scale  n_edges  k_max  wall_s  edges_per_k  full_rescan_cost  incremental_cost

where full_rescan_cost = k_max * n_edges (what the old plan scanned,
first-round input per peel) and incremental_cost = sum of the per-k
input sizes (n_edges + sum of surviving curves), both in edge-rows.

Run: python scripts/kcore_study.py [scales...]  (default 1 4 16)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from myhadoop_spark.operators.kcore import core_numbers, core_numbers_hindex
from myhadoop_spark.session import get_spark

OUT = Path(__file__).resolve().parent.parent / "kcore_study.tsv"


def _graph(scale: int) -> list[tuple[int, int]]:
    """Dedup-shaped: 60·scale 6-cliques (core 5), 2·scale 14-cliques
    (dense families, core 13), chain tails off every 10th clique."""
    edges: list[tuple[int, int]] = []
    base = 0
    for c in range(60 * scale):
        ids = list(range(base, base + 6))
        edges += [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
        if c % 10 == 0:
            edges += [(base, base + 1_000_000), (base + 1_000_000,
                                                 base + 1_000_001)]
        base += 6
    base = 10_000_000
    for _ in range(2 * scale):
        ids = list(range(base, base + 14))
        edges += [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
        base += 14
    return edges


def main() -> None:
    scales = [int(s) for s in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("kcore_study")
    new_file = not OUT.exists()
    with OUT.open("a") as f:
        if new_file:
            f.write("engine\tscale\tn_edges\tk_max\twall_s\t"
                    "edges_per_k\tfull_rescan_cost\t"
                    "incremental_cost\thindex_rounds\t"
                    "hindex_wall_s\tpeel_rounds_total\n")
        for scale in scales:
            edges = _graph(scale)
            df = spark.createDataFrame(edges, "src long, dst long")
            stats: dict = {}
            t0 = time.time()
            core_numbers(df, stats=stats).count()
            wall = time.time() - t0
            curve = stats["edges_per_k"]
            n_sym = curve[0][1] if curve else 0  # k=1 drops nothing on
            # this generator (no isolated vertices), so curve[0] is |E|sym
            k_max = curve[-1][0]
            full = k_max * n_sym
            incremental = n_sym + sum(n for _, n in curve[:-1])
            hstats: dict = {}
            t1 = time.time()
            core_numbers_hindex(df, stats=hstats).count()
            hwall = time.time() - t1
            peel_rounds = sum(r for _, r in
                              stats["iterations_per_k"])
            f.write(f"myhadoop_spark\t{scale}\t{len(edges)}\t{k_max}\t"
                    f"{wall:.2f}\t"
                    f"{','.join(str(n) for _, n in curve)}\t"
                    f"{full}\t{incremental}\t"
                    f"{hstats['iterations']}\t{hwall:.2f}\t"
                    f"{peel_rounds}\n")
            print(f"scale={scale} edges={len(edges)} k_max={k_max} "
                  f"wall={wall:.2f}s curve={[n for _, n in curve]} "
                  f"full={full} incr={incremental} "
                  f"hindex_rounds={hstats['iterations']} "
                  f"hindex_wall={hwall:.2f}s peel_rounds={peel_rounds}")
    spark.stop()


if __name__ == "__main__":
    main()
