"""Triangle-counting scale rehearsal: degree ordering must cap the
wedge volume that id ordering lets a hub explode.

Builds a deterministic skewed graph (every node i links to i+1 …
i+1+i%3 — a sparse backbone — PLUS a handful of hubs each linked to a
large block of nodes: the viral-document shape of a near-dup graph).
Measures, for degree-ordered vs id-ordered orientation, the WEDGE
count — the size of the first join, i.e. the rows the verify
semi-join must process — at 1× and 10×. Triangle output is asserted
identical under both orientations (orientation is a plan choice, not
a semantics choice). Appends to triangle_study.tsv:

    engine  n_nodes  orientation  wall_s  wedges  triangles

The id-ordered hub (low id) keeps ALL its out-edges and contributes
deg² wedges; degree ordering points hub edges INTO the hub, so its
wedge count collapses to the backbone's. This is Suri &
Vassilvitskii's last-reducer curse, measured.

Run: python scripts/triangle_study.py [node_counts...] (default 2000 20000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.operators.triangles import (
    _canonical_edges,
    oriented_edges,
)
from myhadoop_spark.session import get_spark

N_HUBS = 4


def skewed_edges(spark, n: int):
    backbone = (spark.range(n - 4).selectExpr(
        "id AS src", "explode(sequence(id + 1, id + 1 + id % 3)) AS dst")
        .filter(F.col("dst") < n))
    # hubs sit at MID-RANGE ids with neighbors striped across the whole
    # id space: under id ordering ~half the hub's edges point in and
    # half out, so the hub as a wedge middle contributes ~deg²/4 paths;
    # under degree ordering every hub edge points INTO the hub (it has
    # the max degree) and its middle-wedge count is zero
    hub_block = n // 4
    hubs = (spark.range(N_HUBS).alias("h").crossJoin(
        spark.range(hub_block).alias("m"))
        .selectExpr(f"h.id + {n // 2} AS src",
                    f"(m.id * 4 + h.id) % {n} AS dst")
        .filter(F.col("dst") != F.col("src")))
    return backbone.union(hubs)


def id_oriented(edges):
    return _canonical_edges(edges, "src", "dst").select(
        F.col("u").alias("a"), F.col("v").alias("b"))


def wedges_and_triangles(o):
    o = o.localCheckpoint()
    wedge = (o.alias("x").join(o.alias("y"), F.col("x.b") == F.col("y.a"))
             .select(F.col("x.a").alias("a"), F.col("x.b").alias("b"),
                     F.col("y.b").alias("c")))
    n_wedges = wedge.count()
    tri = wedge.join(
        o.select(F.col("a").alias("a2"), F.col("b").alias("c2")),
        (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")),
        "leftsemi")
    return n_wedges, tri.count()


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [2_000, 20_000]
    spark = get_spark("triangle_study")
    out = Path("triangle_study.tsv")
    if not out.exists():
        out.write_text(
            "engine\tn_nodes\torientation\twall_s\twedges\ttriangles\n")

    for n in counts:
        edges = skewed_edges(spark, n).localCheckpoint()
        results = {}
        for name, orient in (("degree", oriented_edges(edges)),
                             ("id", id_oriented(edges))):
            t0 = time.time()
            w, t = wedges_and_triangles(orient)
            results[name] = t
            line = (f"myhadoop_spark\t{n}\t{name}\t"
                    f"{time.time() - t0:.3f}\t{w}\t{t}\n")
            with out.open("a") as f:
                f.write(line)
            print(line.strip())
        assert results["degree"] == results["id"], results

    spark.stop()


if __name__ == "__main__":
    main()
