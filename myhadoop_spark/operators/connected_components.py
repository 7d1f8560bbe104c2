"""Connected components via iterative min-label propagation.

The missing last step of near-duplicate deduplication: LSH + verify
emits PAIRS; keep-one-per-group needs the transitive closure — cluster
ids. Spark has no built-in CC (GraphFrames isn't in the image), so this
is the classic iterative DataFrame algorithm:

    label(v) ← min(label(v), min over neighbors u of label(u))

iterated to fixpoint. Each round is one join + one aggregation (both
shuffle on the node id); convergence takes O(diameter) rounds — near-dup
graphs are dense clusters with tiny diameters, so typically 2-4 rounds.
Lineage is cut every round (localCheckpoint) so the plan doesn't grow
exponentially — the standard discipline for iterative DataFrame jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iterations: int = 20,
                         stats: dict | None = None) -> DataFrame:
    """[src, dst] edge list → [id, component] where component is the
    smallest node id reachable from `id`. Nodes only appear if they
    occur in some edge (callers union isolated nodes as self-edges if
    they want them represented). Pass a dict as `stats` to receive
    {"iterations": n} — the convergence datapoint the scaling study
    (scripts/cc_scaling.py) records."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    n_changed = 0
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        # carry the pre-round label through the pipeline so convergence
        # detection needs no extra join-with-old (and no second action):
        # each round is exactly ONE Spark action — the count() below
        # both materializes the lazy checkpoint and measures progress.
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.col("component").alias("prev"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        )
        # pointer jumping (shortcutting): also adopt the label of the
        # current label-node. Each round then roughly squares the
        # propagation reach, so convergence is O(log diameter) — long
        # similarity chains (which near-dup graphs DO produce; observed
        # diameter > 20 on the sf0.1 embedding graph) converge in a few
        # rounds instead of diameter rounds.
        lbl2 = updated.select(F.col("id").alias("cid"),
                              F.col("component").alias("ccomp"))
        shortcut = (
            updated.join(lbl2, updated.component == lbl2.cid, "left")
            .select(
                "id",
                "prev",
                F.least(F.col("component"),
                        F.coalesce(F.col("ccomp"), F.col("component")))
                .alias("component"),
            )
        )
        shortcut = shortcut.localCheckpoint(eager=False)
        n_changed = shortcut.filter(F.col("component") < F.col("prev")).count()
        labels = shortcut.select("id", "component")
        if n_changed == 0:
            break
    if stats is not None:
        stats["iterations"] = rounds
    if n_changed != 0:
        # silent wrong labels would under-merge clusters downstream
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            f"iterations ({n_changed} labels still changing) — graph "
            "diameter exceeds the budget; raise max_iterations")
    return labels
