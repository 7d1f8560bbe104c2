"""Boundary-band rehearsal for budget_select: the banded plan keeps
or drops whole score bands off a ≤ bands+1-row prefix table and sorts
ONLY the straddling band. Two corpora:

  * dispersed — scores spread over ~1000 values: the boundary band
    sorts ~n/bands rows (the money shape);
  * point-mass — one score value holds 2/3 of the corpus and the
    budget lands inside it: the boundary band IS the tie (the
    documented degeneracy; value bands cannot split equal keys — the
    quantize-plus-unimax path is the remedy when tie order may be
    hash order).

Appends: engine  n_docs  op  wall_s  sorted_rows  rows_out
  * sorted_rows = rows entering the cumulative-window branch
    (window spec: the whole corpus).

Run: python scripts/budget_select_study.py [n_docs] (default 200000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.operators.budget_select import (
    budget_select,
    budget_select_window,
)
from myhadoop_spark.session import get_spark

BANDS = 32


def _boundary_rows(docs, budget: int) -> int:
    """Rows of the single straddling band (what the banded plan
    sorts) — recomputed analytically with the operator's own band
    arithmetic."""
    st = docs.agg(F.min("score").alias("smin"),
                  F.max("score").alias("smax")).head()
    w = (st["smax"] - st["smin"]) // BANDS + 1
    b = (docs.withColumn("_band", ((-F.col("score") + st["smax"]) / w)
                         .cast("long"))
         .groupBy("_band").agg(F.sum("n_tokens").alias("s"),
                               F.count("*").alias("c"))
         .orderBy("_band").collect())
    off = 0
    for r in b:
        if off < budget < off + r["s"]:
            return r["c"]
        off += r["s"]
    return 0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("budget_select_study")
    out = Path("budget_select_study.tsv")
    if not out.exists():
        out.write_text(
            "engine\tn_docs\top\twall_s\tsorted_rows\trows_out\n")

    def corpus(point_mass: bool):
        score = (F.when(F.col("id") % 3 < 2, F.lit(100))
                 .otherwise((F.col("id") * 48271) % 997)
                 if point_mass
                 else (F.col("id") * 48271) % 997)
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            score.cast("long").alias("score"),
            (1 + (F.col("id") * 69621) % 40).cast("long")
            .alias("n_tokens")).localCheckpoint()

    def run(op, thunk, sorted_rows):
        t0 = time.time()
        rows = thunk().count()
        wall = time.time() - t0
        line = (f"myhadoop_spark\t{n}\t{op}\t{wall:.3f}\t"
                f"{sorted_rows}\t{rows}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip())

    for tag, pm in (("dispersed", False), ("pointmass", True)):
        docs = corpus(pm)
        budget = int(docs.agg(F.sum("n_tokens")).head()[0]) // 3
        run(f"budget_window_{tag}",
            lambda d=docs, bu=budget: budget_select_window(d, bu), n)
        run(f"budget_banded_{tag}",
            lambda d=docs, bu=budget: budget_select(d, bu, bands=BANDS),
            _boundary_rows(docs, budget))
    spark.stop()


if __name__ == "__main__":
    main()
