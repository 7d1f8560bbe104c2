"""Hot-line rehearsal for line_dedup (operators/line_dedup.py): one
line appears in ~95% of documents. A survivor plan that joins the
raw occurrences back against the per-key winner funnels every hot
occurrence through a single join task; the shipped plan's min(struct)
carries the winning row through the partial aggregation, so the hot
key collapses map-side and no task ever sees more than its own input
split.

Appends: engine  n_docs  op  wall_s  hot_occurrences  rows_out
  * hot_occurrences = rows the join-back plan funnels through one
    task for the hot line (the direct plan's per-task bound is the
    input split size regardless).

Run: python scripts/line_study.py [n_docs] (default 200000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.operators.line_dedup import line_dedup
from myhadoop_spark.operators.line_filter import split_lines
from myhadoop_spark.session import get_spark


def _joinback(docs, *, lines_col):
    """The r11 pre-optimization plan (kept here as the rehearsal
    strawman): survivor table joined back against raw occurrences."""
    base = (docs.withColumn("_lines", F.col(lines_col))
            .withColumn("n_lines", F.size("_lines").cast("long")))
    occ = (base.select(F.col("doc_id").alias("_id"),
                       F.posexplode("_lines").alias("_p0", "line"))
           .withColumn("pos", (F.col("_p0") + 1).cast("long"))
           .drop("_p0").withColumn("_key", F.col("line")))
    surv = (occ.groupBy("_key")
            .agg(F.min(F.struct("_id", "pos")).alias("_s")))
    kept = (occ.join(surv, "_key")
            .filter((F.col("_id") == F.col("_s._id"))
                    & (F.col("pos") == F.col("_s.pos")))
            .select("_id", "pos", "line"))
    return (kept.groupBy("_id")
            .agg(F.count("*").alias("n_kept")))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("line_study")
    out = Path("line_study.tsv")
    if not out.exists():
        out.write_text(
            "engine\tn_docs\top\twall_s\thot_occurrences\trows_out\n")

    # 95% of docs share one hot line; every doc adds two unique lines
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 20 < 19, F.lit("hot boilerplate line\n"))
            .otherwise(F.lit("")),
            F.concat_ws("\n",
                        F.concat(F.lit("u"), F.col("id"), F.lit(" a")),
                        F.concat(F.lit("u"), F.col("id"), F.lit(" b")))
        ).alias("text")).localCheckpoint()
    hot_n = docs.filter(F.col("text").startswith("hot")).count()

    def run(op, thunk, hot_occ):
        t0 = time.time()
        rows = thunk().count()
        wall = time.time() - t0
        line = (f"myhadoop_spark\t{n}\t{op}\t{wall:.3f}\t"
                f"{hot_occ}\t{rows}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip())

    d = docs.withColumn("_l", split_lines("text", r"\n"))
    run("line_dedup_joinback", lambda: _joinback(d, lines_col="_l"),
        hot_n)
    run("line_dedup_direct",
        lambda: line_dedup(d, lines_col="_l")
        .select("doc_id", "n_kept"),
        0)
    spark.stop()


if __name__ == "__main__":
    main()
