"""DSIR scale rehearsal: what must stay flat and what may grow linearly
when the pool grows 10×.

Runs the fit (bucket counts → log-ratio table) and the scoring
(broadcast ratio join + per-doc fold) on the deterministic synthetic
document source at 1× and 10× the sf0.1 corpus row count, recording
wall seconds and shuffle-write bytes per stage. Appends:

    engine  n_docs  op  wall_s  shuffle_write_bytes  rows_out

What the curve must show (and why it holds by construction):
  * dsir_fit — the bucket aggregation's OUTPUT is capped at B=4096
    rows regardless of corpus size (rows_out must be ≤ B at both
    scales); map-side combine keeps the shuffle ∝ buckets × partitions,
    so fit shuffle bytes stay ~flat while docs grow 10×.
  * dsir_score — the ratio table broadcasts (zero shuffle on that
    side); the only data-sized shuffle is the per-doc re-assembly
    groupBy, so score shuffle bytes grow ∝ feature occurrences —
    linear in docs, never docs².

Run: python scripts/dsir_scaling.py [doc_counts...]   (default 5000 50000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import StageMeter
from myhadoop_spark.operators.dsir import (
    bucket_log_ratios,
    doc_bucket_counts,
    dsir_weights,
)
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
    spark = get_spark("dsir_scaling")
    register_source(spark)
    meter = StageMeter(spark)
    out = Path("dsir_scaling.tsv")
    if not out.exists():
        out.write_text(
            "engine\tn_docs\top\twall_s\tshuffle_write_bytes\trows_out\n")

    def run(n_docs: int, op: str, thunk):
        meter.delta()
        t0 = time.time()
        result, rows = thunk()
        wall = time.time() - t0
        shuffled = meter.delta()["shuffle_write_bytes"]
        line = (f"myhadoop_spark\t{n_docs}\t{op}\t{wall:.3f}\t"
                f"{shuffled}\t{rows}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip())
        return result

    # uncounted warm-up (Python/Arrow worker spawn)
    w = synthetic_docs(spark, 1_000)
    doc_bucket_counts(w).count()

    for n in counts:
        docs = synthetic_docs(spark, n)
        t_cnt = doc_bucket_counts(docs.filter("doc_id % 10 = 0"))
        p_cnt = doc_bucket_counts(docs.filter("doc_id % 10 <> 0"))
        p_cnt = p_cnt.localCheckpoint()  # isolate fit vs score shuffles

        model = {}

        def _fit():
            m = bucket_log_ratios(t_cnt, p_cnt)
            m["ratios"] = m["ratios"].localCheckpoint()
            m["totals"] = m["totals"].localCheckpoint()
            model.update(m)
            return m, m["ratios"].count()

        run(n, "dsir_fit", _fit)

        def _score():
            scored = dsir_weights(p_cnt, model)
            return scored, scored.count()

        run(n, "dsir_score", _score)

    spark.stop()


if __name__ == "__main__":
    main()
