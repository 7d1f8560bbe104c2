"""Fuzzy-decontamination rehearsal: the bench side is broadcast and
the corpus side streams through narrow signature folds, so wall and
candidate volume must scale LINEARLY in the corpus while the bench
set stays fixed (eval sets don't grow with the crawl). Records the
candidate count (the only quadratic risk) beside the wall.

Appends: engine  n_corpus  n_bench  op  wall_s  candidates  hits
Run: python scripts/fuzzy_decontam_study.py [n_corpus] (default 200000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.queries.dedup import _hashed_token_sets
from myhadoop_spark.queries.fuzzy_decontam import fuzzy_contaminated
from myhadoop_spark.session import get_spark


def _docs(spark, n, bench=False):
    # 10-word docs over a 5k vocab; every 50th corpus doc is a light
    # paraphrase of a bench doc (2 words swapped)
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit("w"),
                     ((F.col("id") * (j * 2 + 3) + j) % 5000)
                     .cast("string"))
            for j in range(10)]).alias("text"))
    if bench:
        return base
    return base.withColumn(
        "text",
        F.when(F.col("doc_id") % 50 == 0,
               F.concat_ws(" ", *[
                   F.concat(F.lit("w"),
                            (((F.col("doc_id") % 200) * (j * 2 + 3) + j)
                             % 5000).cast("string"))
                   for j in range(8)] + [F.lit("x1"), F.lit("x2")]))
        .otherwise(F.col("text")))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_bench = 200
    spark = get_spark("fuzzy_decontam_study")
    out = Path("fuzzy_decontam_study.tsv")
    if not out.exists():
        out.write_text(
            "engine\tn_corpus\tn_bench\top\twall_s\tcandidates\thits\n")

    bs = _hashed_token_sets(spark, "", docs=_docs(spark, n_bench,
                                                  bench=True))
    bs = bs.localCheckpoint()
    for scale in (n // 4, n):
        cs = _hashed_token_sets(
            spark, "", docs=_docs(spark, scale),
            wide=True).localCheckpoint()
        t0 = time.time()
        hits = fuzzy_contaminated(spark, cs, bs, threshold=0.5).count()
        wall = time.time() - t0
        # candidate volume (pre-verify) — the quadratic risk metric
        from myhadoop_spark.queries.dedup import minhash_signatures
        sc = minhash_signatures(spark, "", sets=cs)
        sb = minhash_signatures(spark, "", sets=bs)
        cand = (sc.join(F.broadcast(
            sb.select(F.col("doc_id").alias("b"), "band", "band_sig")),
            ["band", "band_sig"]).select("doc_id", "b")
            .distinct().count())
        line = (f"myhadoop_spark\t{scale}\t{n_bench}\tfuzzy_decontam\t"
                f"{wall:.3f}\t{cand}\t{hits}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip())
    spark.stop()


if __name__ == "__main__":
    main()
