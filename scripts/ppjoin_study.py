"""PPJoin prefix-filter re-evaluation (ROADMAP r2 negative result,
unblocked by the r5 Zipfian corpus fixture).

Question: with a REALISTIC heavy-head gram distribution, does the
PPJoin prefix filter (Xiao et al. 2008) prune enough candidate pairs
to beat the size-ratio filter alone? The r2 measurement on the uniform
fixture said no (0.5% pruning, +4 s overhead) because uniformly-drawn
docs share even their rarest grams.

Method (same char-3-gram space as ngram_jaccard, τ = 0.75):
  * size-only candidates: all doc pairs with min/max gram-count ratio
    ≥ τ (the shipped generator, minus the source blocking — the
    synthetic corpus has one source);
  * prefix candidates: pairs sharing ≥ 1 gram within both docs'
    |g|−⌈τ|g|⌉+1 rarest grams (global frequency order, ties by gram
    id — the exact-recall PPJoin prefix), intersected with the size
    filter;
  * both candidate sets verified to yield the SAME final jaccard ≥ τ
    pairs (prefix filtering is lossless at this τ);
  * wall + candidate counts appended to ppjoin_study.tsv.

Run: python scripts/ppjoin_study.py [n_docs...] (default 2000 5000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.operators.ppjoin import prefix_candidates
from myhadoop_spark.session import get_spark
from myhadoop_spark.sources.synthetic import register as register_source

TAU = 0.75


def gram_table(spark, n: int, zipf: bool):
    docs = (spark.read.format("synthetic_docs")
            .option("rows", n).option("vocabSize", 20_000)
            .option("zipf", str(zipf).lower())
            .option("dupEvery", 10)  # planted near-dups so the recall
            # equality check below compares non-empty verified sets
            .option("numPartitions", spark.sparkContext.defaultParallelism)
            .load().select("doc_id", "text"))
    return (docs.filter(F.length("text") >= 3)
            .select("doc_id", F.array_sort(F.array_distinct(F.expr(
                "transform(sequence(1, length(text) - 2),"
                " i -> ascii(substring(text, i, 1)) * 65536"
                "    + ascii(substring(text, i + 1, 1)) * 256"
                "    + ascii(substring(text, i + 2, 1)))"))).alias("grams"))
            .localCheckpoint())


def size_candidates(grams):
    s = grams.select("doc_id", F.size("grams").alias("n"))
    a = s.select(F.col("doc_id").alias("doc1"), F.col("n").alias("n1"))
    b = s.select(F.col("doc_id").alias("doc2"), F.col("n").alias("n2"))
    ratio = (F.least("n1", "n2").cast("double")
             / F.greatest("n1", "n2").cast("double"))
    return (a.join(b, F.col("doc1") < F.col("doc2"))
            .filter(ratio >= TAU).select("doc1", "doc2"))


def ppjoin_prefix(grams):
    return prefix_candidates(grams, TAU)


def verified(grams, cand):
    g1 = grams.select(F.col("doc_id").alias("doc1"),
                      F.col("grams").alias("g1"))
    g2 = grams.select(F.col("doc_id").alias("doc2"),
                      F.col("grams").alias("g2"))
    inter = F.size(F.array_intersect("g1", "g2")).cast("double")
    tot = (F.size("g1") + F.size("g2")).cast("double")
    par = cand.sparkSession.sparkContext.defaultParallelism
    return (cand.repartition(par, "doc1")
            .join(g1, "doc1").join(g2, "doc2")
            .select("doc1", "doc2", (inter / (tot - inter)).alias("j"))
            .filter(F.col("j") >= TAU))


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [2_000, 5_000]
    spark = get_spark("ppjoin_study")
    register_source(spark)
    out = Path("ppjoin_study.tsv")
    if not out.exists():
        out.write_text("engine\tcorpus\tn_docs\tgenerator\twall_s\t"
                       "candidates\tverified_pairs\n")
    from myhadoop_spark.operators.ppjoin import (
        choose_generator,
        rarest_gram_rarity,
    )

    for zipf in (False, True):
        corpus = "zipf" if zipf else "uniform"
        for n in counts:
            grams = gram_table(spark, n, zipf)
            # r6: record the auto-selector's verdict for this corpus —
            # the choice must match the measured-best generator below
            choice = choose_generator(grams)
            rarity = rarest_gram_rarity(grams)
            line = (f"myhadoop_spark\t{corpus}\t{n}\t"
                    f"selector={choice}\t{rarity:.4f}\t0\t0\n")
            with out.open("a") as f:
                f.write(line)
            print(line.strip())
            rows = {}
            for name, gen in (("size_ratio", size_candidates),
                              ("ppjoin_prefix", ppjoin_prefix)):
                t0 = time.time()
                cand = gen(grams).localCheckpoint()
                n_cand = cand.count()
                n_ver = verified(grams, cand).count()
                wall = time.time() - t0
                rows[name] = n_ver
                line = (f"myhadoop_spark\t{corpus}\t{n}\t{name}\t"
                        f"{wall:.3f}\t{n_cand}\t{n_ver}\n")
                with out.open("a") as f:
                    f.write(line)
                print(line.strip())
            assert rows["size_ratio"] == rows["ppjoin_prefix"], \
                "prefix filter lost pairs — recall bug"
    spark.stop()


if __name__ == "__main__":
    main()
