"""Interval-overlap-join scale rehearsal: candidate volume must track
co-bucketed intervals (≈ linear at fixed density), not per-key pairs.

Generates deterministic synthetic interval sets (no RNG: LCG on the
row index) over a time span that GROWS with n so density — intervals
per bucket — stays fixed, which is how a longer retention window
behaves at 100 TB. Records, at 1× and 10×:

  * pairs_out        overlapping pairs emitted (ground truth size)
  * candidates       rows surviving the bucket equi-join BEFORE the
                     residual overlap filter (the work the bucketing
                     actually pays — must grow ~linearly)
  * keypair_rows     the per-key all-pairs volume a keys-only
                     equi-join would feed its filter (the naive plan's
                     candidate count — grows ~quadratically per key)

plus a bucket-width sweep at 1× showing the width trade-off
(too narrow → explode rows; too wide → per-bucket all-pairs).
Appends to interval_join_study.tsv:

    engine  n_rows  op  bucket_w  wall_s  rows_out

Run: python scripts/interval_join_study.py [n ...]  (default 20000 200000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.operators.interval_join import interval_overlap_join
from myhadoop_spark.session import get_spark

N_KEYS = 50
SPAN_PER_ROW = 600          # seconds of timeline per interval → fixed density
W_DEFAULT = 8192


def intervals(spark, n: int, salt: int):
    span = n * SPAN_PER_ROW
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        (F.col("id") % N_KEYS).alias("key"))
    x = F.expr(f"(rid * 1103515245 + 12345 + {salt}) % 2147483648")
    lo = (x % F.lit(span)).cast("long")
    dur = (F.lit(600) + (x % F.lit(14000))).cast("long")
    return df.select(
        "key", F.col("rid").alias("id"), lo.alias("lo"),
        (lo + dur).alias("hi"))


def candidate_count(a, b, w: int):
    """Bucket-join volume before the residual filter — the operator's
    internals restated for measurement."""
    def side(df, p):
        return df.select(
            "key", F.col("lo").alias(f"{p}_lo"),
            F.col("hi").alias(f"{p}_hi"),
        ).withColumn("_bucket", F.explode(F.sequence(
            F.expr(f"{p}_lo div {w}"), F.expr(f"({p}_hi - 1) div {w}"))))
    return side(a, "a").join(side(b, "b"), ["key", "_bucket"]).count()


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [20_000, 200_000]
    spark = get_spark("interval_join_study")
    out = Path("interval_join_study.tsv")
    if not out.exists():
        out.write_text("engine\tn_rows\top\tbucket_w\twall_s\trows_out\n")

    def run(n: int, op: str, w, thunk):
        t0 = time.time()
        rows = thunk()
        line = (f"myhadoop_spark\t{n}\t{op}\t{w}\t"
                f"{time.time() - t0:.3f}\t{rows}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip())

    for n in counts:
        a = intervals(spark, n, 0).localCheckpoint()
        b = intervals(spark, n, 999_331).localCheckpoint()
        run(n, "pairs_out", W_DEFAULT,
            lambda: interval_overlap_join(
                a, b, keys=("key",), bucket_width=W_DEFAULT).count())
        run(n, "candidates", W_DEFAULT,
            lambda: candidate_count(a, b, W_DEFAULT))
        run(n, "keypair_rows", "-",
            lambda: a.groupBy("key").count().agg(
                F.sum(F.col("count")
                      * F.col("count"))).collect()[0][0])

    # width sweep at the small scale
    n = counts[0]
    a = intervals(spark, n, 0).localCheckpoint()
    b = intervals(spark, n, 999_331).localCheckpoint()
    for w in (1024, 8192, 65536, 1 << 20):
        run(n, "sweep_candidates", w, lambda: candidate_count(a, b, w))

    # hot cell: one key piles 2000 short intervals into one narrow time
    # range on each side. With a bucket much wider than the pile the
    # cell is all-pairs (quadratic CANDIDATES for pairs that mostly
    # don't overlap — a width misconfiguration); at a width near the
    # interval length the candidates collapse toward the true
    # overlapping pairs, which for a genuinely concurrent pile is the
    # irreducible OUTPUT (the edjoin tiny-tier precedent: output-bound,
    # not a plan defect). Width is the skew remedy.
    hn = 2_000
    hot = (spark.range(hn).select(
        F.lit(0).alias("key"), F.col("id").alias("id"),
        (F.col("id") * 7 % 20_000).cast("long").alias("lo"))
        .withColumn("hi", F.col("lo") + 64))
    hot_b = hot.select("key", (F.col("id") + 10_000).alias("id"),
                       "lo", "hi")
    true_pairs = interval_overlap_join(
        hot, hot_b, keys=("key",), bucket_width=64).count()
    run(hn, "hot_cell_pairs", 64, lambda: true_pairs)
    for w in (1 << 20, 4096, 64):
        run(hn, "hot_cell_candidates", w,
            lambda: candidate_count(hot, hot_b, w))

    spark.stop()


if __name__ == "__main__":
    main()
