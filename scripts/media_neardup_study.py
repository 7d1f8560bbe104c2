"""Perceptual-hash media near-dup rehearsal (r12, VERDICT r11 #3).

The 100 TB property to rehearse: hamming_pairs' pigeonhole block join
generates candidates ∝ colliding-block pairs, never the n²/2
all-pairs the brute-force oracle computes. This study scales the
planted-grid generator (16·scale base images × 4 variants) and
records the candidate count the block join actually produced vs the
quadratic count the naive plan would have, plus the verified pair
count and wall time.

Appends to media_neardup_study.tsv:

    engine  scale  n_media  candidates  verified_pairs  brute_pairs  wall_s

Run: python scripts/media_neardup_study.py [scales...]  (default 1 4 16)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.operators.phash import dhash64
from myhadoop_spark.operators.simhash_join import (
    _block_bounds,
    _blocks,
    hamming_pairs,
)
from myhadoop_spark.session import get_spark

OUT = Path(__file__).resolve().parent.parent / "media_neardup_study.tsv"
V = 4


def _grids(spark, n_groups: int):
    base = spark.range(n_groups * V).select(
        F.col("id").alias("media_id"),
        (F.col("id") / V).cast("long").alias("g"),
        (F.col("id") % V).alias("v"))

    def pixel(idx: int):
        s = F.md5(F.concat_ws(":", F.col("g").cast("string"),
                              F.lit(str(idx))))
        pix = F.conv(F.substring(s, 1, 2), 16, 10).cast("int")
        hit = (F.col("v").isin(1, 2)
               & ((F.lit(7) * F.col("v") + F.col("g")) % 72
                  == F.lit(idx)))
        return F.when(hit, (pix + 128) % 256).otherwise(pix)

    return base.select(
        "media_id", F.array(*[pixel(i) for i in range(72)]).alias("grid"))


def main() -> None:
    scales = [int(s) for s in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("media_neardup_study")
    new_file = not OUT.exists()
    with OUT.open("a") as f:
        if new_file:
            f.write("engine\tscale\tn_media\tcandidates\t"
                    "verified_pairs\tbrute_pairs\twall_s\n")
        for scale in scales:
            n = 16 * scale * V
            sh = _grids(spark, 16 * scale).select(
                "media_id",
                dhash64(F.col("grid")).alias("dhash")).localCheckpoint()
            t0 = time.time()
            verified = hamming_pairs(
                sh, bits=64, max_hamming=2,
                id_col="media_id", sim_col="dhash").count()
            wall = time.time() - t0
            # candidate count = distinct colliding-block pairs, the
            # same derivation hamming_pairs joins before its verify
            b = _blocks(sh, "media_id", "dhash", _block_bounds(64, 3))
            cand = (b.select(F.col("_id").alias("id_a"), "bi", "bv")
                    .join(b.select(F.col("_id").alias("id_b"),
                                   "bi", "bv"), ["bi", "bv"])
                    .filter(F.col("id_a") < F.col("id_b"))
                    .select("id_a", "id_b").distinct().count())
            brute = n * (n - 1) // 2
            f.write(f"myhadoop_spark\t{scale}\t{n}\t{cand}\t"
                    f"{verified}\t{brute}\t{wall:.2f}\n")
            print(f"scale={scale} n={n} candidates={cand} "
                  f"verified={verified} brute={brute} wall={wall:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
