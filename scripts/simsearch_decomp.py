"""simsearch_ivf cost decomposition (r6 verdict item 5 / r7 carry):
the gate query's median sits near ~2.8 s at sf0.1 with sched_s ≈ 3.5
— this script pins WHERE that cost lives by timing each phase as its
own action, same method as bench.py (noop sink, warm reps, median):

  train        train_centroids alone (one bounded 4096-row collect +
               in-driver Lloyd) — pure driver cost, shared by both
               the gate query and the production path
  ivf          ivf_neighbors — the PRODUCTION ANN probe path
  exact        simsearch_exact — the brute-force truth pass that
               exists ONLY to verify the recall bound in-query
  gate         simsearch_ivf — ivf + exact + recall join, the
               registered gate query

gate − ivf ≈ the price of the in-query recall verification (the
exact truth pass plus the recall join and its plan): the production
path a user runs carries none of it. Appends to simsearch_decomp.tsv:

    engine  sf  phase  rep0_s  rep1_s  rep2_s  median_s

Run: python scripts/simsearch_decomp.py [sf_dir]
(default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from myhadoop_spark.session import get_spark

REPS = 5


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf = Path(sf_dir).name.removeprefix("sf")
    spark = get_spark("simsearch_decomp")

    from pyspark.sql import functions as F

    from myhadoop_spark.catalog import load
    from myhadoop_spark.operators.ivf import train_centroids
    from myhadoop_spark.queries.simsearch import (
        _as_double,
        _dot,
        ivf_neighbors,
        simsearch_exact,
        simsearch_ivf,
    )

    def emb_frame():
        emb = load(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("v"))
        return emb.withColumn("nrm", F.sqrt(_dot("v", "v")))

    def run_train():
        train_centroids(emb_frame(), k=16, iterations=5)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    phases = {
        "train": run_train,
        "ivf": lambda: noop(ivf_neighbors(spark, sf_dir)),
        "exact": lambda: noop(simsearch_exact(spark, sf_dir)),
        "gate": lambda: noop(simsearch_ivf(spark, sf_dir)),
    }

    # warm-up: JVM + codegen on the full gate query, uncounted
    phases["gate"]()

    out = Path("simsearch_decomp.tsv")
    if not out.exists():
        out.write_text("engine\tsf\tphase\t"
                       + "\t".join(f"rep{i}_s" for i in range(REPS))
                       + "\tmedian_s\n")
    meds = {}
    for name, fn in phases.items():
        reps = []
        for _ in range(REPS):
            t0 = time.time()
            fn()
            reps.append(round(time.time() - t0, 3))
        meds[name] = statistics.median(reps)
        line = (f"myhadoop_spark\t{sf}\t{name}\t"
                + "\t".join(f"{t}" for t in reps)
                + f"\t{meds[name]:.3f}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip())
    print(f"verification premium (gate - ivf): "
          f"{meds['gate'] - meds['ivf']:.3f}s; production path = ivf")


if __name__ == "__main__":
    main()
