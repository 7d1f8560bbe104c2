"""Residual-vs-raw PQ study (r6) — the r4 ledger's open candidate
("residual (vs raw) quantization") resolved with numbers.

FAISS's IVFADC quantizes RESIDUALS (v − assigned coarse centroid):
once the bucket mean is soaked up by the coarse quantizer, the
residual cloud is tighter and the same k_sub codebook entries cover
it more densely. This study measures recall@5 vs the exact top-k for
raw-coded and residual-coded PQ across m (codes per vector) and
refine (shortlist multiplier) on the driver embeddings fixture.

Appends to pq_residual_study.tsv:

    engine  sf_dir  n_vecs  m  refine  mode  recall_at_5

Run: python scripts/pq_residual_study.py [sf_dir]
(default /root/testdata/sf0.01)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark import registry
from myhadoop_spark.catalog import load
from myhadoop_spark.operators.ivf import train_centroids
from myhadoop_spark.operators.pq import (
    ivfpq_topk,
    train_pq_codebooks,
    train_residual_codebooks,
)
from myhadoop_spark.queries.simsearch import N_QUERIES, _as_double, _dot
from myhadoop_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("pq_residual_study")
    out = Path("pq_residual_study.tsv")
    if not out.exists():
        out.write_text("engine\tsf_dir\tn_vecs\tm\trefine\tmode\t"
                       "recall_at_5\n")

    emb = (load(spark, sf_dir, "embeddings")
           .select("vec_id", _as_double("embedding").alias("v"))
           .withColumn("nrm", F.sqrt(_dot("v", "v"))).localCheckpoint())
    n = emb.count()
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"))
    cents = train_centroids(emb, k=16, iterations=5)
    truth = {(r["q_id"], r["neighbor_id"]) for r in
             registry.get("simsearch_exact").fn(spark, sf_dir).collect()}

    for m in (8, 16):
        raw = train_pq_codebooks(emb, m=m)
        res = train_residual_codebooks(emb, cents, m=m)
        for refine in (4, 16):
            for mode, books, kw in (("raw", raw, {}),
                                    ("residual", res,
                                     {"residual": True})):
                got = {(r["q_id"], r["neighbor_id"]) for r in
                       ivfpq_topk(emb, q, cents, books,
                                  refine=refine, **kw).collect()}
                rec = len(truth & got) / len(truth)
                line = (f"myhadoop_spark\t{Path(sf_dir).name}\t{n}\t{m}\t"
                        f"{refine}\t{mode}\t{rec:.3f}\n")
                with out.open("a") as f:
                    f.write(line)
                print(line.strip())
    spark.stop()


if __name__ == "__main__":
    main()
