"""langid scale rehearsal (the dsir_scaling discipline): the weight
table must stay CONFIGURATION-bounded (≤ langs × buckets rows) while
train shuffle stays ~flat and scoring grows linearly when the corpus
grows 10×.

Appends: engine  n_docs  op  wall_s  shuffle_write_bytes  rows_out
  * langid_train — rows_out = weight-table rows, pinned ≤ langs ×
    buckets at BOTH scales (the broadcast-ability claim); its shuffle
    carries (lang, bucket) partials, ∝ partitions × langs × buckets,
    ~flat in docs.
  * langid_predict — rows_out = docs scored; the one doc-sized
    groupBy is the only data-proportional shuffle.

Run: python scripts/langid_study.py [doc_counts...] (default 5000 50000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bench import StageMeter
from myhadoop_spark.operators.langid import predict_lang, train_langid
from myhadoop_spark.session import get_spark
from myhadoop_spark.sources.synthetic import register as register_source

BUCKETS = 4096


def synthetic_docs(spark, n: int):
    docs = (spark.read.format("synthetic_docs")
            .option("rows", n).option("vocabSize", 20_000).load())
    lang = (F.when(F.col("doc_id") % 10 < 4, F.lit("en"))
            .otherwise(F.concat(F.lit("l"),
                                (F.col("doc_id") % 10).cast("string"))))
    return docs.withColumn("lang", lang)


def main() -> None:
    import os

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    counts = [int(a) for a in sys.argv[1:]] or [5_000, 50_000]
    spark = get_spark("langid_study")
    register_source(spark)
    meter = StageMeter(spark)
    out = Path("langid_study.tsv")
    if not out.exists():
        out.write_text(
            "engine\tn_docs\top\twall_s\tshuffle_write_bytes\trows_out\n")

    def run(n_docs: int, op: str, thunk):
        meter.delta()
        t0 = time.time()
        rows = thunk()
        wall = time.time() - t0
        shuffled = meter.delta()["shuffle_write_bytes"]
        line = (f"myhadoop_spark\t{n_docs}\t{op}\t{wall:.3f}\t"
                f"{shuffled}\t{rows}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip())

    train_langid(synthetic_docs(spark, 500)).count()  # warm-up

    for n in counts:
        docs = synthetic_docs(spark, n).localCheckpoint()
        box = {}

        def _train():
            w = train_langid(docs.filter(F.col("doc_id") % 5 != 0),
                             buckets=BUCKETS).localCheckpoint()
            box["w"] = w
            rows = w.count()
            n_langs = w.select("lang").distinct().count()
            assert rows <= n_langs * BUCKETS, (rows, n_langs)
            return rows

        run(n, "langid_train", _train)
        run(n, "langid_predict",
            lambda: predict_lang(docs.filter(F.col("doc_id") % 5 == 0),
                                 box["w"], buckets=BUCKETS).count())

    spark.stop()


if __name__ == "__main__":
    main()
