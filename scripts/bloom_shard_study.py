"""Sharded-Bloom probe rehearsal (r5): the 12 GB-filter code path
(operators/bloom.py::bloom_probe_sharded) measured against the
whole-filter broadcast on the synthetic corpus.

What the numbers must show:
  * identical hit counts at every shard count (bit-identical verdicts
    — also proven row-for-row in tests/test_bloom.py);
  * probe wall grows mildly with B (B jobs + B materialized partials)
    while PEAK BROADCAST BYTES per pass drop ~1/B — the trade the
    sharded path exists to make. Peak broadcast is reported as the
    largest per-shard word count x 16 bytes (word_idx + word).

Appends to bloom_shard_study.tsv:

    engine  n_docs  n_shards  wall_s  hits  max_shard_words

Run: python scripts/bloom_shard_study.py [n_docs] (default 50000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.operators.bloom import (
    M_BITS,
    bloom_build,
    bloom_probe,
    bloom_probe_sharded,
)
from myhadoop_spark.session import get_spark
from myhadoop_spark.sources.synthetic import register as register_source


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark("bloom_shard_study")
    register_source(spark)
    out = Path("bloom_shard_study.tsv")
    if not out.exists():
        out.write_text("engine\tn_docs\tn_shards\twall_s\thits\t"
                       "max_shard_words\n")

    docs = (spark.read.format("synthetic_docs")
            .option("rows", n).option("vocabSize", 20_000)
            .option("numPartitions", spark.sparkContext.defaultParallelism)
            .load().select("doc_id", "text").localCheckpoint())
    bloom = bloom_build(docs.filter("doc_id % 5 <> 0").select("text"),
                        "text").localCheckpoint()

    # warm-up (uncounted)
    bloom_probe(docs.limit(1000), "text", bloom,
                id_cols=["doc_id"]).count()

    n_words = M_BITS // 32
    for n_shards in (1, 4, 16):
        t0 = time.time()
        if n_shards == 1:
            pr = bloom_probe(docs, "text", bloom, id_cols=["doc_id"])
            max_words = bloom.count()
        else:
            pr = bloom_probe_sharded(docs, "text", bloom,
                                     n_shards=n_shards,
                                     id_cols=["doc_id"])
            per = -(-n_words // n_shards)
            max_words = (bloom
                         .groupBy(F.floor(F.col("word_idx") / per))
                         .count().agg(F.max("count")).first()[0])
        hits = pr.filter("bloom_hit").count()
        wall = time.time() - t0
        line = (f"myhadoop_spark\t{n}\t{n_shards}\t{wall:.3f}\t{hits}\t"
                f"{max_words}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip())
    spark.stop()


if __name__ == "__main__":
    main()
