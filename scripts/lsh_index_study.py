"""Persistent-LSH-index probe rehearsal (r6): the scale claims behind
operators/lsh_index.py, measured.

Claims under test:

  1. HISTORY IS NEVER SHUFFLED. The probe broadcasts the batch into
     one scan of the signature table, so the probe's shuffle bytes
     are bounded by the MATCH set (the final pair distinct), not by
     history size: bytes-per-match stays ~constant at 10x history
     (matches themselves grow on this planted-dup corpus) while the
     scan — hist_rows, linear in history — never enters an exchange.
     The linear scan is the documented trade; storage-level skipping
     (not a join re-plan) is the lever against it.
  2. FRAGMENTATION IS REPAIRABLE. Streamed appends land one file set
     per touched shard per batch; after 20 appends a probe opens ~20x
     the files at unchanged rows. compact_lsh_index restores the
     fresh shape, probe verdicts bit-identical (asserted here AND in
     tests/test_lsh_index.py).
  3. THE STOP-SIGNATURE GUARD KILLS THE HOT-BUCKET FAN. 5,000 planted
     boilerplate copies in history x a 200-doc batch carrying the
     same text = 1M candidate rows unguarded; after refresh_hot_sigs
     the bucket is skipped (rows_out drops to the cold matches only —
     the declared recall trade on stop signatures).

Metric caveat: REST inputBytes on a local filesystem under-counts
parquet page reads in absolute terms and the probe re-reads the
(tiny) batch checkpoint several times, so input_bytes is reported
but the deterministic scan-size signal is hist_rows (rows in the
partition-pruned history scan).

Appends to lsh_index_study.tsv:

    engine  n_docs  phase  files_total  hist_rows  input_bytes  \
        shuffle_write_bytes  wall_s  rows_out

Run: python scripts/lsh_index_study.py [n_docs] [n_appends]
(default 50000 20; batch probed is always 1000 docs)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bench import StageMeter
from myhadoop_spark.fsutil import count_data_files, list_partition_dirs
from myhadoop_spark.operators.lsh_index import (
    build_lsh_index,
    compact_lsh_index,
    probe_lsh_index,
    start_lsh_dedup_stream,
)
from myhadoop_spark.session import get_spark
from myhadoop_spark.sources.synthetic import register as register_source
from scripts.dedup_scaling import synthetic_docs

BATCH = 1_000


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("lsh_index_study")
    register_source(spark)
    from scripts.ivf_index_study import InputMeter

    meter = StageMeter(spark)
    in_meter = InputMeter(spark)
    out = Path("lsh_index_study.tsv")
    if not out.exists():
        out.write_text("engine\tn_docs\tphase\tfiles_total\t"
                       "hist_rows\tinput_bytes\tshuffle_write_bytes\t"
                       "wall_s\trows_out\n")
    base = "/tmp/lsh_index_study"
    os.system(f"rm -rf {base}")

    # the probe batch: NEW docs (ids past any corpus), Zipf vocabulary
    batch = (synthetic_docs(spark, BATCH, zipf=True)
             .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                     "text").localCheckpoint())

    def record(phase: str, idx: str, probe_docs) -> set:
        files = count_data_files(
            spark, [u for _, u in
                    list_partition_dirs(spark, f"{idx}/sigs", "sbucket")])
        hist_rows = spark.read.parquet(f"{idx}/sigs").count()
        meter.delta()
        in_meter.delta()
        t0 = time.time()
        res = probe_lsh_index(probe_docs, idx)
        pairs = {(r.doc_id, r.hist_id, r.est_jaccard)
                 for r in res.collect()}
        wall = time.time() - t0
        d = meter.delta()
        read = in_meter.delta()
        line = (f"myhadoop_spark\t{n}\t{phase}\t{files}\t"
                f"{hist_rows}\t{read}\t{d['shuffle_write_bytes']}\t"
                f"{wall:.3f}\t{len(pairs)}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip())
        return pairs

    # --- claim 1: probe vs history size (1x and 10x) ----------------
    for scale, hist_n in (("hist_1x", n), ("hist_10x", 10 * n)):
        idx = f"{base}/idx_{scale}"
        hist = synthetic_docs(spark, hist_n, zipf=True)
        build_lsh_index(hist, idx)
        probe_lsh_index(batch, idx).count()  # warm (uncounted)
        record(scale, idx, batch)

    # --- claim 2: fragmentation and compaction ----------------------
    idx = f"{base}/idx_frag"
    hist = synthetic_docs(spark, n, zipf=True).localCheckpoint()
    build_lsh_index(hist.filter(F.col("doc_id") % 2 == 0), idx)
    src = f"{base}/src"
    (hist.filter(F.col("doc_id") % 2 == 1)
     .repartition(n_appends).write.parquet(src))
    stream = (spark.readStream.schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_lsh_dedup_stream(stream, path=idx, out_path=f"{base}/out",
                               checkpoint=f"{base}/ckpt")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        time.sleep(0.2)
    frag = record(f"after_{n_appends}_appends", idx, batch)
    stats = compact_lsh_index(spark, idx, max_files_per_shard=2)
    print(f"compact: {stats}")
    compacted = record("after_compact", idx, batch)
    assert compacted == frag, "compaction changed probe verdicts!"
    print("probe verdicts identical across compaction: OK")

    # --- claim 3: the stop-signature guard kills the hot-bucket fan --
    # plant 5,000 copies of one boilerplate text in history and probe a
    # batch of 200 docs carrying that text: unguarded, every probe doc
    # fans into 5,000 candidate rows; with the hot list the bucket is
    # skipped entirely (the declared recall trade on stop signatures)
    idx = f"{base}/idx_hot"
    boiler = ("terms of service apply to all content all rights "
              "reserved contact us for details")
    hot_hist = spark.range(5_000).selectExpr(
        "id + 20000000 as doc_id", f"'{boiler}' as text")
    build_lsh_index(synthetic_docs(spark, n, zipf=True)
                    .unionByName(hot_hist), idx)
    hot_batch = (spark.range(200).selectExpr(
        "id + 30000000 as doc_id", f"'{boiler}' as text")
        .localCheckpoint())
    probe_lsh_index(hot_batch, idx, use_hot=False).count()  # warm
    record("hot_unguarded", idx, hot_batch)
    from myhadoop_spark.operators.lsh_index import refresh_hot_sigs

    print("refresh_hot:", refresh_hot_sigs(spark, idx, max_bucket=100))
    record("hot_guarded", idx, hot_batch)
    os.system(f"rm -rf {base}")
    spark.stop()


if __name__ == "__main__":
    main()
