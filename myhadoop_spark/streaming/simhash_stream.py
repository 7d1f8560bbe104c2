"""Streaming simhash near-dedup — the ingest face of the Hamming-ball
join (operators/simhash_join.py): incoming documents are dropped when
their fingerprint lies within ``max_hamming`` bits of ANYTHING the
corpus has already accepted. This is the production shape of Manku et
al. 2007 (near-dup suppression at crawl ingest), with EXACT recall at
the configured radius — unlike the signature-equality minhash face
(streaming/near_dedup.py), which trades recall for statelessness.

Per-batch semantics (deterministic):

    1. within-batch: Hamming pairs → connected components → only each
       cluster's min-id representative goes forward (the batch
       operator composition, so a burst of mutual near-dups admits
       exactly one);
    2. cross-corpus: representatives within ``max_hamming`` of any
       ACCEPTED fingerprint drop (exact pigeonhole probe against the
       seen state);
    3. survivors land under ``{path}/clean/batch_id=N`` and their
       fingerprints join the seen state.

Arrival-order contract (the house rule): earlier batches win;
accepted documents are never revoked. State machine = the versioned
discipline (seen_v{batch}, meta with the radius/bits riding along,
idempotent replay skip, loud lineage guard, one-deep retention).

Scale shape: per batch, the within-batch join is batch-sized; the
cross probe joins batch blocks against the data-sized seen blocks
hash-partitioned (state ∝ ACCEPTED corpus — near-dups never enter
it). The CC rounds are batch-bounded.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.fsutil import (
    hadoop_fs,
    read_small_file,
    write_small_file,
)
from myhadoop_spark.operators.connected_components import (
    connected_components,
)
from myhadoop_spark.operators.simhash_join import (
    hamming_pairs,
    hamming_probe,
)


def _read_meta(spark: SparkSession, path: str) -> dict | None:
    raw = read_small_file(spark, f"{path}/meta.json")
    return json.loads(raw) if raw is not None else None


def start_simhash_dedup_stream(doc_stream: DataFrame, *, path: str,
                               checkpoint: str, bits: int = 32,
                               max_hamming: int = 2,
                               sim_col: str = "simhash",
                               id_col: str = "doc_id",
                               stats: list | None = None):
    """Suppress near-duplicates at ingest (availableNow-friendly);
    the stream carries (doc_id, simhash, ...). Survivors land under
    ``{path}/clean/batch_id=N``. Pass ``stats`` (a list) to receive
    one {batch, docs_in, docs_kept, seen} dict per batch."""
    if not 1 <= int(max_hamming) < int(bits):
        raise ValueError(f"max_hamming must be in [1, bits), got "
                         f"{max_hamming}")

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        meta = _read_meta(spark, path)
        if meta is not None and (meta["bits"] != int(bits)
                                 or meta["max_hamming"]
                                 != int(max_hamming)):
            raise ValueError(
                f"simhash-dedup state at {path} was built with bits="
                f"{meta['bits']}, max_hamming={meta['max_hamming']}; "
                f"restarting with bits={bits}, max_hamming="
                f"{max_hamming} would change what counts as a "
                "near-duplicate — start a fresh state path")
        if meta is not None and batch_id == meta["last_batch"]:
            return  # crash-replay of the last batch — idempotent skip
        if meta is not None and batch_id < meta["last_batch"]:
            raise RuntimeError(
                f"simhash-dedup state at {path} was maintained up to "
                f"batch {meta['last_batch']} under a different "
                f"checkpoint lineage (got batch {batch_id}); restore "
                "the original checkpoint or start a fresh state path")
        if meta is not None and batch.isEmpty():
            return
        # 1. within-batch: cluster and keep each cluster's min id
        pairs = hamming_pairs(batch, bits=bits,
                              max_hamming=max_hamming, id_col=id_col,
                              sim_col=sim_col)
        edges = pairs.select(F.col("id_a").alias("src"),
                             F.col("id_b").alias("dst"))
        if edges.isEmpty():
            reps = batch
        else:
            cc = connected_components(edges)
            losers = (cc.groupBy("component")
                      .agg(F.min("id").alias("_keep"))
                      .join(cc, "component")
                      .filter(F.col("id") != F.col("_keep"))
                      .select(F.col("id").alias(id_col)))
            reps = batch.join(losers, id_col, "left_anti")
        # 2. cross-corpus probe against accepted fingerprints
        if meta is not None:
            seen = spark.read.parquet(
                f"{path}/seen_v{meta['last_batch']}")
            hits = hamming_probe(reps, seen, bits=bits,
                                 max_hamming=max_hamming,
                                 id_col=id_col, sim_col=sim_col)
            survivors = reps.join(hits, id_col, "left_anti")
        else:
            survivors = reps
        (survivors.write.mode("overwrite")
         .parquet(f"{path}/clean/batch_id={batch_id}"))
        kept = spark.read.parquet(f"{path}/clean/batch_id={batch_id}")
        new_seen = kept.select(id_col, sim_col)
        if meta is not None:
            new_seen = seen.select(id_col, sim_col).unionByName(new_seen)
        new_seen.write.mode("overwrite").parquet(
            f"{path}/seen_v{batch_id}")
        write_small_file(spark, f"{path}/meta.json",
                         json.dumps({"last_batch": batch_id,
                                     "bits": int(bits),
                                     "max_hamming": int(max_hamming)}))
        keep = {f"seen_v{batch_id}"}
        if meta is not None:
            keep.add(f"seen_v{meta['last_batch']}")
        fs, root = hadoop_fs(spark, path)
        for status in fs.listStatus(root):
            name = status.getPath().getName()
            if name.startswith("seen_v") and name not in keep:
                fs.delete(status.getPath(), True)
        if stats is not None:
            stats.append({
                "batch": batch_id,
                "docs_in": batch.count(),
                "docs_kept": kept.count(),
                "seen": spark.read.parquet(
                    f"{path}/seen_v{batch_id}").count(),
            })

    return (doc_stream.writeStream
            .foreachBatch(_process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def read_clean(spark: SparkSession, path: str) -> DataFrame:
    """Everything the suppressing ingest has emitted so far."""
    meta = _read_meta(spark, path)
    if meta is None:
        raise FileNotFoundError(f"no simhash-dedup state at {path}")
    return spark.read.parquet(f"{path}/clean")
