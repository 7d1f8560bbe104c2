"""Streaming Bloom-filter dedup: drop already-seen documents at ingest
time, maintaining the filter incrementally across micro-batches.

The production shape: a crawl stream re-delivers documents (re-crawls,
mirror duplicates, at-least-once sources). An exact seen-set join grows
with the corpus; the Bloom filter stays m bits forever and broadcasts,
so per-batch dedup cost is flat no matter how much history has been
ingested — at the price of a bounded false-positive rate (a "seen"
verdict can wrongly drop a genuinely new document; sized so that rate
is negligible, and NO new duplicate ever gets through, since the filter
has no false negatives).

Mechanics (foreachBatch — the filter is cross-batch state, which
Structured Streaming's stateless operators can't hold):

  per micro-batch:
    1. probe the batch against the CURRENT filter table (broadcast);
    2. rows that miss are emitted to the sink and their bit positions
       are OR-merged into the filter table (bloom words are mergeable —
       tests/test_bloom.py::test_filter_is_mergeable);
    3. both writes are idempotent under batch replay: novel rows land
       in an OVERWRITTEN per-batch directory (batch_id=<id> — replay
       rewrites the same files instead of double-appending), and
       re-OR-ing the same bits into the filter is a no-op. The emit
       happens BEFORE the filter update: the reverse order would lose
       rows on replay (an already-updated filter classifies the
       batch's novel rows as seen).

Within-batch duplicates are handled by an exact dropDuplicates on the
hash column first (the filter only answers "seen in a PRIOR batch").

The filter lives as a parquet table of (word_idx, word) — restart-safe:
a new query reloads it and continues; replaying the last batch after a
crash converges to the same filter (idempotent OR).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.materialize import materialize
from myhadoop_spark.operators.bloom import (
    K_HASHES,
    M_BITS,
    bloom_build,
    bloom_probe,
    bloom_probe_sharded,
)

_FILTER_SCHEMA = "word_idx bigint, word bigint"


def load_filter(spark: SparkSession, path: str) -> DataFrame:
    """The current filter table; empty on first start.

    Existence is resolved by ATTEMPTING the read, not a local
    os.path.exists probe: the filter table may live on any Hadoop
    filesystem (hdfs://, s3a://), where a local path check is always
    False and would silently reset dedup history, re-emitting every
    previously-seen document. A missing path is the one expected
    first-start condition; anything else propagates. The condition is
    matched by error CLASS when the runtime exposes it (Spark 3.4+'s
    getErrorClass / 4.x getCondition), with both known message
    phrasings as the fallback — message-only matching broke across
    Spark versions that phrase the error differently."""
    try:
        # file listing happens here (InMemoryFileIndex), so a missing
        # path raises NOW, even with the explicit schema
        return spark.read.schema(_FILTER_SCHEMA).parquet(path)
    except AnalysisException as e:
        cls = None
        for probe in ("getCondition", "getErrorClass"):
            fn = getattr(e, probe, None)
            if callable(fn):
                try:
                    cls = fn()
                except Exception:
                    cls = None
                if cls:
                    break
        if (cls == "PATH_NOT_FOUND"
                or "PATH_NOT_FOUND" in str(e)
                or "Path does not exist" in str(e)):
            return spark.createDataFrame([], _FILTER_SCHEMA)
        raise


def merge_filter(current: DataFrame, batch_docs: DataFrame, col: str,
                 m_bits: int = M_BITS, k: int = K_HASHES) -> DataFrame:
    """current OR bloom(batch): the mergeability property makes
    incremental maintenance exact — equal to rebuilding from scratch."""
    return (current.unionByName(bloom_build(batch_docs, col, m_bits, k))
            .groupBy("word_idx")
            .agg(F.bit_or("word").alias("word")))


def dedup_batch(batch: DataFrame, bloom: DataFrame, *, text_col: str,
                id_cols: list[str], m_bits: int = M_BITS,
                k: int = K_HASHES, n_filter_shards: int = 1) -> DataFrame:
    """Rows of `batch` NOT (probably) seen before: exact within-batch
    dedup on content first, then the cross-batch Bloom probe.
    ``n_filter_shards > 1`` probes through the range-sharded path
    (operators/bloom.py::bloom_probe_sharded) for filters too large to
    broadcast whole — same verdicts bit for bit."""
    fresh = batch.dropDuplicates([text_col])
    if n_filter_shards > 1:
        hits = bloom_probe_sharded(fresh, text_col, bloom,
                                   n_shards=n_filter_shards,
                                   id_cols=id_cols, m_bits=m_bits, k=k)
    else:
        hits = bloom_probe(fresh, text_col, bloom, id_cols=id_cols,
                           m_bits=m_bits, k=k)
    return (fresh.join(hits.filter(~F.col("bloom_hit")).select(*id_cols),
                       id_cols))


def start_bloom_dedup_stream(stream_df: DataFrame, *, filter_path: str,
                             out_path: str, checkpoint: str,
                             text_col: str = "text",
                             id_cols: list[str] | None = None,
                             m_bits: int = M_BITS, k: int = K_HASHES,
                             n_filter_shards: int = 1):
    """Start the stream: novel rows append to `out_path`, the filter
    table at `filter_path` absorbs their bits each batch.
    ``n_filter_shards`` sizes the probe for filters beyond one
    broadcast (the maintained table is shard-agnostic — sharding is a
    probe-time view over word_idx ranges, so the same filter serves
    both paths)."""
    ids = id_cols or ["doc_id"]

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        bloom = load_filter(spark, filter_path)
        novel = dedup_batch(batch, bloom, text_col=text_col,
                            id_cols=ids, m_bits=m_bits, k=k,
                            n_filter_shards=n_filter_shards)
        # materialize novel rows BEFORE touching the filter table: both
        # writes below must see the same snapshot
        novel = novel.transform(materialize)
        # per-batch OVERWRITTEN directory, not a bare append: foreachBatch
        # replays a batch after a crash, and replaying an append would
        # double-emit. Overwriting batch_id=<id> makes the emit
        # idempotent; write order matters too — emit BEFORE updating the
        # filter, because replaying with an already-updated filter would
        # classify the batch's novel rows as seen and LOSE them.
        novel.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")
        updated = merge_filter(bloom, novel.select(text_col), text_col,
                               m_bits, k).transform(materialize)
        updated.write.mode("overwrite").parquet(filter_path)

    return (stream_df.writeStream
            .foreachBatch(_process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
