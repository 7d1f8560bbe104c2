"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic document generator.

Why it exists: the reference's only source is "a directory of text
files" (/root/reference/tools.py:132-153). A modern engine also needs
*programmatic* sources (benchmark generators, API readers, fuzz
corpora); Spark 4's Python DataSource API is the sanctioned way to add
one without JVM code. This source demonstrates the full contract —
schema declaration, option handling, partition planning (one split per
`numPartitions`, each generated independently on executors), and
deterministic per-partition generation (seeded by partition index, so
the dataset is identical for any executor placement).

Since r2 the source also has a STREAMING face (simpleStreamReader):
micro-batches over the same deterministic document space, with dict
offsets and a replayable readBetweenOffsets — the contract Structured
Streaming's exactly-once recovery requires. Batch and stream share one
generator (_gen_doc), so stream output ≡ batch output (tested).

Usage:
    from myhadoop_spark.sources.synthetic import register
    register(spark)
    df = (spark.read.format("synthetic_docs")
          .option("rows", 1000).option("numPartitions", 8).load())
    stream = (spark.readStream.format("synthetic_docs")
              .option("rowsPerBatch", 100).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)

VOCAB = ("data spark shuffle join scan filter table row column batch "
         "stream window agg sort merge hash key value query plan").split()


class _DocsPartition(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index = index
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))
        self.min_tokens = int(options.get("minTokens", 5))
        self.max_tokens = int(options.get("maxTokens", 60))
        self.vocab_size = int(options.get("vocabSize", 0))
        self.dup_every = int(options.get("dupEvery", 0))
        self.zipf = str(options.get("zipf", "false")).lower() == "true"

    def partitions(self):
        if self.rows <= 0:
            # the DataSource API rejects an empty partition list; one
            # empty split yields a clean zero-row DataFrame
            return [_DocsPartition(0, 0, 0)]
        step = (self.rows + self.num_partitions - 1) // self.num_partitions
        return [
            _DocsPartition(i, i * step, min((i + 1) * step, self.rows))
            for i in range(self.num_partitions)
            if i * step < self.rows
        ]

    def read(self, partition: _DocsPartition):
        # deterministic per-row generation (_gen_doc: LCG seeded by doc
        # id), independent of partitioning and executor placement
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, _gen_doc(doc_id, self.min_tokens,
                                    self.max_tokens, self.vocab_size,
                                    self.dup_every, self.zipf),
                   partition.index)


def _gen_doc(doc_id: int, min_tokens: int, max_tokens: int,
             vocab_size: int = 0, dup_every: int = 0,
             zipf: bool = False) -> str:
    """The shared deterministic generator: an LCG seeded by doc id, so
    a document's text depends only on its id — identical between the
    batch reader, the stream reader, and any executor placement.

    vocabSize > 0 draws tokens from a synthetic vocabulary `w0..w{V-1}`
    instead of the tiny default word list — the default's 20 words make
    any two documents near-identical as TOKEN SETS (fine for wordcount
    fixtures, degenerate for set-similarity work: minhash at the default
    vocab declares ~half of ALL pairs near-dups). dupEvery = k plants a
    controlled near-duplicate structure: every k-th document is the
    previous document's text plus one trailing token (Jaccard n/(n+1)),
    everything else near-unique — the dedup-rehearsal corpus shape
    (scripts/dedup_scaling.py).

    zipf=true (requires vocabSize) draws ranks log-uniformly —
    rank = floor((V+1)^u), P(rank r) ∝ log((r+1)/r) ≈ 1/r, the classic
    Zipf(s≈1) approximation — so the corpus has a realistic heavy-head
    vocabulary (the uniform draw gives every token frequency ~1/V,
    which no natural language does; max_df, heavy-hitter bounds, and
    candidate-volume rehearsals all behave differently under the
    head)."""
    if dup_every and doc_id % dup_every == 0 and doc_id > 0:
        base = _gen_doc(doc_id - 1, min_tokens, max_tokens, vocab_size,
                        0, zipf)
        return base + " w" + str(doc_id)
    state = (doc_id * 6364136223846793005 + 1442695040888963407) % (1 << 63)
    n_tokens = min_tokens + state % (max_tokens - min_tokens + 1)
    words = []
    for _ in range(n_tokens):
        state = (state * 6364136223846793005 + 1442695040888963407) \
            % (1 << 63)
        if vocab_size > 0 and zipf:
            u = state / (1 << 63)
            rank = int((vocab_size + 1) ** u)  # 1..V, log-uniform
            words.append("w" + str(rank - 1))
        elif vocab_size > 0:
            words.append("w" + str(state % vocab_size))
        else:
            words.append(VOCAB[state % len(VOCAB)])
    return " ".join(words)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic document space.

    Offsets are plain dicts {"next": <first unproduced doc_id>}; each
    poll produces up to `rowsPerBatch` documents. Because documents are
    a pure function of doc_id, replaying any offset range after a
    restart regenerates IDENTICAL rows — which is exactly the
    replayability contract Structured Streaming's exactly-once recovery
    requires from a source (readBetweenOffsets is the replay path the
    engine calls when recovering a batch written to the offset log but
    not yet committed)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.min_tokens = int(options.get("minTokens", 5))
        self.max_tokens = int(options.get("maxTokens", 60))
        self.max_rows = int(options.get("maxRows", -1))  # -1 = unbounded

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _rows(self, start: int, end: int) -> list[tuple]:
        # a concrete list, not a generator: the engine pickles the
        # produced rows into its prefetch cache. gen_partition is the
        # stream's generation unit — the micro-batch ordinal this row
        # belongs to under normal offset advancement (doc_id //
        # rows_per_batch: deterministic, replay-stable, the stream
        # analog of the batch face's split index).
        return [(doc_id, _gen_doc(doc_id, self.min_tokens,
                                  self.max_tokens),
                 doc_id // self.rows_per_batch)
                for doc_id in range(start, end)]

    def read(self, start: dict):
        first = start["next"]
        end = first + self.rows_per_batch
        if self.max_rows >= 0:
            end = min(end, self.max_rows)
        return self._rows(first, max(first, end)), {"next": max(first, end)}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["next"], end["next"])


class SyntheticDocsSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return "doc_id BIGINT, text STRING, gen_partition INT"

    def reader(self, schema):
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    from myhadoop_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    spark.dataSource.register(SyntheticDocsSource)
