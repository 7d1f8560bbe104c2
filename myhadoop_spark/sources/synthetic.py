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

Usage:
    from myhadoop_spark.sources.synthetic import register
    register(spark)
    df = (spark.read.format("synthetic_docs")
          .option("rows", 1000).option("numPartitions", 8).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
        # deterministic per-row generation: an LCG seeded by doc id, so
        # output is independent of partitioning and executor placement
        for doc_id in range(partition.start, partition.end):
            state = (doc_id * 6364136223846793005 + 1442695040888963407) \
                % (1 << 63)
            span = self.max_tokens - self.min_tokens + 1
            n_tokens = self.min_tokens + state % span
            words = []
            for _ in range(n_tokens):
                state = (state * 6364136223846793005 + 1442695040888963407) \
                    % (1 << 63)
                words.append(VOCAB[state % len(VOCAB)])
            yield (doc_id, " ".join(words), partition.index)


class SyntheticDocsSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return "doc_id BIGINT, text STRING, gen_partition INT"

    def reader(self, schema):
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    from myhadoop_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    spark.dataSource.register(SyntheticDocsSource)
