"""Custom Python DataSource: schema, options, partition planning,
determinism, and composition with engine operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from myhadoop_spark.sources.synthetic import register


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_rows_and_schema(spark):
    df = _read(spark, rows=500, numPartitions=4)
    assert df.count() == 500
    assert df.schema.simpleString() == \
        "struct<doc_id:bigint,text:string,gen_partition:int>"
    assert df.select("doc_id").distinct().count() == 500


def test_partition_planning(spark):
    df = _read(spark, rows=100, numPartitions=7)
    parts = {r["gen_partition"] for r in df.select("gen_partition").distinct().collect()}
    assert parts == set(range(7))
    assert df.rdd.getNumPartitions() == 7


def test_determinism_across_partitionings(spark):
    """Same rows regardless of split count — per-row seeding, not
    per-partition RNG streams."""
    a = {(r["doc_id"], r["text"]) for r in _read(spark, rows=200, numPartitions=2).collect()}
    b = {(r["doc_id"], r["text"]) for r in _read(spark, rows=200, numPartitions=9).collect()}
    assert a == b


def test_composes_with_engine_operators(spark):
    """The source feeds the engine's own operators (wordcount)."""
    from myhadoop_spark.queries.wordcount import wordcount_df

    df = _read(spark, rows=300, numPartitions=4)
    wc = {r["word"]: r["cnt"] for r in wordcount_df(df).collect()}
    assert wc and all(c > 0 for c in wc.values())
    from myhadoop_spark.sources.synthetic import VOCAB
    assert set(wc) <= set(VOCAB)


def test_zero_rows_is_clean_empty(spark):
    df = _read(spark, rows=0)
    assert df.count() == 0
    assert df.schema.simpleString() == \
        "struct<doc_id:bigint,text:string,gen_partition:int>"


def test_token_bounds_respected(spark):
    df = _read(spark, rows=200, numPartitions=2, minTokens=3, maxTokens=7)
    sizes = [r["n"] for r in
             df.select(F.size(F.split("text", " ")).alias("n")).collect()]
    assert min(sizes) >= 3 and max(sizes) <= 7


def test_stream_reader_batches_match_batch_read(spark, tmp_path):
    """The STREAMING face of the source (Spark 4 SimpleDataSourceStream-
    Reader): micro-batches over the same deterministic document space
    must reproduce the batch read exactly — same ids, same text."""
    import time

    register(spark)
    # default micro-batch trigger: availableNow drains only the first
    # prefetched batch of a SimpleDataSourceStreamReader, so poll the
    # bounded stream (maxRows) until all rows land, then stop
    q = (spark.readStream.format("synthetic_docs")
         .option("rowsPerBatch", 40).option("maxRows", 100).load()
         .writeStream.format("memory").queryName("synth_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        deadline = time.time() + 120
        while (spark.sql("SELECT count(*) FROM synth_stream").first()[0] < 100
               and time.time() < deadline):
            time.sleep(0.5)
        streamed = {(r["doc_id"], r["text"])
                    for r in spark.sql("SELECT * FROM synth_stream").collect()}
    finally:
        q.stop()
    batch = {(r["doc_id"], r["text"])
             for r in _read(spark, rows=100, numPartitions=3).collect()}
    assert streamed == batch and len(streamed) == 100


def test_stream_reader_replay_is_identical(spark):
    """readBetweenOffsets (the exactly-once recovery path) must
    regenerate the same rows for the same offset range."""
    from myhadoop_spark.sources.synthetic import SyntheticDocsStreamReader

    r = SyntheticDocsStreamReader({"rowsPerBatch": "10"})
    assert r.initialOffset() == {"next": 0}
    rows, nxt = r.read({"next": 0})
    first = list(rows)
    assert nxt == {"next": 10} and len(first) == 10
    replay = list(r.readBetweenOffsets({"next": 0}, {"next": 10}))
    assert replay == first
    # bounded source: reads past maxRows produce nothing and hold offset
    b = SyntheticDocsStreamReader({"rowsPerBatch": "10", "maxRows": "5"})
    rows, nxt = b.read({"next": 0})
    assert len(list(rows)) == 5 and nxt == {"next": 5}
    rows, nxt = b.read({"next": 5})
    assert list(rows) == [] and nxt == {"next": 5}


def test_zipf_vocabulary_is_skewed_and_deterministic(spark):
    """zipf=true must produce a heavy-head token distribution (top rank
    ~1/H(V) of all tokens, orders above the uniform 1/V) while staying
    a pure function of doc_id."""
    from pyspark.sql import functions as F

    def read():
        return (spark.read.format("synthetic_docs")
                .option("rows", 2000).option("vocabSize", 20_000)
                .option("zipf", "true")
                .option("numPartitions", 8).load()
                .select("doc_id", "text"))

    a = {r.doc_id: r.text for r in read().collect()}
    b = {r.doc_id: r.text for r in read().collect()}
    assert a == b  # deterministic

    freq = {r.tok: r.n for r in
            (read().select(F.explode(F.split("text", " ")).alias("tok"))
             .groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
             .collect())}
    total = sum(freq.values())
    # Zipf(s=1) head: P(w0) ≈ 1/H(20000) ≈ 9%; uniform would be 0.005%
    assert freq["w0"] / total > 0.05
    # monotone-ish head: the top rank beats rank 10 beats rank 100
    assert freq["w0"] > freq.get("w9", 0) > freq.get("w99", 0)
    # the tail exists: far more distinct tokens than the head alone
    assert len(freq) > 1000
