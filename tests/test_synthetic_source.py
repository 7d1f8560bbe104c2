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
