"""Streaming decontamination ≡ batch: the stream-static shingle join over
a file-replayed document stream must converge to the batch operator's
result on the same rows."""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.decontam import contamination_pairs
from myhadoop_spark.streaming.decontam_stream import contamination_stream
from myhadoop_spark.streaming.windows import run_to_memory
from tests.conftest import SF_SMOKE

N = 5


@pytest.fixture(scope="module")
def doc_source(spark, tmp_path_factory):
    """Replay the corpus half of documents as 3 parquet micro-batches."""
    docs = load(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.expr("doc_id % 20 <> 0"))
    bench = docs.filter(F.expr("doc_id % 20 = 0"))
    staging = tmp_path_factory.mktemp("doc_stream_staging")
    n = corpus.count()
    step = n // 3 + 1
    ranked = corpus.withColumn(
        "_rk", F.row_number().over(Window.orderBy("doc_id")) - 1)
    for i in range(3):
        (ranked.filter((F.col("_rk") >= i * step)
                       & (F.col("_rk") < (i + 1) * step)).drop("_rk")
         .coalesce(1).write.mode("overwrite").parquet(f"{staging}/b{i}"))
    flat = tmp_path_factory.mktemp("doc_stream")
    now = time.time()
    for i, f in enumerate(sorted(Path(staging).glob("b*/part-*.parquet"))):
        dst = flat / f"{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    return str(flat), corpus, bench


def test_stream_matches_batch(spark, doc_source):
    src, corpus, bench = doc_source
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.format("parquet").schema(schema)
              .option("maxFilesPerTrigger", 1).load(src))
    q = run_to_memory(contamination_stream(stream, bench, n=N),
                      "decontam_out", output_mode="complete")
    try:
        got = sorted(map(tuple, spark.sql(
            "SELECT corpus_id, bench_id, n_shared FROM decontam_out")
            .collect()))
    finally:
        q.stop()
    want = sorted(map(tuple,
                      contamination_pairs(corpus, bench, n=N).collect()))
    assert got == want
    assert got, "no contamination pairs — vacuous equivalence"


def test_stream_join_is_stateless_probe(spark, doc_source):
    """The stream-static join itself must carry no streaming state —
    only the final aggregation is stateful (bounded by contaminated
    pairs, not traffic). Verified through the progress metrics: state
    rows == aggregation output rows, not join-buffered input rows."""
    src, corpus, bench = doc_source
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.format("parquet").schema(schema)
              .option("maxFilesPerTrigger", 1).load(src))
    q = run_to_memory(contamination_stream(stream, bench, n=N),
                      "decontam_state", output_mode="complete")
    try:
        n_pairs = spark.sql(
            "SELECT COUNT(*) AS n FROM decontam_state").collect()[0]["n"]
        ops = [op for p in (q.recentProgress or [])
               for op in (p["stateOperators"] or [])]
        assert ops, "no stateful operators reported"
        max_state = max(op["numRowsTotal"] for op in ops)
        assert max_state <= n_pairs * 2, (max_state, n_pairs)
    finally:
        q.stop()
