"""Document chunking (operators/chunking.py): bitwise DuckDB
differential over the fixture corpus, token conservation, edge cases,
and the shuffle-free plan."""

from __future__ import annotations

import contextlib
import io

import duckdb
import pytest
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.chunking import chunk_documents
from tests.conftest import SF_SMOKE

C, V = 32, 8  # small enough that fixture docs produce multi-chunk output
STEP = C - V


def _duck_chunks(sf_dir: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
    rows = con.execute(f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(str_split_regex(text, '\\s+'),
                             x -> x <> '') AS toks
          FROM documents),
        s AS (
          SELECT doc_id, toks, len(toks) AS n,
                 unnest(list_filter(
                     range(1, greatest(len(toks), 1) + 1, {STEP}),
                     s -> len(toks) > 0
                          AND (s = 1 OR s + {V} <= len(toks)))) AS st
          FROM t)
        SELECT doc_id,
               CAST((st - 1) / {STEP} AS BIGINT) AS chunk_id,
               st AS start_token,
               least(n - st + 1, {C}) AS n_tokens,
               array_to_string(list_slice(toks, st, st + {C} - 1), ' ')
                 AS text
        FROM s""").fetchall()
    return {(r[0], r[1]): r[2:] for r in rows}


def test_matches_duckdb_bitwise(spark):
    got = {(r.doc_id, r.chunk_id): (r.start_token, r.n_tokens, r.text)
           for r in chunk_documents(
               load(spark, SF_SMOKE, "documents").select("doc_id", "text"),
               chunk_tokens=C, overlap=V).collect()}
    want = _duck_chunks(SF_SMOKE)
    assert got == want
    assert len(got) > 500  # multi-chunk docs exist at this C


def test_token_conservation(spark):
    """Dropping the overlap prefix of every chunk after the first and
    concatenating reproduces each document's token stream exactly."""
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    chunks = chunk_documents(docs, chunk_tokens=C, overlap=V)
    rebuilt = (chunks
               .withColumn("_t", F.split("text", " "))
               .withColumn("_t", F.when(F.col("chunk_id") == 0, F.col("_t"))
                           .otherwise(F.slice(F.col("_t"), V + 1,
                                              F.size("_t"))))
               .groupBy("doc_id")
               .agg(F.array_join(
                   F.flatten(F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("chunk_id", "_t"))),
                       lambda s: s["_t"])), " ").alias("re")))
    orig = docs.select(
        "doc_id",
        F.array_join(F.filter(F.split("text", r"\s+"),
                              lambda t: t != F.lit("")), " ").alias("o"))
    diff = (orig.join(rebuilt, "doc_id", "left")
            .filter((F.col("o") != F.coalesce(F.col("re"), F.lit("")))
                    & (F.length("o") > 0)))
    assert diff.count() == 0


def test_edges(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "a"), (2, " ".join(f"t{i}" for i in range(C))),
         (3, " ".join(f"t{i}" for i in range(C + 1))),
         (4, " ".join(f"t{i}" for i in range(C + V)))],
        "doc_id long, text string")
    out = {}
    for r in chunk_documents(df, chunk_tokens=C, overlap=V).collect():
        out.setdefault(r.doc_id, []).append(r)
    assert 0 not in out                       # empty doc: no chunks
    assert len(out[1]) == 1 and out[1][0].n_tokens == 1
    assert len(out[2]) == 1                   # exactly C: one chunk
    assert len(out[3]) == 2                   # C+1: trailing adds 1 token
    assert out[3][1].start_token == 1 + STEP
    assert out[3][1].n_tokens == C + 1 - STEP
    # C+V: the second window would add nothing beyond... it adds V
    # tokens past position C ⇒ two chunks, second exactly C+V-STEP long
    assert len(out[4]) == 2 and out[4][1].n_tokens == C + V - STEP


def test_bad_overlap_raises(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_plan_is_narrow(spark):
    """Chunking must not shuffle: generate + project only."""
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    plan_io = io.StringIO()
    with contextlib.redirect_stdout(plan_io):
        chunk_documents(docs).explain("formatted")
    plan = plan_io.getvalue()
    assert "Exchange" not in plan, plan


def test_stream_equals_batch(spark, tmp_path):
    """Chunking is a stateless narrow projection, so it must apply to
    a streaming DataFrame unchanged and produce exactly the batch
    output (the operator-face convention the streaming modules
    follow)."""
    from myhadoop_spark.sources.synthetic import register

    register(spark)
    batch = (spark.read.format("synthetic_docs")
             .option("rows", 300).option("numPartitions", 4)
             .load().select("doc_id", "text"))
    want = {(r.doc_id, r.chunk_id): (r.start_token, r.n_tokens, r.text)
            for r in chunk_documents(batch, chunk_tokens=C,
                                     overlap=V).collect()}

    # default micro-batch trigger + poll: availableNow drains only the
    # first prefetched batch of a SimpleDataSourceStreamReader (same
    # pattern as test_synthetic_source.py)
    import time

    stream = (spark.readStream.format("synthetic_docs")
              .option("rowsPerBatch", 100).option("maxRows", 300)
              .load().select("doc_id", "text"))
    q = (chunk_documents(stream, chunk_tokens=C, overlap=V)
         .writeStream.format("memory").queryName("chunk_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        deadline = time.time() + 120
        while (spark.sql("SELECT count(DISTINCT doc_id) FROM chunk_stream")
               .first()[0] < 300 and time.time() < deadline):
            time.sleep(0.5)
        got = {(r.doc_id, r.chunk_id): (r.start_token, r.n_tokens, r.text)
               for r in spark.sql("SELECT * FROM chunk_stream").collect()}
    finally:
        q.stop()
    assert got == want
