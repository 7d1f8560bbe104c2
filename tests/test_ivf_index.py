"""Persistent IVF index (operators/ivf_index.py): persisted search ≡
in-memory ivf_topk, partition-pruned probe scans, incremental append ≡
one-shot build under the same centroids, and the streaming ingest
face."""

from __future__ import annotations

import contextlib
import io
import time

from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.ivf import _dot, ivf_topk
from myhadoop_spark.operators.ivf_index import (
    append_to_index,
    build_index,
    load_centroids,
    search_index,
    start_index_ingest_stream,
)
from tests.conftest import SF_SMOKE

N_Q, K, TOP_K = 5, 8, 5


def _emb(spark):
    return (load(spark, SF_SMOKE, "embeddings")
            .select("vec_id",
                    F.transform("embedding", lambda x: x.cast("double"))
                    .alias("v")))


def _queries(emb):
    return (emb.filter(F.col("vec_id") < N_Q)
            .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
                    F.sqrt(_dot("v", "v")).alias("qnrm")))


def _res(df):
    return {(r.q_id, r.neighbor_id): (r.rn, r.cosine) for r in df.collect()}


def test_persisted_search_equals_in_memory(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "idx")
    cents = build_index(emb, path, k=K)
    assert load_centroids(spark, path) == cents
    q = _queries(emb)
    want = _res(ivf_topk(emb.withColumn("nrm", F.sqrt(_dot("v", "v"))),
                         q, cents, top_k=TOP_K))
    got = _res(search_index(spark, path, q, top_k=TOP_K))
    assert got == want and got


def test_probe_scan_is_partition_pruned(spark, tmp_path):
    """The probed bucket set must reach the vectors scan as a PARTITION
    filter — only those bucket directories are read."""
    emb = _emb(spark)
    path = str(tmp_path / "idx")
    build_index(emb, path, k=K)
    plan_io = io.StringIO()
    with contextlib.redirect_stdout(plan_io):
        search_index(spark, path, _queries(emb)).explain("formatted")
    plan = plan_io.getvalue()
    assert "PartitionFilters" in plan
    # the bucket IN (...) predicate sits in PartitionFilters, not a
    # post-scan Filter: find the scan block and check
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("bucket" in ln for ln in scan), plan


def test_append_equals_one_shot_build(spark, tmp_path):
    """Build on the first half, append the second: search must equal
    the one-shot assignment of the UNION under the same centroids (the
    no-retrain append contract)."""
    emb = _emb(spark)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "idx")
    cents = build_index(half_a, path, k=K)
    append_to_index(half_b, path)
    q = _queries(emb)
    want = _res(ivf_topk(emb.withColumn("nrm", F.sqrt(_dot("v", "v"))),
                         q, cents, top_k=TOP_K))
    got = _res(search_index(spark, path, q, top_k=TOP_K))
    assert got == want


def test_streaming_ingest_matches_batch_append(spark, tmp_path):
    """Micro-batched appends through the stream face must leave an
    index whose search equals the batch-appended one."""
    emb = _emb(spark)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1).localCheckpoint()
    path = str(tmp_path / "idx")
    build_index(half_a, path, k=K)

    src = str(tmp_path / "src")
    half_b.coalesce(2).write.parquet(src)
    stream = (spark.readStream.schema("vec_id long, v array<double>")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_index_ingest_stream(stream, path=path,
                                  checkpoint=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        time.sleep(0.2)

    cents = load_centroids(spark, path)
    queries = _queries(emb)
    want = _res(ivf_topk(emb.withColumn("nrm", F.sqrt(_dot("v", "v"))),
                         queries, cents, top_k=TOP_K))
    got = _res(search_index(spark, path, queries, top_k=TOP_K))
    assert got == want
