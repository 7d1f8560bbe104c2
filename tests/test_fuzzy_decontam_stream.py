"""Streaming fuzzy decontamination (streaming/fuzzy_decontam_stream):
BATCHING INVARIANCE (stateless face — any micro-batch split emits
exactly the one-shot operator's survivors), verbatim-copy drops on
ingest, replay idempotence by overwrite."""

from __future__ import annotations

import time

from myhadoop_spark.queries.fuzzy_decontam import fuzzy_decontam
import pytest

from myhadoop_spark.streaming.fuzzy_decontam_stream import (
    read_clean,
    start_fuzzy_decontam_stream,
)

SCHEMA = "doc_id long, text string"

BENCH = [(1001, "alpha beta gamma delta epsilon zeta"),
         (1002, "one two three four five six seven")]


def _corpus(n=30):
    rows = []
    for i in range(1, n + 1):
        if i % 7 == 0:  # verbatim bench copies sprinkled in
            rows.append((i, BENCH[i % 2][1]))
        else:
            rows.append((i, " ".join(f"w{j}" for j in range(i, i + 8))))
    return rows


def _write_src(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    for rows in batches:
        (spark.createDataFrame(rows, SCHEMA)
         .coalesce(1).write.mode("append").parquet(src))
    return src


def _run(spark, src, path, ckpt, *, stats=None, max_files=1):
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", max_files).parquet(src))
    bench = spark.createDataFrame(BENCH, SCHEMA)
    q = start_fuzzy_decontam_stream(stream, bench, path=path,
                                    checkpoint=ckpt, stats=stats)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        time.sleep(0.2)


@pytest.mark.slow  # r14: heavy parity battery (fast twin stays in the default tier)
def test_batching_invariance_vs_one_shot(spark, tmp_path):
    rows = _corpus()
    one_shot = sorted(map(tuple, fuzzy_decontam(
        spark, spark.createDataFrame(rows, SCHEMA),
        spark.createDataFrame(BENCH, SCHEMA)).collect()))
    for tag, batches in (("single", [rows]),
                         ("three", [rows[:10], rows[10:20], rows[20:]])):
        path = str(tmp_path / f"fd_{tag}")
        src = _write_src(spark, tmp_path / tag, batches)
        _run(spark, src, path, str(tmp_path / f"ck_{tag}"),
             max_files=1 if tag == "three" else 10)
        got = sorted(map(tuple, read_clean(spark, path)
                         .select("doc_id", "text").collect()))
        assert got == one_shot, tag
    # the verbatim copies were dropped on ingest
    kept = {d for d, _ in one_shot}
    assert all(i not in kept for i in range(7, 31, 7))


def test_replay_idempotent(spark, tmp_path):
    rows = _corpus(12)
    src = _write_src(spark, tmp_path, [rows])
    path = str(tmp_path / "fd")
    stats: list = []
    _run(spark, src, path, str(tmp_path / "ck"), stats=stats)
    before = sorted(map(tuple, read_clean(spark, path).collect()))
    # fresh checkpoint replays batch 0: overwrite makes it idempotent
    _run(spark, src, path, str(tmp_path / "ck2"))
    assert sorted(map(tuple, read_clean(spark, path).collect())) == before
    assert stats and stats[0]["docs_in"] == 12
    assert stats[0]["docs_kept"] < 12
