"""Curation pipeline v2 (queries/pipeline2.py): the composed
scrub → classify → substring-dedup → export flow runs end to end,
conserves what it should, and its export verifies."""

from __future__ import annotations

from pyspark.sql import functions as F

from myhadoop_spark.operators.export import verify_export
from myhadoop_spark.queries.pipeline2 import curate
from tests.conftest import SF_SMOKE


def test_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "curated")
    stats = curate(spark, SF_SMOKE, out)
    # monotone funnel, nothing fabricated
    assert stats["raw"] == 500
    assert 0 < stats["after_quality"] <= stats["raw"]
    assert 0 < stats["after_dedup"] <= stats["after_quality"]
    assert 0 < stats["after_decontam"] <= stats["after_dedup"]
    assert stats["tokens_excised"] >= 0
    # the exported table matches the manifest bit for bit
    assert stats["manifest"]["total_rows"] == stats["after_decontam"]
    statuses = {r.status for r in verify_export(spark, out).collect()}
    assert statuses == {"ok"}
    # no PII markers survive the scrub (the audit regexes fire on raw)
    exported = spark.read.parquet(out)
    assert exported.filter(F.col("text").rlike(r"@|https?://")).count() == 0


def test_pipeline_is_deterministic(spark, tmp_path):
    s1 = curate(spark, SF_SMOKE, str(tmp_path / "a"))
    s2 = curate(spark, SF_SMOKE, str(tmp_path / "b"))
    assert s1 == s2
