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


def test_pipeline_executes_each_stage_once(spark, tmp_path, monkeypatch):
    """The funnel counts are separate actions; without the persisted
    frontiers the whole lineage (classifier training included)
    re-executed per action — up to 5 source scans per document. Pin
    the source-scan multiplicity with a counting mapInPandas wrapper
    around the catalog load: every lineage re-execution re-reads the
    source, so cumulative wrapped rows / corpus rows = how many times
    the un-persisted prefix ran."""
    import myhadoop_spark.queries.pipeline2 as p2

    acc = spark.sparkContext.accumulator(0)
    real_load = p2.load

    def counting_load(spark_, sf_dir, table):
        df = real_load(spark_, sf_dir, table)

        def count_rows(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        return df.mapInPandas(count_rows, df.schema)

    monkeypatch.setattr(p2, "load", counting_load)
    stats = curate(spark, SF_SMOKE, str(tmp_path / "counted"))
    multiplicity = acc.value / stats["raw"]
    # budget: 1 scan for raw.count + 1 filling the persisted `clean`
    # frontier (every later reference — training's two aggregations,
    # scoring's two passes, the bench side — reads the cache) = 2x,
    # measured; the r4 uncached chain measured 8x. Margin +1 for
    # plan-shape drift; the assert catches the regression class
    # (re-running training per funnel count), not exact plan trivia.
    assert multiplicity <= 3, multiplicity
