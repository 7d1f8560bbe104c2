"""Sampling invariants beyond oracle equality: stability under
repartitioning and sane stratum/fraction properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from myhadoop_spark import registry
from myhadoop_spark.catalog import load
from myhadoop_spark.queries.sampling import hash_bucket
from tests.conftest import SF_SMOKE


def test_sample_fraction_is_roughly_20pct(spark):
    docs = load(spark, SF_SMOKE, "documents")
    n = docs.count()
    s = registry.get("sample_hash").fn(spark, SF_SMOKE).count()
    assert 0.10 * n <= s <= 0.30 * n, (s, n)


def test_sample_stable_under_repartition(spark):
    docs = load(spark, SF_SMOKE, "documents")
    a = {r["doc_id"] for r in
         docs.filter(hash_bucket(F.col("doc_id")) < 20).collect()}
    b = {r["doc_id"] for r in
         docs.repartition(17).filter(hash_bucket(F.col("doc_id")) < 20).collect()}
    assert a == b


def test_split_partitions_are_exhaustive_and_disjoint(spark):
    out = registry.get("train_test_split").fn(spark, SF_SMOKE)
    docs_n = load(spark, SF_SMOKE, "documents").count()
    per = {r["split"]: r["n"] for r in
           out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(per.values()) == docs_n
    assert set(per) == {"train", "val", "test"}
    assert per["train"] > per["val"] and per["train"] > per["test"]


def test_stratified_exact_counts(spark):
    out = registry.get("stratified_sample").fn(spark, SF_SMOKE)
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    langs = {r["lang"] for r in
             load(spark, SF_SMOKE, "documents").select("lang").distinct().collect()}
    assert set(per) == langs
    assert all(n == 20 for n in per.values()), per
