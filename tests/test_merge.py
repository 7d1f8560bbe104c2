"""MERGE/SCD2 emulation semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.merge import merge_upsert, scd2_apply
from tests.conftest import SF_SMOKE


def test_merge_upsert(spark):
    target = load(spark, SF_SMOKE, "customer").select("c_custkey", "c_acctbal")
    # source: 10 updated customers (+1000 balance) and 5 brand-new keys
    updates = (target.filter(F.col("c_custkey") < 10)
               .select("c_custkey", (F.col("c_acctbal") + 1000).alias("c_acctbal")))
    inserts = spark.createDataFrame(
        [(10_000 + i, 1.0 * i) for i in range(5)], "c_custkey LONG, c_acctbal DOUBLE")
    source = updates.unionByName(inserts)
    merged = merge_upsert(target, source, "c_custkey")
    assert merged.count() == target.count() + 5
    got = {r["c_custkey"]: r["c_acctbal"]
           for r in merged.filter(F.col("c_custkey") < 10).collect()}
    want = {r["c_custkey"]: r["c_acctbal"] + 1000
            for r in target.filter(F.col("c_custkey") < 10).collect()}
    assert got == want
    untouched = merged.filter((F.col("c_custkey") >= 10)
                              & (F.col("c_custkey") < 10_000))
    assert untouched.count() == target.filter(F.col("c_custkey") >= 10).count()


def test_scd2_versions(spark):
    hist = spark.createDataFrame(
        [(1, "2020-01-01", "a"), (1, "2021-01-01", "b"), (2, "2020-06-01", "x")],
        "k INT, ts STRING, v STRING").withColumn("ts", F.col("ts").cast("date"))
    upd = spark.createDataFrame(
        [(1, "2022-01-01", "c"), (3, "2022-01-01", "new")],
        "k INT, ts STRING, v STRING").withColumn("ts", F.col("ts").cast("date"))
    out = scd2_apply(hist, upd, "k", "ts").collect()
    cur = {r["k"]: r["v"] for r in out if r["is_current"]}
    assert cur == {1: "c", 2: "x", 3: "new"}
    k1 = sorted((r["v"], str(r["valid_from"]), str(r["valid_to"]))
                for r in out if r["k"] == 1)
    assert k1 == [("a", "2020-01-01", "2021-01-01"),
                  ("b", "2021-01-01", "2022-01-01"),
                  ("c", "2022-01-01", "None")]
