"""File-format surface (SURVEY.md §2.2 row 1): parquet/csv/json/orc
round-trips preserve the data the engine computes on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def nation_df(spark):
    return load(spark, SF_SMOKE, "nation")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv", "xml"])
def test_roundtrip(spark, nation_df, fmt, tmp_path_factory):
    out = str(tmp_path_factory.mktemp(f"fmt_{fmt}")) + "/data"
    writer = nation_df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(out)
        back = (spark.read.option("header", True)
                .schema(nation_df.schema).csv(out))
    elif fmt == "xml":
        # Spark 4 native XML source (no external package)
        writer.format("xml").option("rowTag", "row").save(out)
        back = (spark.read.format("xml").option("rowTag", "row")
                .schema(nation_df.schema).load(out))
    else:
        getattr(writer, fmt)(out)
        if fmt == "json":
            back = spark.read.schema(nation_df.schema).json(out)
        else:
            back = getattr(spark.read, fmt)(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation_df.collect()))


def test_partitioned_parquet_sink_prunes(spark, tmp_path_factory):
    """Hive-style partitioned sink (the scalable layout: partition column
    becomes directory structure, later scans prune by it)."""
    out = str(tmp_path_factory.mktemp("part_sink")) + "/orders"
    orders = load(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate"))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(out)
    back = spark.read.parquet(out)
    one_year = back.filter(F.col("o_year") == 1996)
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_year.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "o_year" in plan
    expected = orders.filter(F.col("o_year") == 1996).count()
    assert one_year.count() == expected


def test_dynamic_partition_overwrite_is_idempotent(spark, tmp_path_factory):
    """partitionOverwriteMode=dynamic rewrites ONLY the partitions
    present in the incoming batch — the idempotent-backfill primitive a
    100 TB pipeline relies on (re-running one day's job must not
    truncate the other days, which STATIC overwrite would)."""
    out = str(tmp_path_factory.mktemp("dyn_ovw")) + "/orders"
    orders = load(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate"))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(out)
    base = {r["o_year"]: r["n"] for r in spark.read.parquet(out)
            .groupBy("o_year").agg(F.count("*").alias("n")).collect()}
    # backfill 1996 with a halved slice, dynamic mode
    patch = (orders.filter(F.col("o_year") == 1996)
             .filter(F.col("o_orderkey") % 2 == 0))
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch.write.mode("overwrite").partitionBy("o_year").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    after = {r["o_year"]: r["n"] for r in spark.read.parquet(out)
             .groupBy("o_year").agg(F.count("*").alias("n")).collect()}
    assert after[1996] == patch.count()          # targeted partition replaced
    for y, n in base.items():                    # every other one intact
        if y != 1996:
            assert after[y] == n, (y, after[y], n)
