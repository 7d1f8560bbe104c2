"""Bucketed tables: pre-shuffled storage layout → co-located joins with
NO exchange on either side (the 100 TB repeated-join pattern)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # managed tables land in ./spark-warehouse (warehouse.dir is a static
    # conf); DROP TABLE below removes the files
    li = load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("li_bucketed"))
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("orders_bucketed"))
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # at fixture scale the planner would broadcast (and rightly ignore
    # bucketing); disable broadcast to exercise the big-big join path
    # bucketing exists for
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("li_bucketed")
            .join(spark.table("orders_bucketed"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan   # co-located: no shuffle at all
        assert "SortMergeJoin" in plan, plan
        direct = (
            load(spark, SF_SMOKE, "lineitem")
            .join(load(spark, SF_SMOKE, "orders"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )
        assert j.count() == direct
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    agg = spark.table("li_bucketed").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        agg.explain("formatted")
    assert "Exchange" not in buf.getvalue()
