"""Skew operators: salted results must equal the straightforward plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.functions.money import dec
from myhadoop_spark.operators.skew import replicated_skew_join, salted_sum_count
from tests.conftest import SF_SMOKE


def test_salted_sum_equals_direct(spark):
    ev = load(spark, SF_SMOKE, "events")
    salted = {
        r["event_type"]: (r["sum_value"], r["n_rows"])
        for r in salted_sum_count(ev, ["event_type"], dec("value")).collect()
    }
    direct = {
        r["event_type"]: (r["s"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.sum(dec("value")).alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert salted == direct


def test_replicated_skew_join_equals_plain(spark):
    li = load(spark, SF_SMOKE, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity")
    orders = load(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("k"), "o_totalprice")
    skewed = replicated_skew_join(li, orders, "k").count()
    plain = li.join(orders, "k").count()
    assert skewed == plain
