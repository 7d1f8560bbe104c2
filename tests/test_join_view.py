"""Incremental materialized join view (operators/join_view.py):
incremental ≡ one-shot (bitwise vs a DuckDB join), replay exactness,
history-never-shuffled plan shape."""

from __future__ import annotations

import contextlib
import io

import duckdb
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.join_view import (
    build_join_view,
    query_view,
    refresh_join_view,
)
from tests.conftest import SF_SMOKE


def _sources(spark):
    orders = (load(spark, SF_SMOKE, "orders")
              .select("o_orderkey", "o_custkey", "o_totalprice")
              .withColumnRenamed("o_custkey", "custkey"))
    cust = (load(spark, SF_SMOKE, "customer")
            .select("c_custkey", "c_name", "c_acctbal")
            .withColumnRenamed("c_custkey", "custkey"))
    return orders.localCheckpoint(), cust.localCheckpoint()


def test_incremental_equals_oneshot_bitwise(spark, tmp_path):
    """Three interleaved left/right append batches: the maintained
    view must equal the one-shot join of the totals — checked bitwise
    against DuckDB joining the same parquet fixtures."""
    orders, cust = _sources(spark)
    path = str(tmp_path / "v")
    build_join_view(orders.filter("o_orderkey % 3 = 0"),
                    cust.filter("custkey % 2 = 0"),
                    path, key="custkey")
    refresh_join_view(path, key="custkey", append_id="a1",
                      delta_left=orders.filter("o_orderkey % 3 = 1"))
    refresh_join_view(path, key="custkey", append_id="a2",
                      delta_right=cust.filter("custkey % 2 = 1"))
    refresh_join_view(path, key="custkey", append_id="a3",
                      delta_left=orders.filter("o_orderkey % 3 = 2"))
    got = sorted(tuple(r) for r in query_view(spark, path)
                 .select("custkey", "o_orderkey", "o_totalprice",
                         "c_name", "c_acctbal").collect())
    con = duckdb.connect()
    want = sorted(con.execute(f"""
        SELECT o.o_custkey, o.o_orderkey, o.o_totalprice,
               c.c_name, c.c_acctbal
        FROM read_parquet('{SF_SMOKE}/orders.parquet') o
        JOIN read_parquet('{SF_SMOKE}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
    """).fetchall())
    assert got == want and got


def test_replay_is_exact(spark, tmp_path):
    """Re-applying a refresh with the same append_id (crash replay:
    its partial writes may be on disk) leaves the view IDENTICAL —
    dynamic overwrite + the append_id exclusion guard."""
    orders, cust = _sources(spark)
    path = str(tmp_path / "v")
    build_join_view(orders.filter("o_orderkey % 2 = 0"), cust,
                    path, key="custkey")
    d1 = orders.filter("o_orderkey % 2 = 1")
    refresh_join_view(path, key="custkey", append_id="a1",
                      delta_left=d1)
    before = sorted(tuple(r) for r in query_view(spark, path).collect())
    refresh_join_view(path, key="custkey", append_id="a1",
                      delta_left=d1)  # replay
    after = sorted(tuple(r) for r in query_view(spark, path).collect())
    assert after == before


def test_refresh_plan_broadcasts_delta(spark, tmp_path):
    """History mirrors are scanned, never shuffled: the delta side
    broadcasts and no hash exchange touches the mirror scans."""
    orders, cust = _sources(spark)
    path = str(tmp_path / "v")
    build_join_view(orders.limit(200), cust, path, key="custkey")
    spark_ = spark
    from myhadoop_spark.operators.join_view import _read_excluding

    dl = orders.limit(20)
    right_old = _read_excluding(
        spark_, f"{path}/right",
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                  for f in cust.schema.fields), "a1")
    plan_df = F.broadcast(dl).join(right_old, "custkey")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_column_overlap_rejected(spark, tmp_path):
    import pytest

    a = spark.createDataFrame([(1, "x")], "k long, name string")
    b = spark.createDataFrame([(1, "y")], "k long, name string")
    with pytest.raises(ValueError, match="share non-key columns"):
        build_join_view(a, b, str(tmp_path / "v"), key="k")