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
import pytest


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

def test_stream_face_matches_batch(spark, tmp_path):
    orders, cust = _sources(spark)
    path = str(tmp_path / "v")
    build_join_view(orders.filter("o_orderkey % 4 = 0"), cust,
                    path, key="custkey")
    from myhadoop_spark.operators.join_view import start_join_view_stream

    src = str(tmp_path / "src")
    for i in range(1, 4):
        (orders.filter(f"o_orderkey % 4 = {i}")
         .coalesce(1).write.parquet(f"{src}/b{i}"))
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in orders.schema.fields)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    q = start_join_view_stream(stream, path=path, key="custkey",
                               checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = query_view(spark, path).count()
    want = orders.join(cust, "custkey").count()
    assert got == want and got > 0


def _oneshot_rows(spark):
    orders, cust = _sources(spark)
    return sorted(tuple(r) for r in orders.join(cust, "custkey")
                  .select("custkey", "o_orderkey", "o_totalprice",
                          "c_name", "c_acctbal").collect())


def _view_rows(spark, path):
    return sorted(tuple(r) for r in query_view(spark, path)
                  .select("custkey", "o_orderkey", "o_totalprice",
                          "c_name", "c_acctbal").collect())


def test_reserved_namespace_rejected(spark, tmp_path):
    """The r7 ADVICE finding: a manual append_id of 'b2'-style could
    silently overwrite a stream batch's partitions. Stream batches now
    live under 'stream-*' and both it and compaction's 'gen-*' are
    rejected for manual refreshes/builds."""
    import pytest

    orders, cust = _sources(spark)
    path = str(tmp_path / "v")
    build_join_view(orders.limit(50), cust, path, key="custkey")
    for bad in ("stream-2", "gen-1"):
        with pytest.raises(ValueError, match="reserved"):
            refresh_join_view(path, key="custkey", append_id=bad,
                              delta_left=orders.limit(5))
        with pytest.raises(ValueError, match="reserved"):
            build_join_view(orders.limit(5), cust,
                            str(tmp_path / "v2"), key="custkey",
                            append_id=bad)


def test_compaction_bitwise_and_bounded(spark, tmp_path):
    """compact_join_view folds every committed append into one
    generation partition per table: query_view is bitwise unchanged
    across the fold, the store shrinks to one directory per table,
    and a refresh AFTER compaction (joining the folded mirrors) still
    lands exactly on the one-shot join."""
    from pathlib import Path

    from myhadoop_spark.operators.join_view import compact_join_view

    orders, cust = _sources(spark)
    path = str(tmp_path / "v")
    build_join_view(orders.filter("o_orderkey % 3 = 0"),
                    cust.filter("custkey % 2 = 0"),
                    path, key="custkey")
    refresh_join_view(path, key="custkey", append_id="a1",
                      delta_left=orders.filter("o_orderkey % 3 = 1"))
    refresh_join_view(path, key="custkey", append_id="a2",
                      delta_right=cust.filter("custkey % 2 = 1"))
    before = _view_rows(spark, path)

    stats = compact_join_view(spark, path)
    assert stats["view"]["folded"] == 3  # base + a1 + a2
    assert _view_rows(spark, path) == before
    for side in ("view", "left", "right"):
        dirs = [p.name for p in Path(path, side).glob("append_id=*")]
        assert dirs == ["append_id=gen-1"], (side, dirs)

    # post-compaction refresh joins against the folded mirrors
    refresh_join_view(path, key="custkey", append_id="a3",
                      delta_left=orders.filter("o_orderkey % 3 = 2"))
    assert _view_rows(spark, path) == _oneshot_rows(spark)

    # idempotent second fold: a1..a3-era content now folds into gen-2
    compact_join_view(spark, path)
    assert _view_rows(spark, path) == _oneshot_rows(spark)


def test_compaction_crash_windows_are_invisible(spark, tmp_path):
    """Every fold crash window leaves readers on one complete copy:
    (a) a stale non-live generation (crash between write and manifest
    flip) is excluded; (b) an unswept folded source (crash between
    flip and sweep) is excluded; the next compaction sweeps both."""
    import shutil
    from pathlib import Path

    from myhadoop_spark.operators.join_view import compact_join_view

    orders, cust = _sources(spark)
    path = str(tmp_path / "v")
    build_join_view(orders.filter("o_orderkey % 2 = 0"), cust,
                    path, key="custkey")
    refresh_join_view(path, key="custkey", append_id="a1",
                      delta_left=orders.filter("o_orderkey % 2 = 1"))
    want = _oneshot_rows(spark)
    # keep a copy of a1's view partition to replant post-fold
    backup = tmp_path / "a1_backup"
    shutil.copytree(Path(path, "view", "append_id=a1"), backup)

    compact_join_view(spark, path)
    assert _view_rows(spark, path) == want

    # (a) stale generation: a completed-but-never-flipped gen-99
    shutil.copytree(Path(path, "view", "append_id=gen-1"),
                    Path(path, "view", "append_id=gen-99"))
    assert _view_rows(spark, path) == want

    # (b) unswept source: a1's directory back on disk; the manifest's
    # folded list (written before the sweep) must exclude it
    shutil.copytree(backup, Path(path, "view", "append_id=a1"))
    assert _view_rows(spark, path) == want

    # the next compaction's cleanup sweeps both leftovers
    compact_join_view(spark, path)
    assert not Path(path, "view", "append_id=gen-99").exists()
    assert not Path(path, "view", "append_id=a1").exists()
    assert _view_rows(spark, path) == want


def test_retention_drop_view_appends(spark, tmp_path):
    """drop_view_appends retires whole refreshes: rows gone from the
    query face, manifest mirrors the drop BEFORE directories die (a
    partial delete still serves the retained window only), and later
    refreshes join only the retained mirrors."""
    from pathlib import Path

    from myhadoop_spark.fsutil import write_small_file
    from myhadoop_spark.operators.join_view import drop_view_appends

    orders, cust = _sources(spark)
    path = str(tmp_path / "v")
    build_join_view(orders.filter("o_orderkey % 3 = 0"), cust,
                    path, key="custkey")
    refresh_join_view(path, key="custkey", append_id="a1",
                      delta_left=orders.filter("o_orderkey % 3 = 1"))
    refresh_join_view(path, key="custkey", append_id="a2",
                      delta_left=orders.filter("o_orderkey % 3 = 2"))

    res = drop_view_appends(spark, path, ["a1"])
    assert res["deleted_dirs"] == 2  # view + left (a1 had no right)
    keep = (orders.filter("o_orderkey % 3 != 1")
            .join(cust, "custkey"))
    want = sorted(tuple(r) for r in keep
                  .select("custkey", "o_orderkey", "o_totalprice",
                          "c_name", "c_acctbal").collect())
    assert _view_rows(spark, path) == want
    assert not Path(path, "view", "append_id=a1").exists()

    # crash-sim: the manifest names a doomed id whose directories are
    # still on disk — readers must already exclude it
    import json

    write_small_file(spark, f"{path}/_dropped",
                     json.dumps({"dropped": ["a1", "a2"]}))
    want2 = sorted(
        tuple(r) for r in orders.filter("o_orderkey % 3 = 0")
        .join(cust, "custkey")
        .select("custkey", "o_orderkey", "o_totalprice",
                "c_name", "c_acctbal").collect())
    assert _view_rows(spark, path) == want2
    # re-run finishes the delete idempotently
    drop_view_appends(spark, path, ["a2"])
    assert not Path(path, "view", "append_id=a2").exists()
    assert _view_rows(spark, path) == want2


def test_stream_face_compacts(spark, tmp_path):
    """compact_every in the stream face: the store stays at a bounded
    directory count across streamed refreshes and the final view still
    equals the one-shot join."""
    from pathlib import Path

    from myhadoop_spark.operators.join_view import start_join_view_stream

    orders, cust = _sources(spark)
    path = str(tmp_path / "v")
    build_join_view(orders.filter("o_orderkey % 5 = 0"), cust,
                    path, key="custkey")
    src = str(tmp_path / "src")
    for i in range(1, 5):
        (orders.filter(f"o_orderkey % 5 = {i}")
         .coalesce(1).write.parquet(f"{src}/b{i}"))
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in orders.schema.fields)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    q = start_join_view_stream(stream, path=path, key="custkey",
                               checkpoint=str(tmp_path / "ckpt"),
                               compact_every=2)
    q.awaitTermination(120)
    assert _view_rows(spark, path) == _oneshot_rows(spark)
    # 4 batches, folds after stream-1 and stream-3: ≤ gen + in-flight
    # + the last un-folded batch, never one dir per refresh
    dirs = sorted(p.name for p in Path(path, "view")
                  .glob("append_id=*"))
    assert len(dirs) <= 3, dirs


@pytest.mark.slow  # r14: heavy parity battery (fast twin stays in the default tier)
def test_composes_with_continuous_aggregate(spark, tmp_path):
    """The end-to-end incremental pipeline: the join view's per-refresh
    delta rows feed the continuous aggregate's incremental refresh —
    after interleaved appends, the rollup query face equals the
    one-shot daily aggregation over the full join, bitwise (both IVM
    layers compose without recomputing either input)."""
    from myhadoop_spark.operators.continuous_agg import (
        query_rollup,
        refresh_rollup,
    )

    orders = (load(spark, SF_SMOKE, "orders")
              .select("o_orderkey", "o_custkey", "o_totalprice",
                      "o_orderdate")
              .withColumnRenamed("o_custkey", "custkey")
              .localCheckpoint())
    vpath = str(tmp_path / "v")
    rpath = str(tmp_path / "r")

    def to_events(view_rows):
        # o_orderdate → ts, mktsegment → key, totalprice → value
        return view_rows.select(
            F.col("o_orderdate").cast("timestamp").alias("ts"),
            F.col("custkey").alias("user_id"),
            F.col("c_mktsegment").alias("event_type"),
            F.col("o_totalprice").cast("double").alias("value"))

    cust2 = (load(spark, SF_SMOKE, "customer")
             .select("c_custkey", "c_mktsegment")
             .withColumnRenamed("c_custkey", "custkey").localCheckpoint())
    build_join_view(orders.filter("o_orderkey % 3 = 0"), cust2,
                    vpath, key="custkey")
    # seed the rollup from the base view (deltas whose ts spans years:
    # a wide lateness keeps every refresh inside the horizon)
    kw = dict(bucket="1 day", keys=["event_type"],
              lateness="3650 days")
    refresh_rollup(to_events(query_view(spark, vpath)), rpath, **kw)
    for i, aid in ((1, "a1"), (2, "a2")):
        delta = refresh_join_view(
            vpath, key="custkey", append_id=aid,
            delta_left=orders.filter(f"o_orderkey % 3 = {i}"))
        refresh_rollup(to_events(delta), rpath, **kw)

    all_events = to_events(query_view(spark, vpath)).localCheckpoint()
    got = sorted(
        (r.bucket, r.event_type, r.n_events, r.sum_value)
        for r in query_rollup(spark, all_events, rpath,
                              bucket="1 day",
                              keys=["event_type"]).collect())
    want = sorted(
        (r.bucket, r.event_type, r.n_events, r.sum_value)
        for r in all_events
        .withColumn("bucket", F.date_trunc("day", "ts"))
        .groupBy("bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("sum_value")).collect())
    assert got == want and got
