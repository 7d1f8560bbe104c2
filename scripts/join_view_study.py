"""Join-view store lifecycle rehearsal (r8): a long-running
start_join_view_stream accumulates one append_id directory per
refresh per table — the pre-compaction IVF fragmentation shape
(ivf_compact_study.tsv) applied to the materialized-view store. The
r8 lifecycle (compact_join_view generations) must hold directory and
file counts FLAT over an unbounded refresh schedule while the view
stays bitwise identical to the one-shot join.

Method: build the view from a base slice of orders x customer, then
stream N left-side append batches twice — once with no compaction
(fragmentation baseline) and once with compact_every=5 — recording
after every refresh the store's total partition-directory count,
data-file count, and bytes across all three tables, plus the final
view row count vs the one-shot join (asserted equal in both runs).

Appends to join_view_study.tsv:

    engine  mode  n_batches  batch_id  dirs  files  bytes  \
        view_rows  wall_s

Run: python scripts/join_view_study.py [n_batches]  (default 20)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.fsutil import count_data_files, list_partition_dirs
from myhadoop_spark.operators.join_view import (
    _SIDES,
    build_join_view,
    compact_join_view,
    query_view,
    start_join_view_stream,
)
from myhadoop_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def store_shape(spark, path) -> tuple[int, int, int]:
    dirs, files, total = 0, 0, 0
    for side in _SIDES:
        listing = list_partition_dirs(spark, f"{path}/{side}",
                                      "append_id")
        dirs += len(listing)
        uris = [u for _, u in listing]
        files += count_data_files(spark, uris)
        for p in Path(path, side).rglob("*.parquet"):
            total += p.stat().st_size
    return dirs, files, total


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("join_view_study")
    out = Path("join_view_study.tsv")
    if not out.exists():
        out.write_text("engine\tmode\tn_batches\tbatch_id\tdirs\t"
                       "files\tbytes\tview_rows\twall_s\n")

    orders = (load(spark, SF, "orders")
              .select("o_orderkey", "o_custkey", "o_totalprice")
              .withColumnRenamed("o_custkey", "custkey")
              .localCheckpoint())
    cust = (load(spark, SF, "customer")
            .select("c_custkey", "c_name", "c_acctbal")
            .withColumnRenamed("c_custkey", "custkey")
            .localCheckpoint())
    want = orders.join(cust, "custkey").count()
    base = "/tmp/join_view_study"

    for mode, compact_every in (("no_compaction", None),
                                ("compact_every_5", 5)):
        root = f"{base}/{mode}"
        os.system(f"rm -rf {root}")
        path = f"{root}/v"
        build_join_view(orders.filter(f"o_orderkey % {n_batches + 1} = 0"),
                        cust, path, key="custkey")
        src = f"{root}/src"
        for i in range(1, n_batches + 1):
            (orders.filter(f"o_orderkey % {n_batches + 1} = {i}")
             .coalesce(1).write.parquet(f"{src}/b{i:03d}"))
        schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                           for f in orders.schema.fields)
        shapes = []

        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
        t0 = time.time()
        q = start_join_view_stream(stream, path=path, key="custkey",
                                   checkpoint=f"{root}/ckpt",
                                   compact_every=compact_every)
        q.awaitTermination(600)
        wall = time.time() - t0
        # final fold so the terminal shape reflects steady-state cadence
        if compact_every:
            compact_join_view(spark, path)
        got = query_view(spark, path).count()
        assert got == want, (mode, got, want)
        dirs, files, total = store_shape(spark, path)
        line = (f"myhadoop_spark\t{mode}\t{n_batches}\t{n_batches}\t"
                f"{dirs}\t{files}\t{total}\t{got}\t{wall:.2f}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip())
        shapes.append((dirs, files))

    print("one-shot join rows:", want)


if __name__ == "__main__":
    main()
