"""HLL index rehearsal: the point of persisting per-group sketches is
that every LATER distinct-count question — coarser rollups, grand
totals — is answered from the keys-sized sketch table instead of
rescanning the corpus. Measure both paths at growing corpus sizes:
the raw path's wall grows with rows; the index path's wall is flat
(it reads #groups rows of ~1-4 KB sketches).

Appends: engine  n_rows  op  wall_s  rows_read  answer
Run: python scripts/hll_index_study.py [n_rows] (default 2000000)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark.operators.hll_index import (
    build_index,
    estimate,
    read_index,
)
from myhadoop_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("hll_index_study")
    out = Path("hll_index_study.tsv")
    if not out.exists():
        out.write_text("engine\tn_rows\top\twall_s\trows_read\tanswer\n")

    work = tempfile.mkdtemp(prefix="hll_study_")
    try:
        for scale in (n // 4, n):
            raw = f"{work}/raw_{scale}"
            (spark.range(scale).select(
                (F.col("id") % 24).cast("string").alias("g"),
                ((F.col("id") * 48271) % (scale // 10)).alias("v"))
             .write.mode("overwrite").parquet(raw))
            df = spark.read.parquet(raw)
            idx = f"{work}/idx_{scale}"

            t0 = time.time()
            build_index(df, ["g"], "v", idx)
            t_build = time.time() - t0

            t0 = time.time()
            exact = df.agg(F.count_distinct("v")).head()[0]
            t_raw = time.time() - t0

            t0 = time.time()
            tbl = read_index(spark, idx)
            est = estimate(tbl, []).head()["estimate"]
            t_idx = time.time() - t0
            n_idx_rows = tbl.count()

            with out.open("a") as f:
                f.write(f"myhadoop_spark\t{scale}\tbuild_index\t"
                        f"{t_build:.3f}\t{scale}\t24\n")
                f.write(f"myhadoop_spark\t{scale}\traw_rescan\t"
                        f"{t_raw:.3f}\t{scale}\t{exact}\n")
                f.write(f"myhadoop_spark\t{scale}\trollup_from_index\t"
                        f"{t_idx:.3f}\t{n_idx_rows}\t{est}\n")
            print(scale, f"build={t_build:.2f}s raw={t_raw:.2f}s "
                         f"index={t_idx:.2f}s exact={exact} est={est} "
                         f"err={abs(est - exact) / max(exact, 1):.4f}")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
