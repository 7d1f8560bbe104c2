"""End-to-end chunk-curation scaling rehearsal (r6).

The composed chunk-granular pipeline (queries/pipeline2.curate_chunks:
scrub → chunk → exact chunk dedup → chunk-level decontam → verified
sharded export) has per-stage scale arguments in its docstring; this
study executes the WHOLE composition at 10× spread (sf0.01 → sf0.1
driver fixtures, 500 → 5,000 docs) and records wall, shuffle-write
bytes, spill, and the funnel counts — the end-to-end counterpart of
the per-operator curves (dedup_scaling.tsv, media_scaling.tsv).

What the curve must show: wall and shuffle grow ≈ linearly in the
corpus (chunking is narrow; dedup shuffles chunk text once; decontam
joins a broadcast bench shingle set; export is one partitionBy-shard
shuffle) and spill stays 0.

Appends to pipeline_scaling.tsv:

    engine  sf_dir  raw_docs  chunks  after_dedup  after_decontam  exported_shards  wall_s  shuffle_write_bytes  spill_bytes

Run: python scripts/pipeline_scaling.py [sf_dirs...]
(default /root/testdata/sf0.01 /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_UI", "1")

from bench import StageMeter
from myhadoop_spark.queries.pipeline2 import curate_chunks
from myhadoop_spark.session import get_spark


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01",
                               "/root/testdata/sf0.1"]
    spark = get_spark("pipeline_scaling")
    out = Path("pipeline_scaling.tsv")
    if not out.exists():
        out.write_text("engine\tsf_dir\traw_docs\tchunks\tafter_dedup\t"
                       "after_decontam\texported_shards\twall_s\t"
                       "shuffle_write_bytes\tspill_bytes\n")
    meter = StageMeter(spark)
    # uncounted warm-up: Python-worker startup + codegen otherwise
    # lands entirely in the first measured row
    curate_chunks(spark, "/root/testdata/sf0.001",
                  "/tmp/pipeline_scaling_warmup")
    for sf_dir in sf_dirs:
        dest = f"/tmp/pipeline_scaling_{Path(sf_dir).name}"
        meter.delta()
        t0 = time.time()
        stats = curate_chunks(spark, sf_dir, dest)
        wall = time.time() - t0
        d = meter.delta()
        shards = len(stats["manifest"]["shards"])
        line = (f"myhadoop_spark\t{Path(sf_dir).name}\t"
                f"{stats['raw_docs']}\t{stats['chunks']}\t"
                f"{stats['after_chunk_dedup']}\t{stats['after_decontam']}\t"
                f"{shards}\t{wall:.2f}\t"
                f"{d.get('shuffle_write_bytes', 0)}\t"
                f"{d.get('spill_memory_bytes', 0) + d.get('spill_disk_bytes', 0)}\n")
        with out.open("a") as f:
            f.write(line)
        print(line.strip())
    spark.stop()


if __name__ == "__main__":
    main()
