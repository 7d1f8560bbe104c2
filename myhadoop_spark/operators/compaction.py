"""Shared selective partition compaction for append-maintained
partitioned tables.

Both persistent indexes (the IVF inverted lists,
operators/ivf_index.py, and the BM25 postings table,
operators/bm25_index.py) are maintained by per-batch APPENDS: each
append writes a new file set into the partitions it touches, so a
long-running ingest fragments the table — the per-probe read
advantage erodes with per-file listing/open cost, not bytes
(`ivf_compact_study.tsv`). The cure is the same for any such table,
so it lives here once:

  1. ONE bounded driver-side listing of the top-level ``col=value``
     partition directories, counting data files per partition;
  2. partitions over ``max_files_per_part`` are read back (basePath +
     only those directories — partition-pruned, untouched partitions
     are never opened), hash-repartitioned on the partition column so
     each partition lands wholly in one task (→ one output file), and
     rewritten via dynamic partition overwrite;
  3. ``maxRecordsPerFile`` re-splits genuinely huge partitions so the
     rewrite still yields parallel-readable bounded files at 100 TB.

``sort_cols`` optionally sorts rows within each rewritten partition —
the BM25 postings use it to keep per-file term min/max stats tight so
a term-IN probe skips row groups after compaction too.

Reference analog: none — engine-hardening surface (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from myhadoop_spark.fsutil import count_data_files, list_partition_dirs


def compact_partitions(spark: SparkSession, table_path: str,
                       part_col: str, *, max_files_per_part: int = 4,
                       max_rows_per_file: int = 1_000_000,
                       sort_cols: tuple[str, ...] = ()) -> dict:
    """Rewrite fragmented partitions of ``table_path`` to one file each
    (bounded by ``max_rows_per_file``); untouched partitions keep their
    files byte-identical. Returns
    {compacted_parts, files_before, files_after}."""
    dirs = list_partition_dirs(spark, table_path, part_col)
    frag = [(v, u) for v, u in dirs
            if count_data_files(spark, [u]) > max_files_per_part]
    if not frag:
        return {"compacted_parts": 0, "files_before": 0, "files_after": 0}
    uris = [u for _, u in frag]
    before = count_data_files(spark, uris)
    df = (spark.read.option("basePath", table_path).parquet(*uris)
          .repartition(len(frag), part_col))
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    (df.write.partitionBy(part_col)
     .option("partitionOverwriteMode", "dynamic")
     .option("maxRecordsPerFile", max_rows_per_file)
     .mode("overwrite").parquet(table_path))
    after = count_data_files(spark, uris)
    return {"compacted_parts": len(frag), "files_before": before,
            "files_after": after}
