"""Streaming decontamination — stream-static join over the shingle index.

The ingest-time form of operators/decontam.py: documents arrive as a
stream and are checked against a STATIC benchmark shingle index before
they ever land in the training corpus. This is the one streaming join
regime the engine didn't yet exercise — stream-static (the stream side
probes a fixed broadcast table; no watermark needed because the static
side never grows stale in-query, per Spark's stream-static semantics).

At scale: the benchmark index is small (eval sets vs a 100 TB corpus) so
the join broadcasts; each micro-batch streams through tokenize → shingle
hash → probe with no shuffle and no state. The per-pair aggregation is
the only stateful piece and is keyed by (corpus_id, bench_id) — bounded
by actual contamination, not by traffic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from myhadoop_spark.operators.decontam import DEFAULT_N, shingle_hashes


def contamination_stream(doc_stream: DataFrame, bench_static: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = DEFAULT_N) -> DataFrame:
    """Streaming (corpus_id, bench_id, n_shared) — update/complete-mode
    aggregation over the stream-static shingle join. `doc_stream` is a
    streaming DataFrame of (id, text); `bench_static` a batch DataFrame
    of benchmark documents."""
    c = shingle_hashes(doc_stream, id_col, text_col, n).withColumnRenamed(
        id_col, "corpus_id")
    b = shingle_hashes(bench_static, id_col, text_col, n).withColumnRenamed(
        id_col, "bench_id")
    return (
        c.join(F.broadcast(b), "sh")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
