"""Compression-ratio quality signals — the classic repetition/
low-information detector from large-corpus curation (the Gopher/
MassiveText rule family: documents that DEFLATE too well are
boilerplate or generated repetition; documents that barely compress
are often binary junk or high-entropy noise).

Two per-document signals, both deterministic:

  * ``compression_ratio`` = deflate(text) bytes / utf-8 bytes at a
    FIXED zlib level — zlib's output is a pure function of (input,
    level, library), and the library is pinned by the runtime, so the
    signal is reproducible run to run and partition-invariant;
  * ``byte_entropy`` = Shannon entropy (bits/byte) of the utf-8 byte
    histogram — the compression-free cousin (a lower bound on any
    codec's achievable rate), cheap and exactly order-independent.

Scale shape: one Arrow-batched pandas UDF pass (zlib is per-row
Python work no built-in expression can express — the sanctioned UDF
case), narrow end to end: no shuffle, no join, no state; composes as
a filter the same way the classifier and LM gates do. The signal
computation streams batch-by-batch through Arrow, so peak memory is
one Arrow batch per core regardless of corpus size.

No DuckDB oracle: the twin would need zlib inside SQL. Correctness is
pinned against the direct Python model (same zlib, bitwise) plus
behavioral bounds (repetition compresses below prose, noise above;
entropy brackets) in tests/test_compression.py.

Reference analog: none — §2.3 extension surface (SURVEY.md §2.3);
Rae et al. 2021 (Gopher) §A1.1 repetition filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

ZLIB_LEVEL = 6  # pinned: the signal is only comparable at one level


def _compress_stats_udf():
    # built inside a function: pandas_udf parses its DDL return type
    # against the ACTIVE session, so module import must not need one
    @pandas_udf("struct<n_bytes: long, z_bytes: long, "
                "byte_entropy: double>")
    def _compress_stats(texts):
        import math
        import zlib

        import pandas as pd

        from collections import Counter

        def one(t):
            b = ("" if t is None else t).encode("utf-8")
            if not b:
                return (0, 0, 0.0)
            z = len(zlib.compress(b, ZLIB_LEVEL))
            # Counter(bytes) counts at C speed; its iteration order is
            # first-encounter order — the same order a manual dict
            # fold would produce, so the float entropy sum is
            # bit-stable against the Python model in tests
            counts = Counter(b)
            n = len(b)
            ent = -sum((c / n) * math.log2(c / n)
                       for c in counts.values())
            return (n, z, ent)

        rows = [one(t) for t in texts]
        return pd.DataFrame(rows, columns=["n_bytes", "z_bytes",
                                           "byte_entropy"])

    return _compress_stats


def compression_signals(docs: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(id, n_bytes, z_bytes, compression_ratio, byte_entropy) per
    document. Empty documents get ratio 0.0 and entropy 0.0 (no bytes
    — nothing to judge; the length gates own that case)."""
    s = _compress_stats_udf()(F.col(text_col))
    return (docs
            .withColumn("_s", s)
            .select(id_col,
                    F.col("_s.n_bytes").alias("n_bytes"),
                    F.col("_s.z_bytes").alias("z_bytes"),
                    F.when(F.col("_s.n_bytes") > 0,
                           F.col("_s.z_bytes")
                           / F.col("_s.n_bytes")).otherwise(0.0)
                    .alias("compression_ratio"),
                    F.col("_s.byte_entropy").alias("byte_entropy")))


def filter_by_compression(docs: DataFrame, *, id_col: str = "doc_id",
                          text_col: str = "text",
                          min_ratio: float = 0.25,
                          max_ratio: float = 1.05) -> DataFrame:
    """Keep documents whose deflate ratio sits in the prose band:
    below ``min_ratio`` is near-pure repetition (the Gopher cut),
    above ``max_ratio`` the text is incompressible noise (a ratio
    slightly over 1.0 is possible — zlib framing overhead on already-
    high-entropy bytes). Empty documents are kept (ratio 0 is the
    no-bytes sentinel, not repetition; length gates own empties)."""
    s = _compress_stats_udf()(F.col(text_col))
    ratio = F.when(F.col("_s.n_bytes") > 0,
                   F.col("_s.z_bytes")
                   / F.col("_s.n_bytes")).otherwise(0.0)
    # inline filter, NOT a join back on the id: the verdict is a pure
    # per-row function of the text, so the face stays narrow end to
    # end (plan-asserted) — no shuffle enters the pipeline for this
    # gate
    return (docs.withColumn("_s", s)
            .filter((F.col("_s.n_bytes") == 0)
                    | ((ratio >= min_ratio) & (ratio <= max_ratio)))
            .drop("_s"))
