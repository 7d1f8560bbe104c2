"""Sequence packing: bin documents into fixed token-budget training rows.

LLM pretraining consumes fixed-length sequences (e.g. 2k/8k tokens);
feeding one short document per sequence wastes the budget on padding.
Packing greedily fills each sequence with several documents.  The
distributed form used here:

1. Oversize documents (> capacity) are split into full-capacity chunks
   (each an exactly-full pack by construction) plus a remainder piece —
   a narrow ``explode(sequence(...))``, no shuffle.
2. Remainder/small pieces are hash-bucketed and packed per bucket with
   first-fit-decreasing inside ``applyInPandas`` — no global
   coordination, so the plan is one shuffle on the bucket key no matter
   the corpus size.  FFD within a bucket wastes at most ~1/4 of one
   pack per open bin; with thousands of pieces per bucket the realized
   fill is ≳90% (asserted in tests).  Pack ids are ``bucket-seq`` so
   they are globally unique without a driver-side counter.

Determinism: bucket assignment hashes the doc id (not the input
partitioning) and FFD orders by (tokens desc, doc_id, piece), so the
output is a pure function of the input rows — rerun- and
repartition-stable (tested), which matters for reproducible training
mixes and resumable jobs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PACK_SCHEMA = ("pack_id STRING, doc_ids ARRAY<BIGINT>, "
               "piece_tokens ARRAY<BIGINT>, total_tokens BIGINT, "
               "n_pieces INT")


def _ffd(bucket_key: tuple, pdf: pd.DataFrame, capacity: int,
         max_source_tokens: int | None = None) -> pd.DataFrame:
    """First-fit-decreasing within one bucket. With max_source_tokens
    set, a piece only fits a bin if its source's tokens in that bin
    stay ≤ the cap (per-bin source-mix quota) — a piece LARGER than the
    cap still always opens its own bin (quotas bound mixing, they must
    not drop data; such a pack is flagged by the quota test as exempt)."""
    has_source = "source" in pdf.columns
    pdf = pdf.sort_values(
        ["tokens", "doc_id", "piece"], ascending=[False, True, True])
    srcs = pdf["source"] if has_source else [""] * len(pdf)
    bins: list[dict] = []  # {"free": int, "docs": [], "toks": [], "by_src": {}}
    for doc_id, tokens, src in zip(pdf["doc_id"], pdf["tokens"], srcs):
        for b in bins:
            if b["free"] >= tokens and (
                    max_source_tokens is None
                    or b["by_src"].get(src, 0) + tokens <= max_source_tokens):
                break
        else:
            b = {"free": capacity, "docs": [], "toks": [], "by_src": {}}
            bins.append(b)
        b["free"] -= tokens
        b["docs"].append(doc_id)
        b["toks"].append(tokens)
        b["by_src"][src] = b["by_src"].get(src, 0) + tokens
    return pd.DataFrame({
        "pack_id": [f"{bucket_key[0]}-{i}" for i in range(len(bins))],
        "doc_ids": [b["docs"] for b in bins],
        "piece_tokens": [b["toks"] for b in bins],
        "total_tokens": [capacity - b["free"] for b in bins],
        "n_pieces": [len(b["docs"]) for b in bins],
    })


def pack_documents(df: DataFrame, capacity: int,
                   id_col: str = "doc_id", tokens_col: str = "tokens",
                   n_buckets: int = 32, source_col: str | None = None,
                   max_source_frac: float | None = None) -> DataFrame:
    """Pack ``(id_col, tokens_col)`` rows into sequences of at most
    ``capacity`` tokens.  Returns one row per pack (PACK_SCHEMA); every
    input document's tokens appear in exactly one pack-piece, oversize
    documents appear as several pieces (full chunks + remainder).

    With ``source_col`` + ``max_source_frac`` set, FFD additionally caps
    any single source at ``max_source_frac * capacity`` tokens per pack
    (mixing quota — no training sequence dominated by one crawl). The
    cap binds the FFD bins; single-piece packs whose one piece exceeds
    the cap (full-capacity chunks of oversize docs, pieces > cap) are
    exempt by construction — quotas bound mixing, never drop data."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if (source_col is None) != (max_source_frac is None):
        raise ValueError("source_col and max_source_frac go together")
    if max_source_frac is not None and not 0 < max_source_frac <= 1:
        raise ValueError("max_source_frac must be in (0, 1]")
    from myhadoop_spark.shipping import ensure_shipped
    ensure_shipped(df.sparkSession)  # _ffd runs on executors
    src_cols = [F.col(source_col).alias("source")] if source_col else []
    base = (df.select(F.col(id_col).alias("doc_id"),
                      F.col(tokens_col).cast("long").alias("tokens"),
                      *src_cols)
            .filter(F.col("tokens") > 0))

    # chunk split: doc of T tokens -> floor(T/cap) full pieces + one
    # remainder piece of T % cap (skipped when it is zero)
    n_full = (F.col("tokens") / capacity).cast("long")
    keep_src = ["source"] if source_col else []
    pieces = base.select(
        "doc_id", "tokens", *keep_src, n_full.alias("n_full"),
        F.explode(
            F.when(F.col("tokens") % capacity > 0,
                   F.concat(
                       F.array_repeat(F.lit(capacity).cast("long"), n_full.cast("int")),
                       F.array((F.col("tokens") % capacity).cast("long"))))
            .otherwise(
                F.array_repeat(F.lit(capacity).cast("long"), n_full.cast("int")))
        ).alias("piece_tokens"))
    pieces = pieces.withColumn(
        "piece", F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.lit(1))))

    full = pieces.filter(F.col("piece_tokens") == capacity).select(
        F.concat_ws("-", F.lit("full"), F.col("doc_id"),
                    F.col("piece")).alias("pack_id"),
        F.array("doc_id").alias("doc_ids"),
        F.array("piece_tokens").alias("piece_tokens"),
        F.col("piece_tokens").alias("total_tokens"),
        F.lit(1).alias("n_pieces"))

    rest = (pieces.filter(F.col("piece_tokens") < capacity)
            .select(F.abs(F.hash("doc_id") % n_buckets).alias("bucket"),
                    "doc_id", "piece", *keep_src,
                    F.col("piece_tokens").alias("tokens")))
    cap_tokens = (int(max_source_frac * capacity)
                  if max_source_frac is not None else None)
    packed = (rest.groupBy("bucket")
              .applyInPandas(
                  lambda key, pdf: _ffd(key, pdf, capacity, cap_tokens),
                  schema=PACK_SCHEMA))
    return full.unionByName(packed)


def packing_stats(packs: DataFrame, capacity: int) -> dict:
    """Fill-ratio summary a pipeline would alert on."""
    row = packs.agg(
        F.count("*").alias("n_packs"),
        F.sum("total_tokens").alias("tokens"),
        F.avg(F.col("total_tokens") / capacity).alias("mean_fill"),
        F.min(F.col("total_tokens") / capacity).alias("min_fill"),
    ).first()
    return {"n_packs": row["n_packs"], "tokens": row["tokens"],
            "mean_fill": float(row["mean_fill"]),
            "min_fill": float(row["min_fill"])}
