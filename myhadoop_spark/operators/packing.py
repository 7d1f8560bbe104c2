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


def _ffd(bucket_key: tuple, pdf: pd.DataFrame, capacity: int
         ) -> pd.DataFrame:
    pdf = pdf.sort_values(
        ["tokens", "doc_id", "piece"], ascending=[False, True, True])
    bins: list[dict] = []  # {"free": int, "docs": [], "toks": []}
    for doc_id, tokens in zip(pdf["doc_id"], pdf["tokens"]):
        for b in bins:
            if b["free"] >= tokens:
                break
        else:
            b = {"free": capacity, "docs": [], "toks": []}
            bins.append(b)
        b["free"] -= tokens
        b["docs"].append(doc_id)
        b["toks"].append(tokens)
    return pd.DataFrame({
        "pack_id": [f"{bucket_key[0]}-{i}" for i in range(len(bins))],
        "doc_ids": [b["docs"] for b in bins],
        "piece_tokens": [b["toks"] for b in bins],
        "total_tokens": [capacity - b["free"] for b in bins],
        "n_pieces": [len(b["docs"]) for b in bins],
    })


def pack_documents(df: DataFrame, capacity: int,
                   id_col: str = "doc_id", tokens_col: str = "tokens",
                   n_buckets: int = 32) -> DataFrame:
    """Pack ``(id_col, tokens_col)`` rows into sequences of at most
    ``capacity`` tokens.  Returns one row per pack (PACK_SCHEMA); every
    input document's tokens appear in exactly one pack-piece, oversize
    documents appear as several pieces (full chunks + remainder)."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    from myhadoop_spark.shipping import ensure_shipped
    ensure_shipped(df.sparkSession)  # _ffd runs on executors
    base = (df.select(F.col(id_col).alias("doc_id"),
                      F.col(tokens_col).cast("long").alias("tokens"))
            .filter(F.col("tokens") > 0))

    # chunk split: doc of T tokens -> floor(T/cap) full pieces + one
    # remainder piece of T % cap (skipped when it is zero)
    n_full = (F.col("tokens") / capacity).cast("long")
    pieces = base.select(
        "doc_id", "tokens", n_full.alias("n_full"),
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
                    "doc_id", "piece",
                    F.col("piece_tokens").alias("tokens")))
    packed = (rest.groupBy("bucket")
              .applyInPandas(lambda key, pdf: _ffd(key, pdf, capacity),
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
