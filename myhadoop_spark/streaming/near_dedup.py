"""Streaming near-duplicate suppression.

Batch near-dedup (dedup.py) emits pairs/clusters; a streaming ingest
pipeline instead wants to DROP incoming documents that near-duplicate
something already seen. Exact-dup streaming uses dropDuplicates on a
content hash; near-dup streaming needs a canonical sketch that equal
near-duplicates collide on. The 16-minhash signature (zero-shuffle
narrow fold, shared with the batch operator) is that sketch: documents
whose full signatures are identical are near-duplicates with very high
probability, and signature equality is a plain equality — so streaming
dropDuplicates machinery applies unchanged, with watermark-bounded state.

This trades recall for streamability (only signature-identical docs are
suppressed — banded OR-matching would need a stateful join); the batch
operator remains the exhaustive pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from myhadoop_spark.queries.dedup import MINHASH_FAM, MINHASH_P


def minhash_signature_col(text_col: str = "text") -> Column:
    """Full 16-minhash signature of a text column as a single string —
    the same hash family as the batch operator (dedup.py), computed as
    one narrow expression so it is legal inside a streaming query."""
    toks = F.array_distinct(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")))
    hashed = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"))
    fam_a = F.array(*[F.lit(a).cast("long") for _, a, _ in MINHASH_FAM])
    fam_b = F.array(*[F.lit(b).cast("long") for _, _, b in MINHASH_FAM])
    sigs = F.transform(
        F.sequence(F.lit(0), F.lit(len(MINHASH_FAM) - 1)),
        lambda i: F.aggregate(
            hashed,
            F.lit(MINHASH_P).cast("long"),
            lambda acc, th: F.least(
                acc,
                (F.element_at(fam_a, i + 1) * th + F.element_at(fam_b, i + 1))
                % MINHASH_P),
        ),
    )
    return F.array_join(F.transform(sigs, lambda v: v.cast("string")), ",")


def near_dedup_stream(docs: DataFrame, ts_col: str = "ts",
                      text_col: str = "text",
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming near-dedup: keep the first document per minhash
    signature within the watermark horizon; signature-identical
    later arrivals are dropped."""
    return (
        docs.withColumn("minhash_sig", minhash_signature_col(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicates(["minhash_sig"])
    )
