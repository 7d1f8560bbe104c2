"""Multimodal (image/audio/video) column plumbing.

Design (SURVEY.md §2.3): media payloads are opaque ``binary`` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``.
The image/audio codec libraries are NOT in this container, so the codec
step is stubbed: ``decode_media(..., fake=True)`` produces deterministic
fake features (so the Spark-side plumbing — schema, batching, partition
behavior — is real and tested), while ``fake=False`` raises
NotImplementedError at the exact point a codec would plug in.

At 100 TB: payloads stay in executor-side Arrow batches end-to-end
(no driver collect); `spark.read.format("binaryFile")` is the ingest
path for real media directories, and partition sizing follows bytes
(maxPartitionBytes), not row counts, since rows are megabyte-scale.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("payload", T.BinaryType(), False),    # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("source_uri", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload_sha", T.StringType()),
    T.StructField("width", T.IntegerType()),       # image/video
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),    # audio/video
    T.StructField("feature", T.ArrayType(T.FloatType())),  # embedding-ish
])


def fake_media_df(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table: payload bytes derived from
    sha256(media_id) so every run (and both sides of any comparison)
    sees identical binaries. Built distributed via spark.range — no
    driver-side materialization."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"))
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        # payload = repeated sha256 bytes, length varies by id
        F.repeat(F.sha2(F.col("id").cast("string"), 256), 4).cast("binary")
        .alias("payload"),
    )
    return df.withColumn("meta", F.struct(
        F.concat(F.lit("synthetic://media/"), F.col("media_id")).alias("source_uri"),
        F.concat(F.lit("application/x-fake-"), F.col("kind")).alias("content_type"),
        F.length("payload").cast("long").alias("n_bytes"),
    ))


def read_media_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Ingest a real media directory as binary columns (the production
    path; binaryFile carries path/length/modificationTime + content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.abs(F.xxhash64("path")).alias("media_id"),
            F.lit("image").alias("kind"),
            F.col("content").alias("payload"),
            F.struct(
                F.col("path").alias("source_uri"),
                F.lit("application/octet-stream").alias("content_type"),
                F.col("length").alias("n_bytes"),
            ).alias("meta"),
        )
    )


def decode_media(df: DataFrame, fake: bool = True,
                 feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract over mapInPandas (Arrow batches).

    fake=True: deterministic pseudo-features from the payload digest —
    the full Spark plumbing (schema, batch iteration, column pruning)
    is real. fake=False: the codec plug-in point, NotImplementedError
    until PIL/ffmpeg-class libs exist in the image.
    """
    from myhadoop_spark.shipping import ensure_shipped

    ensure_shipped(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires codec libraries (PIL/ffmpeg) "
                    "not present in this container; plug decode here")
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                digest = hashlib.sha256(bytes(payload)).digest()
                feat = [round(b / 255.0, 6) for b in digest[:feature_dim]]
                is_visual = kind in ("image", "video")
                is_timed = kind in ("audio", "video")
                out.append({
                    "media_id": mid,
                    "kind": kind,
                    "n_bytes": len(payload),
                    "payload_sha": digest.hex(),
                    "width": 16 * (digest[0] % 64 + 1) if is_visual else None,
                    "height": 16 * (digest[1] % 64 + 1) if is_visual else None,
                    "duration_ms": (int.from_bytes(digest[2:4], "big")
                                    if is_timed else None),
                    "feature": feat,
                })
            yield pd.DataFrame(out)

    return df.select("media_id", "kind", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """'Frame sampling' shape for video payloads: one output row per
    sampled offset — demonstrates the row-expanding media transform
    (explode over a computed offset sequence, all JVM-side)."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0),
                           F.greatest(F.length("payload") - 1, F.lit(0)),
                           F.lit(every_n_bytes))
            ).alias("frame_offset"),
        )
    )
