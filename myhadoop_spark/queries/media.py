"""media_features — the multimodal column pipeline as a declared query.

The media surface (sources/multimodal.py) is deterministic end-to-end:
payloads are repeat(sha256(media_id), 4) built distributed, and the
fake decode derives every feature from sha256(payload). That makes a
DuckDB oracle writable — the oracle re-derives widths/heights/durations
from the same digests, so the driver gate covers the whole mapInPandas
(Arrow batch) decode path, not just its schema.

Float note: the 8-dim feature vector is round(byte/255, 6) per
component. Rounded floats are not reliably hashable cross-engine, so
the declared query reduces features to an exact integer checksum:
round(f*255) provably recovers the source byte on both engines (the
representation error of round(b/255, 6) as float32 is ≤3e-5 · 255 ≪ .5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.registry import register
from myhadoop_spark.sources.multimodal import decode_media, fake_media_df

N_MEDIA = 64

_SQL_BYTE = "CAST(concat('0x', substr(digest, 2 * {i} + 1, 2)) AS INT)"


@register(
    "media_features",
    oracle=f"""
    WITH m AS (SELECT id AS media_id,
                      CASE CAST(id % 3 AS INT) WHEN 0 THEN 'image'
                           WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                      repeat(sha256(CAST(id AS VARCHAR)), 4) AS payload
               FROM generate_series(0, {N_MEDIA - 1}) t(id)),
    d AS (SELECT media_id, kind,
                 CAST(length(payload) AS BIGINT) AS n_bytes,
                 sha256(payload) AS digest
          FROM m),
    f AS (SELECT kind, n_bytes, digest,
                 CASE WHEN kind IN ('image', 'video')
                      THEN 16 * ({_SQL_BYTE.format(i=0)} % 64 + 1) END AS width,
                 CASE WHEN kind IN ('image', 'video')
                      THEN 16 * ({_SQL_BYTE.format(i=1)} % 64 + 1) END AS height,
                 CASE WHEN kind IN ('audio', 'video')
                      THEN {_SQL_BYTE.format(i=2)} * 256
                           + {_SQL_BYTE.format(i=3)} END AS duration_ms,
                 CAST(list_sum(list_transform(generate_series(0, 7),
                     i -> CAST(concat('0x', substr(digest, 2 * i + 1, 2))
                               AS INT))) AS BIGINT) AS feat_bytes
          FROM d)
    SELECT kind,
           COUNT(*) AS n_media,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT digest) AS n_sha,
           CAST(SUM(width) AS BIGINT) AS sum_width,
           CAST(SUM(height) AS BIGINT) AS sum_height,
           CAST(SUM(duration_ms) AS BIGINT) AS sum_duration_ms,
           CAST(SUM(feat_bytes) AS BIGINT) AS feat_checksum
    FROM f GROUP BY kind
    """,
    tags=("multimodal", "extension"),
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline: synthetic binary media table (distributed
    spark.range build, no driver materialization) → Arrow mapInPandas
    decode/feature-extract (sources/multimodal.py) → per-kind rollup of
    byte counts, digests, visual dimensions, durations, and an exact
    integer checksum of the 8-dim feature vectors. sf_dir is unused —
    media payloads are self-generated (the multimodal analog of
    wc_reference_corpus's fixed corpus).

    Scale: decode runs batch-wise in executors (payloads never visit
    the driver); the rollup shuffles 3 kinds × a handful of longs."""
    df = decode_media(fake_media_df(spark, N_MEDIA), fake=True, feature_dim=8)
    feat_bytes = F.aggregate(
        F.transform("feature",
                    lambda f: F.round(f.cast("double") * 255).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        df.withColumn("feat_bytes", feat_bytes)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("payload_sha").alias("n_sha"),
            F.sum("width").cast("bigint").alias("sum_width"),
            F.sum("height").cast("bigint").alias("sum_height"),
            F.sum("duration_ms").cast("bigint").alias("sum_duration_ms"),
            F.sum("feat_bytes").alias("feat_checksum"),
        )
    )
