"""Higher-order (lambda) function battery — transform / filter /
aggregate / zip_with / exists over array columns, the expression-level
tools the custom operators (simsearch, dedup) are built from, surfaced
as a declared query of their own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.registry import register


@register(
    "higher_order_fns",
    oracle="""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings WHERE vec_id % 25 = 0)
    SELECT vec_id,
           list_transform(list_slice(v, 1, 4),
                          x -> floor(x * 2.0 * 1e6) / 1e6) AS doubled4,
           CAST(len(list_filter(v, x -> x > 0.5)) AS INT) AS n_big,
           floor(list_reduce(list_transform(v, x -> x * x),
                             (acc, x) -> acc + x) * 1e6) / 1e6
             AS sumsq_tail,
           list_transform(generate_series(1, 3),
                          i -> floor((v[i] + v[i + 1]) * 1e6) / 1e6)
             AS pairsums,
           len(list_filter(v, x -> x < -0.5)) > 0 AS has_very_neg
    FROM e
    """,
    tags=("scalar", "higher-order"),
)
def higher_order_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / aggregate (fold) / zip_with / exists battery.
    Float outputs are floor-truncated to 6 decimals (portable; see
    simsearch.py). Note DuckDB's list_reduce has no initial accumulator —
    it folds left from the first element, so the Spark fold seeds with
    element 1's square and aggregates the tail identically."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 25 == 0)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    trunc = lambda c: F.floor(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return emb.select(
        "vec_id",
        F.transform(F.slice(v, 1, 4), lambda x: trunc(x * 2.0)).alias("doubled4"),
        F.size(F.filter(v, lambda x: x > 0.5)).alias("n_big"),
        trunc(F.aggregate(
            F.slice(v, 2, F.size(v) - 1),
            F.element_at(v, 1) * F.element_at(v, 1),
            lambda acc, x: acc + x * x)).alias("sumsq_tail"),
        F.zip_with(F.slice(v, 1, 3), F.slice(v, 2, 3),
                   lambda a, b: trunc(a + b)).alias("pairsums"),
        F.exists(v, lambda x: x < -0.5).alias("has_very_neg"),
    )
