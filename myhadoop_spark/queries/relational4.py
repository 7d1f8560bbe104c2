"""Fourth wave: range join (bucketized) and skew-salted aggregation as
declared queries — the explicit scale-pattern operators, oracle-checked
against their naive formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.functions.money import dec
from myhadoop_spark.operators.range_join import bucketized_range_join
from myhadoop_spark.operators.skew import salted_sum_count
from myhadoop_spark.registry import register

# value-histogram intervals: 10 uneven buckets over events.value
_BANDS = [(0, 0.0, 2.0), (1, 2.0, 5.0), (2, 5.0, 8.0), (3, 8.0, 12.0),
          (4, 12.0, 17.0), (5, 17.0, 23.0), (6, 23.0, 30.0),
          (7, 30.0, 40.0), (8, 40.0, 60.0), (9, 60.0, 100.0)]


@register(
    "range_join_hist",
    oracle=f"""
    WITH bands(band_id, lo, hi) AS (VALUES
      {', '.join(f'({i}, {lo}, {hi})' for i, lo, hi in _BANDS)})
    SELECT band_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band_id
    """,
    tags=("range-join", "extension"),
)
def range_join_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram by non-uniform value bands — a true range (theta) join,
    executed as the bucketized equi-join (operators/range_join.py), NOT
    a nested loop. The oracle states the naive BETWEEN semantics; the
    engine must reproduce them exactly through the bucket path."""
    ev = load(spark, sf_dir, "events").select("value")
    bands = spark.createDataFrame(_BANDS, "band_id INT, lo DOUBLE, hi DOUBLE")
    joined = bucketized_range_join(ev, bands, "value", "lo", "hi",
                                   bucket_width=5.0)
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )


@register(
    "salted_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_rows
    FROM events
    GROUP BY event_type
    """,
    tags=("skew", "aggregate", "extension"),
)
def salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation over event_type (a low-cardinality, hence
    maximally skewed, key): two-round salted fold (operators/skew.py).
    Must equal the direct groupBy — decimal sums make the two-round
    result exactly order-independent."""
    ev = load(spark, sf_dir, "events")
    out = salted_sum_count(ev, ["event_type"], dec("value"), n_salts=16)
    return out.select(
        "event_type",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("n_rows").alias("n_rows"),
    )
