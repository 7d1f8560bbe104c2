"""Range join — point-in-interval joins without a nested-loop blowup.

Spark's native plan for ``a.v BETWEEN b.lo AND b.hi`` is a broadcast
nested loop (every row × every interval). Fine when the interval table
is tiny; quadratic death otherwise. The scale form bucketizes: intervals
are exploded to the fixed-width buckets they overlap, points map to
exactly one bucket, and the join becomes an equi-join on bucket id with
a residual range filter — candidate pairs ∝ overlapping buckets only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketized_range_join(points: DataFrame, intervals: DataFrame,
                          point_col: str, lo_col: str, hi_col: str,
                          bucket_width: float) -> DataFrame:
    """Inner join of points to the intervals containing them
    (lo <= v < hi), via fixed-width bucket equi-join.

    intervals is exploded to one row per bucket it overlaps — for
    interval length L that's ~L/bucket_width rows, so pick bucket_width
    near the median interval length.
    """
    pb = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / bucket_width).cast("long"))
    ib = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / bucket_width).cast("long"),
            # hi is exclusive: the bucket containing hi is only needed
            # when hi is not exactly on a bucket boundary; including it
            # is always correct (residual filter removes misses)
            F.floor(F.col(hi_col) / bucket_width).cast("long"),
        )),
    )
    return (
        pb.join(ib, "_bucket")
        .filter((F.col(point_col) >= F.col(lo_col))
                & (F.col(point_col) < F.col(hi_col)))
        .drop("_bucket")
    )
