"""HLL sketch-index differential — the persisted mergeable
distinct-count family (operators/hll_index.py) over the events table:
per-event-type distinct users from per-group sketches, plus the grand
total answered by MERGING the per-type sketches (never re-scanning),
following the approx_distinct/approx_quantiles sketch convention —
exact counts are the cross-engine contract, the sketch estimate is
oracle-verified as a bound flag."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.registry import register
from myhadoop_spark.materialize import materialize

# 5x the lgK=12 nominal rsd (1.04/sqrt(4096) ~ 1.6%), the
# approx-family margin convention; the +3 floor covers the tiny-count
# regime where a relative bound is meaningless
_RSD_MARGIN = 0.081


def _in_bound(est, exact):
    return (F.abs(est - exact)
            <= F.greatest(F.lit(3).cast("long"),
                          F.ceil(F.lit(_RSD_MARGIN)
                                 * exact.cast("double")).cast("long")))


@register(
    "hll_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS sketch_in_bound
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__all__',
           CAST(count(DISTINCT user_id) AS BIGINT),
           TRUE
    FROM events
    ORDER BY event_type
    """,
    gate=False,
    tags=("aggregate", "approx", "sketch", "extension"),
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_exact, sketch_in_bound): distinct users per
    event type, with the '__all__' row estimated by UNIONING the five
    per-type sketches — the index answers the coarser question
    without touching the raw rows. n_exact is the bitwise contract;
    sketch_in_bound asserts the estimate within the 5x-rsd margin
    (exact below ~500 distincts — the coupon-list regime both small
    SFs sit in)."""
    from myhadoop_spark.operators.hll_index import (estimate,
                                                    group_sketches)

    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    sk = group_sketches(ev, ["event_type"], "user_id").transform(materialize)
    per = estimate(sk, ["event_type"]).select("event_type", "estimate")
    exact = (ev.groupBy("event_type")
             .agg(F.count_distinct("user_id").cast("long")
                  .alias("n_exact")))
    per_rows = (exact.join(per, "event_type")
                .select("event_type", "n_exact",
                        _in_bound(F.col("estimate"), F.col("n_exact"))
                        .alias("sketch_in_bound")))
    tot_est = estimate(sk, []).select("estimate")
    tot_exact = ev.agg(F.count_distinct("user_id").cast("long")
                       .alias("n_exact"))
    all_row = (tot_exact.crossJoin(F.broadcast(tot_est))
               .select(F.lit("__all__").alias("event_type"), "n_exact",
                       _in_bound(F.col("estimate"), F.col("n_exact"))
                       .alias("sketch_in_bound")))
    return per_rows.unionByName(all_row).orderBy("event_type")
