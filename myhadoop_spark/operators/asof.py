"""As-of join — an operator Spark has no native form of (SURVEY.md §2.2).

Composition strategy (scale-first): instead of a per-group
``pd.merge_asof`` (Python path, memory-bound per group), tag both sides,
union them, and run one window pass partitioned by the join key and
ordered by time: ``last(right_value, ignoreNulls=True)`` over the
preceding frame gives every left row the most recent right row at or
before it. One shuffle on the key, streaming-friendly state, no Python.

DuckDB's native ASOF JOIN provides the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, time_col: str,
              value_cols: list[str], strict: bool = True) -> DataFrame:
    """For each left row, attach the latest right row with
    right.time < left.time (strict) or <= (non-strict), matching on
    ``on``. Returns the left rows plus ``value_cols`` (nullable — no
    earlier right row → NULL, i.e. left-outer as-of semantics).
    """
    lt = left.withColumn("_side", F.lit(1))
    rt = right.withColumn("_side", F.lit(0))
    rt_filled = rt
    for c in lt.columns:
        if c not in rt.columns:
            rt_filled = rt_filled.withColumn(c, F.lit(None))
    lt_filled = lt
    for c in rt.columns:
        if c not in lt.columns:
            lt_filled = lt_filled.withColumn(c, F.lit(None))
    union_cols = sorted(set(lt_filled.columns))
    u = lt_filled.select(*union_cols).unionByName(rt_filled.select(*union_cols))

    # One ordered pass; right-side values are NULL on left rows, so
    # last(ignoreNulls) over the preceding frame resolves to the most
    # recent right row. Tie handling at equal timestamps is encoded in
    # the sort of the _side tag:
    #   strict (<):   left rows sort BEFORE right rows at equal ts, and
    #                 the frame ends at -1, so equal-ts right rows are
    #                 excluded;
    #   non-strict (<=): right rows sort BEFORE left rows and the frame
    #                 includes the current row, so they are included.
    if strict:
        order = [F.col(time_col).asc(), F.col("_side").desc()]
        frame_end = -1
    else:
        order = [F.col(time_col).asc(), F.col("_side").asc()]
        frame_end = Window.currentRow
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, frame_end)
    )
    picked: list[Column] = []
    for c in value_cols:
        picked.append(F.last(F.when(F.col("_side") == 0, F.col(c)),
                             ignorenulls=True).over(w).alias(f"asof_{c}"))
    out = u.select(*u.columns, *picked).filter(F.col("_side") == 1)
    keep = [c for c in left.columns if c != "_side"]
    return out.select(*keep, *[f"asof_{c}" for c in value_cols])
