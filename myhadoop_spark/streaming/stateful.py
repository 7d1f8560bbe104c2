"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user totals maintained across micro-batches — the kind of
operator Structured Streaming's built-in aggregations can't express when
the update logic is arbitrary Python (the streaming analog of the
reference's user-defined reduce surface, /root/reference/app.py:13-14).

State discipline: per-user counters, cents kept as integers so the
accumulated sum is exact and order-independent (float accumulation
across nondeterministic batch boundaries would drift). At scale, state
is partitioned by user_id across executors and checkpointed by Spark;
a processing-time timeout would bound idle-user state (not enabled here
so the equivalence test is exact).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value_cents", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value_cents", T.LongType()),
])


def _update_user_totals(key: tuple[Any, ...],
                        pdfs: Iterator[pd.DataFrame],
                        state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, cents = state.get
    else:
        n, cents = 0, 0
    for pdf in pdfs:
        n += len(pdf)
        # 2-decimal values → exact integer cents
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "sum_value_cents": [cents],
    })


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming running totals per user (update mode): each micro-batch
    emits the new cumulative (count, exact cents) for every user seen in
    that batch."""
    from myhadoop_spark.shipping import ensure_shipped

    ensure_shipped(events.sparkSession)
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
