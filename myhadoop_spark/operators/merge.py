"""MERGE INTO (upsert) emulation — CDC/SCD patterns without Delta/Iceberg.

The v1 image has no lakehouse table format on the classpath, so MERGE is
composed from primitives (the standard emulation: anti-join + union, or
full-outer resolve). At 100 TB both forms are one shuffle on the merge
key; the SCD2 variant adds a window over the key's history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE semantics: source rows replace matching target rows
    (WHEN MATCHED UPDATE), non-matching source rows are inserted
    (WHEN NOT MATCHED INSERT), untouched target rows remain.
    Columns must match. One left-anti join + union."""
    kept = target.join(source.select(key), key, "left_anti")
    return kept.unionByName(source)


def scd2_apply(history: DataFrame, updates: DataFrame, key: str,
               ts_col: str, tiebreak: tuple[str, ...] = ()) -> DataFrame:
    """Slowly-changing-dimension type 2: append updates to the history
    and recompute validity windows — each version is valid from its own
    timestamp until the next version's (NULL for the current one).
    Pass ``tiebreak`` columns when several versions can share a
    timestamp — lead() over an ambiguous order is nondeterministic."""
    all_rows = history.unionByName(updates)
    w = Window.partitionBy(key).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak])
    return (
        all_rows
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
