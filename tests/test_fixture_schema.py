"""Fixture schema-drift guard.

Round 2 was lost to silent fixture drift: the driver regenerated
events.parquet with timestamp[us] where round 1 had int64 nanoseconds, and
catalog.load() assumed the old encoding — six queries and the whole bench
run died in the driver harness with nothing local catching it first. This
test load()s every table at every available sf dir and pins the dtypes the
engine depends on, so the next regeneration fails HERE in seconds, not in
the round artifact.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

from myhadoop_spark.catalog import TABLES, load

SF_DIRS = [d for d in ("/root/testdata/sf0.001",
                       "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1")
           if os.path.isdir(d)]

# (table, column) → dtype the queries rely on. Not exhaustive — just the
# columns whose physical encoding has drifted or could plausibly drift.
PINNED = {
    ("events", "ts"): TimestampType,        # post-normalization, any encoding
    ("events", "event_id"): LongType,
    ("events", "user_id"): LongType,
    ("events", "value"): DoubleType,
    ("events", "event_type"): StringType,
    ("events", "props"): StringType,        # JSON text payload
    ("lineitem", "l_quantity"): DoubleType,
    ("lineitem", "l_extendedprice"): DoubleType,
    ("lineitem", "l_shipdate"): (TimestampNTZType, TimestampType),
    ("orders", "o_totalprice"): DoubleType,
    ("orders", "o_orderdate"): (TimestampNTZType, TimestampType),
    ("documents", "doc_id"): LongType,
    ("documents", "text"): StringType,
    ("documents", "lang"): StringType,
    ("embeddings", "vec_id"): LongType,
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_tables_load_everywhere(spark, sf_dir):
    """Every table must at minimum load and analyze at every sf dir."""
    for name in TABLES:
        df = load(spark, sf_dir, name)
        assert df.columns, f"{name} at {sf_dir} has no columns"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_pinned_dtypes(spark, sf_dir):
    for (table, col), expect in PINNED.items():
        df = load(spark, sf_dir, table)
        if col not in df.columns:
            pytest.fail(f"{table}.{col} missing at {sf_dir} "
                        f"(fixture drift — columns: {df.columns})")
        actual = df.schema[col].dataType
        names = (expect.__name__ if not isinstance(expect, tuple)
                 else "/".join(t.__name__ for t in expect))
        assert isinstance(actual, expect), (
            f"{table}.{col} at {sf_dir}: expected {names}, "
            f"got {actual} — fixture drift; update catalog normalization")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embedding_vector_is_float_array(spark, sf_dir):
    df = load(spark, sf_dir, "embeddings")
    vec_cols = [f for f in df.schema.fields
                if isinstance(f.dataType, ArrayType)]
    assert vec_cols, f"embeddings at {sf_dir} has no array column"
    inner = vec_cols[0].dataType.elementType
    assert isinstance(inner, (FloatType, DoubleType)), (
        f"embedding element type drifted to {inner}")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_media_columns(spark, sf_dir):
    """Multimodal plumbing depends on a binary payload column if present."""
    df = load(spark, sf_dir, "documents")
    bin_cols = [f.name for f in df.schema.fields
                if isinstance(f.dataType, BinaryType)]
    # binary media column is optional in the fixture; when present it must
    # stay BinaryType (the mapInPandas decode signature depends on it)
    for f in df.schema.fields:
        if f.name in ("media", "payload", "blob"):
            assert f.name in bin_cols, (
                f"documents.{f.name} at {sf_dir} is {f.dataType}, "
                "expected BinaryType")


def test_events_ts_values_sane(spark):
    """ts must decode to plausible wall-clock values (not 1970-epoch noise
    from a mis-scaled ns/µs conversion)."""
    from pyspark.sql import functions as F

    df = load(spark, SF_DIRS[0], "events")
    row = df.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    assert row.lo is not None and row.hi is not None
    assert 1990 <= row.lo.year <= 2100, f"events.ts min {row.lo} implausible"
    assert 1990 <= row.hi.year <= 2100, f"events.ts max {row.hi} implausible"
