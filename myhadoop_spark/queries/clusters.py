"""dedup_clusters — near-duplicate clusters from pairwise edges.

Iterative (non-SQL-expressible in one statement), so this is a declared
rows-only query; its contract is tested structurally in
tests/test_connected_components.py (pair-consistency, representative
minimality) instead of oracle-hashed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.operators.connected_components import connected_components
from myhadoop_spark.registry import register


@register("dedup_clusters", oracle=None, tags=("dedup", "extension", "iterative"))
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs → transitive clusters → (id, component)
    where component is the smallest member id (the canonical keep-one
    representative). The full dedup story: LSH/blocked candidate pairs →
    verify → connected components → keep component representatives."""
    from myhadoop_spark.queries.simsearch import embed_neardup

    edges = embed_neardup(spark, sf_dir).select(
        F.col("id1").alias("src"), F.col("id2").alias("dst"))
    return connected_components(edges)
