"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check at sf0.001
queries()    — named query registry (myhadoop_spark.registry), one entry
               per implemented operator from SURVEY.md §2
oracle_sql() — DuckDB-runnable ANSI-SQL twins for the differential gate
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# make the package importable no matter where the driver runs from
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from myhadoop_spark.queries.relational import agg_q1

    return agg_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from myhadoop_spark import registry

    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    from myhadoop_spark import registry

    return registry.all_oracles()
