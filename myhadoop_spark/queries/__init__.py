"""Declared query set (SURVEY.md §2.4) + extension operators.

Importing this package registers every query into
``myhadoop_spark.registry``. Each module pairs the Spark DataFrame plan
with its DuckDB oracle SQL so the two stay in lock-step.
"""

from myhadoop_spark.queries import (  # noqa: F401
    clusters,
    corpus_stats,
    dedup,
    higher_order,
    pipeline,
    reference_parity,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    sampling,
    simsearch,
    streaming_batch,
    string_fns,
    text,
    udtf_demo,
    wordcount,
)
