"""Declared query set (SURVEY.md §2.4) + extension operators.

Importing this package registers every query into
``myhadoop_spark.registry``. Each module pairs the Spark DataFrame plan
with its DuckDB oracle SQL so the two stay in lock-step.

The registry is deliberately capped at 50 declared queries (the
driver's correctness-gate window): redundant battery queries are
genuinely consolidated (one tagged battery per operator family), not
dropped — every operator the r1 registry exercised is still exercised.
"""

from myhadoop_spark.queries import (  # noqa: F401
    audio,
    clusters,
    corpus_stats,
    curation_gate,
    dedup,
    dedup_ext,
    drift,
    dsir,
    event_analytics,
    fuzzy,
    fuzzy_decontam,
    hll_stats,
    langid,
    lines,
    lm,
    media,
    merge_query,
    phrase,
    pipeline,
    quality_checks,
    reference_parity,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational7,
    repetition,
    sampling,
    simsearch,
    streaming_batch,
    text,
    udtf_demo,
    unimax,
    urls,
    video,
    wordcount,
)
