"""myhadoop_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of ColinBin/myhadoop
(a mini-MapReduce with a WordCount app, reference at /root/reference)
as an idiomatic Spark DataFrame/SQL engine, extended with the
relational operator surface, streaming, and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing) required by the project brief (SURVEY.md §2).

Layout:
  session     SparkSession factory (AQE on, UTC, Arrow)
  catalog     test-fixture table registry (parquet → temp views)
  registry    named-query registry (the analog of reference app_route.py:4-6)
  queries/    declared query set (SURVEY.md §2.4) + extensions
  mapreduce   the reference's map/reduce "app" surface, generalized
  streaming/  Structured Streaming operators (windows, watermark, dedup)
  operators/  dedup / simsearch / asof custom operators
  functions/  scalar function helpers (text stats, hashing, money math)
  sources/    multimodal (binary) column plumbing
"""

__version__ = "0.1.0"

from myhadoop_spark.session import get_spark  # noqa: F401
