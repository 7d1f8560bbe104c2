"""Reference-corpus parity query: WordCount over the reference's OWN
input data, oracle-verified.

This is the reference's exact production workload
(/root/reference/run_client_times.py:8 hardwires ``wordcount/<volume>``;
tokenization semantics /root/reference/datanode.py:598-603, fold
app.py:13-14) run through the engine's DataFrame path AND
hash-matched against DuckDB reading the same raw text files — the
strongest possible statement that the engine reproduces the reference's
results on the reference's data. The sf_dir parameter is ignored: the
corpus is fixed (and tiny — 5.2 MiB).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from myhadoop_spark.queries.wordcount import wordcount_text_dir
from myhadoop_spark.registry import register

REF_CORPUS_512 = "/root/reference/fs/input/wordcount/512"


@register(
    "wc_reference_corpus",
    oracle=rf"""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split_regex(content, '\s+')) AS word
          FROM read_text('{REF_CORPUS_512}/combined_*')) t
    WHERE word <> ''
    GROUP BY word
    """,
    tags=("wordcount", "reference-parity"),
)
def wc_reference_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordCount over the reference's 512 corpus volume (ignores sf_dir —
    the reference's input is a fixed directory of text files)."""
    if not Path(REF_CORPUS_512).exists():  # pragma: no cover
        raise FileNotFoundError(f"reference corpus missing: {REF_CORPUS_512}")
    return wordcount_text_dir(spark, REF_CORPUS_512)
