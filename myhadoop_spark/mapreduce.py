"""MapReduce-compatible job API — the reference's actual user surface.

The reference's entire query language is a job name mapped to an app
class exposing ``map(token) -> (key, value)`` and
``reduce(record1, record2) -> (key, value)`` (/root/reference/app.py:6-14,
app_route.py:4-6), driven over whitespace-tokenized text files
(/root/reference/datanode.py:598-603). This module generalizes that
contract onto Spark:

  * tokenize: each input line split with str.split() (any whitespace run)
  * map: the user callable, applied per token
  * reduce: associative pairwise fold per key — Spark's reduceByKey
    applies it in the same two-round (combiner + final) discipline as the
    reference's ICPP/NEW plans (/root/reference/datanode.py:449-496,
    utilities.py:170-185), so non-associative folds are equally undefined
    in both systems.

Arbitrary Python callables force the RDD path (pickled closures, Python
workers) — correct but slow; the declared relational queries use the
DataFrame path instead. ``run_wordcount_fast`` shows the escape hatch:
when the map/reduce pair matches a known shape, run it as pure
DataFrame ops (100 TB path).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Record = tuple  # (key, value)
MapFn = Callable[[str], Record]
ReduceFn = Callable[[Record, Record], Record]


class WordCountApp:
    """Reference WordCount app (/root/reference/app.py:6-14)."""

    def map(self, word: str) -> Record:
        return word, 1

    def reduce(self, record1: Record, record2: Record) -> Record:
        return record1[0], int(record1[1]) + int(record2[1])


@dataclass
class MapReduceJob:
    """A named map/reduce job over a text input — the Spark analog of the
    reference's NEW_JOB submission (/root/reference/client.py:17-36)."""

    name: str
    map_fn: MapFn
    reduce_fn: ReduceFn

    output_schema: str = "key STRING, value LONG"

    def run_on_lines(self, lines_df: DataFrame, column: str = "value") -> DataFrame:
        """Execute over a DataFrame of text lines; returns a DataFrame of
        ``output_schema`` (default key/count — the WordCount shape; the
        reference stringifies outputs, /root/reference/utilities.py:164-167,
        which we deliberately do not reproduce). The explicit schema also
        makes the all-input-filtered-out case well-defined (an empty
        input must yield an empty result, not a schema-inference error)."""
        from myhadoop_spark.shipping import ensure_shipped

        ensure_shipped(lines_df.sparkSession)
        map_fn, reduce_fn = self.map_fn, self.reduce_fn
        rdd = (
            lines_df.select(column).rdd
            .flatMap(lambda row: (row[0] or "").split())   # datanode.py:600-602
            .map(map_fn)                                    # datanode.py:603
            .map(lambda rec: (rec[0], rec))
            # reduceByKey = combiner + final reduce, both applying the user
            # fold — the reference's two-round contract (R8 + R11)
            .reduceByKey(lambda r1, r2: reduce_fn(r1, r2))
            .map(lambda kv: (kv[1][0], kv[1][1]))
        )
        return lines_df.sparkSession.createDataFrame(rdd, self.output_schema)

    def run_on_text_dir(self, spark: SparkSession, path: str) -> DataFrame:
        """Execute over a directory of plain text files — the reference's
        input layout (one dataset = one dir, /root/reference/tools.py:132-153)."""
        return self.run_on_lines(spark.read.text(path), "value")


def wordcount_job() -> MapReduceJob:
    app = WordCountApp()
    return MapReduceJob("WordCount", app.map, app.reduce)


def run_wordcount_fast(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame fast path for the WordCount shape: same result as
    wordcount_job().run_on_text_dir() but pure Catalyst (JVM tokenize +
    partial/final count) — the form that scales."""
    from myhadoop_spark.queries.wordcount import wordcount_text_dir

    return wordcount_text_dir(spark, path)


def merge_sort(df: DataFrame, column: str) -> DataFrame:
    """The vestigial MergeSort app (/root/reference/app.py:17-43 —
    unreachable in the reference, app_route.py:4-6) expressed as its
    semantic equivalent: a total sort via range partitioning."""
    return df.orderBy(column)


# job-name registry — the analog of /root/reference/app_route.py:4-6
JOB_ROUTE: dict[str, Callable[[], MapReduceJob]] = {
    "WordCount": wordcount_job,
}
