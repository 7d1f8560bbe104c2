"""Percolation — reverse search: STANDING queries stored as data,
matched against every incoming document (the Elasticsearch
percolator / alerting shape). A search engine asks "which documents
match this query?"; a percolator asks "which of my saved queries does
this document match?" — the primitive behind alert subscriptions,
routing rules, and compliance watchlists over a document firehose.

Model: a query is (query_id, terms array, min_should_match) — a doc
matches when at least ``min_should_match`` DISTINCT query terms occur
in its token stream (the boolean should-clause semantics; phrase
percolation composes with queries/phrase.py if needed).

Scale shape: the standing-query table is SMALL (thousands of alerts
vs a 100 TB corpus / unbounded stream) — exploded to (term, query_id)
and BROADCAST, so the document side never shuffles its token stream:
distinct doc tokens explode, hash-join the broadcast term table
(narrow), and only MATCHING (doc, query, term) rows — bounded by hit
volume, not corpus size — enter the per-(doc, query) count shuffle.
The final threshold compares against each query's stored term count.

Streaming face: per-document verdicts are independent across batches
(no cross-batch state), so ``start_percolate_stream`` is a stateless
foreachBatch emit — replay overwrites the same batch directory (the
bloom_ingest idiom), exactly idempotent.

Determinism: token matching is the corpus tokenization convention
(whitespace split), counts are integers — the DuckDB differential
(`percolate`, ungated) matches bitwise.

Reference analog: none — §2.3 extension surface (SURVEY.md §2.3);
the Elasticsearch percolate-query pattern, re-expressed as a
broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from myhadoop_spark.operators.bm25 import _tokens


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # the repo's ONE tokenization convention (operators/bm25.py) — a
    # local copy would silently desynchronize percolation verdicts
    # from the indexes built over the same corpus
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(F.array_distinct(_tokens(text_col)))
                       .alias("term"))


def percolate_docs(docs: DataFrame, queries: DataFrame, *,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, query_id, n_matched): which standing queries each
    document triggers. ``queries`` needs (query_id, terms
    array<string>, min_should_match int); duplicate terms within a
    query count once (distinct-term semantics on both sides)."""
    # a row-level guard, not a driver collect: min_should_match < 1
    # would claim "match everything" semantics this join-based plan
    # cannot express (docs sharing no term produce no row) — reject
    # loudly instead of silently under-matching. The guard lives
    # INSIDE the used column (an assert_true on a dropped column gets
    # column-pruned away and never evaluates).
    msm = F.when(F.col("min_should_match") >= 1,
                 F.col("min_should_match")).otherwise(
        F.raise_error(F.concat(
            F.lit("percolate: min_should_match must be >= 1 (a "
                  "threshold of 0 would match every document — "
                  "filter nothing instead); got "),
            F.col("min_should_match").cast("string"))))
    q_terms = (queries.select(
        "query_id", msm.alias("min_should_match"),
        F.explode(F.array_distinct("terms")).alias("term")))
    hits = (_doc_tokens(docs, id_col, text_col)
            .join(F.broadcast(q_terms), "term")
            .groupBy("doc_id", "query_id", "min_should_match")
            .agg(F.count(F.lit(1)).alias("n_matched")))
    return (hits.filter(F.col("n_matched") >= F.col("min_should_match"))
            .select("doc_id", "query_id", "n_matched"))


def start_percolate_stream(stream_docs: DataFrame, queries: DataFrame, *,
                           out_path: str, checkpoint: str,
                           id_col: str = "doc_id",
                           text_col: str = "text"):
    """Match every micro-batch against the standing queries and land
    the alerts under ``<out_path>/batch_id=N`` (overwritten on replay
    — per-doc verdicts carry no cross-batch state, so replay is
    exactly idempotent)."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        (percolate_docs(batch, queries, id_col=id_col,
                        text_col=text_col)
         .write.mode("overwrite")
         .parquet(f"{out_path}/batch_id={batch_id}"))

    return (stream_docs.writeStream
            .foreachBatch(_process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
