"""URL/domain discipline differential (operators/url_dedup.py): derive
a deterministic messy URL per document (four variants exercising
scheme case, default ports, www./cdn. subdomains, fragments, tracking
params and case-sensitive paths), then URL-dedup + per-domain cap.

The oracle is deliberately NOT a re-implementation of the regexp
canonicalizer: it constructs the expected canonical form and domain
directly from the URL's constituent parts, so the differential pins
that the operator's parsing pipeline recovers the ground truth —
variant 0 (``https://www.b/P/k``) and variant 1
(``HTTP://b:80/P/k?utm_source=feed``) MUST collide after
canonicalization (same pid), variant 3 keeps its non-tracking
``id=`` param, and www./port/fragment/scheme all vanish. Survivor
choice and the per-domain cap are the (md5-rank, doc_id) prefix —
integer/string arithmetic only, bitwise across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load_wide
from myhadoop_spark.operators.url_dedup import (
    domain_cap,
    host_of,
    registrable_domain,
    url_dedup,
)
from myhadoop_spark.registry import register

_CAP = 15
_SQL_RANK = ("CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
             "AS BIGINT) % 1000000")


def _with_urls(docs: DataFrame) -> DataFrame:
    b = F.concat(F.col("source"), F.lit(".com"))
    pid = F.expr("doc_id div 2").cast("string")
    qid = (F.col("doc_id") % 7).cast("string")
    v = F.col("doc_id") % 4
    url = (
        F.when(v == 0, F.concat(F.lit("https://www."), b,
                                F.lit("/P/"), pid))
        .when(v == 1, F.concat(F.lit("HTTP://"), b, F.lit(":80/P/"),
                               pid, F.lit("?utm_source=feed")))
        .when(v == 2, F.concat(F.lit("https://cdn."), b, F.lit("/a/"),
                               pid, F.lit("#frag")))
        .otherwise(F.concat(F.lit("https://"), b, F.lit("/a/"), pid,
                            F.lit("?id="), qid,
                            F.lit("&utm_campaign=x"))))
    return docs.select("doc_id", url.alias("url"))


@register(
    "url_domain_cap",
    oracle=f"""
    WITH u AS (SELECT doc_id, source || '.com' AS b,
                      doc_id % 4 AS v,
                      CAST(doc_id // 2 AS VARCHAR) AS pid,
                      CAST(doc_id % 7 AS VARCHAR) AS qid,
                      {_SQL_RANK} AS r
               FROM documents),
    parts AS (SELECT doc_id, r, b AS domain,
                     CASE v
                       WHEN 0 THEN b || '/P/' || pid
                       WHEN 1 THEN b || '/P/' || pid
                       WHEN 2 THEN 'cdn.' || b || '/a/' || pid
                       ELSE b || '/a/' || pid || '?id=' || qid
                     END AS canon_url
              FROM u),
    dedup AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY canon_url
                                           ORDER BY r, doc_id) AS drn
              FROM parts),
    capped AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY domain
                                            ORDER BY r, doc_id) AS crn
               FROM dedup WHERE drn = 1)
    SELECT doc_id, domain, canon_url
    FROM capped WHERE crn <= {_CAP}
    ORDER BY doc_id
    """,
    gate=False,
    tags=("dedup", "curation", "extension"),
)
def url_domain_cap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, domain, canon_url): the per-domain capped survivors of
    URL-level dedup over the derived crawl URLs."""
    docs = _with_urls(load_wide(spark, sf_dir, "documents"))
    deduped = url_dedup(docs, url_col="url", id_col="doc_id")
    with_dom = deduped.withColumn(
        "domain", registrable_domain(host_of(F.col("url"))))
    capped = domain_cap(with_dom, domain_col="domain", cap=_CAP)
    return (capped.select("doc_id", "domain", "canon_url")
            .orderBy("doc_id"))
