"""DSIR data-selection query (operators/dsir.py) as a DuckDB
differential: fit the hashed-n-gram importance model with the
English doc_id%10==0 slice as the trusted target, score the rest of
the corpus as the raw pool, keep the top-k.

Ranking for the cross-engine compare uses the FLOORED weight (ties →
doc_id ascending) on BOTH sides so last-ulp ln() drift cannot reorder
the cut — the corpus_drift floored-ranking precedent. The production
face (dsir_select in the operator) ranks on the full-precision weight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.dsir import (
    bucket_log_ratios,
    dsir_weights,
    hashed_features,
)
from myhadoop_spark.registry import register

_B = 4096
_K = 100

_TOKS = r"list_filter(string_split_regex(text, '\s+'), t -> t <> '')"
_SQL_BUCKET = ("CAST(concat('0x', substr(md5({col}), 1, 8)) AS BIGINT) "
               f"% {_B}")


@register(
    "dsir_select",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    f AS (SELECT doc_id, (lang = 'en' AND doc_id % 10 = 0) AS is_t,
                 list_concat(toks,
                   list_transform(generate_series(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i + 1]))
                   AS feats
          FROM t WHERE len(toks) > 0),
    occ AS (SELECT doc_id, is_t,
                   {_SQL_BUCKET.format(col='ft')} AS b
            FROM (SELECT doc_id, is_t, unnest(feats) AS ft FROM f)),
    c AS (SELECT b,
                 SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
                 SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
          FROM occ GROUP BY b),
    lr AS (SELECT b, ln(CAST(ct + 1 AS DOUBLE))
                      - ln(CAST(cr + 1 AS DOUBLE)) AS lr FROM c),
    tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS t_total,
                   CAST(SUM(cr) AS DOUBLE) AS r_total FROM c),
    terms AS (SELECT o.doc_id, o.b, coalesce(lr.lr, 0.0) AS lr
              FROM occ o LEFT JOIN lr ON o.b = lr.b
              WHERE NOT o.is_t),
    w AS (SELECT doc_id, COUNT(*) AS n_feats,
                 list_reduce(list(lr ORDER BY b), (a, x) -> a + x)
                   AS core
          FROM terms GROUP BY doc_id)
    SELECT doc_id, n_feats,
           floor((core + CAST(n_feats AS DOUBLE)
                  * (ln(r_total + {_B}.0) - ln(t_total + {_B}.0)))
                 * 1e6) / 1e6 AS logw
    FROM w CROSS JOIN tot
    ORDER BY logw DESC, doc_id ASC
    LIMIT {_K}
    """,
    tags=("dsir", "curation", "extension"),
    gate=False,
)
def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_feats, logw): the {K} raw-pool documents whose
    hashed-n-gram distribution is most target-like, logw floored at
    1e-6. Target = English doc_id%10==0 slice; pool = everything
    else."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang",
                                                   "text")
    is_t = (F.col("lang") == "en") & (F.col("doc_id") % 10 == 0)
    t_occ = hashed_features(docs.filter(is_t), buckets=_B)
    p_occ = hashed_features(docs.filter(~is_t), buckets=_B)
    model = bucket_log_ratios(t_occ, p_occ, buckets=_B)
    scored = dsir_weights(p_occ, model)
    return (scored
            .select("doc_id", "n_feats",
                    (F.floor(F.col("logw") * 1e6) / 1e6).alias("logw"))
            .orderBy(F.desc("logw"), F.asc("doc_id"))
            .limit(_K))
