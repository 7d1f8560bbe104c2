"""Corpus clustering over hashed bag-of-words — the organization step
cluster-based curation pipelines run before pruning or mixing (cluster
the corpus, then balance/prune per cluster; SemDeDup does the same over
model embeddings, this operator needs no model).

Pipeline, all deterministic:

  1. hashed BoW: token → md5-bucket in [0, dim); per-document dense
     count vector via one groupBy + map_from_entries (shuffle carries
     (doc, bucket, count) triples — bounded by tokens, never wider);
  2. sampled k-means (the shared deterministic trainer,
     operators/ivf.py) over the count vectors;
  3. argmax-dot assignment (narrow fold, centroid literals);
  4. per-cluster profile: size + the top representative tokens by
     within-cluster frequency (one (cluster, token) count + window
     top-k — shuffle ∝ vocabulary).

Feature hashing is the standard fixed-dimension trick (Weinberger et
al. 2009): collisions are deterministic and harmless for clustering;
dim trades collision rate for centroid size. 100 TB: every stage is a
bounded-key aggregation or a narrow projection — no all-pairs, no
driver state beyond the bounded k-means sample.

Reference analog: none — §2.3 extension surface (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from myhadoop_spark.operators.ivf import assign_buckets, train_centroids

BOW_DIM = 64
K_CLUSTERS = 8


def tokens(col: str = "text") -> Column:
    return F.filter(F.split(F.col(col), r"\s+"), lambda t: t != F.lit(""))


def token_bucket(tok: Column, dim: int = BOW_DIM) -> Column:
    """Deterministic md5 feature bucket (same family as dedup.py)."""
    return (F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
            % F.lit(dim))


def hashed_bow(docs: DataFrame, *, dim: int = BOW_DIM,
               id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc_id, v): dense double count-vector of md5-hashed tokens.
    Documents with no tokens are dropped (no direction to cluster on)."""
    tok_rows = docs.select(
        id_col, F.explode(tokens(text_col)).alias("_tok")
    ).select(id_col, token_bucket(F.col("_tok"), dim).alias("b"))
    counts = (tok_rows.groupBy(id_col, "b")
              .agg(F.count(F.lit(1)).alias("c")))
    m = F.map_from_entries(F.collect_list(F.struct("b", "c")))
    return (counts.groupBy(id_col).agg(m.alias("_m"))
            .select(id_col,
                    F.transform(
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda i: F.coalesce(
                            F.element_at(F.col("_m"), i.cast("long")),
                            F.lit(0)).cast("double")).alias("v")))


def cluster_corpus(docs: DataFrame, *, k: int = K_CLUSTERS,
                   dim: int = BOW_DIM, iterations: int = 5,
                   top_terms: int = 5,
                   id_col: str = "doc_id",
                   text_col: str = "text"):
    """(assignments, profile): per-document cluster ids and the
    per-cluster summary (size, top terms by within-cluster count with
    deterministic count-desc/token-asc ordering)."""
    bow = hashed_bow(docs, dim=dim, id_col=id_col, text_col=text_col)
    cents = train_centroids(bow, vec_col="v", id_col=id_col, k=k,
                            iterations=iterations)
    assignments = (assign_buckets(bow, cents, vec_col="v")
                   .select(id_col, F.col("bucket").alias("cluster")))

    tok_rows = docs.select(id_col, F.explode(tokens(text_col)).alias("tok"))
    w = Window.partitionBy("cluster").orderBy(
        F.col("n").desc(), F.col("tok").asc())
    top = (tok_rows.join(assignments, id_col)
           .groupBy("cluster", "tok").agg(F.count(F.lit(1)).alias("n"))
           .withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= top_terms)
           .groupBy("cluster")
           .agg(F.array_sort(F.collect_list(F.struct("rn", "tok")))
                .alias("_t"))
           .select("cluster",
                   F.transform("_t", lambda s: s["tok"]).alias("top_terms")))
    profile = (assignments.groupBy("cluster")
               .agg(F.count(F.lit(1)).alias("n_docs"))
               .join(top, "cluster", "left")
               .orderBy("cluster"))
    return assignments, profile
