"""Corpus clustering (operators/text_clusters.py) vs an exact Python
model (same md5 buckets, same sampled Lloyd k-means, same argmax
semantics), plus profile invariants."""

from __future__ import annotations

import hashlib
import math

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.ivf import train_centroids
from myhadoop_spark.operators.text_clusters import (
    BOW_DIM,
    K_CLUSTERS,
    cluster_corpus,
    hashed_bow,
)
from tests.conftest import SF_SMOKE


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % BOW_DIM


def _bow(text: str) -> list[float]:
    v = [0.0] * BOW_DIM
    for t in text.split():
        if t:
            v[_bucket(t)] += 1.0
    return v


def _seq_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def test_bow_matches_python(spark):
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    got = {r.doc_id: list(r.v) for r in hashed_bow(docs).collect()}
    for r in docs.collect():
        want = _bow(r.text)
        if sum(want) == 0:
            assert r.doc_id not in got
        else:
            assert got[r.doc_id] == want, r.doc_id


def test_assignment_matches_python_model(spark):
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    bow = hashed_bow(docs)
    cents = train_centroids(bow, vec_col="v", id_col="doc_id", k=K_CLUSTERS)
    assignments, profile = cluster_corpus(docs)
    got = {r.doc_id: r.cluster for r in assignments.collect()}
    vecs = {r.doc_id: list(r.v) for r in bow.collect()}
    for i, v in vecs.items():
        scores = [_seq_dot(v, c) for c in cents]
        want = max(range(len(cents)), key=lambda j: (scores[j], j))
        assert got[i] == want, (i, got[i], want)
    # profile invariants
    rows = profile.collect()
    assert sum(r.n_docs for r in rows) == len(vecs)
    assert all(1 <= len(r.top_terms) <= 5 for r in rows)
    _ = math


def test_clusters_are_stable_under_repartition(spark):
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    a1, _ = cluster_corpus(docs)
    a2, _ = cluster_corpus(docs.repartition(7))
    r1 = {(r.doc_id, r.cluster) for r in a1.collect()}
    r2 = {(r.doc_id, r.cluster) for r in a2.collect()}
    assert r1 == r2
