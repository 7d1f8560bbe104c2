"""JL random projection (operators/random_projection.py): bitwise
Python-model parity (same fold order), the JL statistical contract
(unbiased norms, distortion shrinking in k — measured on the fixture:
mean cos distortion 0.262/0.175/0.111/0.096 at k=8/16/32/48), the
sign-matrix determinism, and the zero-shuffle plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.random_projection import (
    project,
    sign_matrix,
    sql_sign_matrix,
)
from tests.conftest import SF_SMOKE
from tests.test_plans import plan_of


def _emb(spark, n=60):
    return (spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
            .filter(F.col("vec_id") < n)
            .select("vec_id", "embedding"))


def _py_project(vec, S, k):
    inv = 1.0 / math.sqrt(k)
    out = []
    for row in S:
        acc = 0.0
        for s, x in zip(row, vec):
            acc = acc + s * float(x)  # the engine's fold order
        out.append(acc * inv)
    return out


def test_bitwise_python_model_parity(spark):
    k = 16
    S = sign_matrix(k, 64)
    rows = (_emb(spark)
            .withColumn("p", project("embedding", k=k, dim=64))
            .collect())
    for r in rows:
        assert r["p"] == _py_project(r["embedding"], S, k), r["vec_id"]


def test_sign_matrix_deterministic_and_seeded(spark):
    a = sign_matrix(4, 8)
    assert a == sign_matrix(4, 8)
    assert a != sign_matrix(4, 8, seed="other")
    assert all(x in (1.0, -1.0) for row in a for x in row)
    # the SQL literal mirrors the same bits
    assert sql_sign_matrix(2, 2) == sql_sign_matrix(2, 2)


def test_jl_statistical_contract(spark):
    """Unbiased norm preservation and monotone-in-k distortion — the
    properties that make the primitive usable (pick k for the target
    ε; 64→16 on a clustered corpus is deliberately lossy)."""
    rows = (_emb(spark, 500)
            .withColumn("p16", project("embedding", k=16, dim=64))
            .withColumn("p48", project("embedding", k=48, dim=64))
            .collect())

    def nrm(v):
        return math.sqrt(sum(float(x) * float(x) for x in v))

    def cs(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        return d / (nrm(a) * nrm(b))

    ratios = [(nrm(r["p16"]) / nrm(r["embedding"])) ** 2 for r in rows]
    assert 0.9 < sum(ratios) / len(ratios) < 1.1
    q = rows[0]
    d16 = [abs(cs(q["embedding"], r["embedding"]) - cs(q["p16"], r["p16"]))
           for r in rows[1:]]
    d48 = [abs(cs(q["embedding"], r["embedding"]) - cs(q["p48"], r["p48"]))
           for r in rows[1:]]
    m16, m48 = sum(d16) / len(d16), sum(d48) / len(d48)
    assert m48 < m16 < 0.3, (m16, m48)


def test_guards(spark):
    with pytest.raises(ValueError):
        sign_matrix(0, 4)
    with pytest.raises(ValueError):
        project("embedding", k=4, dim=0)


def test_literal_footprint_guard(spark):
    """k·dim past MAX_LITERALS raises with guidance instead of
    silently inlining a multi-MB plan (a 1k-dim × 256-k call must not
    build quietly); the boundary itself is allowed."""
    from myhadoop_spark.operators.random_projection import MAX_LITERALS

    with pytest.raises(ValueError, match="broadcast-join"):
        sign_matrix(256, 1024)
    with pytest.raises(ValueError, match="broadcast-join"):
        project("embedding", k=256, dim=1024)
    k = 8
    assert len(sign_matrix(k, MAX_LITERALS // k)) == k


def test_plan_is_narrow(spark):
    plan = plan_of(spark, "jl_project")
    assert "hashpartitioning" not in plan.lower(), plan
    assert "BatchEvalPython" not in plan, plan
