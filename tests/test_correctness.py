"""Oracle-differential smoke (t1): every declared query vs DuckDB at
sf0.001 — the fast mirror of the driver's sf0.01 gate."""

from __future__ import annotations

import pytest

from myhadoop_spark import registry
from myhadoop_spark.oracle import canon_rows, compare, duck_connection, run_oracle
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", sorted(registry.all_oracles(include_ungated=True)))
def test_query_matches_oracle(spark, duck, name):
    """Includes gate-demoted queries (registry.ungated() — sort_topn,
    join2): outside the driver's 50-row window but still held to the
    same bitwise oracle contract here."""
    q = registry.get(name)
    sdf = q.fn(spark, SF_SMOKE)
    scols, srows = canon_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    dcols, drows = canon_rows(*run_oracle(duck, q.oracle))
    ok, notes = compare(scols, srows, dcols, drows)
    assert ok, notes
    # bitwise parity is the actual contract (driver value-hash)
    assert not notes, f"non-bitwise float match: {notes}"


@pytest.mark.parametrize(
    "name", sorted(set(registry.names())
                   - set(registry.all_oracles(include_ungated=True))))
def test_rows_only_queries_run(spark, name):
    df = registry.get(name).fn(spark, SF_SMOKE)
    assert df.count() >= 0
