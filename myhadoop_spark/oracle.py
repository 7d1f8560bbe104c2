"""Differential-oracle comparison utilities (SURVEY.md §5.1).

Canonicalization mirrors the driver's correctness gate: columns sorted
by name, rows sorted, order-insensitive; floats compared exactly first
(the engine aims for bitwise parity via exact decimal aggregation) with
a 1e-9 relative tolerance fallback that callers can treat as a warning.
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import duckdb

from myhadoop_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_value(x)) for k, x in v.items()))
    return v


def _sort_key(x: Any) -> str:
    # Tolerance-stable sort key: floats that differ within the 1e-9
    # relative comparison tolerance must not sort into different row
    # orders (compare() zips row partners positionally), so the KEY
    # rounds to 10 significant digits; the comparison itself still sees
    # full-precision values.
    if isinstance(x, float) and math.isfinite(x):
        return f"{x:.9e}"
    return str(x)


def canon_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, _sort_key(x)) for x in t))
    return sorted(cols), out


def float_close(a: Any, b: Any) -> tuple[bool, float]:
    if a == b:
        return True, 0.0
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, 0.0
        d = abs(a - b)
        return d <= 1e-9 * max(1.0, abs(a), abs(b)), d
    return False, float("inf")


def compare(scols, srows, dcols, drows) -> tuple[bool, list[str]]:
    """Compare canonicalized (cols, rows) from Spark vs the oracle.
    Returns (ok, notes); a float-tolerant (non-bitwise) match is ok=True
    with a warning note."""
    if scols != dcols:
        return False, [f"columns differ: spark={scols} oracle={dcols}"]
    if len(srows) != len(drows):
        return False, [f"row count: spark={len(srows)} oracle={len(drows)}"]
    ok, exact, max_d, notes = True, True, 0.0, []
    for sr, dr in zip(srows, drows):
        if sr == dr:
            continue
        exact = False
        for a, b in zip(sr, dr):
            if a == b:
                continue
            close, d = float_close(a, b)
            if not close:
                ok = False
                notes.append(f"value mismatch: spark={a!r} oracle={b!r}")
                if len(notes) > 5:
                    return False, notes
            else:
                max_d = max(max_d, d)
    if ok and not exact:
        notes.append(f"float-tolerant match (max abs diff {max_d:.3e}) — "
                     "NOT bitwise; driver hash may fail")
    return ok, notes


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()
