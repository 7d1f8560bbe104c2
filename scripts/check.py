"""Driver-sim: run every registered query on Spark and its oracle on
DuckDB at the given SF dir; compare row count, column names, and values
(order-insensitive, columns sorted by name — mirrors CORRECTNESS_r{N}).

Usage: python scripts/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from myhadoop_spark import registry
from myhadoop_spark.catalog import TABLES
from myhadoop_spark.session import get_spark


def canon_value(v):
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


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return sorted(cols), out


def float_close(a, b):
    if a == b:
        return True, 0.0
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)
                                  and isinstance(b, float) and math.isnan(b)):
        return a is b or (isinstance(a, float) and isinstance(b, float)), 0.0
    if isinstance(a, float) and isinstance(b, float):
        d = abs(a - b)
        tol = 1e-9 * max(1.0, abs(a), abs(b))
        return d <= tol, d
    return False, float("inf")


def compare(name, scols, srows, dcols, drows):
    notes = []
    ok = True
    if scols != dcols:
        return False, [f"columns differ: spark={scols} duck={dcols}"]
    if len(srows) != len(drows):
        return False, [f"row count: spark={len(srows)} duck={len(drows)}"]
    exact = True
    max_d = 0.0
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
                notes.append(f"value mismatch: spark={a!r} duck={b!r}")
                if len(notes) > 5:
                    return False, notes
            else:
                max_d = max(max_d, d)
    if ok and not exact:
        notes.append(f"float-tolerant match (max abs diff {max_d:.3e}) — "
                     "NOT bitwise; driver hash may fail")
    return ok, notes


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    n_pass = n_fail = n_skip = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            n_skip += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        sc, sr = canon_rows(scols, srows)
        dc, dr = canon_rows(dcols, drows)
        ok, notes = compare(name, sc, sr, dc, dr)
        status = "PASS" if ok else "FAIL"
        n_pass += ok
        n_fail += not ok
        msg = f"{status} {name}: {len(srows)} rows, {time.time()-t0:.1f}s"
        if notes:
            msg += " | " + "; ".join(notes[:6])
        print(msg)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
