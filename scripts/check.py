"""Driver-sim: run every registered query on Spark and its oracle on
DuckDB at the given SF dir; compare row count, column names, and values
(order-insensitive, columns sorted by name — mirrors CORRECTNESS_r{N}).

Usage: python scripts/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from myhadoop_spark import registry
from myhadoop_spark.oracle import canon_rows, compare, duck_connection, run_oracle
from myhadoop_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    known = set(registry.names())
    unknown = only - known
    if unknown:
        print(f"unknown queries: {sorted(unknown)}; known: {sorted(known)}")
        return 2
    spark = get_spark("check")
    con = duck_connection(sf_dir)

    # explicit names may address demoted (gate=False) queries too; the
    # bare invocation keeps the driver's gated-window semantics
    qs = registry.all_queries(include_ungated=bool(only))
    oracles = registry.all_oracles(include_ungated=bool(only))
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
            dcols, drows = run_oracle(con, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        sc, sr = canon_rows(scols, srows)
        dc, dr = canon_rows(dcols, drows)
        ok, notes = compare(sc, sr, dc, dr)
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
