"""Dump plans/r14/<query>_<suffix>.txt evidence files: the query's
explain('formatted') at sf0.1 INCLUDING the subplan of every frame the
query materializes along the way (materialization truncates the final
frame's visible plan to the post-checkpoint tail, so the computation's
plan shape lives in the captured subplans). r14 note: call sites route
through myhadoop_spark.materialize, which still calls
DataFrame.localCheckpoint locally — the capture hook below therefore
sees every materialized frame (VERDICT r13 item 9: the dumps and the
code now share one see-through convention with tests/test_plans.py's
plan_of).

Usage: python scripts/dump_r14_plans.py [--suffix before|after] \
           <query> [query ...]
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from myhadoop_spark import registry
from myhadoop_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
OUT = Path(__file__).resolve().parent.parent / "plans" / "r14"


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    try:  # Spark 4: concrete instances are the classic subclass
        import pyspark.sql.classic.dataframe as dfmod
    except ImportError:  # pragma: no cover — Spark 3 layout
        import pyspark.sql.dataframe as dfmod

    args = sys.argv[1:]
    suffix = "after"
    if args and args[0] == "--suffix":
        suffix = args[1]
        args = args[2:]

    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump_r14_plans")
    for name in args:
        plans: list[str] = []
        orig = dfmod.DataFrame.localCheckpoint

        def capture(self, *a, **k):
            plans.append(_explain(self))
            return orig(self, *a, **k)

        dfmod.DataFrame.localCheckpoint = capture
        try:
            df = registry.get(name).fn(spark, SF_DIR)
        finally:
            dfmod.DataFrame.localCheckpoint = orig
        parts = [f"# {name} — explain('formatted') at sf0.1, {suffix} "
                 "r14 optimization\n# (materialized-intermediate "
                 "subplans captured at each materialize/localCheckpoint,"
                 " then the final frame)\n"]
        for i, p in enumerate(plans):
            parts.append(f"\n## materialized intermediate {i + 1}\n{p}")
        parts.append(f"\n## final frame\n{_explain(df)}")
        out = OUT / f"{name}_{suffix}.txt"
        out.write_text("".join(parts))
        n_exch = sum(p.count("Exchange") for p in plans)
        n_exch += _explain(df).count("Exchange")
        print(f"{name}: {len(plans)} materialized subplans -> {out} "
              f"(~{n_exch} Exchange mentions)")


if __name__ == "__main__":
    main()
