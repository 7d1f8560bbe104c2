"""Pruned entity-catalog probe rehearsal (r12).

The 100 TB property: with the persistent q-gram prefix index
(operators/edjoin_index.py), a micro-batch's cross probe reads only
the index buckets its OWN prefix grams hash to (plus the bounded
short tier) — per-batch catalog bytes scale with the BATCH's gram
set, not the catalog. Buckets touched ≈ min(n_buckets, batch prefix
grams), so the pruning bites exactly in the real ingest shape: small
batches against a large catalog, with n_buckets sized above the
batch gram count. This study builds a catalog with FOUNDING batches
(500·scale mostly-unique names each), then probes it with SMALL
batches (10 records) and records buckets/rows read vs the index
totals; the default (unpruned) run of the same batches gives the
wall comparison.

Appends to edjoin_index_study.tsv:

    engine  scale  batch  catalog  buckets_read  n_buckets  rows_read  rows_total  wall_pruned_s  wall_default_s

Run: python scripts/edjoin_index_study.py [scales...]  (default 1 4)
"""

from __future__ import annotations

import hashlib
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from myhadoop_spark.session import get_spark
from myhadoop_spark.streaming.entity_stream import start_entity_stream

OUT = Path(__file__).resolve().parent.parent / "edjoin_index_study.tsv"
FOUNDING = 3
PROBES = 3
N_BUCKETS = 512


def _key(b: int, i: int, n: int) -> str:
    # md5 suffixes keep distinct names > 2 edits apart (serial
    # numbers differ by 1-2 digits and would collapse the whole
    # batch into one Ed-Join cluster)
    return hashlib.md5(f"{b}:{i}:{n}".encode()).hexdigest()[:10]


def _rows(b: int, n: int) -> list[tuple[int, str]]:
    """Mostly-unique names (the catalog GROWS ~n per batch — the
    property the pruned probe exists for) with a planted near-dup of
    a prior-batch entity every fifth record."""
    words = ["anvil", "feed", "box", "suit", "cactus", "rope", "seed",
             "crate", "spring", "magnet"]
    out = []
    for i in range(n):
        w1 = words[(i * 7 + b) % len(words)]
        w2 = words[(i * 3 + 1) % len(words)]
        if i % 5 == 1 and b > 0:
            nm = f"{w1} {w2} item {_key(b - 1, i, n)}x"
        else:
            nm = f"{w1} {w2} item {_key(b, i, n)}"
        out.append((b * 1_000_000 + i, nm))
    return out


def _run(spark, batches, path, ckpt, **kw):
    src = tempfile.mkdtemp(prefix="ej_src_")
    try:
        for rows in batches:
            (spark.createDataFrame(rows, "id long, nm string")
             .coalesce(1).write.mode("append").parquet(src))
        stream = (spark.readStream.schema("id long, nm string")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        stats: list = []
        t0 = time.time()
        q = start_entity_stream(stream, path=path, checkpoint=ckpt,
                                stats=stats, **kw)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return stats, time.time() - t0
    finally:
        shutil.rmtree(src, ignore_errors=True)


def main() -> None:
    scales = [int(s) for s in sys.argv[1:]] or [1, 4]
    spark = get_spark("edjoin_index_study")
    new_file = not OUT.exists()
    with OUT.open("a") as f:
        if new_file:
            f.write("engine\tscale\tbatch\tcatalog\tbuckets_read\t"
                    "n_buckets\trows_read\trows_total\t"
                    "wall_pruned_s\twall_default_s\n")
        for scale in scales:
            founding = [_rows(b, 500 * scale)
                        for b in range(FOUNDING)]
            # small probe batches: half genuinely new names, half
            # planted near-dups (founding name + "x") so the probe
            # exercises both hit and miss paths
            probes = []
            for p in range(PROBES):
                pool = founding[p % FOUNDING]
                rows = [((FOUNDING + p) * 1_000_000 + j,
                         f"probe {_key(99 + p, j, scale)} widget")
                        for j in range(5)]
                rows += [((FOUNDING + p) * 1_000_000 + 50 + j,
                          pool[(p * 37 + j * 11) % len(pool)][1] + "x")
                         for j in range(5)]
                probes.append(rows)
            batches = founding + probes
            n_all = FOUNDING + PROBES
            tmp = tempfile.mkdtemp(prefix="ej_state_")
            try:
                sp, wp = _run(spark, batches, f"{tmp}/p",
                              f"{tmp}/cp", pruned_index=True,
                              n_buckets=N_BUCKETS)
                sd, wd = _run(spark, batches, f"{tmp}/d", f"{tmp}/cd")
                total = spark.read.parquet(f"{tmp}/p/prefix").count()
                for st in sp[FOUNDING:]:
                    f.write(
                        f"myhadoop_spark\t{scale}\t{st['batch']}\t"
                        f"{st['catalog']}\t{st['buckets_read']}\t"
                        f"{N_BUCKETS}\t"
                        f"{st['index_rows_read']}\t{total}\t"
                        f"{wp / n_all:.2f}\t{wd / n_all:.2f}\n")
                    print(f"scale={scale} batch={st['batch']} "
                          f"catalog={st['catalog']} "
                          f"buckets={st['buckets_read']}/{N_BUCKETS} "
                          f"rows={st['index_rows_read']}/{total} "
                          f"wall p/d={wp / n_all:.2f}/"
                          f"{wd / n_all:.2f}s")
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
