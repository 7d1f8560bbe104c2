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

r13 (VERDICT r12 #5): the wall columns now time ONLY the probe phase
(per probe batch, catalog founding excluded on both engines) — the
crossover question is what a small batch costs against an
already-built catalog; rows appended before r13 averaged over all
batches instead.

Run: python scripts/edjoin_index_study.py [scales...]  (default 1 4;
the r13 crossover sweep used 1 4 16 67 — up to a ~100k-entity
catalog)
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


def _run(spark, batches, path, ckpt, split_at: int | None = None, **kw):
    """Replay ``batches`` through the entity stream. With ``split_at``
    the first ``split_at`` batches (catalog founding) are processed
    first and only the REMAINING (probe) batches are timed — the wall
    number the crossover question actually asks about (a small probe
    against an already-built catalog). Returns (stats, wall_s) where
    wall_s covers the timed phase."""
    src = tempfile.mkdtemp(prefix="ej_src_")
    try:
        head = batches if split_at is None else batches[:split_at]
        tail = [] if split_at is None else batches[split_at:]
        for rows in head:
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
            if tail:
                for rows in tail:
                    (spark.createDataFrame(rows, "id long, nm string")
                     .coalesce(1).write.mode("append").parquet(src))
                t0 = time.time()          # time ONLY the probe phase
                q.processAllAvailable()
        finally:
            q.stop()
        return stats, time.time() - t0
    finally:
        shutil.rmtree(src, ignore_errors=True)


def main() -> None:
    # scale s -> catalog of 3 * 500 * s entities; the r13 crossover
    # sweep (VERDICT r12 #5) runs 1 4 16 67 => up to ~100k entities,
    # with the probe phase timed SEPARATELY from catalog founding
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
            tmp = tempfile.mkdtemp(prefix="ej_state_")
            try:
                sp, wp = _run(spark, batches, f"{tmp}/p",
                              f"{tmp}/cp", split_at=FOUNDING,
                              pruned_index=True, n_buckets=N_BUCKETS)
                sd, wd = _run(spark, batches, f"{tmp}/d", f"{tmp}/cd",
                              split_at=FOUNDING)
                total = spark.read.parquet(f"{tmp}/p/prefix").count()
                for st in sp[FOUNDING:]:
                    # wall columns = PROBE-phase wall per probe batch
                    # (founding excluded on both engines — the r13
                    # crossover measure; pre-r13 rows in this TSV
                    # averaged over ALL batches)
                    f.write(
                        f"myhadoop_spark\t{scale}\t{st['batch']}\t"
                        f"{st['catalog']}\t{st['buckets_read']}\t"
                        f"{N_BUCKETS}\t"
                        f"{st['index_rows_read']}\t{total}\t"
                        f"{wp / PROBES:.2f}\t{wd / PROBES:.2f}\n")
                    print(f"scale={scale} batch={st['batch']} "
                          f"catalog={st['catalog']} "
                          f"buckets={st['buckets_read']}/{N_BUCKETS} "
                          f"rows={st['index_rows_read']}/{total} "
                          f"probe wall p/d={wp / PROBES:.2f}/"
                          f"{wd / PROBES:.2f}s")
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
