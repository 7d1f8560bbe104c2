"""Streaming entity resolution (streaming/entity_stream):
single-batch catalog ≡ the one-shot entity_resolution canonicals,
cross-batch assignment to existing entities (cluster-level, ties by
distance then entity id), arrival order (canonicals never change),
replay idempotence, loud guards."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.streaming.entity_stream import (
    read_assignments,
    read_catalog,
    start_entity_stream,
)

# r14 (VERDICT r13 item 1): heavy parity/property battery — the
# slow tier; see pytest.ini. Run with -m "slow or not slow".
pytestmark = pytest.mark.slow

SCHEMA = "id long, nm string"


def _write_src(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    for rows in batches:
        (spark.createDataFrame(rows, SCHEMA)
         .coalesce(1).write.mode("append").parquet(src))
    return src


def _run(spark, src, path, ckpt, *, stats=None, max_files=1, **kw):
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", max_files).parquet(src))
    q = start_entity_stream(stream, path=path, checkpoint=ckpt,
                            stats=stats, **kw)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        time.sleep(0.2)


def test_single_batch_catalog_equals_one_shot(spark, tmp_path):
    rows = [(1, "acme anvil large"), (2, "acme anvil largex"),
            (3, "roadrunner feed"), (4, "acme anvil larg"),
            (5, "tnt box red")]
    src = _write_src(spark, tmp_path, [rows])
    path = str(tmp_path / "er")
    _run(spark, src, path, str(tmp_path / "ck"), max_files=10)
    got = sorted(map(tuple, read_catalog(spark, path).collect()))
    # one-shot: cluster {1,2,4} canon = shortest name 'acme anvil larg'
    assert got == [(3, "roadrunner feed"),
                   (4, "acme anvil larg"),
                   (5, "tnt box red")]
    a = {r["id"]: (r["entity"], r["is_new"])
         for r in read_assignments(spark, path).collect()}
    assert a[1] == (4, True) and a[2] == (4, True) and a[4] == (4, True)


def test_cross_batch_assignment_and_arrival_order(spark, tmp_path):
    b1 = [(10, "acme anvil large")]
    b2 = [(20, "acme anvil largex"),     # 1 edit from the catalog
          (21, "completely different")]  # new entity
    src = _write_src(spark, tmp_path, [b1, b2])
    path = str(tmp_path / "er")
    stats: list = []
    _run(spark, src, path, str(tmp_path / "ck"), stats=stats)
    a = {r["id"]: r for r in read_assignments(spark, path).collect()}
    assert a[20]["entity"] == 10 and not a[20]["is_new"]
    assert a[20]["canon_nm"] == "acme anvil large"  # catalog unchanged
    assert a[21]["entity"] == 21 and a[21]["is_new"]
    cat = sorted(map(tuple, read_catalog(spark, path).collect()))
    assert cat == [(10, "acme anvil large"),
                   (21, "completely different")]
    assert [s["new_entities"] for s in stats] == [1, 1]
    assert stats[1]["matched"] == 1


def test_replay_idempotent_and_guards(spark, tmp_path):
    rows = [(1, "aa bb cc"), (2, "dd ee ff")]
    src = _write_src(spark, tmp_path, [rows])
    path = str(tmp_path / "er")
    _run(spark, src, path, str(tmp_path / "ck"))
    before = sorted(map(tuple, read_catalog(spark, path).collect()))
    _run(spark, src, path, str(tmp_path / "ck2"))  # replay batch 0
    assert sorted(map(tuple, read_catalog(spark, path).collect())) \
        == before
    with pytest.raises(Exception, match="same entity"):
        _run(spark, src, path, str(tmp_path / "ck3"), max_dist=3)
    with pytest.raises(ValueError):
        start_entity_stream(None, path="x", checkpoint="y", max_dist=0)


def test_negative_ids_rejected(spark, tmp_path):
    src = _write_src(spark, tmp_path, [[(-5, "neg id name")]])
    path = str(tmp_path / "er")
    with pytest.raises(Exception, match="non-negative"):
        _run(spark, src, path, str(tmp_path / "ck"))


# ------------------------------------------------ pruned index probe


def _names(b, n=14):
    """Deterministic product-name batches with planted near-dups of
    earlier batches (suffix variants) and genuinely new names."""
    base = ["acme anvil", "roadrunner feed", "tnt box", "coyote suit",
            "desert cactus", "canyon rope", "bird seed premium"]
    rows = []
    for i in range(n):
        nm = base[i % len(base)]
        if i % 3 == 1:
            nm = nm + "x"          # 1 edit from a base name
        elif i % 3 == 2:
            nm = nm + f" v{b}{i}"  # farther away
        rows.append((b * 100 + i, nm))
    rows.append((b * 100 + 98, "zq"[: 1 + b % 2]))  # short tier
    return rows


def test_pruned_index_probe_equals_default(spark, tmp_path):
    """pruned_index=True produces BITWISE-identical assignments and
    catalog across a multi-batch run (both probes are exact-recall
    candidate generators in front of the same exact verify), while
    reading only the batch's gram buckets plus the short tier."""
    batches = [_names(b) for b in range(4)]
    src = _write_src(spark, tmp_path, batches)
    p1, p2 = str(tmp_path / "er1"), str(tmp_path / "er2")
    stats: list = []
    _run(spark, src, p1, str(tmp_path / "c1"))
    _run(spark, src, p2, str(tmp_path / "c2"), pruned_index=True,
         n_buckets=16, stats=stats)
    a1 = sorted(map(tuple, read_assignments(spark, p1).collect()))
    a2 = sorted(map(tuple, read_assignments(spark, p2).collect()))
    assert a1 == a2
    c1 = sorted(map(tuple, read_catalog(spark, p1).collect()))
    c2 = sorted(map(tuple, read_catalog(spark, p2).collect()))
    assert c1 == c2
    # probes after the founding batch read a bounded bucket subset
    probed = [s for s in stats if "buckets_read" in s]
    assert probed and all(s["buckets_read"] <= 16 for s in probed)


def test_pruned_index_partition_pruning_bites(spark, tmp_path):
    """A tiny probe batch against a larger catalog reads strictly
    fewer index rows than the index holds (the bucket filter prunes
    parquet partitions, not just rows)."""
    big = [(i, f"warehouse item number {i:04d}") for i in range(40)]
    tiny = [(900, "zzz unrelated widget")]
    src = _write_src(spark, tmp_path, [big, tiny])
    path = str(tmp_path / "er")
    stats: list = []
    _run(spark, src, path, str(tmp_path / "ck"), pruned_index=True,
         n_buckets=32, stats=stats)
    total = spark.read.parquet(f"{path}/prefix").count()
    probe = [s for s in stats if "index_rows_read" in s][-1]
    assert probe["index_rows_read"] < total
    assert probe["buckets_read"] < 32


def test_pruned_index_replay_and_mode_guard(spark, tmp_path):
    src = _write_src(spark, tmp_path, [_names(0)])
    path = str(tmp_path / "er")
    _run(spark, src, path, str(tmp_path / "ck"), pruned_index=True)
    before = sorted(map(tuple, read_assignments(spark, path).collect()))
    # fresh checkpoint replays batch 0 -> idempotent skip
    _run(spark, src, path, str(tmp_path / "ck2"), pruned_index=True)
    assert sorted(map(tuple,
                      read_assignments(spark, path).collect())) == before
    # switching probe modes on existing state fails loudly
    with pytest.raises(Exception, match="probe modes"):
        _run(spark, src, path, str(tmp_path / "ck3"))
    with pytest.raises(Exception, match="probe modes"):
        _run(spark, src, path, str(tmp_path / "ck4"), pruned_index=True,
             n_buckets=8)


def test_pruned_index_all_short_batch(spark, tmp_path):
    """A probe batch made entirely of content-blind short names
    (len <= 2d) reads only the bounded short tier (empty bucket
    list) and still matches the default probe bitwise."""
    b1 = _names(0)
    b2 = [(900, "zq"), (901, "ab"), (902, "zq")]   # all len <= 2d=4
    src = _write_src(spark, tmp_path, [b1, b2])
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    stats: list = []
    _run(spark, src, p1, str(tmp_path / "c1"))
    _run(spark, src, p2, str(tmp_path / "c2"), pruned_index=True,
         stats=stats)
    a1 = sorted(map(tuple, read_assignments(spark, p1).collect()))
    a2 = sorted(map(tuple, read_assignments(spark, p2).collect()))
    assert a1 == a2
    assert stats[-1]["buckets_read"] == 0


def test_pruned_index_crash_replay_not_poisoned(spark, tmp_path):
    """A crash AFTER the batch-N prefix write but BEFORE the meta.json
    commit leaves an orphan prefix/batch_id=N dir. The replay of batch
    N must NOT probe those failed-attempt rows — else its own new
    entities would match 'existing' at dist 0, is_new=False, and the
    catalog would permanently omit entities the assignments reference.
    read_pruned restricts the probe to committed batches (ADVICE r12)."""
    import shutil

    b0 = _names(0)
    b1 = [(900, "totally novel gadget zzz")]   # genuinely new, long tier
    # reference run: both batches, clean lifecycle
    src_ref = _write_src(spark, tmp_path / "rsrc", [b0, b1])
    p_ref = str(tmp_path / "ref")
    _run(spark, src_ref, p_ref, str(tmp_path / "rck"),
         pruned_index=True, n_buckets=16)

    # crashed run: batch 0 committed; then plant batch 1's own prefix
    # rows as the orphan of a failed attempt (meta still last_batch=0)
    src = _write_src(spark, tmp_path / "src", [b0])
    path = str(tmp_path / "er")
    ck = str(tmp_path / "ck")
    _run(spark, src, path, ck, pruned_index=True, n_buckets=16)
    shutil.copytree(f"{p_ref[len('file:'):] if p_ref.startswith('file:') else p_ref}/prefix/batch_id=1",
                    f"{path}/prefix/batch_id=1")

    # resume the SAME checkpoint: batch 1 replays against the orphan
    _write_src(spark, tmp_path / "src", [b1])
    _run(spark, src, path, ck, pruned_index=True, n_buckets=16)

    a = {r["id"]: r for r in read_assignments(spark, path).collect()}
    assert a[900]["is_new"] is True            # not self-matched
    cat = {r["entity"] for r in read_catalog(spark, path).collect()}
    assert 900 in cat                          # catalog holds it
    # end state bitwise ≡ the clean reference run
    ar = sorted(map(tuple, read_assignments(spark, p_ref).collect()))
    ac = sorted(map(tuple, read_assignments(spark, path).collect()))
    assert ar == ac
