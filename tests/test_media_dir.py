"""Directory-scale real-decode media path (VERDICT r12 #4): actual
PNG/BMP/PPM files on disk -> binaryFile ingest (read_media_dir) ->
decode_image_grid(fake=False) -> dhash64 -> Hamming-ball join -> CC
keep-one. The planted structure (one grid box repainted => <= 2 dHash
bits; one byte-exact copy => hamming 0) must be recovered exactly."""

from __future__ import annotations

import pyspark.sql.functions as F

from myhadoop_spark.operators.connected_components import (
    connected_components,
)
from myhadoop_spark.operators.phash import dhash64
from myhadoop_spark.operators.simhash_join import hamming_pairs
from myhadoop_spark.sources.imagegen import write_image_corpus
from myhadoop_spark.sources.multimodal import (
    decode_image_grid,
    read_media_dir,
)

N_GROUPS, VARIANTS = 6, 4


def _hashed(spark, tmp_path):
    stats = write_image_corpus(tmp_path, n_groups=N_GROUPS,
                               variants=VARIANTS)
    assert stats["files"] == N_GROUPS * VARIANTS
    media = read_media_dir(spark, str(tmp_path))
    # carry group/variant recovered from the file name so assertions
    # can reason in planted coordinates (media_id is a path hash)
    name = F.element_at(F.split(F.col("meta.source_uri"), "/"), -1)
    tagged = media.withColumn(
        "g", F.regexp_extract(name, r"g(\d+)_v(\d)", 1).cast("int")
    ).withColumn(
        "v", F.regexp_extract(name, r"g(\d+)_v(\d)", 2).cast("int"))
    grids = decode_image_grid(tagged, fake=False)
    return (tagged.select("media_id", "g", "v")
            .join(grids.select("media_id",
                               dhash64(F.col("grid")).alias("dhash")),
                  "media_id"))


def test_on_disk_decode_to_neardup_and_keep_one(spark, tmp_path):
    hashed = _hashed(spark, tmp_path).localCheckpoint()
    assert hashed.count() == N_GROUPS * VARIANTS

    tags = {r.media_id: (r.g, r.v) for r in hashed.collect()}
    pairs = hamming_pairs(hashed.select("media_id", "dhash"),
                          bits=64, max_hamming=2,
                          id_col="media_id", sim_col="dhash").collect()

    # every pair stays within one planted group (gradient bases from
    # different seeds never land within hamming 2)
    for p in pairs:
        assert tags[p.id_a][0] == tags[p.id_b][0], p
    # per group: base pairs with every variant (box repaint <= 2 bits,
    # exact copy = 0 bits)
    by_group: dict[int, set] = {}
    ham0 = set()
    for p in pairs:
        g = tags[p.id_a][0]
        vs = frozenset((tags[p.id_a][1], tags[p.id_b][1]))
        by_group.setdefault(g, set()).add(vs)
        if p.hamming == 0:
            ham0.add((g, vs))
    for g in range(N_GROUPS):
        got = by_group.get(g, set())
        for v in range(1, VARIANTS):
            assert frozenset((0, v)) in got, (g, v, got)
        assert (g, frozenset((0, VARIANTS - 1))) in ham0  # exact copy

    # keep-one: each group collapses to exactly one component
    comp = connected_components(
        spark.createDataFrame(pairs)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    comp_of = {r.id: r.component for r in comp.collect()}
    groups = {}
    for mid, (g, _v) in tags.items():
        groups.setdefault(g, set()).add(comp_of[mid])
    assert all(len(cs) == 1 for cs in groups.values()), groups
    assert len({next(iter(cs)) for cs in groups.values()}) == N_GROUPS


def test_decode_parallelizes_and_prunes_payload(spark, tmp_path):
    """The binaryFile scan feeds mapInPandas directly; selecting only
    media_id/grid must not break on a fresh read (column pruning to
    the Arrow batch), and every file decodes without error."""
    write_image_corpus(tmp_path, n_groups=3, variants=2)
    media = read_media_dir(spark, str(tmp_path))
    grids = decode_image_grid(media, fake=False)
    rows = grids.select("media_id", F.size("grid").alias("n")).collect()
    assert len(rows) == 6 and all(r.n == 72 for r in rows)
