"""Manifest compaction (IcebergLocalTable.rewrite_manifests).

Contract: a metadata-only ``replace`` commit that merges per-(content,
spec-id) manifest groups into single manifests — no data file moves, no
logical row changes, entry sequence numbers / snapshot ids preserved
(so MOR strict-sequence semantics and provenance survive), partition
summaries recomputed (so manifest-level pruning survives), and every
history-walking read (time travel, incremental, changelog) crosses it
unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.iceberg import avro_io
from ner_spark.iceberg.spark_io import (
    delete_iceberg_keys,
    delete_iceberg_where,
    merge_upsert_iceberg_mor,
    read_iceberg,
    read_iceberg_changelog,
    read_iceberg_incremental,
    write_iceberg,
)
from ner_spark.iceberg.table import IcebergLocalTable


def _mk(spark, lo, hi, mul=10.0):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("g"),
        (F.col("id") * mul).alias("p"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.select("k", "g", "p").collect())


def _manifests(t):
    _, _, ms = avro_io.read_container(t.current_snapshot()["manifest-list"])
    return ms


def test_rewrite_merges_without_touching_data(spark, tmp_path):
    loc = str(tmp_path / "t")
    for lo in range(0, 50, 10):
        write_iceberg(_mk(spark, lo, lo + 10), loc, mode="append")
    t = IcebergLocalTable(loc)
    before_rows = _rows(read_iceberg(spark, loc))
    before_paths = {f.path for f in t.scan()}
    assert len(_manifests(t)) == 5

    r = t.rewrite_manifests()
    assert r == {"manifests_before": 5, "manifests_after": 1,
                 "merged_groups": 1}
    t = IcebergLocalTable(loc)
    ms = _manifests(t)
    assert len(ms) == 1
    assert ms[0]["added_files_count"] == 0  # all EXISTING, nothing added
    assert ms[0]["existing_files_count"] == len(before_paths)
    assert t.current_snapshot()["summary"]["operation"] == "replace"
    # no data file moved, no row changed
    assert {f.path for f in t.scan()} == before_paths
    assert _rows(read_iceberg(spark, loc)) == before_rows
    # idempotent: a second pass has nothing to merge
    assert t.rewrite_manifests()["merged_groups"] == 0


def test_mor_strict_sequence_survives_rewrite(spark, tmp_path):
    loc = str(tmp_path / "t")
    write_iceberg(_mk(spark, 0, 20), loc, mode="append")
    delete_iceberg_where(spark, loc, [("k", "<", 3)])
    delete_iceberg_keys(spark, loc, spark.range(5, 8).select(
        F.col("id").alias("k")))
    # one atomic MOR merge: eq-delete keys 10..13 + re-append them
    merge_upsert_iceberg_mor(
        spark, loc, _mk(spark, 10, 14, mul=777.0), key="k"
    )
    before = _rows(read_iceberg(spark, loc))
    t = IcebergLocalTable(loc)
    n_del_manifests = sum(
        1 for m in _manifests(t) if m.get("content", 0) == 1
    )
    assert n_del_manifests >= 3  # pos + eq + merge delete manifests
    r = t.rewrite_manifests()
    assert r["merged_groups"] >= 1
    t = IcebergLocalTable(loc)
    ms = _manifests(t)
    assert sum(1 for m in ms if m.get("content", 0) == 1) == 1
    assert sum(1 for m in ms if m.get("content", 0) == 0) == 1
    # the strict-sequence rule still keeps the merge's re-appended rows
    # alive and the earlier deletes applied
    assert _rows(read_iceberg(spark, loc)) == before
    # delete entries kept their ORIGINAL sequence numbers
    dm = next(m for m in ms if m.get("content", 0) == 1)
    _, _, entries = avro_io.read_container(dm["manifest_path"])
    seqs = sorted({e["sequence_number"] for e in entries})
    assert seqs == [2, 3, 4]  # the three delete commits, not the rewrite's
    # and a MOR merge AFTER the rewrite still works end-to-end
    merge_upsert_iceberg_mor(
        spark, loc, _mk(spark, 15, 17, mul=999.0), key="k"
    )
    got = {r[0]: r[2] for r in _rows(read_iceberg(spark, loc))}
    assert got[15] == 15 * 999.0 and got[16] == 16 * 999.0


def test_partition_pruning_survives_rewrite(spark, tmp_path):
    loc = str(tmp_path / "t")
    for lo in range(0, 40, 10):
        write_iceberg(
            _mk(spark, lo, lo + 10), loc, mode="append",
            partition_by=["bucket(4, k)"],
        )
    t = IcebergLocalTable(loc)
    pruned_before = {f.path for f in t.scan(filters=[("k", "=", 7)])}
    all_before = {f.path for f in t.scan()}
    assert len(pruned_before) < len(all_before)
    t.rewrite_manifests()
    t = IcebergLocalTable(loc)
    ms = _manifests(t)
    assert len(ms) == 1
    # summaries recomputed on the merged manifest (pruning stays possible)
    assert ms[0]["partitions"] is not None
    assert {f.path for f in t.scan(filters=[("k", "=", 7)])} == pruned_before
    rows = read_iceberg(spark, loc, filters=[("k", "=", 7)]).collect()
    assert [r["k"] for r in rows] == [7]


def test_rewrite_merges_per_spec_group(spark, tmp_path):
    """Manifests written under different partition specs never merge
    with each other — each merged manifest prunes under ITS OWN spec."""
    loc = str(tmp_path / "t")
    write_iceberg(_mk(spark, 0, 10), loc, mode="append",
                  partition_by=["bucket(4, k)"])
    write_iceberg(_mk(spark, 10, 20), loc, mode="append")
    t = IcebergLocalTable(loc)
    assert t.evolve_spec(["bucket(8, k)"])
    write_iceberg(_mk(spark, 20, 30), loc, mode="append")
    write_iceberg(_mk(spark, 30, 40), loc, mode="append")
    t = IcebergLocalTable(loc)
    pruned_before = {f.path for f in t.scan(filters=[("k", "=", 7)])}
    r = t.rewrite_manifests()
    assert r["merged_groups"] == 2 and r["manifests_after"] == 2
    t = IcebergLocalTable(loc)
    ms = _manifests(t)
    assert sorted(m["partition_spec_id"] for m in ms) == [0, 1]
    assert {f.path for f in t.scan(filters=[("k", "=", 7)])} == pruned_before
    assert _rows(read_iceberg(spark, loc)) == _rows(_mk(spark, 0, 40))


def test_history_walks_cross_the_rewrite(spark, tmp_path):
    loc = str(tmp_path / "t")
    s1 = write_iceberg(_mk(spark, 0, 10), loc, mode="append")
    write_iceberg(_mk(spark, 10, 20), loc, mode="append")
    t = IcebergLocalTable(loc)
    t.rewrite_manifests()
    write_iceberg(_mk(spark, 20, 25), loc, mode="append")
    # incremental read from before the rewrite: the replace snapshot is
    # skipped, both real appends arrive
    inc = read_iceberg_incremental(spark, loc, s1)
    assert _rows(inc) == _rows(_mk(spark, 10, 25))
    # changelog emits nothing for the rewrite commit
    log = read_iceberg_changelog(spark, loc, from_snapshot_id=s1)
    assert log.count() == 15
    assert log.where("_change_type = 'delete'").count() == 0
    # time travel to the pre-rewrite snapshot still reads its own list
    assert _rows(read_iceberg(spark, loc, snapshot_id=s1)) == _rows(
        _mk(spark, 0, 10)
    )
