"""Partition spec evolution (SURVEY.md §4.4): change a table's layout
without rewriting history. Old manifests keep their spec-id and are
pruned under the spec they were WRITTEN with; new writes land under the
new default; reads union the layouts (grouped by hive signature — Spark
refuses mixed partition-dir depths in one scan); compaction migrates
everything to the current spec as routine maintenance.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ner_spark.iceberg import transforms as T
from ner_spark.iceberg.spark_io import (
    compact_iceberg,
    merge_upsert_iceberg_mor,
    read_iceberg,
    read_iceberg_incremental,
    write_iceberg,
)
from ner_spark.iceberg.table import IcebergLocalTable

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def evolved(spark, tmp_path_factory):
    """events split in two halves: h1 written under bucket(4, user_id),
    spec evolved to bucket(8, user_id) + days(ts), h2 appended."""
    loc = str(tmp_path_factory.mktemp("icev") / "events")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    h1 = ev.filter(F.col("event_id") % 2 == 0)
    h2 = ev.filter(F.col("event_id") % 2 == 1)
    write_iceberg(h1.coalesce(1), loc, partition_by=["bucket(4, user_id)"])
    t = IcebergLocalTable(loc)
    pre_snap = t.current_snapshot()["snapshot-id"]
    assert t.evolve_spec(["bucket(8, user_id)", "days(ts)"]) is True
    write_iceberg(h2.coalesce(1), loc, mode="append")
    return loc, ev, h1, h2, pre_snap


def test_evolution_metadata_and_field_id_rules(spark, evolved):
    loc, *_ = evolved
    t = IcebergLocalTable(loc)
    md = t.metadata()
    specs = {s["spec-id"]: s["fields"] for s in md["partition-specs"]}
    assert set(specs) == {0, 1}
    assert [f["transform"] for f in specs[0]] == ["bucket[4]"]
    assert [f["transform"] for f in specs[1]] == ["bucket[8]", "day"]
    # fresh field-ids for new (source, transform) pairs, never reused
    ids0 = {f["field-id"] for f in specs[0]}
    ids1 = {f["field-id"] for f in specs[1]}
    assert ids0.isdisjoint(ids1)
    assert md["default-spec-id"] == 1
    # re-declaring the current spec is a no-op
    assert t.evolve_spec(["bucket(8, user_id)", "days(ts)"]) is False
    # an identical (source, transform) pair keeps its field-id on re-use
    assert t.evolve_spec(["bucket(4, user_id)", "days(ts)"]) is True
    md2 = IcebergLocalTable(loc).metadata()
    spec2 = md2["partition-specs"][-1]["fields"]
    assert spec2[0]["field-id"] == specs[0][0]["field-id"]  # bucket[4] reused
    assert spec2[1]["field-id"] == specs[1][1]["field-id"]  # day reused
    # restore for the other module-scoped tests
    assert IcebergLocalTable(loc).evolve_spec(
        ["bucket(8, user_id)", "days(ts)"]
    ) is True


def test_union_read_across_specs(spark, evolved):
    loc, ev, *_ = evolved
    back = read_iceberg(spark, loc)
    assert back.columns == ev.columns
    assert (
        back.orderBy("event_id").collect() == ev.orderBy("event_id").collect()
    )


def test_each_manifest_prunes_under_its_own_spec(spark, evolved):
    """The same user_id predicate prunes pre-evolution files mod 4 and
    post-evolution files mod 8 — per-manifest spec resolution."""
    loc, ev, *_ = evolved
    t = IcebergLocalTable(loc)
    uid = 7
    b4 = T.apply_transform("bucket[4]", "long", uid)
    b8 = T.apply_transform("bucket[8]", "long", uid)
    files = t.scan(filters=[("user_id", "=", uid)])
    assert files
    by_spec = {0: set(), 1: set()}
    for f in files:
        by_spec[f.spec_id].add(f.partition["user_id_bucket"])
    assert by_spec[0] <= {b4} and by_spec[1] <= {b8}
    # both halves contributed (old AND new layout actually pruned)
    assert by_spec[0] and by_spec[1]
    assert len(files) < len(t.scan())
    got = read_iceberg(spark, loc, filters=[("user_id", "=", uid)])
    assert got.count() == ev.filter(F.col("user_id") == uid).count() > 0
    # the new-only days(ts) transform prunes new files; old files pass
    # conservatively (no ts_day value) and bounds take over
    lo, hi = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 12)
    flt = [("ts", ">=", lo), ("ts", "<", hi)]
    got2 = read_iceberg(spark, loc, filters=flt)
    want2 = ev.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
    assert got2.count() == want2.count() > 0


def test_time_travel_and_incremental_across_evolution(spark, evolved):
    loc, _ev, h1, h2, pre_snap = evolved
    tt = read_iceberg(spark, loc, snapshot_id=pre_snap)
    assert (
        tt.orderBy("event_id").collect() == h1.orderBy("event_id").collect()
    )
    inc = read_iceberg_incremental(spark, loc, pre_snap)
    assert (
        inc.orderBy("event_id").collect() == h2.orderBy("event_id").collect()
    )


def test_mor_and_compaction_migrate_to_current_spec(spark, tmp_path):
    loc = str(tmp_path / "mig")
    ev = spark.read.parquet(f"{SF}/events.parquet").limit(300)
    write_iceberg(ev.coalesce(1), loc, partition_by=["bucket(4, user_id)"])
    t = IcebergLocalTable(loc)
    assert t.evolve_spec(["days(ts)"]) is True
    delta = (
        ev.limit(5)
        .withColumn("value", F.lit(321.0))
        .dropDuplicates(["event_id"])
    )
    merge_upsert_iceberg_mor(spark, loc, delta, "event_id")
    assert read_iceberg(spark, loc).filter("value = 321.0").count() == 5
    compact_iceberg(spark, loc)
    files = IcebergLocalTable(loc).scan()
    # compaction rewrote everything under the NEW spec (incremental
    # layout migration — never a stop-the-world rewrite)
    assert all(f.spec_id == 1 for f in files)
    assert all(f.partition.get("ts_day") is not None for f in files)
    assert read_iceberg(spark, loc).count() == 300
    # append after the migrating compaction still reads (layout grouped)
    write_iceberg(ev.limit(7), loc, mode="append")
    assert read_iceberg(spark, loc).count() == 307


def test_evolution_validation(spark, tmp_path):
    loc = str(tmp_path / "v")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    write_iceberg(df, loc)
    t = IcebergLocalTable(loc)
    with pytest.raises(ValueError):
        t.evolve_spec(["bucket(4, missing_col)"])
    with pytest.raises(NotImplementedError):
        t.evolve_spec(["days(k)"])  # temporal over long
