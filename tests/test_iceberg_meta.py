"""Metadata inspection tables + orphan file cleanup (SURVEY.md §4.4).

Differential strategy: every metadata-table number is recomputed from an
independent source — snapshots/files totals against actual reads of the
data, partitions against a plain groupBy of the frame that was written,
history against the commit sequence the test itself performed.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ner_spark.iceberg.meta_tables import (
    files_table,
    history_table,
    partitions_table,
    refs_table,
    snapshots_table,
)
from ner_spark.iceberg.spark_io import read_iceberg, write_iceberg
from ner_spark.iceberg.table import IcebergLocalTable


def _orders(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id as k",
        "case cast(id % 3 as int) when 0 then 'A' when 1 then 'B' "
        "else 'C' end as status",
        "cast(id * 2.5 as double) as v",
    )


def test_meta_tables_cross_check(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    s1 = write_iceberg(_orders(spark, 0, 90).coalesce(1), loc,
                       partition_by=["status"])
    s2 = write_iceberg(_orders(spark, 90, 120).coalesce(1), loc,
                       mode="append")
    t = IcebergLocalTable(loc)
    t.create_tag("v1", s1)

    snaps = {r["snapshot_id"]: r for r in snapshots_table(spark, loc).collect()}
    assert set(snaps) == {s1, s2}
    assert snaps[s1]["parent_id"] is None and snaps[s2]["parent_id"] == s1
    assert snaps[s1]["operation"] == "overwrite"
    assert snaps[s2]["operation"] == "append"
    # summary totals match an actual read of each snapshot
    assert snaps[s2]["total_records"] == read_iceberg(spark, loc).count() == 120
    assert snaps[s2]["added_records"] == 30

    files = files_table(spark, loc).collect()
    assert all(f["content"] == 0 for f in files)
    assert sum(f["record_count"] for f in files) == 120
    # every listed file exists on disk and carries its partition value
    for f in files:
        assert os.path.exists(f["file_path"])
        assert set(f["partition"]) == {"status"}

    # partitions rollup == groupBy of what was written (1 file/partition
    # per coalesced commit → 2 commits → 2 files per status)
    parts = {r["partition"]: r for r in partitions_table(spark, loc).collect()}
    want = {
        f"status={r['status']}": r["n"]
        for r in _orders(spark, 0, 120).groupBy("status")
        .agg(F.count("*").alias("n")).collect()
    }
    assert {p: r["record_count"] for p, r in parts.items()} == want
    assert all(r["file_count"] == 2 for r in parts.values())

    refs = {r["name"]: r for r in refs_table(spark, loc).collect()}
    assert refs["main"]["snapshot_id"] == s2
    assert refs["v1"]["type"] == "tag" and refs["v1"]["snapshot_id"] == s1

    hist = history_table(spark, loc).collect()
    assert [h["snapshot_id"] for h in hist] == [s1, s2]
    assert all(h["is_live"] and h["is_current_ancestor"] for h in hist)

    # a branch commit must NOT appear in main's history
    write_iceberg(_orders(spark, 200, 210), loc, mode="append", branch="aud")
    assert len(history_table(spark, loc).collect()) == 2
    # files at the branch head include the staged rows
    assert (
        sum(f["record_count"] for f in files_table(spark, loc, ref="aud")
            .where("content = 0").collect())
        == 130
    )


def test_remove_orphan_files(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    write_iceberg(_orders(spark, 0, 50).coalesce(1), loc,
                  partition_by=["status"])
    t = IcebergLocalTable(loc)

    # crash debris: parquet in the data dir no snapshot references
    stray = os.path.join(loc, "data", "seq=99", "status=A")
    os.makedirs(stray)
    stray_file = os.path.join(stray, "part-crash.parquet")
    with open(stray_file, "wb") as f:
        f.write(b"PAR1 not a real file")

    before = read_iceberg(spark, loc).count()
    dead = t.remove_orphan_files()
    assert dead == [stray_file]
    assert not os.path.exists(stray_file)
    # live data untouched
    assert read_iceberg(spark, loc).count() == before == 50

    # a dropped staging branch's files survive until its snapshot expires
    write_iceberg(_orders(spark, 50, 60), loc, mode="append", branch="aud")
    t.drop_ref("aud")
    assert t.remove_orphan_files() == []  # snapshot still live → referenced
    t.expire_snapshots(keep_last=1)
    assert t.remove_orphan_files() == []  # expiry already deleted them
    assert read_iceberg(spark, loc).count() == 50
