"""Iceberg v2 merge-on-read row deltas (ner_spark.iceberg, SURVEY.md §4.4).

Position deletes (content=1) and equality deletes (content=2) per the
public spec: a position delete names (file_path, pos) ordinals of a data
file; an equality delete matches rows on its equality_ids columns in data
files with a STRICTLY smaller sequence number, nulls matching nulls.
Differential strategy mirrors the rest of the iceberg suite: every MOR
read is checked against a plain-Spark recompute of the same logical
frame, and the MOR merge is checked against the copy-on-write merge on
identical inputs.
"""

from __future__ import annotations

import pytest

from ner_spark.iceberg import avro_io
from ner_spark.iceberg.spark_io import (
    compact_iceberg,
    delete_iceberg_keys,
    delete_iceberg_where,
    merge_upsert_iceberg,
    merge_upsert_iceberg_mor,
    read_iceberg,
    read_iceberg_incremental,
    write_iceberg,
)
from ner_spark.iceberg.table import IcebergLocalTable


def _ids(spark, loc, **kw):
    return sorted(r["id"] for r in read_iceberg(spark, loc, **kw).collect())


def test_position_delete_where(spark, tmp_path):
    loc = str(tmp_path / "pos")
    df = spark.range(0, 100).selectExpr("id", "id % 7 as bucket")
    s1 = write_iceberg(df, loc)
    t = IcebergLocalTable(loc)
    data_before = {f.path for f in t.scan()}

    s2 = delete_iceberg_where(spark, loc, [("bucket", "=", 3)])
    assert s2 is not None and s2 != s1
    # logical delete, physical files untouched (the 100-TB point)
    t = IcebergLocalTable(loc)
    assert {f.path for f in t.scan()} == data_before
    snap = t.current_snapshot()
    assert snap["summary"]["operation"] == "delete"
    assert int(snap["summary"]["added-delete-records"]) == len(
        [i for i in range(100) if i % 7 == 3]
    )
    assert _ids(spark, loc) == [i for i in range(100) if i % 7 != 3]
    # time travel composes: pre-delete snapshot still shows every row
    assert _ids(spark, loc, snapshot_id=s1) == list(range(100))
    # delete files live in a delete manifest, never a data manifest
    _, _, manifests = avro_io.read_container(snap["manifest-list"])
    assert sorted(m["content"] for m in manifests) == [0, 1]
    # residual filters compose with the MOR subtraction
    assert _ids(spark, loc, filters=[("id", "<", 10)]) == [
        i for i in range(10) if i % 7 != 3
    ]


def test_position_delete_noop_and_idempotence(spark, tmp_path):
    loc = str(tmp_path / "pos_noop")
    write_iceberg(spark.range(0, 10).selectExpr("id"), loc)
    n_snaps = len(IcebergLocalTable(loc).snapshots())
    # nothing matches → no snapshot at all, not an empty one
    assert delete_iceberg_where(spark, loc, [("id", ">=", 99)]) is None
    assert len(IcebergLocalTable(loc).snapshots()) == n_snaps
    # the same DELETE twice: second pass re-marks already-dead ordinals,
    # the anti-join is idempotent
    delete_iceberg_where(spark, loc, [("id", "<", 3)])
    delete_iceberg_where(spark, loc, [("id", "<", 3)])
    assert _ids(spark, loc) == list(range(3, 10))


def test_equality_delete_strict_sequence(spark, tmp_path):
    """The v2 rule that makes single-commit MERGE sound: an equality
    delete only matches data rows with a strictly SMALLER sequence."""
    loc = str(tmp_path / "eq")
    write_iceberg(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id bigint, v string"
        ),
        loc,
    )
    keys = spark.createDataFrame([(2,)], "id bigint")
    delete_iceberg_keys(spark, loc, keys)
    assert _ids(spark, loc) == [1, 3]
    # rows appended AFTER the delete carry a larger sequence → survive
    write_iceberg(
        spark.createDataFrame([(2, "b2")], "id bigint, v string"),
        loc,
        mode="append",
    )
    rows = {r["id"]: r["v"] for r in read_iceberg(spark, loc).collect()}
    assert rows == {1: "a", 2: "b2", 3: "c"}


def test_equality_delete_null_matches_null(spark, tmp_path):
    loc = str(tmp_path / "eqnull")
    write_iceberg(
        spark.createDataFrame(
            [(1, "x"), (2, None), (3, None), (4, "y")], "id bigint, k string"
        ),
        loc,
    )
    delete_iceberg_keys(
        spark, loc, spark.createDataFrame([(None,)], "k string")
    )
    assert _ids(spark, loc) == [1, 4]
    # empty key set → no-op, no snapshot
    n = len(IcebergLocalTable(loc).snapshots())
    assert (
        delete_iceberg_keys(
            spark, loc, spark.createDataFrame([], "k string")
        )
        is None
    )
    assert len(IcebergLocalTable(loc).snapshots()) == n


def test_mor_merge_matches_copy_on_write(spark, tmp_path):
    """Differential: MOR merge and COW merge are the same logical MERGE —
    identical inputs must read back as identical frames."""
    base = spark.createDataFrame(
        [(i, f"v{i}", i % 3) for i in range(50)], "id bigint, v string, p int"
    )
    delta = spark.createDataFrame(
        [(5, "V5", 2), (7, "V7", 1), (100, "V100", 0)],
        "id bigint, v string, p int",
    )
    mor, cow = str(tmp_path / "mor"), str(tmp_path / "cow")
    for loc in (mor, cow):
        write_iceberg(base, loc, partition_by=["p"])
    merge_upsert_iceberg_mor(spark, mor, delta, key="id")
    merge_upsert_iceberg(spark, cow, delta, key="id")
    got = {
        loc: sorted(
            (r["id"], r["v"], r["p"])
            for r in read_iceberg(spark, loc).collect()
        )
        for loc in (mor, cow)
    }
    assert got[mor] == got[cow]
    # key 5's pre-merge row is gone, its merged row present
    assert (5, "v5", 2) not in got[mor] and (5, "V5", 2) in got[mor]
    # MOR committed ONE atomic snapshot carrying both halves
    t = IcebergLocalTable(mor)
    snap = t.current_snapshot()
    assert snap["summary"]["operation"] == "delete"
    assert snap["summary"]["merge-mode"] == "merge-on-read"
    assert int(snap["summary"]["added-data-files"]) >= 1
    assert int(snap["summary"]["added-delete-files"]) >= 1
    # re-applying the same delta is logically idempotent
    merge_upsert_iceberg_mor(spark, mor, delta, key="id")
    assert (
        sorted(
            (r["id"], r["v"], r["p"])
            for r in read_iceberg(spark, mor).collect()
        )
        == got[cow]
    )


def test_compaction_folds_deletes(spark, tmp_path):
    loc = str(tmp_path / "fold")
    write_iceberg(spark.range(0, 40).selectExpr("id"), loc)
    delete_iceberg_where(spark, loc, [("id", "<", 5)])
    delete_iceberg_keys(spark, loc, spark.createDataFrame([(10,)], "id bigint"))
    want = [i for i in range(40) if i >= 5 and i != 10]
    assert _ids(spark, loc) == want

    compact_iceberg(spark, loc, target_file_bytes=1 << 30)
    t = IcebergLocalTable(loc)
    snap = t.current_snapshot()
    assert snap["summary"]["operation"] == "replace"
    # the replace snapshot carries NO delete manifests — deltas folded in
    assert t.scan_deletes() == []
    _, _, manifests = avro_io.read_container(snap["manifest-list"])
    assert all(m["content"] == 0 for m in manifests)
    assert _ids(spark, loc) == want
    assert int(snap["summary"]["total-delete-files"]) == 0


def test_incremental_refuses_to_cross_delete(spark, tmp_path):
    """Row deltas invalidate append-only incremental consumption — the
    reader must say so rather than silently replay appends minus nothing."""
    loc = str(tmp_path / "inc")
    s1 = write_iceberg(spark.range(0, 10).selectExpr("id"), loc)
    write_iceberg(spark.range(10, 20).selectExpr("id"), loc, mode="append")
    assert read_iceberg_incremental(spark, loc, s1).count() == 10
    delete_iceberg_where(spark, loc, [("id", "=", 0)])
    with pytest.raises(ValueError, match="delete snapshot"):
        read_iceberg_incremental(spark, loc, s1)


def test_commit_validates_delete_files(tmp_path, spark):
    loc = str(tmp_path / "val")
    write_iceberg(spark.range(0, 3).selectExpr("id"), loc)
    t = IcebergLocalTable(loc)
    from ner_spark.iceberg.table import DataFile

    with pytest.raises(ValueError, match="needs delete_files"):
        t.commit([], operation="delete", delete_files=[])
    bad = DataFile(path="x", record_count=1, file_size=1, partition={})
    with pytest.raises(ValueError, match="content 1"):
        t.commit([], operation="delete", delete_files=[bad])
    eq_no_ids = DataFile(
        path="x", record_count=1, file_size=1, partition={}, content=2
    )
    with pytest.raises(ValueError, match="equality_ids"):
        t.commit([], operation="delete", delete_files=[eq_no_ids])
    with pytest.raises(ValueError, match="require operation"):
        t.commit([], operation="append", delete_files=[bad])


def test_expire_keeps_live_delete_files(spark, tmp_path):
    """Snapshot expiry must treat delete files like data files: still-
    referenced ones survive, orphaned ones go."""
    import os

    loc = str(tmp_path / "exp")
    write_iceberg(spark.range(0, 20).selectExpr("id"), loc)
    delete_iceberg_where(spark, loc, [("id", "<", 4)])
    t = IcebergLocalTable(loc)
    live_dels = [f.path for f in t.scan_deletes()]
    assert live_dels
    t.expire_snapshots(keep_last=1)
    assert all(os.path.exists(p) for p in live_dels)
    assert _ids(spark, loc) == list(range(4, 20))
    # compact (folds deletes), then expire: the delete files are now
    # referenced by no kept snapshot and get removed
    compact_iceberg(spark, loc, target_file_bytes=1 << 30)
    IcebergLocalTable(loc).expire_snapshots(keep_last=1)
    assert not any(os.path.exists(p) for p in live_dels)
    assert _ids(spark, loc) == list(range(4, 20))


def test_streaming_upsert_sink_exactly_once(spark, tmp_path):
    """mode='upsert' CDC sink: each batch is one atomic MOR merge; the
    table converges to last-write-wins per key, replayed batches are
    no-ops, and the whole run never rewrites a base data file."""
    from ner_spark.iceberg.spark_io import iceberg_sink

    loc = str(tmp_path / "cdc")
    sink = iceberg_sink(loc, mode="upsert", key="id")
    b0 = spark.createDataFrame(
        [(1, "a0"), (2, "b0"), (3, "c0")], "id bigint, v string"
    )
    b1 = spark.createDataFrame(
        [(2, "b1"), (4, "d1")], "id bigint, v string"
    )
    b2 = spark.createDataFrame(
        [(2, "b2"), (1, "a2"), (5, "e2")], "id bigint, v string"
    )
    sink(b0, 0)
    sink(b1, 1)
    sink(b2, 2)
    want = {1: "a2", 2: "b2", 3: "c0", 4: "d1", 5: "e2"}
    got = {r["id"]: r["v"] for r in read_iceberg(spark, loc).collect()}
    assert got == want
    # at-least-once replay (same or older batch id) commits nothing
    t = IcebergLocalTable(loc)
    n = len(t.snapshots())
    sink(b2, 2)
    sink(b1, 1)
    assert len(IcebergLocalTable(loc).snapshots()) == n
    assert {r["id"]: r["v"] for r in read_iceberg(spark, loc).collect()} == want
    # MOR promise: batch 0's data file was never rewritten
    ops = [s["summary"]["operation"] for s in IcebergLocalTable(loc).snapshots()]
    assert ops == ["append", "delete", "delete"]
    # maintenance: fold the CDC deltas, contents unchanged
    compact_iceberg(spark, loc, target_file_bytes=1 << 30)
    assert IcebergLocalTable(loc).scan_deletes() == []
    assert {r["id"]: r["v"] for r in read_iceberg(spark, loc).collect()} == want


def test_streaming_upsert_sink_end_to_end(spark, tmp_path):
    """A real writeStream → foreachBatch(upsert sink) run: the table
    equals a last-write-wins recompute of the CDC feed, across a
    checkpoint restart."""
    import pyspark.sql.functions as F

    from ner_spark.iceberg.spark_io import iceberg_sink

    src = str(tmp_path / "src")
    loc = str(tmp_path / "cdc_e2e")
    ckpt = str(tmp_path / "ckpt")
    # CDC feed: seq breaks ties; key collisions across files
    feeds = [
        [(i, f"v{i}@0", i) for i in range(20)],
        [(i, f"v{i}@1", 100 + i) for i in range(10, 25)],
    ]
    for n, rows in enumerate(feeds):
        spark.createDataFrame(
            rows, "id bigint, v string, seqno bigint"
        ).coalesce(1).write.mode("append").parquet(src)

    def run():
        q = (
            spark.readStream.schema("id bigint, v string, seqno bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(iceberg_sink(loc, mode="upsert", key="id"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    # last-write-wins recompute straight from the feed files
    raw = spark.read.parquet(src)
    want = {
        r["id"]: r["v"]
        for r in raw.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("id")
                .orderBy(F.desc("seqno"))
            ),
        )
        .where("rn = 1")
        .collect()
    }
    got = {r["id"]: r["v"] for r in read_iceberg(spark, loc).collect()}
    assert got == want and len(got) == 25
    # restart on the same checkpoint, no new data → no new snapshots
    n = len(IcebergLocalTable(loc).snapshots())
    run()
    assert len(IcebergLocalTable(loc).snapshots()) == n
    # new CDC file arrives → picked up incrementally, still LWW
    spark.createDataFrame(
        [(0, "v0@2", 1000), (30, "v30@2", 1000)],
        "id bigint, v string, seqno bigint",
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    got = {r["id"]: r["v"] for r in read_iceberg(spark, loc).collect()}
    assert got[0] == "v0@2" and got[30] == "v30@2" and len(got) == 26


def test_empty_delta_leaves_sequence_free(spark, tmp_path):
    """An empty row-delta no-op must not strand a ``seq=N`` directory:
    the next commit recomputes the same sequence number and its
    errorifexists write needs the path free."""
    loc = str(tmp_path / "seqfree")
    write_iceberg(spark.range(0, 10).selectExpr("id"), loc)
    empty = spark.createDataFrame([], "id bigint")
    assert delete_iceberg_keys(spark, loc, empty) is None
    # empty MOR merge: writes (then must clean) BOTH the deletes/ and
    # data/ side of the would-be commit
    merge_upsert_iceberg_mor(spark, loc, empty, key="id")
    assert delete_iceberg_where(spark, loc, [("id", ">=", 99)]) is None
    # the same sequence number must now commit cleanly, all kinds
    write_iceberg(spark.range(10, 15).selectExpr("id"), loc, mode="append")
    delete_iceberg_where(spark, loc, [("id", "<", 2)])
    merge_upsert_iceberg_mor(
        spark, loc,
        spark.createDataFrame([(2,)], "id bigint"), key="id",
    )
    assert _ids(spark, loc) == list(range(2, 15))
    # and the streaming sink survives an empty micro-batch mid-feed
    sloc = str(tmp_path / "seqfree_sink")
    sink = iceberg_sink_upsert = __import__(
        "ner_spark.iceberg.spark_io", fromlist=["iceberg_sink"]
    ).iceberg_sink(sloc, mode="upsert", key="id")
    sink(spark.createDataFrame([(1, "a")], "id bigint, v string"), 0)
    sink(spark.createDataFrame([], "id bigint, v string"), 1)
    sink(spark.createDataFrame([(2, "b")], "id bigint, v string"), 2)
    assert _ids(spark, sloc) == [1, 2]


def test_upsert_sink_intra_batch_duplicates(spark, tmp_path):
    """Several CDC events for one key INSIDE one micro-batch: the sink
    reduces to one row per key before the merge — last-per-``order_by``
    when given, exactly-one otherwise — because same-commit rows cannot
    be ordered by the strict-sequence rule."""
    from ner_spark.iceberg.spark_io import iceberg_sink

    loc = str(tmp_path / "dup")
    sink = iceberg_sink(loc, mode="upsert", key="id", order_by="seqno")
    b0 = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (2, "x", 1)],
        "id bigint, v string, seqno bigint",
    )
    sink(b0, 0)
    got = {r["id"]: r["v"] for r in read_iceberg(spark, loc).collect()}
    assert got == {1: "b", 2: "x"}
    # later event listed FIRST in the frame still wins by seqno
    b1 = spark.createDataFrame(
        [(1, "c", 5), (1, "d", 4)], "id bigint, v string, seqno bigint"
    )
    sink(b1, 1)
    got = {r["id"]: r["v"] for r in read_iceberg(spark, loc).collect()}
    assert got == {1: "c", 2: "x"}
    # no duplicate rows survive even after compaction folds the deltas
    compact_iceberg(spark, loc, target_file_bytes=1 << 30)
    assert read_iceberg(spark, loc).count() == 2

    # without order_by: exactly one (arbitrary) row per key
    loc2 = str(tmp_path / "dup2")
    sink2 = iceberg_sink(loc2, mode="upsert", key="id")
    sink2(b0, 0)
    cnt = (
        read_iceberg(spark, loc2).groupBy("id").count()
        .agg({"count": "max"}).collect()[0][0]
    )
    assert cnt == 1
    # order_by outside upsert mode is rejected loudly
    with pytest.raises(ValueError, match="order_by"):
        iceberg_sink(loc2, order_by="seqno")
