"""Row-level changelog reads (read_iceberg_changelog).

Contract: the changelog of (from, to] is a multiset delta — replaying
it onto the starting state reproduces the ending state exactly — and it
is recovered per snapshot from that snapshot's own change files:
appends → inserts, position/equality delete files → delete rows, COW
overwrites → file-diff with carryover rows netted, compaction → nothing.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from ner_spark.iceberg.spark_io import (
    compact_iceberg,
    delete_iceberg_keys,
    delete_iceberg_where,
    merge_upsert_iceberg,
    merge_upsert_iceberg_mor,
    read_iceberg,
    read_iceberg_changelog,
    write_iceberg,
)
from ner_spark.iceberg.table import IcebergLocalTable


def _rows(df, cols):
    return Counter(tuple(r) for r in df.select(*cols).collect())


def _replay(start, log, cols):
    """start state + changelog → end state, as multisets."""
    state = Counter(start)
    ins = _rows(log.where("_change_type = 'insert'"), cols)
    dels = _rows(log.where("_change_type = 'delete'"), cols)
    state.update(ins)
    state.subtract(dels)
    bad = {k: v for k, v in state.items() if v < 0}
    assert not bad, f"changelog deleted rows that never existed: {bad}"
    return +state  # drop zero-count entries


def _orders(spark, lo, hi, price_mul=10.0):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("int").alias("grp"),
        (F.col("id") * price_mul).alias("price"),
    )


COLS = ["k", "grp", "price"]


def test_append_only_changelog_is_inserts(spark, tmp_path):
    loc = str(tmp_path / "t")
    s1 = write_iceberg(_orders(spark, 0, 10), loc, mode="append")
    write_iceberg(_orders(spark, 10, 15), loc, mode="append")
    log = read_iceberg_changelog(spark, loc, from_snapshot_id=s1)
    assert log.where("_change_type = 'delete'").count() == 0
    assert _rows(log, COLS) == _rows(_orders(spark, 10, 15), COLS)
    assert log.select("_commit_order").distinct().count() == 1


def test_mor_deletes_and_merge_emit_row_deltas(spark, tmp_path):
    loc = str(tmp_path / "t")
    write_iceberg(_orders(spark, 0, 20), loc, mode="append")
    base = _rows(read_iceberg(spark, loc), COLS)

    delete_iceberg_where(spark, loc, [("price", "<", 50.0)])  # k in 0..4
    delete_iceberg_keys(
        spark, loc, spark.range(8, 12).select(F.col("id").alias("k"))
    )
    delta = _orders(spark, 14, 18, price_mul=1000.0)
    merge_upsert_iceberg_mor(spark, loc, delta, key="k")

    log = read_iceberg_changelog(spark, loc)
    # commit 1: base inserts; 2: position deletes; 3: equality deletes;
    # 4: MOR merge = delete(live old rows for keys 14..17) + insert(new)
    c2 = log.where("_commit_order = 2")
    assert _rows(c2, COLS) == _rows(_orders(spark, 0, 5), COLS)
    assert c2.select("_change_type").distinct().collect()[0][0] == "delete"
    c3 = log.where("_commit_order = 3")
    assert sorted(r["k"] for r in c3.collect()) == [8, 9, 10, 11]
    c4 = log.where("_commit_order = 4")
    old = _rows(c4.where("_change_type = 'delete'"), COLS)
    assert old == _rows(_orders(spark, 14, 18), COLS)
    new = _rows(c4.where("_change_type = 'insert'"), COLS)
    assert new == _rows(delta, COLS)

    # replay property over the full range
    end = _replay(Counter(), log, COLS)
    assert end == _rows(read_iceberg(spark, loc), COLS)
    # and over a sub-range starting mid-history
    t = IcebergLocalTable(loc)
    first = min(t.snapshots(), key=lambda s: s["sequence-number"])
    sub = read_iceberg_changelog(
        spark, loc, from_snapshot_id=first["snapshot-id"]
    )
    assert _replay(base, sub, COLS) == _rows(read_iceberg(spark, loc), COLS)


def test_cow_overwrite_nets_carryovers(spark, tmp_path):
    loc = str(tmp_path / "t")
    s1 = write_iceberg(_orders(spark, 0, 30), loc, mode="append")
    # COW merge rewrites whole files to change 3 rows + insert 2
    delta = _orders(spark, 27, 32, price_mul=999.0)
    merge_upsert_iceberg(spark, loc, delta, key="k")

    log = read_iceberg_changelog(spark, loc, from_snapshot_id=s1)
    dels = _rows(log.where("_change_type = 'delete'"), COLS)
    ins = _rows(log.where("_change_type = 'insert'"), COLS)
    # only genuinely changed rows survive the netting: 3 updates
    assert dels == _rows(_orders(spark, 27, 30), COLS)
    assert ins == _rows(delta, COLS)
    # raw file-level diff (no netting) re-emits the carryover rows
    raw = read_iceberg_changelog(
        spark, loc, from_snapshot_id=s1, net_carryovers=False
    )
    assert raw.count() > log.count()
    assert _replay(_rows(_orders(spark, 0, 30), COLS), raw, COLS) == _rows(
        read_iceberg(spark, loc), COLS
    )


def test_compaction_emits_nothing_and_replay_crosses_it(spark, tmp_path):
    loc = str(tmp_path / "t")
    write_iceberg(_orders(spark, 0, 10), loc, mode="append")
    write_iceberg(_orders(spark, 10, 20), loc, mode="append")
    delete_iceberg_where(spark, loc, [("k", "<", 3)])
    compact_iceberg(spark, loc)  # folds the delete, replace snapshot
    write_iceberg(_orders(spark, 20, 22), loc, mode="append")

    log = read_iceberg_changelog(spark, loc)
    t = IcebergLocalTable(loc)
    replace_ids = {
        s["snapshot-id"] for s in t.snapshots()
        if s["summary"]["operation"] == "replace"
    }
    logged_ids = {
        r["_commit_snapshot_id"]
        for r in log.select("_commit_snapshot_id").distinct().collect()
    }
    assert replace_ids and not (replace_ids & logged_ids)
    assert _replay(Counter(), log, COLS) == _rows(
        read_iceberg(spark, loc), COLS
    )


def test_branch_commits_never_leak_into_lineage_reads(spark, tmp_path):
    """A commit staged on a branch gets an interleaved sequence number;
    incremental, changelog, and CDC key-recovery reads of MAIN must
    walk the ancestry chain and exclude it."""
    from ner_spark.iceberg.spark_io import (
        changed_keys_iceberg,
        read_iceberg_incremental,
        write_iceberg,
    )
    from ner_spark.iceberg.table import IcebergLocalTable

    loc = str(tmp_path / "t")
    s1 = write_iceberg(_orders(spark, 0, 10), loc, mode="append")
    # staged on a branch BETWEEN two main commits: its sequence number
    # interleaves with main's
    write_iceberg(_orders(spark, 100, 105), loc, mode="append", branch="st")
    write_iceberg(_orders(spark, 10, 20), loc, mode="append")

    inc = read_iceberg_incremental(spark, loc, s1)
    assert _rows(inc, COLS) == _rows(_orders(spark, 10, 20), COLS)
    log = read_iceberg_changelog(spark, loc, from_snapshot_id=s1)
    assert _rows(log, COLS) == _rows(_orders(spark, 10, 20), COLS)
    assert log.where("_change_type = 'delete'").count() == 0
    keys = {r["k"] for r in changed_keys_iceberg(spark, loc, s1, "k")
            .collect()}
    assert keys == set(range(10, 20))
    t = IcebergLocalTable(loc)
    assert t.operations_between(s1) == {"append"}
    # a from-snapshot on a different lineage refuses instead of
    # guessing a sequence window
    st_head = t.refs()["st"]["snapshot-id"]
    with pytest.raises(ValueError, match="not an ancestor"):
        read_iceberg_changelog(spark, loc, from_snapshot_id=st_head)


def test_changelog_range_validation(spark, tmp_path):
    loc = str(tmp_path / "t")
    s1 = write_iceberg(_orders(spark, 0, 5), loc, mode="append")
    with pytest.raises(ValueError, match="not found"):
        read_iceberg_changelog(spark, loc, from_snapshot_id=123)
    # empty range: from == to
    log = read_iceberg_changelog(
        spark, loc, from_snapshot_id=s1, to_snapshot_id=s1
    )
    assert log.count() == 0
    assert "_change_type" in log.columns
