"""Iceberg refs: branches, tags, write-audit-publish (SURVEY.md §4.4).

The WAP contract under test: a commit staged on an audit branch is
invisible to main-branch readers until ``fast_forward('main', audit)``
publishes it; tags pin snapshots against ``expire_snapshots``; a
diverged branch refuses to fast-forward rather than dropping commits.
Every read goes through the public ``read_iceberg(ref=...)`` facade and
is differentially compared against a plain-Spark recompute of the same
rows.
"""

from __future__ import annotations

import os

import pytest

from ner_spark.iceberg.spark_io import read_iceberg, write_iceberg
from ner_spark.iceberg.table import IcebergLocalTable


def _turns(spark, lo, hi, tag):
    return spark.range(lo, hi).selectExpr(
        "concat('c', cast(id % 7 as string)) as conv_id",
        "cast(id as int) as turn_idx",
        "case when id % 3 = 0 then 'user' else 'assistant' end as role",
        f"concat('{tag} turn ', id) as text",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def tbl(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    s1 = write_iceberg(_turns(spark, 0, 50, "base"), loc,
                       partition_by=["conv_id"], run_id="r1")
    return loc, s1


def test_wap_stage_audit_publish(spark, tbl):
    loc, s1 = tbl
    base = _rows(read_iceberg(spark, loc))

    staged = _turns(spark, 50, 80, "staged")
    write_iceberg(staged, loc, mode="append", run_id="r2", branch="audit")

    # main readers are untouched; the audit branch sees base + staged
    assert _rows(read_iceberg(spark, loc)) == base
    want = sorted(base + _rows(staged))
    assert _rows(read_iceberg(spark, loc, ref="audit")) == want

    t = IcebergLocalTable(loc)
    assert t.refs()["audit"]["type"] == "branch"
    assert t.current_snapshot()["snapshot-id"] == s1
    log_before = len(t.metadata()["snapshot-log"])

    # audit passes → publish
    head = t.fast_forward("main", "audit")
    assert _rows(read_iceberg(spark, loc)) == want
    assert t.current_snapshot()["snapshot-id"] == head
    assert len(t.metadata()["snapshot-log"]) == log_before + 1
    # idempotent: already at target
    assert t.fast_forward("main", "audit") == head


def test_branch_accumulates_commits(spark, tbl):
    loc, _ = tbl
    write_iceberg(_turns(spark, 50, 60, "a"), loc, mode="append", branch="b")
    write_iceberg(_turns(spark, 60, 70, "b"), loc, mode="append", branch="b")
    got = read_iceberg(spark, loc, ref="b")
    assert got.count() == 70
    assert read_iceberg(spark, loc).count() == 50


def test_fast_forward_refuses_diverged(spark, tbl):
    loc, _ = tbl
    write_iceberg(_turns(spark, 50, 60, "a"), loc, mode="append", branch="aud")
    # main moves independently → audit head no longer descends from main
    write_iceberg(_turns(spark, 90, 95, "m"), loc, mode="append")
    with pytest.raises(ValueError, match="not an ancestor"):
        IcebergLocalTable(loc).fast_forward("main", "aud")
    # the staged branch is still readable for manual reconciliation
    assert read_iceberg(spark, loc, ref="aud").count() == 60


def test_tag_pins_snapshot_against_expiry(spark, tbl):
    loc, s1 = tbl
    t = IcebergLocalTable(loc)
    t.create_tag("v1", s1)
    write_iceberg(_turns(spark, 0, 10, "over"), loc, mode="overwrite")

    assert read_iceberg(spark, loc, ref="v1").count() == 50
    assert read_iceberg(spark, loc).count() == 10

    # expiry keeps the tagged snapshot and its files
    dead = t.expire_snapshots(keep_last=1)
    assert read_iceberg(spark, loc, ref="v1").count() == 50
    assert {s["snapshot-id"] for s in t.snapshots()} >= {s1}

    # dropping the tag releases it
    t.drop_ref("v1")
    dead2 = t.expire_snapshots(keep_last=1)
    assert dead2  # the base files are now unreferenced
    for p in dead + dead2:
        assert not os.path.exists(p)
    with pytest.raises(ValueError, match="not found"):
        read_iceberg(spark, loc, ref="v1")


def test_ref_invariants(spark, tbl):
    loc, s1 = tbl
    t = IcebergLocalTable(loc)
    t.create_tag("v1", s1)
    with pytest.raises(ValueError, match="immutable"):
        write_iceberg(_turns(spark, 0, 5, "x"), loc, mode="append", branch="v1")
    with pytest.raises(ValueError, match="immutable"):
        t.fast_forward("v1", "main")
    with pytest.raises(ValueError, match="already exists"):
        t.create_tag("v1")
    with pytest.raises(ValueError, match="cannot drop"):
        t.drop_ref("main")
    with pytest.raises(ValueError, match="not found"):
        t.fast_forward("main", "ghost")
    with pytest.raises(ValueError, match="exclusive"):
        t.scan(snapshot_id=s1, ref="v1")
    # fast_forward creates the target branch when absent
    t.create_branch("dev")
    write_iceberg(_turns(spark, 50, 55, "d"), loc, mode="append", branch="dev")
    t.fast_forward("release", "dev")
    assert t.refs()["release"]["snapshot-id"] == t.refs()["dev"]["snapshot-id"]
