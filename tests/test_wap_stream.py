"""Streaming write-audit-publish (iceberg_sink(branch=) + wap_publish_stream).

Contract: a stream stages one append commit per micro-batch on a named
branch — invisible to main readers — with the exactly-once replay guard
reading the BRANCH head; publish audits the union of exactly the staged
snapshots' added files and fast-forwards main over all of them in one
metadata commit. A red audit leaves main byte-untouched with the branch
inspectable; a diverged branch refuses to publish rather than dropping
commits; upsert mode refuses branch staging outright.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ner_spark.iceberg.spark_io import (
    iceberg_sink,
    read_iceberg,
    write_iceberg,
)
from ner_spark.iceberg.table import IcebergLocalTable
from ner_spark.plans.wap import wap_publish_stream

_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _turns(spark, conv: str, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.lit(conv).alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit(f"{conv} turn "), F.col("id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_stages_on_branch_then_publishes(spark, tmp_path):
    loc = str(tmp_path / "tx")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    base = _turns(spark, "c_base", 0, 10)
    write_iceberg(base, loc, mode="append")
    head_before = IcebergLocalTable(loc).current_snapshot()["snapshot-id"]

    # two source files → maxFilesPerTrigger=1 forces >=2 micro-batches,
    # i.e. >=2 staged snapshots on the branch
    _turns(spark, "c_s1", 0, 7).coalesce(1).write.mode("append").parquet(src)
    _turns(spark, "c_s2", 0, 5).coalesce(1).write.mode("append").parquet(src)
    q = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(iceberg_sink(loc, branch="ingest-audit"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # staged output is invisible on main, visible on the branch
    t = IcebergLocalTable(loc)
    assert t.current_snapshot()["snapshot-id"] == head_before
    assert read_iceberg(spark, loc).count() == 10
    assert read_iceberg(spark, loc, ref="ingest-audit").count() == 22

    r = wap_publish_stream(spark, loc, "ingest-audit")
    assert r["published"], r["checks"]
    assert r["staged_snapshots"] >= 2
    assert r["staged_rows"] == 12
    assert r["checks"]["append_only"]["ok"]
    assert "key_collision_with_main" in r["checks"]

    t = IcebergLocalTable(loc)
    assert set(t.refs()) == {"main"}
    expect = base.unionByName(_turns(spark, "c_s1", 0, 7)).unionByName(
        _turns(spark, "c_s2", 0, 5)
    )
    assert _rows(read_iceberg(spark, loc)) == _rows(expect)


def test_branch_replay_guard_reads_branch_head(spark, tmp_path):
    loc = str(tmp_path / "tx")
    write_iceberg(_turns(spark, "c_base", 0, 4), loc, mode="append")
    sink = iceberg_sink(loc, branch="st")
    sink(_turns(spark, "c_a", 0, 3), 0)
    # a direct main commit between micro-batches must not confuse the
    # guard: the stream's batch ids live on the branch head, not main's
    write_iceberg(_turns(spark, "c_main2", 0, 2), loc, mode="append")
    sink(_turns(spark, "c_b", 0, 2), 1)
    sink(_turns(spark, "c_b", 0, 2), 1)  # foreachBatch replay → no-op
    sink(_turns(spark, "c_a", 0, 3), 0)  # older replay → no-op
    t = IcebergLocalTable(loc)
    branch_head = next(
        s for s in t.snapshots()
        if s["snapshot-id"] == t.refs()["st"]["snapshot-id"]
    )
    assert branch_head["summary"]["streaming-batch-id"] == "1"
    assert read_iceberg(spark, loc, ref="st").count() == 4 + 3 + 2
    # main moved past the fork point → the branch is diverged; publish
    # must refuse (fast-forward would drop main's commit) rather than
    # silently merging
    with pytest.raises(ValueError, match="ancestor"):
        wap_publish_stream(spark, loc, "st")


def test_red_stream_audit_keeps_branch_main_untouched(spark, tmp_path):
    loc = str(tmp_path / "tx")
    write_iceberg(_turns(spark, "c1", 0, 6), loc, mode="append")
    main_before = _rows(read_iceberg(spark, loc))
    sink = iceberg_sink(loc, branch="st")
    sink(_turns(spark, "c2", 0, 3), 0)
    sink(_turns(spark, "c1", 4, 8), 1)  # turns 4,5 collide with main
    r = wap_publish_stream(spark, loc, "st")
    assert not r["published"]
    assert not r["checks"]["key_collision_with_main"]["ok"]
    t = IcebergLocalTable(loc)
    assert "st" in t.refs()  # kept for inspection
    assert _rows(read_iceberg(spark, loc)) == main_before
    # the audit saw the union of BOTH staged micro-batches
    assert r["staged_rows"] == 7 and r["staged_snapshots"] == 2


def test_replay_after_publish_is_noop(spark, tmp_path):
    """The guard must survive the publish dropping the branch ref: a
    batch replayed across that boundary would otherwise re-commit onto
    a fresh branch fork and duplicate rows at the next publish."""
    loc = str(tmp_path / "tx")
    sink = iceberg_sink(loc, branch="st")
    sink(_turns(spark, "c_a", 0, 3), 0)
    sink(_turns(spark, "c_b", 0, 2), 1)
    assert wap_publish_stream(spark, loc, "st")["published"]
    n_snaps = len(IcebergLocalTable(loc).snapshots())
    sink(_turns(spark, "c_b", 0, 2), 1)  # replay across the publish
    t = IcebergLocalTable(loc)
    assert len(t.snapshots()) == n_snaps  # no-op: no new commit, no branch
    assert "st" not in t.refs()
    # a genuinely NEW batch still lands (on a fresh branch fork)
    sink(_turns(spark, "c_c", 0, 1), 2)
    assert read_iceberg(spark, loc, ref="st").count() == 6
    assert wap_publish_stream(spark, loc, "st")["published"]
    assert read_iceberg(spark, loc).count() == 6


def test_rebase_publish_after_main_advances(spark, tmp_path):
    loc = str(tmp_path / "tx")
    write_iceberg(_turns(spark, "c_base", 0, 4), loc, mode="append")
    sink = iceberg_sink(loc, branch="st")
    sink(_turns(spark, "c_a", 0, 3), 0)
    # main advances while the stream stages → diverged
    write_iceberg(_turns(spark, "c_main2", 0, 2), loc, mode="append",
                  run_id="main2")
    sink(_turns(spark, "c_b", 0, 2), 1)

    r = wap_publish_stream(spark, loc, "st", rebase_on_diverged=True)
    assert r["published"] and r["rebased"], r["checks"]
    t = IcebergLocalTable(loc)
    assert "st" not in t.refs()
    expect = (
        _turns(spark, "c_base", 0, 4)
        .unionByName(_turns(spark, "c_main2", 0, 2))
        .unionByName(_turns(spark, "c_a", 0, 3))
        .unionByName(_turns(spark, "c_b", 0, 2))
    )
    assert _rows(read_iceberg(spark, loc)) == _rows(expect)
    # cherry-picked commits carry provenance + the batch stamp, so the
    # replay guard keeps working after the rebase publish
    picked = [s for s in t.snapshots()
              if "cherry-picked-from" in s["summary"]]
    assert len(picked) == 2
    assert picked[-1]["summary"]["streaming-batch-id"] == "1"
    # the summary reports the real row counts, not the empty files=[]
    assert picked[0]["summary"]["added-records"] == "3"
    sink(_turns(spark, "c_b", 0, 2), 1)  # replay → no-op
    assert len(IcebergLocalTable(loc).snapshots()) == len(t.snapshots())

    # the rebase-published rows must be VISIBLE to lineage consumers:
    # an incremental read from the pre-publish main head returns them
    from ner_spark.iceberg.spark_io import (
        read_iceberg_changelog,
        read_iceberg_incremental,
    )

    pre_publish_head = next(
        s["snapshot-id"] for s in t.snapshots()
        if s["summary"].get("run_id") == "main2"
    )
    staged = _turns(spark, "c_a", 0, 3).unionByName(
        _turns(spark, "c_b", 0, 2)
    )
    inc = read_iceberg_incremental(spark, loc, pre_publish_head)
    assert _rows(inc) == _rows(staged)
    log = read_iceberg_changelog(spark, loc,
                                 from_snapshot_id=pre_publish_head)
    assert _rows(log.drop("_change_type", "_commit_order",
                          "_commit_snapshot_id")) == _rows(staged)
    assert log.where("_change_type = 'delete'").count() == 0


def test_replay_guard_survives_maintenance(spark, tmp_path):
    """The published high-water mark lives in table PROPERTIES, which
    survive snapshot expiry: a checkpoint replay after a maintenance
    window must still no-op even when every stamped snapshot expired."""
    loc = str(tmp_path / "tx")
    sink = iceberg_sink(loc, branch="st")
    sink(_turns(spark, "c_a", 0, 3), 0)
    assert wap_publish_stream(spark, loc, "st")["published"]
    t = IcebergLocalTable(loc)
    assert t.properties()["streaming-batch-id-hwm"] == "0"
    # main gains ordinary commits; maintenance expires aggressively —
    # every stamped snapshot may go, the property stays
    write_iceberg(_turns(spark, "c_m1", 0, 2), loc, mode="append")
    write_iceberg(_turns(spark, "c_m2", 0, 2), loc, mode="append")
    t = IcebergLocalTable(loc)
    t.expire_snapshots(keep_last=1)
    t = IcebergLocalTable(loc)
    assert not any(
        "streaming-batch-id" in s["summary"] for s in t.snapshots()
    )
    n = len(t.snapshots())
    sink(_turns(spark, "c_a", 0, 3), 0)  # replay after maintenance
    assert len(IcebergLocalTable(loc).snapshots()) == n  # no-op
    assert read_iceberg(spark, loc).count() == 7


def test_refused_batch_discard_is_replayable(spark, tmp_path):
    """A refused-and-discarded staging branch must NOT poison re-ingest:
    its stamps die with the branch and the published hwm never rose, so
    the fixed batch re-stages cleanly under a fresh checkpoint."""
    loc = str(tmp_path / "tx")
    write_iceberg(_turns(spark, "c_base", 0, 3), loc, mode="append")
    sink = iceberg_sink(loc, branch="st")
    bad = _turns(spark, "c_base", 0, 2)  # collides with main
    sink(bad, 0)
    sink(_turns(spark, "c_ok", 0, 2), 1)
    r = wap_publish_stream(spark, loc, "st")
    assert not r["published"]
    t = IcebergLocalTable(loc)
    assert "streaming-batch-id-hwm" not in t.properties()
    t.drop_ref("st")  # operator discards the refused batch
    # the producer fixes the feed and restarts with a FRESH checkpoint:
    # batch ids restart at 0 and must not be suppressed
    sink2 = iceberg_sink(loc, branch="st")
    sink2(_turns(spark, "c_fixed", 0, 2), 0)
    sink2(_turns(spark, "c_ok", 0, 2), 1)
    r2 = wap_publish_stream(spark, loc, "st")
    assert r2["published"] and r2["staged_rows"] == 4
    assert read_iceberg(spark, loc).count() == 7
    assert IcebergLocalTable(loc).properties()[
        "streaming-batch-id-hwm"
    ] == "1"


def test_rebase_publish_retry_skips_already_picked(spark, tmp_path):
    """A publish that crashed between cherry-picks must be retryable
    without duplicating the already-applied snapshots' rows."""
    loc = str(tmp_path / "tx")
    write_iceberg(_turns(spark, "c_base", 0, 4), loc, mode="append")
    sink = iceberg_sink(loc, branch="st")
    sink(_turns(spark, "c_a", 0, 3), 0)
    write_iceberg(_turns(spark, "c_main2", 0, 2), loc, mode="append")
    sink(_turns(spark, "c_b", 0, 2), 1)
    # simulate the crash: the first staged snapshot was cherry-picked,
    # then the process died before set_properties/drop_ref
    t = IcebergLocalTable(loc)
    staged0 = min(
        (s for s in t.snapshots()
         if "streaming-batch-id" in s["summary"]),
        key=lambda s: s["sequence-number"],
    )
    t.cherry_pick(staged0["snapshot-id"])
    r = wap_publish_stream(spark, loc, "st", rebase_on_diverged=True)
    assert r["published"] and r["rebased"]
    expect = (
        _turns(spark, "c_base", 0, 4)
        .unionByName(_turns(spark, "c_main2", 0, 2))
        .unionByName(_turns(spark, "c_a", 0, 3))
        .unionByName(_turns(spark, "c_b", 0, 2))
    )
    assert _rows(read_iceberg(spark, loc)) == _rows(expect)  # no dupes


def test_rebase_refused_on_interim_row_delta_or_collision(spark, tmp_path):
    from ner_spark.iceberg.spark_io import delete_iceberg_where

    loc = str(tmp_path / "tx")
    write_iceberg(_turns(spark, "c_base", 0, 4), loc, mode="append")
    sink = iceberg_sink(loc, branch="st")
    sink(_turns(spark, "c_a", 0, 3), 0)
    # a MOR delete lands on main: row deltas don't commute with the
    # staged appends, so rebase must refuse even on a green audit
    delete_iceberg_where(spark, loc, [("turn_idx", "<", 1)])
    with pytest.raises(ValueError, match="do not commute"):
        wap_publish_stream(spark, loc, "st", rebase_on_diverged=True)
    assert "st" in IcebergLocalTable(loc).refs()  # branch kept

    # collision case: main gains the SAME turns the stream staged — the
    # audit (against CURRENT main) goes red before any rebase
    loc2 = str(tmp_path / "tx2")
    write_iceberg(_turns(spark, "c_base", 0, 4), loc2, mode="append")
    sink2 = iceberg_sink(loc2, branch="st")
    sink2(_turns(spark, "c_dup", 0, 3), 0)
    write_iceberg(_turns(spark, "c_dup", 0, 2), loc2, mode="append")
    r = wap_publish_stream(spark, loc2, "st", rebase_on_diverged=True)
    assert not r["published"] and not r["rebased"]
    assert not r["checks"]["key_collision_with_main"]["ok"]


def test_branch_upsert_refused_and_empty_branch_noop(spark, tmp_path):
    with pytest.raises(ValueError, match="append"):
        iceberg_sink("/x", mode="upsert", key="k", branch="st")
    loc = str(tmp_path / "tx")
    write_iceberg(_turns(spark, "c1", 0, 3), loc, mode="append")
    t = IcebergLocalTable(loc)
    t.create_branch("st")  # forked but nothing staged
    r = wap_publish_stream(spark, loc, "st")
    assert not r["published"] and r["staged_snapshots"] == 0
    assert not r["checks"]["staged_nonempty"]["ok"]
    with pytest.raises(ValueError, match="no such branch"):
        wap_publish_stream(spark, loc, "nope")
