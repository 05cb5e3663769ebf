"""Write-audit-publish ingest for transcript tables (SURVEY.md §4.4).

The 100-TB-safe landing pattern the north rule's production loop needs:
a transcript batch is committed to a per-batch AUDIT BRANCH of the
Iceberg table, the audit validates the rows that actually reached disk
(not the DataFrame the producer claims it wrote), and only a fully green
audit fast-forwards main. Readers of main — the incremental KG tick
included — can never observe a half-validated batch; a refused batch
stays readable on its branch for inspection and costs one ``drop_ref``
to discard.

Audit checks (all computed in ONE Spark job over the staged delta, plus
one pruned collision probe against main):

- ``schema_nulls``: conv_id / turn_idx / text / ts must be non-null —
  the per-turn text-equality invariant is meaningless on null keys.
- ``dup_keys_in_batch``: (conv_id, turn_idx) unique within the batch —
  duplicate turn ordinals break stable turn ordering.
- ``key_collision_with_main``: the batch must not re-append turns main
  already has (corrections go through the MOR upsert path instead).
  The probe reads main with a pushed-down ``conv_id IN`` filter, so on
  a ``bucket(N, conv_id)`` layout it scans only the touched buckets —
  O(batch), not O(table).
- caller-supplied ``extra_checks``: callables ``DataFrame -> (ok,
  detail)`` over the staged delta (e.g. language-ID drift, PII scans).

Publish is ``fast_forward('main', branch)`` — O(1) metadata regardless
of table size — followed by dropping the staging branch. Divergence
(another writer advanced main since the fork) refuses at publish rather
than dropping commits, preserving the single-writer contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ner_spark.iceberg.spark_io import (
    read_iceberg,
    read_iceberg_snapshot_adds,
    write_iceberg,
)
from ner_spark.iceberg.table import IcebergLocalTable

_KEY = ("conv_id", "turn_idx")


def wap_ingest(
    spark: SparkSession,
    batch: DataFrame,
    transcripts_loc: str,
    batch_id: str,
    extra_checks: list[Callable[[DataFrame], tuple[bool, str]]] | None = None,
    max_collision_probe_keys: int = 10_000,
    partition_by: tuple[str, ...] = ("days(ts)", "bucket(16, conv_id)"),
) -> dict:
    """Stage ``batch`` on branch ``audit-{batch_id}``, audit, publish.

    ``partition_by`` applies only when the batch CREATES the table; the
    default is the scale-sane transcript layout — temporal dirs bound
    every incremental scan to the new days and conv_id buckets keep
    per-conversation repair to 1/N of the data. (Identity
    ``conv_id`` partitioning would create one directory per
    conversation: pathological at any real conversation count.)

    Returns ``{"published": bool, "branch": str, "snapshot_id": int,
    "staged_rows": int, "checks": {name: {"ok": bool, "detail": str}}}``.
    On a red audit, main is untouched and the branch is KEPT for
    inspection (``IcebergLocalTable.drop_ref`` discards it); on green,
    main is fast-forwarded and the branch is dropped.
    """
    branch = f"audit-{batch_id}"
    t = IcebergLocalTable(transcripts_loc)
    if t.exists() and branch in t.refs():
        raise ValueError(
            f"ref {branch!r} already exists (a refused batch under "
            "investigation?); drop_ref it before re-staging"
        )
    base_head = (
        (t.current_snapshot() or {}).get("snapshot-id") if t.exists() else None
    )
    staged_id = write_iceberg(
        batch, transcripts_loc, mode="append", branch=branch,
        run_id=batch_id, partition_by=list(partition_by),
    )
    t = IcebergLocalTable(transcripts_loc)

    # audit what reached DISK: exactly the files the staged snapshot
    # added, from its own manifest list — main never references them,
    # and an earlier refused batch's orphaned snapshot cannot leak in
    staged = read_iceberg_snapshot_adds(spark, transcripts_loc, staged_id)

    checks, staged_rows = _audit_delta(
        spark, transcripts_loc, staged, base_head,
        extra_checks, max_collision_probe_keys,
    )

    published = all(c["ok"] for c in checks.values())
    if published:
        t.fast_forward("main", branch)
        t.drop_ref(branch)
    return {
        "published": published,
        "branch": branch,
        "snapshot_id": staged_id,
        "staged_rows": staged_rows,
        "checks": checks,
    }


def _audit_delta(
    spark: SparkSession,
    transcripts_loc: str,
    staged: DataFrame,
    base_head: int | None,
    extra_checks: list[Callable[[DataFrame], tuple[bool, str]]] | None,
    max_collision_probe_keys: int,
) -> tuple[dict, int]:
    """The audit body shared by batch and streaming WAP: validate the
    staged delta (what reached disk) against itself and against main as
    of ``base_head`` (the fork point). Returns (checks, staged_rows)."""
    checks: dict[str, dict] = {}
    stats = staged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (
                F.col("conv_id").isNull()
                | F.col("turn_idx").isNull()
                | F.col("text").isNull()
                | F.col("ts").isNull()
            ).cast("long")
        ).alias("n_null"),
        F.count_distinct(*[F.col(c) for c in _KEY]).alias("n_distinct"),
    ).collect()[0]
    checks["schema_nulls"] = {
        "ok": (stats["n_null"] or 0) == 0,
        "detail": f"{stats['n_null'] or 0} null-key rows of {stats['n']}",
    }
    checks["dup_keys_in_batch"] = {
        "ok": stats["n_distinct"] == stats["n"],
        "detail": f"{stats['n'] - stats['n_distinct']} duplicate "
                  f"(conv_id, turn_idx) of {stats['n']}",
    }

    if base_head is not None:
        # collision probe against main, pruned to the batch's
        # conversations (IN pushdown → bucket/identity partition pruning)
        convs = [r["conv_id"] for r in
                 staged.select("conv_id").distinct().collect()
                 if r["conv_id"] is not None]
        if len(convs) <= max_collision_probe_keys:
            main_slice = read_iceberg(
                spark, transcripts_loc, snapshot_id=base_head,
                filters=[("conv_id", "in", convs)] if convs else None,
            )
        else:
            main_slice = read_iceberg(
                spark, transcripts_loc, snapshot_id=base_head
            ).join(
                F.broadcast(staged.select("conv_id").distinct()), "conv_id"
            )
        n_coll = (
            staged.select(*_KEY)
            .join(main_slice.select(*_KEY), list(_KEY), "left_semi")
            .count()
        )
        checks["key_collision_with_main"] = {
            "ok": n_coll == 0,
            "detail": f"{n_coll} staged turns already exist on main "
                      "(corrections belong on the MOR upsert path)",
        }

    for i, fn in enumerate(extra_checks or []):
        ok, detail = fn(staged)
        checks[getattr(fn, "__name__", f"extra_{i}")] = {
            "ok": bool(ok), "detail": str(detail),
        }

    return checks, stats["n"]


def _staged_lineage(
    t: IcebergLocalTable, branch: str
) -> tuple[list[int], int | None]:
    """Snapshot ids staged on ``branch`` that main does not have: walk
    the branch head's parent chain until a main ancestor (the fork
    point). Returns (staged ids oldest-first, fork-point id or None for
    a table the branch itself created)."""
    refs = t.refs()
    if branch not in refs:
        raise ValueError(f"no such branch: {branch!r}")
    by_id = {s["snapshot-id"]: s for s in t.snapshots()}
    main_anc: set[int] = set()
    cur = (refs.get("main") or {}).get("snapshot-id")
    while cur is not None and cur in by_id:
        main_anc.add(cur)
        cur = by_id[cur].get("parent-snapshot-id")
    staged: list[int] = []
    cur = refs[branch]["snapshot-id"]
    while cur is not None and cur in by_id and cur not in main_anc:
        staged.append(cur)
        cur = by_id[cur].get("parent-snapshot-id")
    fork = cur if cur in main_anc else None
    return staged[::-1], fork


def wap_publish_stream(
    spark: SparkSession,
    transcripts_loc: str,
    branch: str,
    extra_checks: list[Callable[[DataFrame], tuple[bool, str]]] | None = None,
    max_collision_probe_keys: int = 10_000,
    rebase_on_diverged: bool = False,
) -> dict:
    """Audit-and-publish for a STREAMED staging branch.

    ``iceberg_sink(loc, branch=...)`` lands one append commit per
    micro-batch on the branch; this is the publish half: recover every
    snapshot the branch staged since it forked from main (ancestry walk
    — immune to unrelated commits elsewhere in the sequence range),
    audit the union of exactly those snapshots' added files with the
    same checks as batch WAP, and on green fast-forward main over ALL
    staged micro-batches in one O(1) metadata commit. A red audit
    leaves main untouched and the branch readable for inspection; the
    stream can keep appending to it and publish can be retried.

    One extra check vs batch WAP: the staged lineage must be
    append-only (the sink enforces this at write time; re-verified here
    from snapshot metadata because publish may run in a different
    process than the stream).

    If main advanced since the branch forked, fast-forward correctly
    refuses (a silent merge would drop main's commits). With
    ``rebase_on_diverged=True`` a green audit publishes anyway by
    CHERRY-PICKING each staged append onto the current main head —
    manifest-reusing metadata commits, no data file moves — provided
    main's interim commits are append/replace only (a row delta on main
    could target the staged rows' keys, and re-ordering deletes across
    appends changes semantics; refused conservatively). The audit's
    collision probe always runs against the CURRENT main head, so a
    rebase cannot publish turns main gained while the stream was
    staging.
    """
    t = IcebergLocalTable(transcripts_loc)
    staged_ids, fork = _staged_lineage(t, branch)
    if not staged_ids:
        return {
            "published": False, "branch": branch, "snapshot_id": None,
            "staged_snapshots": 0, "staged_rows": 0,
            "checks": {"staged_nonempty": {
                "ok": False,
                "detail": "branch head is already on main; nothing staged",
            }},
        }
    by_id = {s["snapshot-id"]: s for s in t.snapshots()}
    main_head = (t.refs().get("main") or {}).get("snapshot-id")
    # crash-retry idempotency: a prior rebase publish may have died
    # mid-cherry-pick — staged snapshots already applied on MAIN'S
    # ancestry are published, not pending; auditing them again would
    # self-collide with their own published rows
    main_anc: set[int] = set()
    cur = main_head
    while cur is not None and cur in by_id:
        main_anc.add(cur)
        cur = by_id[cur].get("parent-snapshot-id")
    already = {
        int(by_id[a]["summary"]["cherry-picked-from"])
        for a in main_anc
        if "cherry-picked-from" in by_id[a]["summary"]
    }
    pending = [sid for sid in staged_ids if sid not in already]
    ops = {by_id[sid]["summary"]["operation"] for sid in pending}
    checks: dict[str, dict] = {
        "append_only": {
            "ok": ops <= {"append"},
            "detail": f"staged operations: {sorted(ops)}",
        }
    }
    staged: DataFrame | None = None
    for sid in pending:
        part = read_iceberg_snapshot_adds(spark, transcripts_loc, sid)
        staged = part if staged is None else staged.unionByName(part)
    # audit against the CURRENT main head, not the fork point: if main
    # advanced while the stream staged, new collisions must fail the
    # audit before any rebase can publish them
    staged_rows = 0
    if staged is not None:
        delta_checks, staged_rows = _audit_delta(
            spark, transcripts_loc, staged, main_head,
            extra_checks, max_collision_probe_keys,
        )
        checks.update(delta_checks)
    published = all(c["ok"] for c in checks.values())
    rebased = False
    if published:
        diverged = fork != main_head
        if not diverged or not rebase_on_diverged:
            # fast-forward refuses a diverged branch with a clear error
            t.fast_forward("main", branch)
        else:
            interim = (
                t.operations_between(fork, main_head)
                if fork is not None else {"unknown-lineage"}
            )
            bad = interim - {"append", "replace"}
            if bad:
                raise ValueError(
                    "cannot rebase-publish: main gained "
                    f"{sorted(bad)} commits since the fork; row deltas "
                    "do not commute with the staged appends — re-stage "
                    "against the current head"
                )
            for sid in pending:
                t.cherry_pick(sid)
            rebased = True
        # raise the published high-water mark: the sink's replay guard
        # reads it after the branch (and its stamps) are gone, and it
        # survives snapshot expiry. A refused batch never reaches here,
        # so its discarded stamps stay replayable.
        stamps = [
            int(by_id[sid]["summary"]["streaming-batch-id"])
            for sid in staged_ids
            if "streaming-batch-id" in by_id[sid]["summary"]
        ]
        if stamps:
            prev = t.properties().get("streaming-batch-id-hwm")
            hwm = max(stamps + ([int(prev)] if prev is not None else []))
            t.set_properties({"streaming-batch-id-hwm": hwm})
        t.drop_ref(branch)
    return {
        "published": published,
        "rebased": rebased,
        "branch": branch,
        "snapshot_id": staged_ids[-1],
        "staged_snapshots": len(staged_ids),
        "staged_rows": staged_rows,
        "checks": checks,
    }
