"""Registry queries for the Iceberg v2 local table format (SURVEY.md §4.4).

Both entries are end-to-end through the real on-disk format: Spark writes
parquet, ``ner_spark.iceberg`` commits Avro manifests + metadata JSON, and
the read side resolves the snapshot chain (with file-level pruning) before
handing Spark the surviving file list. The DuckDB oracles recompute the
same result straight from the source tables — a full differential over
write → commit → time-travel/pruned read.

Float-sum hygiene: aggregates are computed in DECIMAL(18,2) (exact) and
cast to double at the end, so Spark's and DuckDB's summation orders cannot
produce last-ulp hash mismatches.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ner_spark.registry import register, t


def _dsum(col: str, alias: str):
    return (
        F.sum(F.col(col).cast("decimal(18,2)")).cast("double").alias(alias)
    )


@register(
    "iceberg_snapshot_reads",
    """
    WITH s1 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 3 = 0),
    s2 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 3 IN (0, 1)),
    delta AS (
      SELECT o_orderkey, 'U' AS o_orderstatus, 0.0 AS o_totalprice
      FROM orders WHERE o_orderkey % 6 IN (0, 5)),
    s3 AS (
      SELECT o.o_orderkey,
             CASE WHEN d.o_orderkey IS NOT NULL THEN 0.0
                  ELSE o.o_totalprice END AS o_totalprice
      FROM s2 o LEFT JOIN delta d ON o.o_orderkey = d.o_orderkey
      UNION ALL
      SELECT o_orderkey, o_totalprice FROM delta WHERE o_orderkey % 6 = 5),
    states AS (
      SELECT 'snap1' AS snap, o_totalprice FROM s1
      UNION ALL SELECT 'snap2', o_totalprice FROM s2
      UNION ALL SELECT 'current', o_totalprice FROM s3)
    SELECT snap, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           SUM(CASE WHEN o_totalprice = 0.0 THEN 1 ELSE 0 END) AS n_updated
    FROM states GROUP BY snap
    """,
)
def iceberg_snapshot_reads(spark, sf):
    """Snapshot lineage + time travel through the real Iceberg v2 format.

    Builds a 3-snapshot table from ``orders`` (overwrite → append → CoW
    MERGE via io.merge_upsert's iceberg-local branch), then reads each
    snapshot BACK THROUGH THE METADATA — snap1/snap2 by snapshot id after
    two further commits have moved the table on, `current` through the
    version-hint. The oracle reconstructs all three states relationally,
    so any error in manifest bookkeeping (a dropped file, a double-counted
    manifest, a merge that leaked pre-image rows) shows up as a value
    mismatch, not just a row-count drift.

    Scale shape: the merge is the same broadcast-delta CoW plan as
    merge_upsert_orders; commits are O(files) metadata appends, reads are
    O(manifests) + a parquet scan of only the live files.
    """
    from ner_spark.iceberg.spark_io import (
        merge_upsert_iceberg,
        read_iceberg,
        write_iceberg,
    )

    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    loc = tempfile.mkdtemp(prefix="iceberg_q_") + "/orders_tbl"
    key = F.col("o_orderkey")
    s1 = write_iceberg(
        o.where(key % 3 == 0), loc, partition_by=["o_orderstatus"], run_id="s1"
    )
    s2 = write_iceberg(o.where(key % 3 == 1), loc, mode="append", run_id="s2")
    delta = o.where((key % 6).isin(0, 5)).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        F.lit(0.0).alias("o_totalprice"),
    )
    merge_upsert_iceberg(spark, loc, delta, "o_orderkey", run_id="s3")

    parts = []
    for label, sid in [("snap1", s1), ("snap2", s2), ("current", None)]:
        parts.append(
            read_iceberg(spark, loc, snapshot_id=sid)
            .agg(
                F.count("*").alias("n_rows"),
                _dsum("o_totalprice", "sum_price"),
                F.sum(
                    F.when(F.col("o_totalprice") == 0.0, 1).otherwise(0)
                ).alias("n_updated"),
            )
            .select(F.lit(label).alias("snap"), "n_rows", "sum_price",
                    "n_updated")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "iceberg_mor_delta",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 4 = 0),
    d1 AS (  -- after the position DELETE WHERE o_totalprice < 50000
      SELECT * FROM base WHERE NOT (o_totalprice < 50000.0)),
    d2 AS (  -- after the equality delete on o_orderkey % 20 = 0 keys
      SELECT * FROM d1 WHERE o_orderkey % 20 <> 0),
    delta AS (
      SELECT o_orderkey, 'M' AS o_orderstatus, 1.0 AS o_totalprice
      FROM orders WHERE o_orderkey % 8 = 4),
    cur AS (
      SELECT d.* FROM d2 d
      WHERE d.o_orderkey NOT IN (SELECT o_orderkey FROM delta)
      UNION ALL SELECT * FROM delta),
    states AS (
      SELECT 'snap1' AS snap, o_totalprice FROM base
      UNION ALL SELECT 'current', o_totalprice FROM cur)
    SELECT snap, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           SUM(CASE WHEN o_totalprice = 1.0 THEN 1 ELSE 0 END) AS n_merged
    FROM states GROUP BY snap
    """,
)
def iceberg_mor_delta(spark, sf):
    """Merge-on-read row deltas through the real v2 format: a position
    DELETE WHERE (delete_iceberg_where → (file_path, pos) parquet), an
    equality delete (delete_iceberg_keys → key-set parquet with
    equality_ids), and a single-commit MOR MERGE (equality-delete the
    delta's keys + append its rows, strict-sequence rule keeping the
    new rows alive) — then the current state AND the pre-delete snapshot
    are read back through the metadata. The oracle reconstructs both
    states relationally, so any MOR bookkeeping error (a delete applied
    to the wrong sequence range, a position that out-lives compaction, a
    merge that leaks pre-image rows) is a value mismatch.

    Scale shape: every delta here is O(changed rows) — no data file is
    rewritten. At 100 TB a 0.1% DELETE costs a KB-scale delete file plus
    a pruned scan, and CDC MERGE ingest never touches the base table;
    compact_iceberg folds the deltas back on maintenance windows.
    """
    from ner_spark.iceberg.spark_io import (
        delete_iceberg_keys,
        delete_iceberg_where,
        merge_upsert_iceberg_mor,
        read_iceberg,
        write_iceberg,
    )

    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    key = F.col("o_orderkey")
    loc = tempfile.mkdtemp(prefix="iceberg_q_") + "/orders_mor"
    s1 = write_iceberg(
        o.where(key % 4 == 0), loc, partition_by=["o_orderstatus"],
        run_id="m1",
    )
    delete_iceberg_where(spark, loc, [("o_totalprice", "<", 50000.0)])
    delete_iceberg_keys(
        spark, loc,
        o.where((key % 4 == 0) & (key % 20 == 0)).select("o_orderkey"),
    )
    delta = o.where(key % 8 == 4).select(
        "o_orderkey",
        F.lit("M").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
    )
    merge_upsert_iceberg_mor(spark, loc, delta, key="o_orderkey")

    parts = []
    for label, sid in [("snap1", s1), ("current", None)]:
        parts.append(
            read_iceberg(spark, loc, snapshot_id=sid)
            .agg(
                F.count("*").alias("n_rows"),
                _dsum("o_totalprice", "sum_price"),
                F.sum(
                    F.when(F.col("o_totalprice") == 1.0, 1).otherwise(0)
                ).alias("n_merged"),
            )
            .select(F.lit(label).alias("snap"), "n_rows", "sum_price",
                    "n_merged")
        )
    return parts[0].unionByName(parts[1])


@register(
    "iceberg_cdc_changed_keys",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderkey % 50 AS grp, o_totalprice
      FROM orders WHERE o_orderkey % 4 = 0),
    d1 AS (  -- after the position DELETE WHERE o_totalprice < 30000
      SELECT * FROM base WHERE NOT (o_totalprice < 30000.0)),
    eq_keys AS (  -- equality delete by o_orderkey (non-key column)
      SELECT o_orderkey FROM base WHERE o_orderkey % 40 = 0),
    d2 AS (
      SELECT * FROM d1 WHERE o_orderkey NOT IN (SELECT * FROM eq_keys)),
    delta AS (
      SELECT 1000000 + g AS o_orderkey, g AS grp, 1.0 AS o_totalprice
      FROM (SELECT 1 AS g UNION ALL SELECT 2)),
    final AS (
      SELECT * FROM d2 WHERE grp NOT IN (1, 2)
      UNION ALL SELECT * FROM delta),
    touched AS (
      SELECT DISTINCT grp FROM (
        SELECT grp FROM base WHERE o_totalprice < 30000.0
        UNION ALL
        SELECT grp FROM d1 WHERE o_orderkey % 40 = 0
        UNION ALL SELECT 1 UNION ALL SELECT 2))
    SELECT t.grp,
           COALESCE(f.n_rows, 0) AS n_rows,
           f.sum_price
    FROM touched t LEFT JOIN (
      SELECT grp, COUNT(*) AS n_rows,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
      FROM final GROUP BY grp) f ON t.grp = f.grp
    """,
)
def iceberg_cdc_changed_keys(spark, sf):
    """CDC change tracking over merge-on-read history: after a position
    DELETE WHERE, an equality delete on a NON-key column (whose group
    must be recovered via the parent-snapshot semi-join), and a MOR
    group upsert, `changed_keys_iceberg` must name exactly the touched
    groups — and the final per-group state, read merge-on-read, must
    match the relational reconstruction. Tombstone-visibility included:
    a touched group with zero surviving rows stays in the output with
    n_rows=0 (the left join), which is what a derived-table maintainer
    needs to propagate erasures.

    Scale shape: key recovery reads only the range's change files (new
    data files, position-delete ordinals joined back to the named files,
    equality-key files); the one table re-read is the documented
    parent-snapshot fallback for equality deletes that don't carry the
    key — at 10^12 turns you key your CDC by the group column precisely
    to avoid it.
    """
    from ner_spark.iceberg.spark_io import (
        changed_keys_iceberg,
        delete_iceberg_keys,
        delete_iceberg_where,
        merge_upsert_iceberg_mor,
        read_iceberg,
        write_iceberg,
    )

    o = t(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") % 50).alias("grp"),
        "o_totalprice",
    )
    key = F.col("o_orderkey")
    loc = tempfile.mkdtemp(prefix="iceberg_q_") + "/orders_cdc"
    s0 = write_iceberg(o.where(key % 4 == 0), loc, run_id="c0")
    delete_iceberg_where(spark, loc, [("o_totalprice", "<", 30000.0)])
    delete_iceberg_keys(
        spark, loc,
        o.where((key % 4 == 0) & (key % 40 == 0)).select("o_orderkey"),
    )
    delta = spark.createDataFrame(
        [(1000000 + g, g, 1.0) for g in (1, 2)],
        "o_orderkey bigint, grp bigint, o_totalprice double",
    )
    merge_upsert_iceberg_mor(spark, loc, delta, key="grp")

    changed = changed_keys_iceberg(spark, loc, s0, "grp")
    final = (
        read_iceberg(spark, loc)
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_rows"),
            _dsum("o_totalprice", "sum_price"),
        )
    )
    return changed.join(final, "grp", "left").select(
        "grp",
        F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
        "sum_price",
    )


@register(
    "iceberg_changelog",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 4 = 0),
    a2 AS (  -- commit 1 in the range: a plain append
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 4 = 1),
    st2 AS (SELECT * FROM base UNION ALL SELECT * FROM a2),
    del3 AS (  -- commit 2: position DELETE WHERE o_totalprice < 40000
      SELECT * FROM st2 WHERE o_totalprice < 40000.0),
    st3 AS (SELECT * FROM st2 WHERE NOT (o_totalprice < 40000.0)),
    del4 AS (  -- commit 3 delete half: rows LIVE at the parent matching
               -- the merge delta's keys (already-deleted rows excluded)
      SELECT * FROM st3 WHERE o_orderkey % 8 = 4),
    ins4 AS (  -- commit 3 insert half: the delta's rows
      SELECT o_orderkey, 'M' AS o_orderstatus, 1.0 AS o_totalprice
      FROM orders WHERE o_orderkey % 8 = 4),
    chg AS (
      SELECT 1 AS _commit_order, 'insert' AS _change_type, o_totalprice
      FROM a2
      UNION ALL SELECT 2, 'delete', o_totalprice FROM del3
      UNION ALL SELECT 3, 'delete', o_totalprice FROM del4
      UNION ALL SELECT 3, 'insert', o_totalprice FROM ins4)
    SELECT _commit_order, _change_type, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM chg GROUP BY _commit_order, _change_type
    """,
)
def iceberg_changelog(spark, sf):
    """Row-level changelog (CDC view) across MOR history: after an
    append, a position DELETE WHERE, and a single-commit MOR MERGE,
    ``read_iceberg_changelog`` must emit exactly the insert/delete rows
    each snapshot caused — deletes recovered from the snapshots' own
    delete files (position ordinals joined back to only the named files;
    equality keys semi-joined against the parent state under the
    strict-sequence rule), the merge appearing as delete(old)+insert(new)
    at one commit, and rows ALREADY deleted by an earlier commit never
    re-emitted. The oracle replays the same history relationally, so any
    changelog bookkeeping error (a delete attributed to the wrong
    commit, a pre-image leak, a double-emitted row) is a value mismatch.

    Scale shape: each commit's changes come from its own O(delta) change
    files — a downstream maintainer at 10^12 turns reads the day's
    change rows, never the table; only equality deletes re-read the
    parent state, behind a broadcast semi-join that a key-bucketed
    layout prunes.
    """
    from ner_spark.iceberg.spark_io import (
        delete_iceberg_where,
        merge_upsert_iceberg_mor,
        read_iceberg_changelog,
        write_iceberg,
    )

    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    key = F.col("o_orderkey")
    loc = tempfile.mkdtemp(prefix="iceberg_q_") + "/orders_chlog"
    s1 = write_iceberg(o.where(key % 4 == 0), loc, run_id="c0")
    write_iceberg(o.where(key % 4 == 1), loc, mode="append")
    delete_iceberg_where(spark, loc, [("o_totalprice", "<", 40000.0)])
    delta = o.where(key % 8 == 4).select(
        "o_orderkey",
        F.lit("M").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
    )
    merge_upsert_iceberg_mor(spark, loc, delta, key="o_orderkey")

    log = read_iceberg_changelog(spark, loc, from_snapshot_id=s1)
    return log.groupBy("_commit_order", "_change_type").agg(
        F.count("*").alias("n_rows"),
        _dsum("o_totalprice", "sum_price"),
    )


@register(
    "iceberg_stream_read",
    """
    WITH feed AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 5 IN (0, 1))
    SELECT o_orderstatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM feed GROUP BY o_orderstatus
    """,
)
def iceberg_stream_read(spark, sf):
    """The table IS the queue: a readStream over the iceberg-local
    format drains two append snapshots (plus a compaction, which must
    contribute nothing) through a real availableNow run into a parquet
    sink, and the drained rows must equal the relational feed. Offsets
    are snapshot sequence numbers on the main lineage; partitions are
    the appended data files resolved from manifest metadata, read
    executor-side via Arrow, with identity-partition columns reattached
    from the manifests' typed partition records.

    Scale shape: planning is O(new snapshots' manifests) per trigger and
    reading is O(new files) — a downstream KG tick at 10^12 turns tails
    the transcript table like a log, with WAP publishes as the commit
    points that make staged rows visible.
    """
    import tempfile as _tf

    from ner_spark.iceberg.spark_io import compact_iceberg, write_iceberg
    from ner_spark.sources.iceberg_stream import IcebergStreamDataSource

    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    key = F.col("o_orderkey")
    d = _tf.mkdtemp(prefix="iceberg_q_")
    loc = d + "/orders_feed"
    write_iceberg(o.where(key % 5 == 0), loc, mode="append",
                  partition_by=["o_orderstatus"])
    write_iceberg(o.where(key % 5 == 1), loc, mode="append")
    compact_iceberg(spark, loc)  # replace snapshot: adds no logical rows

    spark.dataSource.register(IcebergStreamDataSource)
    q = (
        spark.readStream.format("iceberg_stream")
        .option("location", loc).load()
        .writeStream.format("parquet").option("path", d + "/out")
        .option("checkpointLocation", d + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("iceberg_stream drain still running after 300s")
    if q.exception() is not None:
        raise q.exception()
    drained = spark.read.schema(
        "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    ).parquet(d + "/out")
    return drained.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        _dsum("o_totalprice", "sum_price"),
    )


@register(
    "iceberg_maintenance_invariant",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 4 = 0),
    trickle AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 4 = 1),
    st AS (SELECT * FROM base UNION ALL SELECT * FROM trickle),
    final AS (SELECT * FROM st WHERE NOT (o_totalprice < 30000.0))
    SELECT o_orderstatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           CAST(SUM(CAST(o_orderkey AS DECIMAL(18,0))) AS BIGINT)
             AS sum_key
    FROM final GROUP BY o_orderstatus
    """,
)
def iceberg_maintenance_invariant(spark, sf):
    """The full maintenance window is logically invisible: after a base
    write, three trickle appends (one manifest + small files each), and
    a MOR position DELETE, ``maintain_iceberg`` runs data compaction
    (folding the delete), manifest rewrite, snapshot expiry, and orphan
    cleanup — and the table read back through the rewritten metadata
    must still equal the plain relational reconstruction. Any
    maintenance bug class lands here as a value mismatch: a compaction
    that loses or resurrects MOR-deleted rows, a manifest merge that
    drops/duplicates an entry or breaks sequence scoping, an expiry
    that deletes a still-referenced file.

    Scale shape: each maintenance verb is O(day's churn) — small-file
    partitions rewritten, manifests merged, expired files unlinked —
    never O(table); the invariant checked here is what makes running it
    nightly on a 100 TB table safe.
    """
    from ner_spark.iceberg.spark_io import (
        delete_iceberg_where,
        maintain_iceberg,
        read_iceberg,
        write_iceberg,
    )

    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    key = F.col("o_orderkey")
    loc = tempfile.mkdtemp(prefix="iceberg_q_") + "/orders_maint"
    write_iceberg(o.where(key % 4 == 0), loc,
                  partition_by=["o_orderstatus"], run_id="base")
    for r in range(3):  # trickle: one commit (and one manifest) each
        write_iceberg(
            o.where((key % 4 == 1) & (key % 3 == r)), loc, mode="append",
        )
    delete_iceberg_where(spark, loc, [("o_totalprice", "<", 30000.0)])
    maintain_iceberg(spark, loc, keep_snapshots=1)
    return read_iceberg(spark, loc).groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        _dsum("o_totalprice", "sum_price"),
        F.sum(F.col("o_orderkey").cast("decimal(18,0)"))
        .cast("bigint").alias("sum_key"),
    )


@register(
    "iceberg_pruned_scan",
    """
    SELECT l_linestatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity >= 30
    GROUP BY l_linestatus
    """,
)
def iceberg_pruned_scan(spark, sf):
    """File-level pruning through Iceberg metadata: identity-partition
    pruning on l_returnflag plus min/max bound pruning on l_quantity —
    the scan planner hands Spark only files that MAY match and re-applies
    the residual predicate row-wise (Iceberg's exact contract). The
    oracle computes the same aggregate from the raw table, so a pruning
    bug in either direction (skipping a live file / leaking a dead one)
    is a value mismatch.

    Scale shape: at 100 TB this metadata-level skip is the difference
    between scanning one partition's worth of files and listing the whole
    table; the same stats drive it here and on a real cluster.
    """
    from ner_spark.iceberg.spark_io import read_iceberg, write_iceberg

    li = t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_returnflag", "l_quantity",
        "l_extendedprice",
    )
    loc = tempfile.mkdtemp(prefix="iceberg_q_") + "/lineitem_tbl"
    write_iceberg(li, loc, partition_by=["l_returnflag"], run_id="p1")
    pruned = read_iceberg(
        spark,
        loc,
        filters=[("l_returnflag", "=", "R"), ("l_quantity", ">=", 30.0)],
    )
    return pruned.groupBy("l_linestatus").agg(
        F.count("*").alias("n_rows"),
        _dsum("l_extendedprice", "sum_price"),
    )


@register(
    "iceberg_hidden_partitioning",
    """
    WITH day_range AS (
      SELECT 'day_range' AS probe, event_type, COUNT(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
      GROUP BY event_type),
    bucket_eq AS (
      SELECT 'bucket_eq' AS probe, event_type, COUNT(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      WHERE user_id = 7
      GROUP BY event_type)
    SELECT * FROM day_range UNION ALL SELECT * FROM bucket_eq
    """,
)
def iceberg_hidden_partitioning(spark, sf):
    """Hidden partitioning end-to-end: the table is laid out by DERIVED
    partition values — ``days(ts)`` and ``bucket(8, user_id)`` (spec
    murmur3, Appendix-B bit-exact) — that no query ever names. Both
    probes predicate on the SOURCE columns only; the scan planner applies
    the same transforms to the predicate constants and prunes partitions
    (a time-range touches only its day dirs; a user equality touches 1/8
    of the buckets). The DuckDB oracle recomputes both aggregates from
    the raw parquet, so a transform mismatch between the write side
    (vectorized numpy murmur3 / unix_micros floor-div) and the planner
    (pure-python spec transforms) — or pruning that drops a live file —
    is a value mismatch, not just a plan difference.

    Scale shape: this is THE layout for a 10^12-turn transcript table —
    ``days(ts)`` bounds every incremental tick's scan to the new days,
    ``bucket(N, conv_id)`` makes single-conversation repairs O(1/N) —
    and the pruning decisions are made from manifest metadata before any
    data file opens.
    """
    import datetime as dt

    from ner_spark.iceberg.spark_io import read_iceberg, write_iceberg

    ev = t(spark, sf, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    loc = tempfile.mkdtemp(prefix="iceberg_hp_") + "/events_tbl"
    # one writer task → one file per partition dir (small fixture; a real
    # table would repartition by the spec before the write instead)
    write_iceberg(
        ev.coalesce(1), loc, partition_by=["days(ts)", "bucket(8, user_id)"]
    )

    def probe(tag, filters):
        return (
            read_iceberg(spark, loc, filters=filters)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_rows"), _dsum("value", "sum_value"))
            .select(F.lit(tag).alias("probe"), "event_type", "n_rows",
                    "sum_value")
        )

    lo, hi = dt.datetime(2024, 1, 8), dt.datetime(2024, 1, 15)
    return probe("day_range", [("ts", ">=", lo), ("ts", "<", hi)]).unionAll(
        probe("bucket_eq", [("user_id", "=", 7)])
    )


@register(
    "iceberg_spec_evolution",
    """
    WITH probe AS (
      SELECT event_type, COUNT(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events WHERE user_id = 7 GROUP BY event_type),
    full_t AS (
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events)
    SELECT 'user_eq' AS probe, event_type, n_rows, sum_value FROM probe
    UNION ALL
    SELECT 'full', 'all', n_rows, sum_value FROM full_t
    """,
)
def iceberg_spec_evolution(spark, sf):
    """Partition spec evolution differential: half the events land under
    ``bucket(4, user_id)``, the spec evolves to ``bucket(8, user_id)``
    (one metadata commit, no rewrite), the other half appends under the
    new layout. The user-equality probe then prunes EACH manifest under
    the spec it was written with (old files mod 4, new files mod 8), and
    the full read unions the two hive layouts. The DuckDB oracle
    recomputes both from the raw parquet — a wrong per-spec transform,
    a file leaked/dropped across the evolution boundary, or a bad layout
    union is a value mismatch.

    Scale shape: re-bucketing a 100 TB table is one metadata commit;
    history keeps its layout and stays prunable, and compaction migrates
    it incrementally.
    """
    from ner_spark.iceberg.spark_io import read_iceberg, write_iceberg
    from ner_spark.iceberg.table import IcebergLocalTable

    ev = t(spark, sf, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    loc = tempfile.mkdtemp(prefix="iceberg_ev_") + "/events_tbl"
    write_iceberg(
        ev.filter(F.col("event_id") % 2 == 0).coalesce(1),
        loc, partition_by=["bucket(4, user_id)"],
    )
    IcebergLocalTable(loc).evolve_spec(["bucket(8, user_id)"])
    write_iceberg(
        ev.filter(F.col("event_id") % 2 == 1).coalesce(1),
        loc, mode="append",
    )
    probe = (
        read_iceberg(spark, loc, filters=[("user_id", "=", 7)])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_rows"), _dsum("value", "sum_value"))
        .select(F.lit("user_eq").alias("probe"), "event_type", "n_rows",
                "sum_value")
    )
    full = (
        read_iceberg(spark, loc)
        .agg(F.count("*").alias("n_rows"), _dsum("value", "sum_value"))
        .select(F.lit("full").alias("probe"),
                F.lit("all").alias("event_type"), "n_rows", "sum_value")
    )
    return probe.unionAll(full)


@register(
    "iceberg_branch_wap",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 3 = 0),
    staged AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 3 = 1),
    merged AS (
      SELECT * FROM base UNION ALL SELECT * FROM staged),
    states AS (
      SELECT 'pre_publish' AS state, o_totalprice FROM base
      UNION ALL SELECT 'audit', o_totalprice FROM merged
      UNION ALL SELECT 'published', o_totalprice FROM merged
      UNION ALL SELECT 'tag_v1', o_totalprice FROM base)
    SELECT state, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM states GROUP BY state
    """,
)
def iceberg_branch_wap(spark, sf):
    """Write-audit-publish through Iceberg refs: the base table is tagged
    ``v1``, an ingest tick is committed on the ``audit`` BRANCH (main
    readers untouched — ``pre_publish`` is read from the table head while
    the staged commit already exists), the audit read validates the
    branch, and ``fast_forward('main', 'audit')`` publishes atomically
    (one metadata swap, zero data movement). The tag still reads the
    pre-publish state afterwards. The oracle reconstructs all four states
    relationally, so a branch commit that leaks into main, a publish that
    drops staged files, or a tag that drifts is a value mismatch.

    Scale shape: staging on a branch is the 100-TB-safe ingest pattern —
    a bad tick never reaches readers, the audit query costs one scan of
    the staged files, and publish is O(1) metadata regardless of table
    size.
    """
    from ner_spark.iceberg.spark_io import read_iceberg, write_iceberg
    from ner_spark.iceberg.table import IcebergLocalTable

    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    key = F.col("o_orderkey")
    loc = tempfile.mkdtemp(prefix="iceberg_wap_") + "/orders_tbl"
    write_iceberg(o.where(key % 3 == 0), loc,
                  partition_by=["o_orderstatus"], run_id="base")
    tbl = IcebergLocalTable(loc)
    tbl.create_tag("v1")
    write_iceberg(o.where(key % 3 == 1), loc, mode="append",
                  run_id="tick", branch="audit")

    def _state(label, **kw):
        # read_iceberg plans its file list eagerly, so each state is
        # pinned at call time regardless of when Spark executes it
        return (
            read_iceberg(spark, loc, **kw)
            .agg(F.count("*").alias("n_rows"),
                 _dsum("o_totalprice", "sum_price"))
            .select(F.lit(label).alias("state"), "n_rows", "sum_price")
        )

    pre = _state("pre_publish")
    audit = _state("audit", ref="audit")
    tbl.fast_forward("main", "audit")
    published = _state("published")
    tag = _state("tag_v1", ref="v1")
    return pre.unionAll(audit).unionAll(published).unionAll(tag)


@register(
    "iceberg_partitions_meta",
    """
    SELECT concat('o_orderstatus=', o_orderstatus) AS partition,
           CAST(1 AS BIGINT) AS file_count,
           COUNT(*) AS record_count
    FROM orders WHERE o_orderkey % 2 = 0
    GROUP BY o_orderstatus
    """,
)
def iceberg_partitions_meta(spark, sf):
    """The ``tbl$partitions`` inspection surface: per-partition file/row
    rollup computed purely from manifest METADATA (no data file opened) —
    what compaction planning and skew monitoring read on a 100 TB table.
    The write runs through one task (coalesce(1)) so the expected layout
    is exactly one file per partition value, and the oracle recomputes
    the per-partition row counts from the raw source: a manifest stats
    error (wrong record_count, dropped partition dir, double-counted
    file) is a value mismatch.
    """
    from ner_spark.iceberg.meta_tables import partitions_table
    from ner_spark.iceberg.spark_io import write_iceberg

    o = (
        t(spark, sf, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .where(F.col("o_orderkey") % 2 == 0)
        .coalesce(1)
    )
    loc = tempfile.mkdtemp(prefix="iceberg_meta_") + "/orders_tbl"
    write_iceberg(o, loc, partition_by=["o_orderstatus"])
    return partitions_table(spark, loc).select(
        "partition", "file_count", "record_count"
    )


@register(
    "iceberg_sorted_rewrite",
    """
    WITH t AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey % 4 = 1)
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM t
    WHERE o_orderkey >= 1000 AND o_orderkey < 50000
    GROUP BY o_orderstatus
    """,
)
def iceberg_sorted_rewrite(spark, sf):
    """Sort-ordered rewrite differential: four hash-striped appends give
    every file the full o_orderkey span (a key-range probe can prune
    nothing), then ``compact_iceberg_partitions(sort_by=['o_orderkey'])``
    rewrites each partition range-clustered + sorted, and the SAME range
    probe is answered through the rewritten layout. The query asserts the
    plan actually prunes (files hit < live files — the point of the
    rewrite) and the oracle recomputes the aggregate from the raw rows:
    a rewrite that drops/duplicates rows, breaks bound harvesting, or
    prunes a file it needed is a value mismatch.

    Scale shape: sort-ordered rewrite is how a 100 TB table buys
    file-level pruning on a hot NON-partition column — bounds become
    disjoint, and the probe cost is decided in manifest metadata.
    """
    from ner_spark.iceberg.spark_io import (
        compact_iceberg_partitions,
        read_iceberg,
        write_iceberg,
    )
    from ner_spark.iceberg.table import IcebergLocalTable

    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).where(F.col("o_orderkey") % 4 == 1)
    loc = tempfile.mkdtemp(prefix="iceberg_sort_") + "/orders_tbl"
    for i in range(4):  # hash stripes → full key span per file
        write_iceberg(
            o.where(F.col("o_orderkey") % 16 == 1 + 4 * i).coalesce(1),
            loc, partition_by=["o_orderstatus"],
            mode="overwrite" if i == 0 else "append",
        )
    tbl = IcebergLocalTable(loc)
    total = sum(f.file_size for f in tbl.scan())
    compact_iceberg_partitions(
        spark, loc, target_file_bytes=max(1, total // 8),
        sort_by=["o_orderkey"],
    )
    tbl = IcebergLocalTable(loc)
    probe = [("o_orderkey", ">=", 1000), ("o_orderkey", "<", 50000)]
    n_live, n_hit = len(tbl.scan()), len(tbl.scan(filters=probe))
    if not n_hit < n_live:
        raise AssertionError(
            f"sorted rewrite did not prune: {n_hit}/{n_live} files hit"
        )
    return (
        read_iceberg(spark, loc, filters=probe)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             _dsum("o_totalprice", "sum_price"))
    )


@register(
    "iceberg_zorder_rewrite",
    """
    WITH t AS (
      SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
      WHERE o_orderkey % 4 = 2)
    SELECT 'date_corner' AS probe, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM t WHERE o_orderdate < TIMESTAMP '1996-06-01'
    UNION ALL
    SELECT 'price_corner' AS probe, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM t WHERE o_totalprice < 80000.0
    """,
)
def iceberg_zorder_rewrite(spark, sf):
    """Z-order rewrite differential: four hash-striped appends give every
    file the full (o_orderdate, o_totalprice) span, then
    ``compact_iceberg_partitions(zorder_by=['o_orderdate',
    'o_totalprice'])`` rewrites the table clustered on the interleaved-bit
    Morton curve (iceberg/zorder.py), and corner probes on EACH dimension
    are answered through the rewritten layout. The query asserts BOTH
    probes actually prune on file bounds (the property a single-column
    sort cannot deliver — see test_iceberg_zorder.py's sort-vs-z
    tradeoff test) and the oracle recomputes each probe's aggregate from
    the raw rows: a rewrite that drops/duplicates rows, mis-buckets the
    curve, or prunes a needed file is a value mismatch.

    Scale shape: z-order is how a 100 TB table buys file-level pruning on
    TWO hot columns at once (``ts`` ranges AND entity/user equality) —
    upstream Iceberg's ``sort_order => 'zorder(a, b)'`` and Delta's
    ``OPTIMIZE ... ZORDER BY``; the probe cost is decided in manifest
    metadata before any file opens.
    """
    import datetime as dt

    from ner_spark.iceberg.spark_io import (
        compact_iceberg_partitions,
        read_iceberg,
        write_iceberg,
    )
    from ner_spark.iceberg.table import IcebergLocalTable

    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    ).where(F.col("o_orderkey") % 4 == 2)
    loc = tempfile.mkdtemp(prefix="iceberg_zorder_") + "/orders_tbl"
    for i in range(4):  # hash stripes → full span per file, both dims
        write_iceberg(
            o.where(F.col("o_orderkey") % 16 == 2 + 4 * i).coalesce(1),
            loc, mode="overwrite" if i == 0 else "append",
        )
    tbl = IcebergLocalTable(loc)
    total = sum(f.file_size for f in tbl.scan())
    compact_iceberg_partitions(
        spark, loc, target_file_bytes=max(1, total // 12),
        zorder_by=["o_orderdate", "o_totalprice"],
    )
    tbl = IcebergLocalTable(loc)
    n_live = len(tbl.scan())
    probes = {
        "date_corner": [
            ("o_orderdate", "<", dt.datetime(1996, 6, 1,
                                             tzinfo=dt.timezone.utc))
        ],
        "price_corner": [("o_totalprice", "<", 80000.0)],
    }
    parts = []
    for tag, probe in probes.items():
        n_hit = len(tbl.scan(filters=probe))
        if not n_hit < n_live:
            raise AssertionError(
                f"zorder rewrite did not prune {tag}: "
                f"{n_hit}/{n_live} files hit"
            )
        parts.append(
            read_iceberg(spark, loc, filters=probe)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 _dsum("o_totalprice", "sum_price"))
            .select(F.lit(tag).alias("probe"), "n_rows", "sum_price")
        )
    return parts[0].unionAll(parts[1])
