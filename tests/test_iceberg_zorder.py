"""Z-order clustering rewrite (SURVEY.md §4.4; iceberg/zorder.py).

Contract: ``compact_iceberg_partitions(zorder_by=[a, b])`` rewrites each
picked partition clustered on the interleaved-bit Morton curve of the
named columns, so file-level min/max bounds prune probes on EITHER
column (upstream Iceberg's ``sort_order => 'zorder(a, b)'`` / Delta's
``OPTIMIZE ... ZORDER BY``). Logical content is identical before/after
(it is a ``replace`` commit like any other rewrite), time travel still
reads the pre-rewrite layout, and the clustering column never appears
in file contents or the read schema.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ner_spark.iceberg.spark_io import (
    compact_iceberg_partitions,
    read_iceberg,
    write_iceberg,
)
from ner_spark.iceberg.table import IcebergLocalTable
from ner_spark.iceberg.zorder import sampled_boundaries, zorder_column


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _events(spark, n=8000):
    """Two independent uniform dimensions + a timestamp, deterministic."""
    return spark.range(n).selectExpr(
        "id AS event_id",
        "CAST(hash(id) % 1000 AS BIGINT) AS user_id",
        "CAST(pmod(hash(id * 7 + 3), 10000) AS DOUBLE) / 10.0 AS amount",
        "timestamp_micros(1704067200000000 + CAST(pmod(hash(id * 13 + 5),"
        " 86400 * 30) AS BIGINT) * 1000000) AS ts",
    )


def _striped_table(spark, tmp_path, df, key="event_id", partition_by=None):
    """Four hash-striped single-file appends: every file spans the full
    domain of every column, so nothing prunes before the rewrite."""
    loc = str(tmp_path / "tbl")
    for i in range(4):
        write_iceberg(
            df.where(F.pmod(F.col(key), F.lit(4)) == i).coalesce(1),
            loc,
            partition_by=partition_by,
            mode="overwrite" if i == 0 else "append",
        )
    return loc


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    df = _events(spark)
    loc = _striped_table(spark, tmp_path, df)
    t = IcebergLocalTable(loc)
    pre_snap = t.current_snapshot()["snapshot-id"]
    before = _rows(read_iceberg(spark, loc))
    total = sum(f.file_size for f in t.scan())

    stats = compact_iceberg_partitions(
        spark, loc, target_file_bytes=max(1, total // 16),
        zorder_by=["user_id", "amount"],
    )
    assert stats["files_in"] == 4 and stats["files_out"] >= 8

    t = IcebergLocalTable(loc)
    live = len(t.scan())
    # corner probes on EACH dimension prune on file bounds alone
    hit_u = len(t.scan(filters=[("user_id", "<", -500)]))
    hit_a = len(t.scan(filters=[("amount", "<", 250.0)]))
    assert hit_u < live and hit_a < live
    # interior band on either dimension also prunes
    hit_band = len(
        t.scan(filters=[("amount", ">=", 400.0), ("amount", "<", 500.0)])
    )
    assert hit_band < live

    # logical content identical; pruned reads return exactly the
    # predicate's rows
    assert _rows(read_iceberg(spark, loc)) == before
    probe = [("user_id", ">=", 0), ("user_id", "<", 100)]
    got = _rows(
        read_iceberg(spark, loc, filters=probe).select("event_id")
    )
    want = _rows(
        df.where((F.col("user_id") >= 0) & (F.col("user_id") < 100))
        .select("event_id")
    )
    assert got == want
    # time travel still reads the pre-rewrite snapshot
    assert _rows(read_iceberg(spark, loc, snapshot_id=pre_snap)) == before
    # the clustering column never leaks into the read schema
    assert "__zorder__" not in read_iceberg(spark, loc).columns


def test_zorder_prunes_where_single_sort_cannot(spark, tmp_path):
    """The reason z-order exists: a layout sorted on user_id alone
    serves user_id probes but leaves ts bounds file-wide; the z-order
    layout serves BOTH, each at partial (~sqrt) efficiency."""
    df = _events(spark)
    thr_ts = dt.datetime(2024, 1, 8, tzinfo=dt.timezone.utc)

    loc_s = str(tmp_path / "sorted")
    loc_z = str(tmp_path / "zorder")
    for loc in (loc_s, loc_z):
        for i in range(4):
            write_iceberg(
                df.where(F.pmod(F.col("event_id"), F.lit(4)) == i)
                .coalesce(1),
                loc, mode="overwrite" if i == 0 else "append",
            )
        total = sum(f.file_size for f in IcebergLocalTable(loc).scan())
        kw = (
            {"sort_by": ["user_id"]} if loc == loc_s
            else {"zorder_by": ["user_id", "ts"]}
        )
        compact_iceberg_partitions(
            spark, loc, target_file_bytes=max(1, total // 16), **kw
        )

    ts_probe = [("ts", "<", thr_ts)]
    s, z = IcebergLocalTable(loc_s), IcebergLocalTable(loc_z)
    s_hit, s_live = len(s.scan(filters=ts_probe)), len(s.scan())
    z_hit, z_live = len(z.scan(filters=ts_probe)), len(z.scan())
    # dedicated sort on user_id: ts bounds stay file-wide → no pruning
    assert s_hit == s_live
    # z-order: the same ts probe prunes
    assert z_hit < z_live
    # and user_id probes still prune on the z layout too
    assert len(z.scan(filters=[("user_id", "<", -500)])) < z_live
    # both layouts answer the probe identically
    a = _rows(read_iceberg(spark, loc_s, filters=ts_probe)
              .where(F.col("ts") < F.lit(thr_ts)))
    b = _rows(read_iceberg(spark, loc_z, filters=ts_probe)
              .where(F.col("ts") < F.lit(thr_ts)))
    assert a == b and len(a) > 0


def test_zorder_preserves_partition_layout(spark, tmp_path):
    """Under a hive partition spec the z clustering applies WITHIN each
    partition and the layout (dir depth, partition values) survives —
    later partitioned appends must still work."""
    df = _events(spark, 4000).withColumn(
        "grp", (F.col("event_id") % 2).cast("string")
    )
    loc = _striped_table(spark, tmp_path, df, partition_by=["grp"])
    before = _rows(read_iceberg(spark, loc))
    t = IcebergLocalTable(loc)
    total = sum(f.file_size for f in t.scan())
    compact_iceberg_partitions(
        spark, loc, target_file_bytes=max(1, total // 16),
        zorder_by=["user_id", "amount"],
    )
    t = IcebergLocalTable(loc)
    assert all(f.partition.get("grp") in ("0", "1") for f in t.scan())
    assert _rows(read_iceberg(spark, loc)) == before
    # post-rewrite appends keep working on the same layout
    write_iceberg(df.limit(10).coalesce(1), loc, mode="append")
    assert len(_rows(read_iceberg(spark, loc))) == len(before) + 10


def test_zorder_handles_nulls_and_low_cardinality(spark, tmp_path):
    """NULLs bucket to the low corner (never dropped); a near-constant
    column degrades to few buckets without erroring."""
    df = _events(spark, 3000).select(
        "event_id",
        F.when(F.col("event_id") % 10 == 0, None)
        .otherwise(F.col("user_id")).alias("user_id"),
        F.lit("same").alias("kind"),
        "amount",
    )
    loc = _striped_table(spark, tmp_path, df)
    before = _rows(read_iceberg(spark, loc))
    total = sum(f.file_size for f in IcebergLocalTable(loc).scan())
    compact_iceberg_partitions(
        spark, loc, target_file_bytes=max(1, total // 8),
        zorder_by=["user_id", "kind"],
    )
    assert _rows(read_iceberg(spark, loc)) == before


def test_zorder_argument_validation(spark, tmp_path):
    df = _events(spark, 100)
    loc = _striped_table(spark, tmp_path, df)
    with pytest.raises(ValueError, match="mutually exclusive"):
        compact_iceberg_partitions(
            spark, loc, sort_by=["user_id"], zorder_by=["user_id", "ts"]
        )
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_column(read_iceberg(spark, loc), ["user_id"], est_rows=100)


def test_sampled_boundaries_are_weighted_quantiles(spark):
    """Boundary estimation: deterministic, ascending, bounded count, and
    quantile-shaped (a heavy hitter occupies its mass, not one slot)."""
    # 90% of rows are value 5; the rest uniform 0..99
    df = spark.range(10000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 5 ELSE CAST(id % 100 AS BIGINT) END AS v"
    )
    b1 = sampled_boundaries(df, "v", 16, est_rows=10000)
    b2 = sampled_boundaries(df, "v", 16, est_rows=10000)
    assert b1 == b2  # deterministic
    assert b1 == sorted(set(b1)) and len(b1) <= 15
    # the hitter's mass collapses to one boundary at 5; uppers spread
    assert b1.count(5) == 1 and any(x > 5 for x in b1)
    # all-null column -> no boundaries, bucket 0 everywhere
    nulls = spark.range(100).selectExpr("CAST(NULL AS BIGINT) AS v")
    assert sampled_boundaries(nulls, "v", 16, est_rows=100) == []


def test_sampled_boundaries_survive_low_cardinality_at_scale(spark):
    """Sampling rate is sized from the column's DISTINCT count, not row
    count: a few-valued column on a huge table keeps its full value set
    (the old row-count sizing drove p into the thousands and silently
    returned [] — no clustering on that column at all)."""
    df = spark.range(20000).selectExpr(
        "CAST(id % 4 AS BIGINT) AS v"
    )
    # est_rows is back-compat-ignored; even claiming 10^9 rows the four
    # distinct values all survive and produce real boundaries
    b = sampled_boundaries(df, "v", 8, est_rows=1_000_000_000)
    assert set(b) >= {1, 2, 3}  # every step between the 4 values present


def test_interleave_bit_budget_is_guarded_and_capped(spark):
    """The Morton code is 64-bit and refuses to wrap: interleave_expr
    raises past 62 bit positions, and zorder_column auto-caps bits so
    many-column requests stay correct instead of silently scrambling
    (32-bit shiftleft takes shift mod 32)."""
    from ner_spark.iceberg.zorder import bucket_expr, interleave_expr

    with pytest.raises(ValueError, match="bit budget"):
        interleave_expr([F.lit(0), F.lit(0)], bits=32)

    # six z columns at the default 6 bits would need 36 positions on an
    # int (wraps at 31); the cap keeps 62/6 = 10 bits/column and the
    # code must stay non-negative with every column still contributing
    df = spark.range(512).selectExpr(
        *[f"CAST(pmod(hash(id * {3 + i}), 97) AS BIGINT) AS c{i}"
          for i in range(6)]
    )
    z = zorder_column(df, [f"c{i}" for i in range(6)], bits=6)
    stats = df.select(z.alias("z")).agg(
        F.min("z").alias("lo"), F.countDistinct("z").alias("nd")
    ).first()
    assert stats["lo"] >= 0
    assert stats["nd"] > 64  # real multi-column spread, not a few cells

    # high-bits two-column request: position 31 would flip the sign on
    # int32; on bigint the code stays non-negative and ordered
    wide = df.select("c0", "c1")
    zz = interleave_expr(
        [bucket_expr("c0", list(range(1, 97))),
         bucket_expr("c1", list(range(1, 97)))],
        bits=16,
    )
    assert wide.select(zz.alias("z")).agg(F.min("z")).first()[0] >= 0
