"""Iceberg partition transforms + hidden partitioning (SURVEY.md §4.4).

Three layers of evidence, strongest first:

1. **Spec known-answer tests**: the bucket transform's murmur3 values are
   pinned to the numbers published in the Iceberg spec's Appendix B, so
   bucket ids here are bit-identical to any real Iceberg writer's.
2. **Dual-implementation differential**: the vectorized numpy murmur3
   (write path) against the pure-python one (planner path) on random
   variable-length inputs — the invariant that makes write-side layout
   and planner-side pruning agree.
3. **End-to-end write/scan parity**: every row of every data file must
   satisfy ``transform(row.source) == file.partition[field]``, pruned
   reads must equal unpruned-read-then-filter, and pruning must actually
   drop files (no vacuous passes).
"""

from __future__ import annotations

import datetime as dt
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from ner_spark.iceberg import transforms as T
from ner_spark.iceberg.spark_io import (
    compact_iceberg,
    merge_upsert_iceberg,
    merge_upsert_iceberg_mor,
    read_iceberg,
    write_iceberg,
)
from ner_spark.iceberg.table import IcebergLocalTable


# ------------------------------------------------------------- spec KATs
def test_murmur3_spec_known_answers():
    """Values published in the Iceberg spec, Appendix B."""
    assert T.murmur3_32(struct.pack("<q", 34)) == 2017239379  # int & long
    assert T.murmur3_32(b"iceberg") == 1210000089  # string
    assert T.murmur3_32(struct.pack("<q", 17486)) == -653330422  # date
    assert (
        T.murmur3_32(struct.pack("<q", 1510871468000000)) == -2047944441
    )  # timestamp micros


def test_bucket_transform_values():
    # bucket = (hash & Integer.MAX_VALUE) % N
    assert T.apply_transform("bucket[16]", "long", 34) == 2017239379 % 16
    assert T.apply_transform("bucket[16]", "string", "iceberg") == (
        1210000089 % 16
    )
    # negative hash must mask, not mirror
    assert T.apply_transform("bucket[10]", "date", 17486) == (
        (-653330422 & 0x7FFFFFFF) % 10
    )
    assert T.apply_transform("bucket[4]", "long", None) is None


def test_numpy_murmur3_matches_pure_python():
    rng = np.random.default_rng(11)
    # variable-length byte strings incl. empty and all tail lengths
    blobs = [bytes(rng.integers(0, 256, size=int(n))) for n in
             list(range(0, 9)) + list(rng.integers(0, 64, size=200))]
    width = max(len(b) for b in blobs) + 3
    buf = np.zeros((len(blobs), width), dtype=np.uint8)
    for i, b in enumerate(blobs):
        buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    lengths = np.array([len(b) for b in blobs], dtype=np.int64)
    vec = T.murmur3_32_numpy(buf, lengths)
    pure = np.array([T.murmur3_32(b) for b in blobs], dtype=np.int32)
    assert (vec == pure).all()


def test_numpy_bucket_helpers_match_pure_python():
    rng = np.random.default_rng(5)
    longs = rng.integers(-(2**62), 2**62, size=500)
    got = T.bucket_longs_numpy(longs, 32)
    want = [T.apply_transform("bucket[32]", "long", int(v)) for v in longs]
    assert [int(x) for x in got] == want
    strs = [
        "".join(chr(rng.integers(32, 0x2FA0)) for _ in range(rng.integers(0, 24)))
        for _ in range(300)
    ] + [None, "", "日本語テキスト"]
    got_s = T.bucket_strings_numpy(strs, 16)
    for s, g in zip(strs, got_s):
        if s is None:
            assert int(g) == -1  # caller re-masks nulls
        else:
            assert int(g) == T.apply_transform("bucket[16]", "string", s)


# ------------------------------------------------------- unit transforms
def test_truncate_floors_negatives():
    assert T.apply_transform("truncate[10]", "long", -1) == -10
    assert T.apply_transform("truncate[10]", "int", 19) == 10
    assert T.apply_transform("truncate[3]", "string", "abcdef") == "abc"
    assert T.apply_transform("truncate[3]", "string", "ab") == "ab"


def test_temporal_ordinals_pre_and_post_epoch():
    us = T.MICROS_PER_DAY
    assert T.apply_transform("day", "timestamp", 0) == 0
    assert T.apply_transform("day", "timestamp", us - 1) == 0
    assert T.apply_transform("day", "timestamp", -1) == -1  # floor, not trunc
    assert T.apply_transform("day", "date", 17486) == 17486
    assert T.apply_transform("hour", "timestamp", 3 * T.MICROS_PER_HOUR) == 3
    nov2017 = 1510871468000000
    assert T.apply_transform("month", "timestamp", nov2017) == (2017 - 1970) * 12 + 10
    assert T.apply_transform("year", "timestamp", nov2017) == 47
    assert T.apply_transform("month", "date", -1) == -1  # 1969-12-31
    assert T.apply_transform("year", "date", -1) == -1


def test_parse_partition_field():
    assert T.parse_partition_field("conv_id") == ("conv_id", "identity")
    assert T.parse_partition_field("days(ts)") == ("ts", "day")
    assert T.parse_partition_field("day(ts)") == ("ts", "day")
    assert T.parse_partition_field("bucket(16, conv_id)") == (
        "conv_id",
        "bucket[16]",
    )
    assert T.parse_partition_field("truncate(4, sku)") == ("sku", "truncate[4]")
    with pytest.raises(ValueError):
        T.parse_partition_field("bucket(conv_id)")  # missing N
    with pytest.raises(ValueError):
        T.parse_partition_field("median(ts)")


def test_result_types_and_validation():
    assert T.result_type("bucket[8]", "string") == "int"
    assert T.result_type("day", "timestamp") == "int"
    assert T.result_type("truncate[4]", "long") == "long"
    assert T.result_type("truncate[4]", "string") == "string"
    with pytest.raises(NotImplementedError):
        T.result_type("hour", "date")
    with pytest.raises(NotImplementedError):
        T.result_type("day", "long")


# ------------------------------------------------------------ end to end
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_table(spark, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("icetr") / "events")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    write_iceberg(ev, loc, partition_by=["days(ts)", "bucket(8, user_id)"])
    return loc, ev


def test_hidden_partition_roundtrip(spark, events_table):
    loc, ev = events_table
    back = read_iceberg(spark, loc)
    # hidden: derived fields never appear in the read schema
    assert back.columns == ev.columns
    assert (
        back.orderBy("event_id").collect() == ev.orderBy("event_id").collect()
    )


def test_write_scan_transform_parity(spark, events_table):
    """Every data file's rows satisfy transform(source) == partition value
    — the invariant that makes planner-side pruning sound."""
    import pyarrow.parquet as pq

    loc, _ = events_table
    files = IcebergLocalTable(loc).scan()
    assert files, "fixture wrote no files"
    checked = 0
    for f in files:
        tb = pq.read_table(f.path, columns=["ts", "user_id"]).to_pydict()
        for ts, uid in zip(tb["ts"], tb["user_id"]):
            m = int(
                ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
            )
            assert T.apply_transform("day", "timestamp", m) == f.partition["ts_day"]
            assert (
                T.apply_transform("bucket[8]", "long", uid)
                == f.partition["user_id_bucket"]
            )
            checked += 1
    assert checked > 0


def test_day_transform_prunes_time_range(spark, events_table):
    loc, ev = events_table
    t = IcebergLocalTable(loc)
    total = len(t.scan())
    lo, hi = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 12)
    flt = [("ts", ">=", lo), ("ts", "<", hi)]
    pruned = t.scan(filters=flt)
    assert 0 < len(pruned) < total  # pruning engaged, not vacuous
    # hidden partitioning: the predicate names ts, never ts_day
    got = read_iceberg(spark, loc, filters=flt)
    want = ev.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
    assert got.count() == want.count() > 0
    assert (
        got.orderBy("event_id").collect() == want.orderBy("event_id").collect()
    )


def test_bucket_transform_prunes_equality(spark, events_table):
    loc, ev = events_table
    t = IcebergLocalTable(loc)
    total = len(t.scan())
    uid = ev.select("user_id").first()[0]
    pruned = t.scan(filters=[("user_id", "=", uid)])
    # bucket(8): an equality predicate addresses exactly one bucket
    assert 0 < len(pruned) <= -(-total // 8) + 8
    got = read_iceberg(spark, loc, filters=[("user_id", "=", uid)])
    assert got.count() == ev.filter(F.col("user_id") == uid).count() > 0
    # bucket serves equality only: a range predicate over user_id still
    # reads correctly (file BOUNDS may prune; bucket values must not)
    rng = read_iceberg(spark, loc, filters=[("user_id", ">", uid)])
    assert rng.count() == ev.filter(F.col("user_id") > uid).count()


def test_strict_range_keeps_boundary_partition(spark, tmp_path):
    """ts < midnight must keep the previous day's partition (weakened to
    day(ts) <= day(c)) — rows strictly before the boundary live there."""
    loc = str(tmp_path / "bound")
    rows = [
        (1, dt.datetime(2024, 1, 5, 23, 59, 59)),
        (2, dt.datetime(2024, 1, 6, 0, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp_ntz")
    write_iceberg(df, loc, partition_by=["days(ts)"])
    flt = [("ts", "<", dt.datetime(2024, 1, 6))]
    got = read_iceberg(spark, loc, filters=flt)
    assert [r["id"] for r in got.collect()] == [1]


def test_truncate_and_month_partitions(spark, tmp_path):
    loc = str(tmp_path / "tr")
    df = spark.createDataFrame(
        [(-19, "alpha", dt.datetime(2023, 12, 31)),
         (7, "alps", dt.datetime(2024, 1, 1)),
         (23, "beta", dt.datetime(2024, 2, 15))],
        "v long, name string, ts timestamp_ntz",
    )
    write_iceberg(
        df, loc,
        partition_by=["truncate(10, v)", "truncate(2, name)", "months(ts)"],
    )
    t = IcebergLocalTable(loc)
    parts = sorted(
        (f.partition["v_trunc"], f.partition["name_trunc"],
         f.partition["ts_month"])
        for f in t.scan()
    )
    assert parts == [(-20, "al", 647), (0, "al", 648), (20, "be", 649)]
    # range predicate on v prunes via order-preserving truncate
    pruned = t.scan(filters=[("v", ">=", 20)])
    assert [f.partition["v_trunc"] for f in pruned] == [20]
    got = read_iceberg(spark, loc, filters=[("v", ">=", 20)])
    assert [r["name"] for r in got.collect()] == ["beta"]


def test_compact_then_append_keeps_layout(spark, events_table, tmp_path):
    """Compaction must preserve the hive layout: Spark's partition
    discovery rejects mixed dir depths, so an unpartitioned rewrite would
    poison every later partitioned append."""
    loc = str(tmp_path / "ca")
    ev = spark.read.parquet(f"{SF}/events.parquet").limit(200)
    write_iceberg(ev, loc, partition_by=["days(ts)"])
    compact_iceberg(spark, loc)
    write_iceberg(ev.limit(10), loc, mode="append")
    assert read_iceberg(spark, loc).count() == 210
    # compacted files keep their partition values → pruning still works
    t = IcebergLocalTable(loc)
    assert all(f.partition.get("ts_day") is not None for f in t.scan())


def test_merge_modes_on_transform_partitioned_table(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, f"u{i % 5}", float(i), dt.datetime(2024, 1, 1 + i % 9))
         for i in range(40)],
        "id long, who string, val double, ts timestamp_ntz",
    )
    delta = spark.createDataFrame(
        [(3, "uX", 99.0, dt.datetime(2024, 1, 20)),
         (77, "uY", 77.0, dt.datetime(2024, 1, 21))],
        "id long, who string, val double, ts timestamp_ntz",
    )
    out = {}
    for name, fn in (("cow", merge_upsert_iceberg),
                     ("mor", merge_upsert_iceberg_mor)):
        loc = str(tmp_path / name)
        write_iceberg(base, loc,
                      partition_by=["days(ts)", "bucket(4, who)"])
        fn(spark, loc, delta, "id")
        out[name] = sorted(
            (r["id"], r["who"], r["val"])
            for r in read_iceberg(spark, loc).collect()
        )
    assert out["cow"] == out["mor"]
    assert (3, "uX", 99.0) in out["cow"] and (77, "uY", 77.0) in out["cow"]
    assert len(out["cow"]) == 41


def test_spark_bucket_udf_null_and_large_values(spark):
    """Nulls stay null; values above 2^53 keep exact int64 semantics
    (the Arrow float64 pitfall the coalesce guard exists for)."""
    big = 2**61 + 12345
    df = spark.createDataFrame([(1, big), (2, None), (3, 34)], "id long, v long")
    col = T.spark_partition_column("bucket[16]", "v", "long")
    rows = {r["id"]: r["b"] for r in df.select("id", col.alias("b")).collect()}
    assert rows[2] is None
    assert rows[3] == 2017239379 % 16
    assert rows[1] == T.apply_transform("bucket[16]", "long", big)


def test_in_predicate_prunes_buckets_and_days(spark, events_table):
    """op='in' is a disjunction of equalities, so every transform serves
    it — bucket included. The repair-path shape: a small key list pushed
    down prunes to the union of the keys' buckets."""
    loc, ev = events_table
    t = IcebergLocalTable(loc)
    total = len(t.scan())
    uids = [r["user_id"] for r in
            ev.select("user_id").distinct().limit(2).collect()]
    want_buckets = {T.apply_transform("bucket[8]", "long", u) for u in uids}
    pruned = t.scan(filters=[("user_id", "in", uids)])
    assert 0 < len(pruned) < total
    assert {f.partition["user_id_bucket"] for f in pruned} <= want_buckets
    got = read_iceberg(spark, loc, filters=[("user_id", "in", uids)])
    assert got.count() == ev.filter(F.col("user_id").isin(uids)).count() > 0
    # temporal in-list through days()
    days = [dt.datetime(2024, 1, 3, 12), dt.datetime(2024, 1, 9, 1)]
    p2 = t.scan(filters=[("ts", "in", days)])
    assert {f.partition["ts_day"] for f in p2} <= {
        T.apply_transform(
            "day", "timestamp",
            int(d.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000),
        )
        for d in days
    }


def test_cdc_repair_prunes_bucketed_transcripts(spark, small_inputs, tmp_path):
    """The north-rule repair shape end-to-end on a bucket(4, conv_id)
    transcript layout: a correction tick re-reads ONLY the corrected
    conversation's bucket (pruned from manifest metadata), and the
    repaired mentions state matches a from-scratch recompute."""
    import pandas as pd

    from ner_spark.iceberg.spark_io import merge_upsert_iceberg_mor
    from ner_spark.nlp.stage import detect_mentions
    from ner_spark.plans.incremental import incremental_kg_update

    tx = small_inputs["transcripts"]
    gaz = small_inputs["gazetteer_pdf"]
    emb = small_inputs["entity_embeddings"]
    src = str(tmp_path / "transcripts")
    wh = str(tmp_path / "wh")
    write_iceberg(tx, src, partition_by=["bucket(4, conv_id)"])

    incremental_kg_update(spark, src, wh, gaz, emb)  # tick 1: full

    convs = sorted(
        r["conv_id"] for r in tx.select("conv_id").distinct().collect()
    )
    touched = convs[0]
    corrected = (
        tx.filter(F.col("conv_id") == touched)
        .withColumn("text", F.upper(F.col("text")))
        .select(*tx.columns)
    )
    merge_upsert_iceberg_mor(spark, src, corrected, key="conv_id")

    r = incremental_kg_update(spark, src, wh, gaz, emb)  # repair tick
    assert r["processed_rows"] == corrected.count() > 0

    # the pruned scan the repair issues touches only the key's bucket
    t = IcebergLocalTable(src)
    total = len(t.scan())
    pruned = t.scan(filters=[("conv_id", "in", [touched])])
    bucket = T.apply_transform("bucket[4]", "string", touched)
    assert 0 < len(pruned) < total
    assert all(f.partition["conv_id_bucket"] == bucket for f in pruned)

    # repaired derived state ≡ recompute over current transcripts
    cur = read_iceberg(spark, src)
    want = (
        detect_mentions(cur, gaz, spark)
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "start", "end"])
        .reset_index(drop=True)
    )
    got = (
        r["mentions"]
        .select(*want.columns)
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "start", "end"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_streaming_sink_into_transform_layout(spark, tmp_path):
    """The streaming CDC seam inherits hidden partitioning: a
    foreachBatch iceberg_sink creating a bucket(4, conv_id)-partitioned
    table lands every micro-batch through the partition projection, and
    the accumulated table prunes on the source column."""
    from ner_spark.iceberg.spark_io import iceberg_sink

    loc = str(tmp_path / "sink")
    sink = iceberg_sink(loc, partition_by=["bucket(4, conv_id)"])
    b0 = spark.range(0, 40).selectExpr(
        "concat('conv-', id % 10) as conv_id", "id as turn_idx",
        "concat('text ', id) as text",
    )
    b1 = spark.range(40, 60).selectExpr(
        "concat('conv-', id % 10) as conv_id", "id as turn_idx",
        "concat('text ', id) as text",
    )
    sink(b0, 0)
    sink(b1, 1)
    t = IcebergLocalTable(loc)
    files = t.scan()
    assert all(f.partition.get("conv_id_bucket") is not None for f in files)
    pruned = t.scan(filters=[("conv_id", "=", "conv-3")])
    want_bucket = T.apply_transform("bucket[4]", "string", "conv-3")
    assert 0 < len(pruned) < len(files)
    assert all(f.partition["conv_id_bucket"] == want_bucket for f in pruned)
    got = read_iceberg(spark, loc, filters=[("conv_id", "=", "conv-3")])
    assert got.count() == 6  # ids 3,13,23,33,43,53
