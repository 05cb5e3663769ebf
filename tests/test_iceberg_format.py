"""Iceberg v2 local table format (ner_spark.iceberg, SURVEY.md §4.4).

Independence strategy: the Avro container files this layer writes are
round-tripped through the JVM's bundled ``org.apache.avro`` reader
(avro-1.12.1.jar ships with Spark) — a fully independent decoder of the
public format — and every table-level behavior (time travel, pruning,
merge, expiry) is differentially checked against plain-Spark recomputes
of the same frames.
"""

from __future__ import annotations

import io
import os

import pytest

from ner_spark import io as nio
from ner_spark.iceberg import avro_io
from ner_spark.iceberg.spark_io import read_iceberg, write_iceberg
from ner_spark.iceberg.table import IcebergLocalTable, decode_single, encode_single


# ------------------------------------------------------------- avro codec


def test_zigzag_spec_vectors():
    # the worked examples from the Avro spec's binary-encoding section
    for n, want in [
        (0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
        (2, b"\x04"), (64, b"\x80\x01"), (-64, b"\x7f"),
    ]:
        assert avro_io._zigzag(n) == want
    for n in (2**62, -(2**63), 2**63 - 1, 123456789):
        assert avro_io._read_zigzag(io.BytesIO(avro_io._zigzag(n))) == n


def test_container_roundtrip(tmp_path):
    schema = {
        "type": "record", "name": "r", "fields": [
            {"name": "a", "type": "long"},
            {"name": "s", "type": ["null", "string"], "default": None},
            {"name": "m", "type": {"type": "map", "values": "bytes"}},
            {"name": "arr", "type": {"type": "array", "items": {
                "type": "record", "name": "kv", "fields": [
                    {"name": "k", "type": "int"},
                    {"name": "v", "type": ["null", "bytes"], "default": None},
                ]}}},
            {"name": "d", "type": "double"},
        ],
    }
    recs = [
        {"a": -7, "s": None, "m": {"x": b"\x01\x02"},
         "arr": [{"k": 1, "v": b"z"}, {"k": 2, "v": None}], "d": 3.5},
        {"a": 2**40, "s": "héllo", "m": {}, "arr": [], "d": -0.25},
    ]
    p = str(tmp_path / "t.avro")
    avro_io.write_container(p, schema, recs, {"custom": "v"})
    _sch, meta, out = avro_io.read_container(p)
    assert out == recs
    assert meta["custom"] == "v"


def test_single_value_serialization_roundtrip():
    cases = [
        ("int", -42), ("long", 2**40), ("double", -1.5), ("float", 0.5),
        ("boolean", True), ("string", "héllo"), ("date", 19000),
        ("timestamptz", 1_700_000_000_000_000), ("binary", b"\x00\xff"),
    ]
    for t, v in cases:
        assert decode_single(t, encode_single(t, v)) == v
    # little-endian per spec appendix D
    assert encode_single("int", 1) == b"\x01\x00\x00\x00"
    assert encode_single("long", 1) == b"\x01" + b"\x00" * 7


# ------------------------------------------------------- table fixtures


@pytest.fixture(scope="module")
def tbl(spark, tmp_path_factory):
    """A 3-snapshot table: overwrite → append → CoW merge (via ner_spark.io).

    Module-scoped; mutating tests (expiry) build their own table.
    """
    loc = str(tmp_path_factory.mktemp("iceberg") / "tbl")
    df1 = spark.range(0, 100).selectExpr(
        "id", "cast(id % 4 as int) as bucket",
        "concat('name_', id) as name", "cast(id * 1.5 as double) as score",
    )
    s1 = write_iceberg(df1, loc, partition_by=["bucket"], run_id="r1")
    df2 = spark.range(100, 120).selectExpr(
        "id", "cast(id % 4 as int) as bucket",
        "concat('name_', id) as name", "cast(id * 1.5 as double) as score",
    )
    s2 = write_iceberg(df2, loc, mode="append", run_id="r2")
    delta = spark.range(110, 130).selectExpr(
        "id", "cast(id % 4 as int) as bucket",
        "concat('upd_', id) as name", "cast(0.0 as double) as score",
    )
    nio.merge_upsert(spark, loc, delta, "id", fmt="iceberg-local", run_id="r3")
    t = IcebergLocalTable(loc)
    s3 = t.current_snapshot()["snapshot-id"]
    return loc, t, (s1, s2, s3)


# ------------------------------------------- JVM avro reader (independent)


def _java_read(spark, path):
    jvm = spark._jvm
    rdr = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(path), rdr)
    recs = []
    while dfr.hasNext():
        recs.append(dfr.next())
    return dfr.getSchema(), recs


def _jbytes(bb):
    """java ByteBuffer → python bytes."""
    out = bytearray()
    dup = bb.duplicate()
    while dup.hasRemaining():
        out.append(dup.get() & 0xFF)
    return bytes(out)


def test_jvm_avro_decodes_manifest_list_and_manifest(spark, tbl):
    loc, t, _snaps = tbl
    snap = t.current_snapshot()
    jschema, jrecs = _java_read(spark, snap["manifest-list"])
    _, _, precs = avro_io.read_container(snap["manifest-list"])
    assert jschema.getName() == "manifest_file"
    assert len(jrecs) == len(precs) >= 1
    for j, p in zip(jrecs, precs):
        assert j.get("manifest_path").toString() == p["manifest_path"]
        assert int(str(j.get("manifest_length"))) == p["manifest_length"]
        assert int(str(j.get("sequence_number"))) == p["sequence_number"]
        assert int(str(j.get("added_rows_count"))) == p["added_rows_count"]
        assert int(str(j.get("added_snapshot_id"))) == p["added_snapshot_id"]

    mpath = precs[0]["manifest_path"]
    jschema2, jents = _java_read(spark, mpath)
    _, _, pents = avro_io.read_container(mpath)
    assert jschema2.getName() == "manifest_entry"
    assert len(jents) == len(pents) >= 1
    for j, p in zip(jents, pents):
        dj, dp = j.get("data_file"), p["data_file"]
        assert dj.get("file_path").toString() == dp["file_path"]
        assert int(str(dj.get("record_count"))) == dp["record_count"]
        assert int(str(dj.get("file_size_in_bytes"))) == dp["file_size_in_bytes"]
        assert int(str(j.get("status"))) == p["status"]
        jlb = dj.get("lower_bounds")
        plb = dp.get("lower_bounds")
        if plb:
            got = {int(str(r.get("key"))): _jbytes(r.get("value")) for r in jlb}
            want = {r["key"]: r["value"] for r in plb}
            assert got == want


def test_manifest_carries_spec_field_ids(tbl):
    """The spec's reserved field ids are what external readers key on."""
    _loc, t, _ = tbl
    snap = t.current_snapshot()
    schema, _meta, _recs = avro_io.read_container(snap["manifest-list"])
    ids = {f["name"]: f.get("field-id") for f in schema["fields"]}
    assert ids["manifest_path"] == 500
    assert ids["manifest_length"] == 501
    assert ids["added_snapshot_id"] == 503
    assert ids["sequence_number"] == 515
    assert ids["content"] == 517
    _, _, recs = avro_io.read_container(snap["manifest-list"])
    entry_schema, meta, _ents = avro_io.read_container(recs[0]["manifest_path"])
    by_name = {f["name"]: f for f in entry_schema["fields"]}
    assert by_name["status"]["field-id"] == 0
    assert by_name["data_file"]["field-id"] == 2
    dfields = {
        f["name"]: f.get("field-id")
        for f in by_name["data_file"]["type"]["fields"]
    }
    assert dfields["file_path"] == 100
    assert dfields["partition"] == 102
    assert dfields["record_count"] == 103
    assert dfields["lower_bounds"] == 125
    assert dfields["upper_bounds"] == 128
    assert meta["format-version"] == "2"
    assert meta["content"] == "data"


# --------------------------------------------------------- table behavior


def test_roundtrip_and_schema(spark, tbl):
    loc, t, _ = tbl
    cur = read_iceberg(spark, loc)
    assert cur.count() == 130
    assert cur.columns == ["id", "bucket", "name", "score"]
    row = cur.filter("id = 7").collect()[0]
    assert (row["bucket"], row["name"], row["score"]) == (3, "name_7", 10.5)
    assert t.spark_ddl() == "id bigint, bucket int, name string, score double"


def test_time_travel_and_lineage(spark, tbl):
    loc, t, (s1, s2, s3) = tbl
    assert read_iceberg(spark, loc, snapshot_id=s1).count() == 100
    assert read_iceberg(spark, loc, snapshot_id=s2).count() == 120
    # pre-merge snapshot still sees the original row after the CoW merge
    old = read_iceberg(spark, loc, snapshot_id=s2).filter("id = 115").collect()
    assert old[0]["name"] == "name_115"
    new = read_iceberg(spark, loc).filter("id = 115").collect()
    assert new[0]["name"] == "upd_115"
    # lineage: parent chain + strictly increasing sequence numbers
    snaps = {s["snapshot-id"]: s for s in t.snapshots()}
    assert snaps[s1]["parent-snapshot-id"] is None
    assert snaps[s2]["parent-snapshot-id"] == s1
    assert snaps[s3]["parent-snapshot-id"] == s2
    assert [snaps[s]["sequence-number"] for s in (s1, s2, s3)] == [1, 2, 3]
    assert snaps[s3]["summary"]["operation"] == "overwrite"
    assert snaps[s2]["summary"]["run_id"] == "r2"
    # as-of-timestamp resolves to the newest snapshot at or before ts
    assert (
        read_iceberg(spark, loc, as_of_ms=snaps[s2]["timestamp-ms"]).count()
        == 120
    )


def test_partition_and_bounds_pruning(spark, tbl):
    loc, t, (s1, s2, _s3) = tbl
    total = len(t.scan(snapshot_id=s2))
    part = t.scan(snapshot_id=s2, filters=[("bucket", "=", 2)])
    assert 0 < len(part) < total
    assert all(f.partition["bucket"] == 2 for f in part)
    # min/max bounds pruning on a NON-partition column: the append-only
    # second snapshot holds ids 100.. so files from snapshot 1 are skipped
    hi = t.scan(snapshot_id=s2, filters=[("id", ">=", 100)])
    assert 0 < len(hi) < total
    # pruned read ≡ unpruned read + filter (the differential that matters)
    for filters, cond in [
        ([("bucket", "=", 2)], "bucket = 2"),
        ([("id", ">=", 100)], "id >= 100"),
        ([("name", "=", "name_55")], "name = 'name_55'"),
    ]:
        a = read_iceberg(spark, loc, snapshot_id=s2, filters=filters)
        b = read_iceberg(spark, loc, snapshot_id=s2).filter(cond)
        assert sorted(r["id"] for r in a.collect()) == sorted(
            r["id"] for r in b.collect()
        )


def test_resume_contract_via_io_seam(spark, tmp_path):
    loc = str(tmp_path / "stage_out")
    df = spark.range(10).selectExpr("id", "cast(id as string) as s")
    assert not nio.table_complete(loc, fmt="iceberg-local")
    nio.write_table(df, loc, fmt="iceberg-local", run_id="runA")
    assert nio.table_complete(loc, run_id="runA", fmt="iceberg-local")
    assert not nio.table_complete(loc, run_id="runB", fmt="iceberg-local")
    got = nio.read_table(spark, loc, fmt="iceberg-local")
    assert got.count() == 10
    # a re-run overwrites idempotently and restamps
    nio.write_table(df, loc, fmt="iceberg-local", run_id="runB")
    assert nio.table_complete(loc, run_id="runB", fmt="iceberg-local")
    assert nio.read_table(spark, loc, fmt="iceberg-local").count() == 10


def test_expire_snapshots(spark, tmp_path):
    loc = str(tmp_path / "exp")
    df1 = spark.range(0, 40).selectExpr(
        "id", "cast(id % 4 as int) as bucket",
        "concat('name_', id) as name", "cast(id * 1.5 as double) as score",
    )
    s1 = write_iceberg(df1, loc, partition_by=["bucket"])
    delta = spark.range(30, 50).selectExpr(
        "id", "cast(id % 4 as int) as bucket",
        "concat('upd_', id) as name", "cast(0.0 as double) as score",
    )
    nio.merge_upsert(spark, loc, delta, "id", fmt="iceberg-local")
    t = IcebergLocalTable(loc)
    s3 = t.current_snapshot()["snapshot-id"]
    n_cur = read_iceberg(spark, loc).count()
    assert n_cur == 50
    before = {f.path for f in t.scan()}
    dead = t.expire_snapshots(keep_last=1)
    assert dead  # the pre-merge data files are gone from disk
    assert all(not os.path.exists(p) for p in dead)
    assert {f.path for f in t.scan()} == before  # current snapshot intact
    assert read_iceberg(spark, loc).count() == 50
    assert [s["snapshot-id"] for s in t.snapshots()] == [s3]
    with pytest.raises(ValueError, match="expired or never existed"):
        t.scan(snapshot_id=s1)


def test_concurrent_commit_conflict_detected(spark, tmp_path):
    """Two writers racing from the same base version: the loser must
    fail loudly (CommitConflictError), never silently overwrite the
    winner's metadata — the HadoopTables fail-if-exists swap."""
    from ner_spark.iceberg.table import CommitConflictError

    loc = str(tmp_path / "cc")
    write_iceberg(
        spark.range(0, 5).selectExpr("id", "id * 2 as v"), loc
    )
    t_stale = IcebergLocalTable(loc)
    stale_md = t_stale.metadata()
    stale_v = t_stale.current_version()
    # a second writer wins the race with a normal commit
    write_iceberg(
        spark.range(5, 8).selectExpr("id", "id * 2 as v"), loc,
        mode="append",
    )
    with pytest.raises(CommitConflictError, match="concurrent"):
        t_stale._write_metadata(stale_md, stale_v + 1)
    # the winner's commit is intact and the table still reads cleanly
    assert read_iceberg(spark, loc).count() == 8
    assert IcebergLocalTable(loc).current_version() == stale_v + 1


def test_version_hint_crash_recovery(spark, tmp_path):
    """A crash between the version-file link (the commit point) and the
    hint update must not wedge the table: current_version rolls forward
    to the newest committed version and the next commit self-heals."""
    loc = str(tmp_path / "hint")
    write_iceberg(spark.range(0, 5).selectExpr("id", "id as v"), loc)
    write_iceberg(
        spark.range(5, 8).selectExpr("id", "id as v"), loc, mode="append"
    )
    t = IcebergLocalTable(loc)
    v = t.current_version()
    # simulate the crash: regress the hint below the committed version
    with open(t._hint_path(), "w") as f:
        f.write(str(v - 1))
    t2 = IcebergLocalTable(loc)
    assert t2.current_version() == v  # rolled forward past the stale hint
    assert read_iceberg(spark, loc).count() == 8
    # a new commit succeeds (no CommitConflictError livelock) and heals
    write_iceberg(
        spark.range(8, 9).selectExpr("id", "id as v"), loc, mode="append"
    )
    with open(IcebergLocalTable(loc)._hint_path()) as f:
        assert int(f.read().strip()) == v + 1
    assert read_iceberg(spark, loc).count() == 9


def test_expired_history_refuses_since_creation_delta(spark, tmp_path):
    """After expiry breaks the parent chain, a since-creation changelog
    must refuse rather than silently return a partial delta."""
    from ner_spark.iceberg.spark_io import read_iceberg_changelog

    loc = str(tmp_path / "exp_lineage")
    write_iceberg(spark.range(0, 5).selectExpr("id", "id as v"), loc,
                  mode="append")
    write_iceberg(spark.range(5, 9).selectExpr("id", "id as v"), loc,
                  mode="append")
    write_iceberg(spark.range(9, 12).selectExpr("id", "id as v"), loc,
                  mode="append")
    t = IcebergLocalTable(loc)
    t.expire_snapshots(keep_last=2)
    with pytest.raises(ValueError, match="expired"):
        read_iceberg_changelog(spark, loc)
    # a retained from-snapshot still works
    t = IcebergLocalTable(loc)
    oldest = min(t.snapshots(), key=lambda s: s["sequence-number"])
    log = read_iceberg_changelog(
        spark, loc, from_snapshot_id=oldest["snapshot-id"]
    )
    assert log.count() == 3


def test_expire_snapshots_by_age(spark, tmp_path):
    """older_than_ms: snapshots newer than the horizon survive even
    beyond keep_last — the 'keep N days of time travel' retention
    contract — while older unpinned snapshots expire."""
    loc = str(tmp_path / "exp_age")

    def mk(lo, hi):
        return spark.range(lo, hi).selectExpr("id", "id * 2 as v")

    write_iceberg(mk(0, 5), loc, mode="append")
    write_iceberg(mk(5, 10), loc, mode="append")
    write_iceberg(mk(10, 15), loc, mode="append")
    write_iceberg(mk(15, 20), loc, mode="append")
    t = IcebergLocalTable(loc)
    snaps = sorted(t.snapshots(), key=lambda s: s["sequence-number"])
    horizon = snaps[2]["timestamp-ms"]  # commits 1-2 are strictly older

    t.expire_snapshots(keep_last=1, older_than_ms=horizon)
    t = IcebergLocalTable(loc)
    left = {s["snapshot-id"] for s in t.snapshots()}
    # snapshot 3 survived beyond keep_last=1 because it's newer than
    # the horizon; snapshots 1-2 expired
    assert left == {snaps[2]["snapshot-id"], snaps[3]["snapshot-id"]}
    assert read_iceberg(spark, loc).count() == 20
    # time travel within the retained window still works
    assert read_iceberg(
        spark, loc, snapshot_id=snaps[2]["snapshot-id"]
    ).count() == 15
    # no age horizon (default) keeps only keep_last + pins, as before
    t.expire_snapshots(keep_last=1)
    assert [s["snapshot-id"] for s in IcebergLocalTable(loc).snapshots()] \
        == [snaps[3]["snapshot-id"]]
    assert read_iceberg(spark, loc).count() == 20


def test_bound_truncation():
    from ner_spark.iceberg.table import truncate_lower, truncate_upper

    long_s = "abcdefghijklmnopqrstuvwxyz"
    lo = truncate_lower("string", long_s)
    hi = truncate_upper("string", long_s)
    assert lo == long_s[:16] and lo <= long_s
    assert hi == long_s[:15] + "q" and hi > long_s  # last kept char +1
    b = bytes(range(200, 232))
    blo, bhi = truncate_lower("binary", b), truncate_upper("binary", b)
    assert blo == b[:16] and blo <= b
    assert bhi == b[:15] + bytes([b[15] + 1]) and bhi > b
    # all-0xFF prefix can't be incremented → bound dropped
    assert truncate_upper("binary", b"\xff" * 32) is None
    # short values pass through untouched
    assert truncate_lower("string", "abc") == "abc"
    assert truncate_upper("string", "abc") == "abc"


def test_kg_pipeline_on_iceberg_local(spark, small_inputs, tmp_path):
    """North-rule materialization: the full KG pipeline committing every
    stage as a REAL Iceberg v2 table — byte-identical triples to the
    in-memory run, stage-level resume through snapshot run_id stamps."""
    import pandas as pd

    from ner_spark.plans.kg import build_kg

    wh = str(tmp_path / "wh")
    key = ["subj", "pred", "obj", "conv_id", "turn_idx"]

    def _run(resume):
        return build_kg(
            spark,
            small_inputs["transcripts"],
            small_inputs["gazetteer_pdf"],
            small_inputs["entity_embeddings"],
            warehouse=wh,
            run_id="icb",
            resume=resume,
            fmt="iceberg-local",
        )

    def _t(out):
        return (
            out["triples"].toPandas().sort_values(key, kind="mergesort")
            .reset_index(drop=True)
        )

    iceberg_triples = _t(_run(resume=False))
    base = build_kg(
        spark,
        small_inputs["transcripts"],
        small_inputs["gazetteer_pdf"],
        small_inputs["entity_embeddings"],
    )
    pd.testing.assert_frame_equal(iceberg_triples, _t(base))

    stages = ["mentions", "links", "edges", "entities_canon", "triples",
              "entities"]
    versions = {}
    for s in stages:
        t = IcebergLocalTable(os.path.join(wh, s))
        assert t.exists(), s
        assert t.current_snapshot()["summary"]["run_id"] == "icb", s
        versions[s] = t.current_version()

    # simulated kill: triples' commit vanishes → only downstream rebuilds
    import shutil

    shutil.rmtree(os.path.join(wh, "triples"))
    resumed = _t(_run(resume=True))
    pd.testing.assert_frame_equal(iceberg_triples, resumed)
    for s in stages:
        t = IcebergLocalTable(os.path.join(wh, s))
        if s == "triples":
            assert t.current_version() == 2  # fresh create + one commit
        else:
            assert t.current_version() == versions[s], s  # untouched


def test_timestamp_and_date_columns(spark, tmp_path):
    """Footer stats for temporal columns arrive as datetime/date objects;
    commits must serialize them (micros/days) and datetime filters must
    prune files — the input-hint transcript schema carries a ts column,
    so this is the north rule's own shape."""
    import datetime as dt

    loc = str(tmp_path / "ts")
    df = spark.range(0, 48).selectExpr(
        "id",
        "timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,0,id,0,0) AS ts",
        "date'2026-01-01' + cast(id as int) AS d",
    ).repartitionByRange(4, "id")
    write_iceberg(df, loc)
    t = IcebergLocalTable(loc)
    files = t.scan()
    assert all("ts" in f.lower_bounds and "d" in f.lower_bounds for f in files)
    # datetime / date predicates prune at the file level (range-clustered
    # files → late-cut timestamps skip early files)
    cut = dt.datetime(2026, 1, 2, 12, tzinfo=dt.timezone.utc)
    pruned = t.scan(filters=[("ts", ">=", cut)])
    assert 0 < len(pruned) < len(files)
    got = read_iceberg(spark, loc, filters=[("ts", ">=", cut)])
    want = read_iceberg(spark, loc).filter(
        "ts >= timestamp'2026-01-02 12:00:00'"
    )
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in want.collect()
    )
    dcut = dt.date(2026, 2, 1)
    gd = read_iceberg(spark, loc, filters=[("d", ">=", dcut)])
    assert sorted(r["id"] for r in gd.collect()) == list(range(31, 48))


def test_schema_evolution(spark, tmp_path):
    """Union-evolve on write: new nullable columns get fresh field ids,
    old files read back with nulls; int→long promotion widens in place."""
    loc = str(tmp_path / "evo")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    write_iceberg(v1, loc)
    t = IcebergLocalTable(loc)
    ids_before = {
        f["name"]: f["id"]
        for f in t._schema_struct(t.metadata())["fields"]
    }
    v2 = spark.createDataFrame(
        [(3, "c", 0.5, ["x"])],
        "id bigint, name string, score double, tags array<string>",
    )
    write_iceberg(v2, loc, mode="append")
    t = IcebergLocalTable(loc)
    md = t.metadata()
    struct = t._schema_struct(md)
    ids_after = {f["name"]: f["id"] for f in struct["fields"]}
    # existing columns keep their ids; new ones get fresh ids above them
    for name, fid in ids_before.items():
        assert ids_after[name] == fid, name
    assert ids_after["score"] > max(ids_before.values())
    assert md["current-schema-id"] == 1 and len(md["schemas"]) == 2
    # promotion: id widened to long in place
    assert {f["name"]: f["type"] for f in struct["fields"]}["id"] == "long"
    back = read_iceberg(spark, loc).orderBy("id").collect()
    assert [r["id"] for r in back] == [1, 2, 3]
    assert [r["score"] for r in back] == [None, None, 0.5]
    assert back[2]["tags"] == ["x"]
    # incompatible changes are rejected loudly
    bad = spark.createDataFrame([("x", "y")], "id string, name string")
    with pytest.raises(ValueError, match="incompatible type change"):
        write_iceberg(bad, loc, mode="append")


def test_incremental_read_and_compaction(spark, tmp_path):
    from ner_spark.iceberg.spark_io import (
        compact_iceberg,
        read_iceberg_incremental,
    )

    loc = str(tmp_path / "incr")
    mk = lambda a, b: spark.range(a, b).selectExpr(  # noqa: E731
        "id", "concat('n', id) as name"
    )
    s1 = write_iceberg(mk(0, 10), loc)
    s2 = write_iceberg(mk(10, 25), loc, mode="append")
    n_files = compact_iceberg(spark, loc, target_file_bytes=1 << 30)
    assert n_files == 1  # everything coalesced into one file
    t = IcebergLocalTable(loc)
    s3 = t.current_snapshot()["snapshot-id"]
    assert t.current_snapshot()["summary"]["operation"] == "replace"
    s4 = write_iceberg(mk(25, 30), loc, mode="append")
    # full read after compaction + append: all rows exactly once
    assert read_iceberg(spark, loc).count() == 30
    # incremental s1→current: the appends' rows, NOT the compacted rewrite
    inc = read_iceberg_incremental(spark, loc, s1)
    assert sorted(r["id"] for r in inc.collect()) == list(range(10, 30))
    # sub-ranges
    assert read_iceberg_incremental(spark, loc, s2, s3).count() == 0
    assert read_iceberg_incremental(spark, loc, s3, s4).count() == 5
    # crossing an overwrite is refused
    write_iceberg(mk(0, 5), loc, mode="overwrite")
    with pytest.raises(ValueError, match="overwrite"):
        read_iceberg_incremental(spark, loc, s1)


def test_streaming_sink_exactly_once(spark, tmp_path):
    """iceberg_sink: replayed foreachBatch invocations (same or older
    batch_id) are no-ops — the exactly-once commit protocol."""
    from ner_spark.iceberg.spark_io import iceberg_sink

    loc = str(tmp_path / "sink")
    sink = iceberg_sink(loc)
    b0 = spark.range(0, 5).selectExpr("id", "concat('a', id) as v")
    b1 = spark.range(5, 9).selectExpr("id", "concat('a', id) as v")
    sink(b0, 0)
    sink(b1, 1)
    assert read_iceberg(spark, loc).count() == 9
    # replay batch 1 (foreachBatch's at-least-once delivery) → no dup
    sink(b1, 1)
    sink(b0, 0)
    assert read_iceberg(spark, loc).count() == 9
    t = IcebergLocalTable(loc)
    assert t.current_snapshot()["summary"]["streaming-batch-id"] == "1"
    # a NEW batch still lands
    sink(spark.range(9, 10).selectExpr("id", "concat('a', id) as v"), 2)
    assert read_iceberg(spark, loc).count() == 10


def test_streaming_sink_end_to_end(spark, tmp_path):
    """A real writeStream → foreachBatch(iceberg_sink) run with
    availableNow: table contents equal the stream input, snapshots are
    append-only and batch-stamped."""
    import pyspark.sql.functions as F

    from ner_spark.iceberg.spark_io import iceberg_sink

    src = str(tmp_path / "src")
    loc = str(tmp_path / "sink_e2e")
    ckpt = str(tmp_path / "ckpt")
    for lo, hi in [(0, 20), (20, 50)]:
        spark.range(lo, hi).selectExpr(
            "id", "concat('v', id) as v"
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("id bigint, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.withColumn("flag", F.col("id") % 2 == 0)
        .writeStream.foreachBatch(iceberg_sink(loc))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert read_iceberg(spark, loc).count() == 50
    t = IcebergLocalTable(loc)
    ops = [s["summary"]["operation"] for s in t.snapshots()]
    assert set(ops) == {"append"} and len(ops) >= 1
    # restart on the same checkpoint with no new data: no new snapshots
    n_before = len(t.snapshots())
    q2 = (
        stream.withColumn("flag", F.col("id") % 2 == 0)
        .writeStream.foreachBatch(iceberg_sink(loc))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert len(IcebergLocalTable(loc).snapshots()) == n_before
    assert read_iceberg(spark, loc).count() == 50


def test_empty_table_and_null_partitions(spark, tmp_path):
    loc = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, None, "y"), (3, "a", None)],
        "id int, pcol string, v string",
    )
    write_iceberg(df, loc, partition_by=["pcol"])
    back = read_iceberg(spark, loc)
    rows = {r["id"]: (r["pcol"], r["v"]) for r in back.collect()}
    assert rows == {1: ("a", "x"), 2: (None, "y"), 3: ("a", None)}
    t = IcebergLocalTable(loc)
    # null partition value is tracked in the manifest partition summary
    snap = t.current_snapshot()
    _, _, manifests = avro_io.read_container(snap["manifest-list"])
    assert manifests[0]["partitions"][0]["contains_null"] is True
    # empty scan at a filter that matches nothing (but can't be pruned to
    # zero) still returns a well-formed frame
    none = read_iceberg(spark, loc, filters=[("id", ">=", 99)])
    assert none.count() == 0 and none.columns == ["id", "pcol", "v"]
