"""Iceberg metadata inspection tables (the ``tbl$files`` surface).

The ops queries a 100 TB table lives on — snapshot growth, per-partition
file/row counts, small-file detection that drives compaction, ref
heads — exposed as DataFrames the way Iceberg engines expose
``SELECT * FROM tbl.files`` / ``.snapshots`` / ``.partitions``.

All of these are METADATA-sized reads: they decode manifest Avro on the
driver (manifests are O(files/manifest-target) records, bounded by the
commit protocol) and hand Spark a local frame. No data file is opened.
On a real cluster with 10^6+ files the manifest decode itself would be
distributed (Iceberg's engines read manifests as a parallel scan); the
single-process layout here makes the driver decode the honest choice —
the interface is what scales, and callers never touch the avro.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ner_spark.iceberg.table import IcebergLocalTable


def snapshots_table(spark: SparkSession, location: str) -> DataFrame:
    """One row per live snapshot: lineage, operation, record totals."""
    t = IcebergLocalTable(location)
    rows = [
        (
            s["snapshot-id"],
            s.get("parent-snapshot-id"),
            s["sequence-number"],
            s["timestamp-ms"],
            s["summary"].get("operation"),
            int(s["summary"].get("total-records", 0)),
            int(s["summary"].get("total-data-files", 0)),
            int(s["summary"].get("added-records", 0)),
            int(s["summary"].get("total-delete-records", 0)),
        )
        for s in t.snapshots()
    ]
    return spark.createDataFrame(
        rows,
        "snapshot_id long, parent_id long, sequence_number long, "
        "committed_at_ms long, operation string, total_records long, "
        "total_data_files long, added_records long, total_delete_records long",
    )


def files_table(
    spark: SparkSession, location: str, ref: str | None = None
) -> DataFrame:
    """One row per live file at a snapshot (data AND delete files) —
    ``content`` 0/1/2 per the v2 spec. Feeds small-file detection:
    ``files_table(...).where("file_size_bytes < 32*1024*1024")``."""
    t = IcebergLocalTable(location)
    rows = []
    for f in t.scan(ref=ref) + t.scan_deletes(ref=ref):
        part = {k: str(v) for k, v in (f.partition or {}).items()}
        rows.append(
            (f.path, f.content, f.record_count, f.file_size, part,
             f.sequence_number)
        )
    return spark.createDataFrame(
        rows,
        "file_path string, content int, record_count long, "
        "file_size_bytes long, partition map<string,string>, "
        "sequence_number long",
    )


def partitions_table(
    spark: SparkSession, location: str, ref: str | None = None
) -> DataFrame:
    """Per-partition rollup of the live DATA files: record/file counts and
    bytes — the table compaction and skew decisions read. Partition is
    rendered as the spec's ``field=value`` dir string (sorted by field)
    so evolved-spec layouts stay distinguishable."""
    files = files_table(spark, location, ref=ref).where("content = 0")
    from pyspark.sql import functions as F

    part_str = F.array_join(
        F.transform(
            F.array_sort(F.map_keys("partition")),
            lambda k: F.concat_ws(
                "=", k, F.element_at(F.col("partition"), k)
            ),
        ),
        "/",
    )
    return (
        files.groupBy(part_str.alias("partition"))
        .agg(
            F.count(F.lit(1)).alias("file_count"),
            F.sum("record_count").alias("record_count"),
            F.sum("file_size_bytes").alias("total_size_bytes"),
        )
    )


def refs_table(spark: SparkSession, location: str) -> DataFrame:
    t = IcebergLocalTable(location)
    rows = [
        (name, r["type"], r["snapshot-id"]) for name, r in t.refs().items()
    ]
    return spark.createDataFrame(
        rows, "name string, type string, snapshot_id long"
    )


def history_table(spark: SparkSession, location: str) -> DataFrame:
    """Main-branch history (the snapshot-log): when each snapshot became
    the table head, and whether it still is an ancestor of the head."""
    t = IcebergLocalTable(location)
    md = t.metadata()
    live = {s["snapshot-id"] for s in md.get("snapshots", [])}
    # ancestors of the current head (time travel only replays these)
    by_id = {s["snapshot-id"]: s for s in md.get("snapshots", [])}
    anc = set()
    cur = md.get("current-snapshot-id")
    while cur not in (None, -1) and cur in by_id:
        anc.add(cur)
        cur = by_id[cur].get("parent-snapshot-id")
    rows = [
        (e["timestamp-ms"], e["snapshot-id"], e["snapshot-id"] in live,
         e["snapshot-id"] in anc)
        for e in md.get("snapshot-log", [])
    ]
    return spark.createDataFrame(
        rows,
        "made_current_at_ms long, snapshot_id long, is_live boolean, "
        "is_current_ancestor boolean",
    )
