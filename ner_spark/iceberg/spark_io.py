"""Spark ⇄ IcebergLocalTable adapter.

Write path: Spark writes immutable parquet under
``<location>/data/seq=N/`` (hive layout when identity-partitioned), the
adapter collects footer stats with pyarrow and commits an Iceberg v2
snapshot. Data files are never rewritten in place — every commit gets a
fresh ``seq=N`` directory, which is what makes time travel work and
matches Iceberg's immutable-file contract.

Read path: the table's manifest chain is resolved (optionally at a past
snapshot / timestamp, optionally pruned by predicate against partition
tuples and file bounds) and the surviving file list feeds
``spark.read.parquet`` with an explicit schema + ``basePath`` so
hive-partition columns (and the synthetic ``seq`` commit column) are
recovered without type inference. On a 1000-executor cluster the same
listing is what an Iceberg DSv2 relation hands Spark as its file index —
Catalyst still does column pruning and residual filtering on the scan;
this layer contributes the *file-level* pruning Spark can't do from a
bare directory.
"""

from __future__ import annotations

import os
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ner_spark.iceberg.table import (
    DataFile,
    IcebergLocalTable,
    collect_parquet_stats,
)


def _data_dir(location: str) -> str:
    return os.path.join(location.rstrip("/"), "data")


def _list_parquet(d: str) -> list[str]:
    out = []
    for root, _dirs, names in os.walk(d):
        for n in names:
            if n.endswith(".parquet"):
                out.append(os.path.join(root, n))
    return sorted(out)


def _partition_parser(data_dir: str, spec_cols: dict[str, str]):
    """path → {col: typed value} from hive-style dir segments."""

    def _cast(t: str, v: str):
        if t in ("int", "long"):
            return int(v)
        if t in ("double", "float"):
            return float(v)
        if t == "boolean":
            return v.lower() == "true"
        return v  # string (dates/timestamps aren't identity-partition
        # sources in this repo)

    def parse(path: str) -> dict:
        rel = os.path.relpath(path, data_dir)
        vals: dict = {}
        for seg in rel.split(os.sep)[:-1]:
            k, eq, v = seg.partition("=")
            if eq and k in spec_cols:
                v = urllib.parse.unquote(v)
                vals[k] = (
                    None if v == "__HIVE_DEFAULT_PARTITION__"
                    else _cast(spec_cols[k], v)
                )
        return vals

    return parse


def write_iceberg(
    df: DataFrame,
    location: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    run_id: str | None = None,
    properties: dict | None = None,
    summary: dict | None = None,
) -> int:
    """Write ``df`` as a new Iceberg snapshot; returns the snapshot id.

    ``mode='overwrite'`` replaces table contents (new snapshot, old data
    files retained for time travel); ``mode='append'`` adds to them.
    """
    t = IcebergLocalTable(location)
    if not t.exists():
        t = IcebergLocalTable.create(
            location, df.schema, partition_by=partition_by, properties=properties
        )
    else:
        # union-evolve on write (new nullable columns / safe promotions);
        # existing columns keep their field ids
        t.evolve_schema(df.schema)
    md = t.metadata()
    seq = md["last-sequence-number"] + 1
    commit_dir = os.path.join(_data_dir(location), f"seq={seq}")
    spec_fields = t._spec_fields(md)
    spec_names = [pf["name"] for pf in spec_fields]

    w = df.write.mode("errorifexists")
    if spec_names:
        w = w.partitionBy(*spec_names)
    # Iceberg data files must use TIMESTAMP_MICROS (INT96 has no column
    # stats → no bounds, no pruning); ner_spark.session sets this
    # globally, but honor it for foreign sessions too (set-and-restore)
    sess = df.sparkSession
    conf_key = "spark.sql.parquet.outputTimestampType"
    prev = sess.conf.get(conf_key, None)
    sess.conf.set(conf_key, "TIMESTAMP_MICROS")
    try:
        w.parquet(commit_dir)
    finally:
        if prev is not None:
            sess.conf.set(conf_key, prev)

    struct = t._schema_struct(md)
    types = {
        f["name"]: f["type"] for f in struct["fields"]
        if isinstance(f["type"], str)
    }
    parser = _partition_parser(_data_dir(location), {
        c: types.get(c, "string") for c in spec_names
    })
    files = collect_parquet_stats(_list_parquet(commit_dir), parser)
    # identity partition values also bound the (path-only) partition column
    for f in files:
        for c, v in f.partition.items():
            if v is not None:
                f.lower_bounds.setdefault(c, v)
                f.upper_bounds.setdefault(c, v)
    summ = dict(summary or {})
    if run_id is not None:
        summ["run_id"] = run_id
    op = "append" if mode == "append" else "overwrite"
    return t.commit(files, operation=op, summary=summ)


def read_iceberg(
    spark: SparkSession,
    location: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    filters: list[tuple] | None = None,
) -> DataFrame:
    """Scan → DataFrame (file-pruned, schema from table metadata)."""
    t = IcebergLocalTable(location)
    md = t.metadata()
    ddl = t.spark_ddl()
    files = t.scan(snapshot_id=snapshot_id, as_of_ms=as_of_ms, filters=filters)
    cols = [f["name"] for f in t._schema_struct(md)["fields"]]
    if not files:
        return spark.createDataFrame([], ddl)
    reader = (
        spark.read.schema(ddl + ", seq bigint")
        .option("basePath", _data_dir(location))
        .parquet(*[f.path for f in files])
    )
    out = reader.select(*cols)
    if filters:
        # residual predicate: file pruning keeps files that MAY match;
        # the row-level filter is re-applied here (and pushed to the
        # parquet scan by Catalyst)
        for col, op, val in filters:
            c = F.col(col)
            out = out.filter(
                {"=": c == val, "<": c < val, "<=": c <= val,
                 ">": c > val, ">=": c >= val}[op]
            )
    return out


def read_iceberg_incremental(
    spark: SparkSession,
    location: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Rows ADDED after ``from_snapshot_id`` — the CDC-consumption read.

    At 100 TB this is the difference between a downstream job scanning
    the day's appends and re-scanning the table: O(new files), resolved
    entirely from manifest metadata.
    """
    t = IcebergLocalTable(location)
    files = t.scan_incremental(from_snapshot_id, to_snapshot_id)
    ddl = t.spark_ddl()
    if not files:
        return spark.createDataFrame([], ddl)
    cols = [f["name"] for f in t._schema_struct(t.metadata())["fields"]]
    return (
        spark.read.schema(ddl + ", seq bigint")
        .option("basePath", _data_dir(location))
        .parquet(*[f.path for f in files])
        .select(*cols)
    )


def iceberg_sink(location: str, partition_by: list[str] | None = None):
    """Exactly-once streaming sink: ``writeStream.foreachBatch(iceberg_sink(loc))``.

    foreachBatch's contract is at-least-once with a stable batch_id on
    replay; commits stamp ``streaming-batch-id`` into the snapshot
    summary and a replayed batch at or below the last committed id is a
    no-op — the same idempotent-commit trick Iceberg's own streaming
    writer uses. Combined with the checkpointed source offsets this
    yields exactly-once table contents across restarts.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        t = IcebergLocalTable(location)
        if t.exists():
            snap = t.current_snapshot()
            if snap is not None:
                last = snap["summary"].get("streaming-batch-id")
                if last is not None and int(last) >= batch_id:
                    return  # replayed batch: already committed
        write_iceberg(
            batch_df,
            location,
            partition_by=partition_by,
            mode="append",
            summary={"streaming-batch-id": batch_id},
        )

    return _write


def compact_iceberg(
    spark: SparkSession,
    location: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """rewrite_data_files: coalesce small files into ~target-size files
    and commit a ``replace`` snapshot (no logical rows change; incremental
    consumers skip it). The rewrite is a NARROW coalesce — no shuffle —
    exactly like io.compact_parquet_dir, but the swap is a metadata
    commit instead of a directory rename, so concurrent readers keep a
    consistent snapshot throughout. Returns the new file count.
    """
    t = IcebergLocalTable(location)
    files = t.scan()
    if not files:
        return 0
    total = sum(f.file_size for f in files)
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    df = read_iceberg(spark, location)
    md = t.metadata()
    seq = md["last-sequence-number"] + 1
    commit_dir = os.path.join(_data_dir(location), f"seq={seq}")
    sess = df.sparkSession
    conf_key = "spark.sql.parquet.outputTimestampType"
    prev = sess.conf.get(conf_key, None)
    sess.conf.set(conf_key, "TIMESTAMP_MICROS")
    try:
        df.coalesce(n_out).write.mode("errorifexists").parquet(commit_dir)
    finally:
        if prev is not None:
            sess.conf.set(conf_key, prev)
    struct = t._schema_struct(md)
    types = {
        f["name"]: f["type"] for f in struct["fields"]
        if isinstance(f["type"], str)
    }
    spec_names = [pf["name"] for pf in t._spec_fields(md)]
    parser = _partition_parser(
        _data_dir(location), {c: types.get(c, "string") for c in spec_names}
    )
    new_files = collect_parquet_stats(_list_parquet(commit_dir), parser)
    t.commit(new_files, operation="replace",
             summary={"compaction-target-bytes": target_file_bytes})
    return len(new_files)


def merge_upsert_iceberg(
    spark: SparkSession,
    location: str,
    delta: DataFrame,
    key: str,
    run_id: str | None = None,
) -> int:
    """Copy-on-write MERGE: matched rows replaced, unmatched inserted.

    The rewrite is the same plan as Iceberg's copy-on-write MERGE bet:
    the delta is broadcast (CDC batches are small next to the table) and
    the base never shuffles. Commits an ``overwrite`` snapshot, so the
    pre-merge state stays time-travelable.
    """
    base = read_iceberg(spark, location)
    merged = base.join(
        F.broadcast(delta.select(key)), key, "left_anti"
    ).unionByName(delta.select(*base.columns))
    t = IcebergLocalTable(location)
    md = t.metadata()
    spec_names = [pf["name"] for pf in t._spec_fields(md)]
    return write_iceberg(
        merged,
        location,
        partition_by=spec_names or None,
        mode="overwrite",
        run_id=run_id,
    )
