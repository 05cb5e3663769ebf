"""Storage abstraction (SURVEY.md §4.4).

The production target is Iceberg (BASELINE.json north_rule: "over Iceberg
tables"), but no Iceberg runtime jars exist in this sandbox and there is no
network to fetch them, so the layer is abstracted over three formats:

- ``fmt='parquet'`` (sandbox default): partitioned parquet + a JSON
  manifest that supplies the snapshot/commit bookkeeping Iceberg would
  give us (idempotent overwrite, resume markers — SURVEY.md §4.5).
- ``fmt='iceberg-local'``: the REAL Iceberg v2 table format written by
  ``ner_spark.iceberg`` (pure-python metadata: Avro manifests/manifest
  lists, vN.metadata.json, HadoopTables version-hint commit protocol) —
  snapshot lineage, time travel, file-level min/max + partition pruning,
  snapshot expiry, all readable by any external Iceberg client.
- ``fmt='iceberg'``: the catalog path — ``writeTo`` / ``spark.table``;
  expects ``--packages org.apache.iceberg:...`` + catalog conf on the
  cluster. Never import Iceberg classes directly.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

FMT = os.environ.get("NER_SPARK_TABLE_FORMAT", "parquet")


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_manifest.json")


def read_table(spark: SparkSession, path_or_name: str, fmt: str = FMT) -> DataFrame:
    if fmt == "iceberg":
        return spark.table(path_or_name)
    if fmt == "iceberg-local":
        from ner_spark.iceberg.spark_io import read_iceberg

        return read_iceberg(spark, path_or_name)
    return spark.read.parquet(path_or_name)


def write_table(
    df: DataFrame,
    path_or_name: str,
    fmt: str = FMT,
    partition_by: list[str] | None = None,
    run_id: str | None = None,
    meta: dict | None = None,
) -> None:
    """Idempotent overwrite of a stage output table + manifest commit marker."""
    if fmt == "iceberg":
        w = df.writeTo(path_or_name)
        if run_id is not None:
            # stamped into the committing snapshot's summary — the Iceberg
            # analogue of the parquet manifest's run_id marker, read back
            # by table_complete via the .snapshots metadata table
            w = w.option("snapshot-property.run_id", run_id)
        if partition_by:
            w = w.partitionedBy(*partition_by)
        w.createOrReplace()
        return
    if fmt == "iceberg-local":
        from ner_spark.iceberg.spark_io import write_iceberg

        write_iceberg(
            df, path_or_name, partition_by=partition_by,
            mode="overwrite", run_id=run_id, summary=meta,
        )
        return
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path_or_name)
    manifest = {
        "run_id": run_id,
        "completed_at": time.time(),
        "format": "parquet",
        "partition_by": partition_by or [],
        **(meta or {}),
    }
    with open(_manifest_path(path_or_name), "w") as f:
        json.dump(manifest, f)


def table_complete(
    path_or_name: str,
    run_id: str | None = None,
    fmt: str = FMT,
    spark: SparkSession | None = None,
) -> bool:
    """True iff the table committed (and, if run_id given, by that run).

    Iceberg branch: a table exists iff the catalog resolves it, and it was
    committed by `run_id` iff the CURRENT snapshot's summary carries that
    run_id (write_table stamps it via snapshot-property.run_id). Reading
    the current snapshot — not the latest by timestamp — also does the
    right thing after a rollback."""
    if fmt == "iceberg":
        if spark is None:
            raise ValueError("iceberg table_complete needs a SparkSession")
        if not spark.catalog.tableExists(path_or_name):
            return False
        if run_id is None:
            return True
        rows = spark.sql(
            f"SELECT summary['run_id'] AS run_id FROM {path_or_name}.snapshots "
            "WHERE snapshot_id = (SELECT snapshot_id FROM "
            f"{path_or_name}.history ORDER BY made_current_at DESC LIMIT 1)"
        ).collect()
        return bool(rows) and rows[0]["run_id"] == run_id
    if fmt == "iceberg-local":
        from ner_spark.iceberg.table import IcebergLocalTable

        t = IcebergLocalTable(path_or_name)
        if not t.exists():
            return False
        snap = t.current_snapshot()
        if snap is None:
            return False
        return run_id is None or snap["summary"].get("run_id") == run_id
    mp = _manifest_path(path_or_name)
    if not os.path.exists(mp):
        return False
    with open(mp) as f:
        m = json.load(f)
    return run_id is None or m.get("run_id") == run_id


def read_manifest(path_or_name: str) -> dict | None:
    mp = _manifest_path(path_or_name)
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        return json.load(f)


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction (the 100-TB maintenance op every streaming /
    incremental sink eventually needs: availableNow micro-batches and
    per-task commits leave O(batches x tasks) small files, and scan-task
    scheduling degrades once file count >> core count).

    Sizes the output by the INPUT's actual bytes (listed through the
    Hadoop FileSystem API, so the same code paths work on HDFS/S3A, not
    just file://) and rewrites with coalesce — a NARROW dependency, no
    shuffle: each output task concatenates whole input partitions, which
    is exactly what compaction wants. Returns the output file count.

    Content is preserved row-for-row (no ordering guarantee, same as any
    parquet dir); verified in tests/test_io_iceberg.py. On Iceberg this
    maps to rewrite_data_files; the manifest, if present, is copied
    through so resume markers survive compaction.
    """
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    total = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet"):
            total += f.getLen()
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    manifest = read_manifest(path)
    if manifest is not None:
        with open(_manifest_path(out_path), "w") as fh:
            json.dump(manifest, fh)
    out = jvm.org.apache.hadoop.fs.Path(out_path)
    it = fs.listFiles(out, True)
    n_out = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            n_out += 1
    return n_out

def merge_upsert(
    spark: SparkSession,
    target: str,
    delta: DataFrame,
    key: str,
    fmt: str = FMT,
    run_id: str | None = None,
    strategy: str = "cow",
) -> None:
    """MERGE INTO emulation: upsert ``delta`` into ``target`` by ``key``
    (matched rows replaced, unmatched inserted) — the CDC-apply operation
    an incremental KG warehouse runs every micro-batch.

    ``strategy`` picks the physical merge on the iceberg-local branch:
    ``'cow'`` (default) rewrites the table copy-on-write — read-optimized;
    ``'mor'`` commits the delta as one merge-on-read snapshot (equality
    delete + append, O(delta)) — write-optimized, folded back by
    compaction. Other formats are copy-on-write by construction and
    reject ``'mor'`` loudly.

    Iceberg branch: a real ``MERGE INTO`` (copy-on-write/merge-on-read is
    the table's own property); delta is exposed as a temp view.

    Parquet branch (sandbox): copy-on-write by hand. The merged result is
    ``target ⟕̸ delta ∪ delta`` — a LEFT ANTI join with the delta
    broadcast (a CDC batch is small relative to the table, so the fact
    side never shuffles; Iceberg's copy-on-write MERGE makes the same
    bet) — written to a temp sibling dir and swapped in. The swap is not
    atomic (delete-then-rename); a crash between the two leaves no
    manifest, which the resume protocol (table_complete) already treats
    as "stage incomplete, recompute" — the same crash contract every
    other stage write has.
    """
    if strategy not in ("cow", "mor"):
        raise ValueError(strategy)
    if strategy == "mor" and fmt != "iceberg-local":
        raise ValueError(
            "strategy='mor' needs fmt='iceberg-local' (row-delta files); "
            f"fmt={fmt!r} merges copy-on-write by construction"
        )
    if fmt == "iceberg":
        delta.createOrReplaceTempView("__merge_delta")
        cols = delta.columns
        sets = ", ".join(f"t.{c} = s.{c}" for c in cols if c != key)
        vals = ", ".join(f"s.{c}" for c in cols)
        spark.sql(
            f"MERGE INTO {target} t USING __merge_delta s ON t.{key} = s.{key} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({', '.join(cols)}) VALUES ({vals})"
        )
        return
    if fmt == "iceberg-local":
        from ner_spark.iceberg.spark_io import (
            merge_upsert_iceberg,
            merge_upsert_iceberg_mor,
        )

        fn = merge_upsert_iceberg_mor if strategy == "mor" \
            else merge_upsert_iceberg
        fn(spark, target, delta, key, run_id=run_id)
        return
    import shutil

    from pyspark.sql import functions as F

    base = spark.read.parquet(target)
    merged = base.join(
        F.broadcast(delta.select(key)), key, "left_anti"
    ).unionByName(delta)
    tmp = target.rstrip("/") + f".__merge_tmp_{os.getpid()}"
    merged.write.mode("overwrite").parquet(tmp)
    manifest = {
        "run_id": run_id,
        "completed_at": time.time(),
        "format": "parquet",
        "merged_key": key,
    }
    with open(_manifest_path(tmp), "w") as f:
        json.dump(manifest, f)
    shutil.rmtree(target)
    os.rename(tmp, target)
