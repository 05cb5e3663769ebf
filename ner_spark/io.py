"""Storage abstraction (SURVEY.md §4.4).

The production target is Iceberg (BASELINE.json north_rule: "over Iceberg
tables"), but no Iceberg runtime jars exist in this sandbox and there is no
network to fetch them, so the layer is abstracted: ``fmt='parquet'`` (sandbox
default) writes partitioned parquet + a JSON manifest that supplies the
snapshot/commit bookkeeping Iceberg would give us (idempotent overwrite,
resume markers — SURVEY.md §4.5); ``fmt='iceberg'`` uses ``writeTo`` /
``spark.table`` and expects ``--packages org.apache.iceberg:...`` + catalog
conf on the cluster. Never import Iceberg classes directly.
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
        if partition_by:
            w = w.partitionedBy(*partition_by)
        w.createOrReplace()
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


def table_complete(path_or_name: str, run_id: str | None = None, fmt: str = FMT) -> bool:
    """True iff the table committed (and, if run_id given, by that run)."""
    if fmt == "iceberg":
        raise NotImplementedError("cluster path: check snapshot summary")
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
