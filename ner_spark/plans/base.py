"""Staged-pipeline protocol (SURVEY.md §4.5): per-stage materialization
with manifest commit, idempotent resume, and async per-partition lineage.

Extracted from the KG pipeline so every production dataflow in this repo
— KG construction (plans/kg.py) and training-data curation
(plans/curation.py) — shares one checkpoint/resume/audit implementation:
a stage is a named build closure; with a warehouse it commits to
``{warehouse}/{stage}`` via the io.write_table manifest protocol, reads
back the materialized table, and records per-partition row counts +
order-insensitive checksums on a side thread. On resume, completed
stages (manifest run_id matches) are read back instead of recomputed.
"""

from __future__ import annotations

import os
import threading
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ner_spark import io as nio

LINEAGE_COLS = ["run_id", "stage", "partition_id", "n_rows", "checksum", "completed_at"]


def lineage_rows(df: DataFrame, run_id: str, stage: str) -> pd.DataFrame:
    """Per-partition row counts + order-insensitive checksum (A6).

    The checksum covers the primitive (scalar) columns only: hashing the
    embedding/payload arrays roughly doubles the read-back cost of wide
    stages for no audit value (the scalar key+score columns already pin
    row identity)."""
    cols = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        not in ("array", "map", "struct", "binary")
    ] or df.columns
    agg = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # bit_xor: order-insensitive and overflow-free under ANSI mode
            # (SUM(xxhash64) throws ARITHMETIC_OVERFLOW on Spark 4)
            F.bit_xor(F.xxhash64(*cols)).alias("checksum"),
        )
        .toPandas()
    )
    if not len(agg):
        # an empty stage output still committed — record it explicitly, or
        # the lineage table silently loses the stage (resume audits rely on
        # every stage being present)
        agg = pd.DataFrame(
            {"partition_id": [-1], "n_rows": [0], "checksum": [0]}
        )
    agg.insert(0, "stage", stage)
    agg.insert(0, "run_id", run_id)
    agg["completed_at"] = time.time()
    return agg[LINEAGE_COLS]


class StagedPipeline:
    """Base for resumable multi-stage dataflows. Subclasses call
    ``self._stage(name, build)`` per stage and ``self._join_lineage()``
    before returning results."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str | None = None,
        run_id: str = "r0",
        resume: bool = True,
        fmt: str | None = None,
    ):
        from ner_spark.deploy import ensure_py_files

        ensure_py_files(spark)
        self.spark = spark
        self.warehouse = warehouse
        self.run_id = run_id
        self.resume = resume
        # table format for stage commits: 'parquet' (JSON-manifest
        # protocol), 'iceberg-local' (real Iceberg v2 metadata,
        # ner_spark.iceberg), or 'iceberg' (catalog, cluster-only)
        self.fmt = fmt or nio.FMT
        self.lineage: list[pd.DataFrame] = []
        # wall seconds per stage (build+commit+readback; resume hits cost
        # only the readback) — bench.py surfaces this per-stage breakdown
        # so a throughput regression is attributable without a profiler
        self.stage_secs: dict[str, float] = {}
        self._lineage_threads: list[threading.Thread] = []
        self._lineage_errors: list[tuple[str, BaseException]] = []
        self._lineage_lock = threading.Lock()

    # -- stage materialization protocol (§4.5) -------------------------------
    def _stage(self, name: str, build, partition_by=None) -> DataFrame:
        if not self.warehouse:
            return build()
        t0 = time.perf_counter()
        path = os.path.join(self.warehouse, name)
        if self.resume and nio.table_complete(
            path, self.run_id, fmt=self.fmt, spark=self.spark
        ):
            out = nio.read_table(self.spark, path, fmt=self.fmt)
            self.stage_secs[name] = round(time.perf_counter() - t0, 3)
            return out
        df = build()
        nio.write_table(
            df, path, fmt=self.fmt, partition_by=partition_by, run_id=self.run_id
        )
        out = nio.read_table(self.spark, path, fmt=self.fmt)
        self.stage_secs[name] = round(time.perf_counter() - t0, 3)
        # lineage is an audit artifact, not a dataflow dependency: compute
        # it on a side thread (Spark schedules the jobs concurrently) so
        # the next stage starts immediately; each thread flushes on
        # completion, preserving crash-time coverage of finished stages
        t = threading.Thread(
            target=self._lineage_task, args=(out, name), daemon=True
        )
        t.start()
        self._lineage_threads.append(t)
        return out

    def _lineage_task(self, df: DataFrame, name: str) -> None:
        # daemon-thread exceptions would otherwise vanish; record them so
        # _join_lineage can re-raise — a silently missing lineage stage is
        # exactly what the resume audit exists to prevent
        try:
            rows = lineage_rows(df, self.run_id, name)
        except BaseException as e:  # noqa: BLE001 — re-raised at join
            with self._lineage_lock:
                self._lineage_errors.append((name, e))
            return
        with self._lineage_lock:
            self.lineage.append(rows)
            self._flush_lineage()

    def _join_lineage(self) -> None:
        for t in self._lineage_threads:
            t.join(timeout=600)
            if t.is_alive():
                raise TimeoutError(
                    f"lineage job still running after 600s (run {self.run_id})"
                )
        if self._lineage_errors:
            name, err = self._lineage_errors[0]
            raise RuntimeError(
                f"lineage job for stage '{name}' failed (run {self.run_id})"
            ) from err

    def _flush_lineage(self) -> None:
        if not (self.warehouse and self.lineage):
            return
        path = os.path.join(self.warehouse, f"lineage_{self.run_id}.parquet")
        new = pd.concat(self.lineage)
        if os.path.exists(path):
            # resume: keep lineage of stages that were not recomputed
            old = pd.read_parquet(path)
            new = pd.concat([old[~old.stage.isin(set(new.stage))], new])
        new.to_parquet(path, index=False)
