"""End-to-end batch KG pipeline (SURVEY.md §3.2), with per-stage
materialization, per-partition lineage + metrics, and idempotent resume
(SURVEY.md §4.5; BASELINE.json:14).

Stage graph:
  transcripts → [repartition by conv_id] → fused NLP mapInPandas → mentions
  → B1 broadcast gazetteer join → B2 link-score join (AQE skew) → B13 top-1
  → links → B3/B11 coref edges → B10 iterative CC → canonical map
  → B5 triples (REL/COOC pairs + TOOL as-of) → canonicalized triples
  → B8 entity aggregation.

When ``warehouse`` is given, each stage commits to
``{warehouse}/{stage}`` with a manifest (run_id) and a lineage row set;
on resume, completed stages are read back instead of recomputed — the
kill-and-rerun test in tests/test_resume.py relies on this.
"""

from __future__ import annotations

import os
import threading
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ner_spark import io as nio
from ner_spark.nlp.stage import detect_mentions
from ner_spark.operators.coref import canonical_map, coref_edges
from ner_spark.operators.linking import gazetteer_norm, link_mentions
from ner_spark.operators.triples import (
    canonicalize_triples,
    rel_cooc_triples,
    tool_triples,
)

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


class KGPipeline:
    def __init__(
        self,
        spark: SparkSession,
        gazetteer_pdf: pd.DataFrame,
        entity_embeddings: DataFrame,
        warehouse: str | None = None,
        run_id: str = "r0",
        resume: bool = True,
        n_partitions: int | None = None,
    ):
        from ner_spark.deploy import ensure_py_files

        ensure_py_files(spark)
        self.spark = spark
        self.gaz_pdf = gazetteer_pdf
        self.emb = entity_embeddings
        self.warehouse = warehouse
        self.run_id = run_id
        self.resume = resume
        self.n_partitions = n_partitions
        self.lineage: list[pd.DataFrame] = []
        self._lineage_threads: list[threading.Thread] = []
        self._lineage_errors: list[tuple[str, BaseException]] = []
        self._lineage_lock = threading.Lock()

    # -- stage materialization protocol (§4.5) -------------------------------
    def _stage(self, name: str, build, partition_by=None) -> DataFrame:
        if not self.warehouse:
            return build()
        path = os.path.join(self.warehouse, name)
        if self.resume and nio.table_complete(path, self.run_id, spark=self.spark):
            return nio.read_table(self.spark, path)
        df = build()
        nio.write_table(df, path, partition_by=partition_by, run_id=self.run_id)
        out = nio.read_table(self.spark, path)
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

    # -- pipeline -------------------------------------------------------------
    def run(self, transcripts: DataFrame) -> dict[str, DataFrame]:
        spark = self.spark
        tx = transcripts
        if self.n_partitions:
            # explicit partitioning by conv_id with hot-conversation
            # salting [B:14]: a profile pass finds conversations big
            # enough to pin a straggler partition and spreads only those
            # across salt buckets (operators/partitioning.py)
            from ner_spark.operators.partitioning import salted_repartition

            tx = salted_repartition(tx, self.n_partitions)

        # full mentions (with the ctx embedding) feed the link stage from a
        # memory/disk cache; the materialized mentions AUDIT table drops
        # ctx_emb — persisting 8*EMB_DIM bytes/mention through a parquet
        # write+read costs more than recomputing the NLP stage on the rare
        # resume where mentions committed but links did not
        men_full = detect_mentions(tx, self.gaz_pdf, spark)
        links_path = self.warehouse and os.path.join(self.warehouse, "links")
        links_cached = bool(
            links_path
            and self.resume
            and nio.table_complete(links_path, self.run_id, spark=spark)
        )
        if self.warehouse and not links_cached:
            men_full = men_full.persist(StorageLevel.MEMORY_AND_DISK)
        mentions = self._stage("mentions", lambda: men_full.drop("ctx_emb"))
        gaz_n = gazetteer_norm(spark, self.gaz_pdf)
        links = self._stage(
            "links", lambda: link_mentions(men_full, gaz_n, self.emb)
        )
        men_full.unpersist()
        edges = self._stage("edges", lambda: coref_edges(links))
        canon = self._stage("entities_canon", lambda: canonical_map(links, edges))
        triples = self._stage(
            "triples",
            lambda: canonicalize_triples(
                rel_cooc_triples(links, tx).unionByName(
                    tool_triples(links, tx, self.gaz_pdf, spark)
                ),
                canon,
            ),
        )
        entities = self._stage(
            "entities",
            lambda: links.join(F.broadcast(canon), "entity_id")
            .groupBy(F.col("canonical_id").alias("entity_id"))
            .agg(
                F.array_sort(F.collect_set("norm_surface")).alias("aliases"),
                F.count(F.lit(1)).alias("n_mentions"),
                F.mode("ner_type").alias("ner_type"),
            ),
        )
        self._join_lineage()
        return {
            "mentions": mentions,
            "links": links,
            "edges": edges,
            "canon": canon,
            "triples": triples,
            "entities": entities,
        }


def build_kg(
    spark: SparkSession,
    transcripts: DataFrame,
    gazetteer_pdf: pd.DataFrame,
    entity_embeddings: DataFrame,
    warehouse: str | None = None,
    run_id: str = "r0",
    resume: bool = True,
    n_partitions: int | None = None,
) -> dict[str, DataFrame]:
    return KGPipeline(
        spark, gazetteer_pdf, entity_embeddings, warehouse, run_id, resume,
        n_partitions,
    ).run(transcripts)
