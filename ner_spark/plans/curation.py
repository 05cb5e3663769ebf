"""Resumable training-data curation pipeline (task brief: dedup as a
first-class production dataflow, not just per-query operators).

Stage graph, on the StagedPipeline protocol (plans/base.py — same
manifest-commit / idempotent-resume / async-lineage machinery as the KG
pipeline):

  documents → minhash signatures           [signatures]
            → LSH bucket self-join pairs   [pairs]
            → connected components         [clusters]
            → keep/drop decision per doc   [decision]
            → per-source curation report   [report]

Why staged: at 100 TB the signature pass is the only stage that reads
the full corpus; materializing it means a crash during clustering (or a
re-run with a different band threshold) resumes from the signature
table instead of re-scanning 100 TB. Each stage commits with a run_id
manifest and per-partition lineage checksums, so the same kill-and-
rerun audit that covers the KG build covers curation.

Scale shapes (all inherited from the underlying operators):
- signatures: per-row, zero shuffle (functions/dedup.py);
- pairs: equi self-join on (band, minhash) — LSH buckets are the
  shuffle partitions;
- clusters: O(log n)-round large-star/small-star CC (operators/coref);
- decision: winner per cluster via max_by(struct) hash aggregate (no
  window sort), then two equi-joins against the doc-id/source list;
- report: hash aggregate keyed by source over the decision table (the
  corpus itself is read exactly once, by the signature stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ner_spark.functions.dedup import (
    lsh_pairs_from_signatures,
    minhash_signatures,
    shingles,
)
from ner_spark.operators.coref import connected_components
from ner_spark.plans.base import StagedPipeline


class CurationPipeline(StagedPipeline):
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str | None = None,
        run_id: str = "r0",
        resume: bool = True,
        n_bands: int = 8,
        min_band_hits: int = 2,
        hash_fn=F.xxhash64,
    ):
        super().__init__(spark, warehouse, run_id, resume)
        self.n_bands = n_bands
        self.min_band_hits = min_band_hits
        self.hash_fn = hash_fn

    def run(self, docs: DataFrame) -> dict[str, DataFrame]:
        sig = self._stage(
            "signatures",
            lambda: minhash_signatures(
                shingles(docs), self.n_bands, self.hash_fn
            ),
        )
        pairs = self._stage(
            "pairs",
            lambda: lsh_pairs_from_signatures(sig, self.min_band_hits),
        )
        clusters = self._stage(
            "clusters",
            lambda: connected_components(
                pairs.select(
                    F.col("doc_a").alias("src_entity"),
                    F.col("doc_b").alias("dst_entity"),
                )
            ).select(
                F.col("entity_id").alias("doc_id"),
                F.col("canonical_id").alias("cluster_id"),
            ),
        )
        decision = self._stage(
            "decision", lambda: keep_decision(docs, clusters)
        )
        report = self._stage(
            "report", lambda: curation_report(decision)
        )
        self._join_lineage()
        return {
            "signatures": sig,
            "pairs": pairs,
            "clusters": clusters,
            "decision": decision,
            "report": report,
        }


def cluster_winners(docs: DataFrame, clusters: DataFrame) -> DataFrame:
    """THE winner-per-cluster rule — (cluster_id, n_members, keep_doc_id,
    keep_n_chars): best member = longest text, min doc_id tiebreak, as a
    max_by(struct) hash aggregate (partial-agg friendly, never a
    per-cluster window sort). Single definition shared by the pipeline's
    decision stage and the dedup_keep_best query so the published
    survivor report can never diverge from what the pipeline keeps."""
    members = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
    return members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.expr("max_by(doc_id, struct(n_chars, -doc_id))").alias(
            "keep_doc_id"
        ),
        F.max("n_chars").alias("keep_n_chars"),
    )


def keep_decision(docs: DataFrame, clusters: DataFrame) -> DataFrame:
    """(doc_id, source, cluster_id, keep): every unclustered doc is kept;
    each near-dup cluster keeps exactly its cluster_winners() member.
    `source` rides along so the report stage is a pure aggregate over
    this (small) table — no second scan of the corpus."""
    winners = cluster_winners(docs, clusters).select(
        "cluster_id", "keep_doc_id"
    )
    return (
        docs.select("doc_id", "source")
        .join(clusters, "doc_id", "left")
        .join(winners, "cluster_id", "left")
        .select(
            "doc_id",
            "source",
            "cluster_id",
            (
                F.col("cluster_id").isNull()
                | (F.col("doc_id") == F.col("keep_doc_id"))
            ).alias("keep"),
        )
    )


def curation_report(decision: DataFrame) -> DataFrame:
    """Per-source keep/drop accounting — the release note a curation run
    publishes: (source, n_docs, n_kept, drop_rate). A pure aggregate
    over the decision table; the corpus is not re-read."""
    return (
        decision
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_kept"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            F.round(
                1.0 - F.col("n_kept").cast("double") / F.col("n_docs"), 6
            ).alias("drop_rate"),
        )
    )


def curate(
    spark: SparkSession,
    docs: DataFrame,
    warehouse: str | None = None,
    run_id: str = "r0",
    resume: bool = True,
    **kw,
) -> dict[str, DataFrame]:
    return CurationPipeline(spark, warehouse, run_id, resume, **kw).run(docs)
