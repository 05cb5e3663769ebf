"""Co-reference edges + iterative-join connected components
(SURVEY.md §2.4 B3, §2.6 B10/B11).

GraphFrames is unavailable in this sandbox (SURVEY.md §0 [V]), so CC is the
alternating large-star / small-star algorithm of Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SOCC'13), expressed as
DataFrame joins: O(log n) rounds, each round = two groupBy/join stages,
``localCheckpoint`` per round to truncate lineage, convergence = emitted
edge set stable. Node ids are strings; min is string order (matches the
oracle's union-find canonical = min entity_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coref_edges(links: DataFrame) -> DataFrame:
    """Within one conversation, surfaces linked to >=2 distinct entities
    produce all unordered entity pairs (spec: co-reference evidence).

    Self-join is bounded by per-(conv, surface) dedup first (SURVEY.md B3).
    """
    d = links.select("conv_id", "norm_surface", "entity_id").distinct()
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.conv_id") == F.col("b.conv_id"),
                F.col("a.norm_surface") == F.col("b.norm_surface"),
                F.col("a.entity_id") < F.col("b.entity_id"),
            ],
        )
        .select(
            F.col("a.entity_id").alias("src_entity"),
            F.col("b.entity_id").alias("dst_entity"),
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect strictly-larger neighbors to the min of each neighborhood."""
    sym = e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect smaller-or-equal neighbors to the neighborhood min."""
    # orient edges u >= v
    o = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = o.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    j = o.join(m, "u")
    out = j.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        j.select(F.col("u"), F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def connected_components(edges: DataFrame, max_rounds: int = 25) -> DataFrame:
    """edges(src_entity, dst_entity) → (entity_id, canonical_id).

    Alternating large-star/small-star until the edge set is stable; the
    final edge set is a union of stars (node → component min). Nodes only
    ever appearing as a component min map to themselves via the union at
    the end. Each round localCheckpoints (lineage truncation, SURVEY.md
    §4.5) and the convergence check is one count() action.
    """
    e = (
        edges.select(
            F.col("src_entity").alias("u"), F.col("dst_entity").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        # converged iff same edge set (both are distinct sets)
        n_old, n_new = e.count(), e2.count()
        if n_old == n_new and e.exceptAll(e2).isEmpty():
            e = e2
            break
        e = e2
    stars = e.select(F.col("u").alias("entity_id"), F.col("v").alias("canonical_id"))
    roots = e.select(F.col("v").alias("entity_id")).distinct().withColumn(
        "canonical_id", F.col("entity_id")
    )
    return stars.unionByName(roots).distinct()


def canonical_map(links: DataFrame, edges: DataFrame) -> DataFrame:
    """(entity_id, canonical_id) covering every linked entity (singletons → self)."""
    cc = connected_components(edges)
    all_nodes = links.select("entity_id").distinct()
    return (
        all_nodes.join(cc, "entity_id", "left")
        .withColumn("canonical_id", F.coalesce("canonical_id", "entity_id"))
        .select("entity_id", "canonical_id")
    )
