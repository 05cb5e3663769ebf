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

    One shuffle total: groupBy(conv, surface) with collect_set dedups and
    groups in a single hash aggregate (map-side partial), then pairs are
    expanded JVM-side from the tiny sorted entity array. The equivalent
    distinct → self-join → distinct formulation costs three full-width
    shuffles of the links table."""
    ents = (
        links.groupBy("conv_id", "norm_surface")
        .agg(F.array_sort(F.collect_set("entity_id")).alias("es"))
        .where(F.size("es") >= 2)
    )
    # all i<j pairs of the sorted array (src < dst by construction)
    pairs = F.flatten(
        F.transform(
            "es",
            lambda x, i: F.transform(
                F.slice(F.col("es"), i + 2, F.size("es")),
                lambda y: F.struct(x.alias("src_entity"), y.alias("dst_entity")),
            ),
        )
    )
    return (
        ents.select(F.explode(pairs).alias("p"))
        .select("p.src_entity", "p.dst_entity")
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
    n_old = e.count()
    for _ in range(max_rounds):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        # converged iff same edge set (both are distinct sets). The count
        # is carried between rounds (one action per round, not two) and the
        # expensive set-difference check only runs once counts agree.
        n_new = e2.count()
        if n_old == n_new and e.exceptAll(e2).isEmpty():
            e = e2
            break
        e, n_old = e2, n_new
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
