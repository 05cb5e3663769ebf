"""Graph analytics over KG-style edge tables (SURVEY.md §2 KG axis).

The KG pipeline materializes an entity co-occurrence/co-reference edge
table (plans/kg.py); downstream consumers want centrality and community
statistics over it. These operators implement the two canonical ones —
PageRank and triangle counting — as iterative/self-join DataFrame plans,
the same execution shape GraphFrames lowers to, with the 100-TB layout
choices made explicit:

- the adjacency table is shuffled ONCE onto its join key and persisted;
  per-iteration joins then only shuffle the (small) rank table;
- triangle counting orients every edge from its lower-(degree, id)
  endpoint to the higher one first — the standard hub-killing trick: a
  node of degree d contributes O(d^2) join candidates unoriented, but
  only pairs among its higher-degree neighbors oriented, bounding the
  worst key to ~O(sqrt(E)) fanout instead of O(max_degree);
- all joins are equi-joins (co-partitionable); nothing broadcasts a
  table that grows with |V| except the single-row global-average frame.

Cross-engine determinism (DuckDB differential in queries_graph.py): all
arithmetic is IEEE double on identical inputs; sums differ only in add
order, so query outputs round to 6 decimals on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    items: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Undirected (src < dst) edges between items sharing a group, kept
    only when the pair's co-occurrence count exceeds the global average —
    the thresholding that turns a near-complete co-occurrence relation
    into an informative graph.

    Scale shape: the self-join is an equi-join on ``group_col`` with
    fanout bounded by group size (orders hold <= ~13 suppliers; KG
    conversations are bounded by the salting profile), followed by one
    hash aggregate on the pair key. The global average is a single-row
    aggregate broadcast into the filter — not a driver-side collect.
    """
    ds = items.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("i")
    ).distinct()
    pairs = (
        ds.alias("a")
        .join(ds.alias("b"), "g")
        .where(F.col("a.i") < F.col("b.i"))
        .groupBy(F.col("a.i").alias("src"), F.col("b.i").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    avg_w = pairs.agg(F.avg("w").alias("avg_w"))
    return (
        pairs.join(F.broadcast(avg_w))
        .where(F.col("w") > F.col("avg_w"))
        .select("src", "dst")
    )


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def pagerank(
    edges: DataFrame, iters: int = 3, damping: float = 0.85
) -> DataFrame:
    """PageRank over an undirected (src < dst) edge table; returns
    (node, rank) after ``iters`` synchronous iterations of the
    non-normalized formulation r(v) = (1-d) + d * sum_{u~v} r(u)/deg(u),
    r0 = 1. Every node in the edge table has degree >= 1, so there is no
    dangling-node mass term.

    Iteration plan: ``adj`` (src, dst, deg) is hash-partitioned on src
    and persisted before the loop — the one edge-sized shuffle. Each
    iteration joins the rank table (|V| rows, the small side) against
    that fixed layout and hash-aggregates contributions by dst: per
    iteration only rank-sized data moves. Fixed small iteration counts
    keep the lineage shallow enough that no checkpoint is needed; the
    open-ended analogue (connected components, operators/coref.py) shows
    the per-round localCheckpoint pattern for unbounded loops.
    """
    und = _symmetrize(edges)
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    adj = und.join(deg, "src").repartition("src").persist()
    ranks = adj.select(F.col("src").alias("node")).distinct().withColumn(
        "rank", F.lit(1.0)
    )
    try:
        for _ in range(iters):
            contrib = (
                adj.join(ranks, adj["src"] == ranks["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("rank") / F.col("deg")).alias("m"))
            )
            ranks = contrib.select(
                "node",
                (F.lit(1.0 - damping) + F.lit(damping) * F.col("m")).alias(
                    "rank"
                ),
            )
        # materialize while adj is still persisted — callers may unpersist
        return ranks.localCheckpoint()
    finally:
        adj.unpersist()


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Reorient each undirected edge from its lower-(deg, id) endpoint to
    the higher one (deterministic total order; ids are unique)."""
    und = _symmetrize(edges)
    deg = und.groupBy(F.col("src").alias("n")).agg(
        F.count(F.lit(1)).alias("d")
    )
    e = (
        edges.join(deg.select(F.col("n").alias("src"), F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("n").alias("dst"), F.col("d").alias("dd")), "dst")
    )
    lower_first = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an undirected
    (src < dst) edge table; returns (node, n_triangles) for nodes in at
    least one triangle.

    With edges oriented low→high by (degree, id), every triangle
    {x, y, z} (x < y < z in that order) appears exactly once as the join
    ab=(x,y) ⋈ bc=(y,z) ⋈ ac=(x,z) — three equi-joins, no post-hoc
    dedup, and the orientation bounds the per-key join fanout on hubs
    (module docstring). Each found triangle credits all three corners.

    The edge list and its oriented form are materialized once
    (localCheckpoint) before the three-way self-join — otherwise every
    join branch re-derives the full edge pipeline (at scale, three
    redundant co-occurrence shuffles).
    """
    edges = edges.localCheckpoint()
    o = oriented_edges(edges).localCheckpoint()
    ab, bc, ac = o.alias("ab"), o.alias("bc"), o.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.dst") == F.col("bc.src"))
        .join(
            ac,
            (F.col("ac.src") == F.col("ab.src"))
            & (F.col("ac.dst") == F.col("bc.dst")),
        )
        .select(
            F.col("ab.src").alias("x"),
            F.col("ab.dst").alias("y"),
            F.col("bc.dst").alias("z"),
        )
    )
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def label_propagation(
    edges: DataFrame, iters: int = 2, checkpoint: bool = True
) -> DataFrame:
    """Deterministic synchronous label propagation (community detection)
    over an undirected (src < dst) edge table; returns (node, lbl) after
    ``iters`` iterations. l0(v) = v; each step every node adopts the
    most frequent label among its neighbors, smallest label on ties —
    the tie rule that makes LPA (normally randomized) a fixed function
    of the graph, so it can be differentially tested.

    Same iteration layout as pagerank: the symmetrized adjacency is
    shuffled once onto src and persisted; per iteration only the
    |V|-row label table joins against it, and the argmax per node is a
    max_by(struct) hash aggregate — map-side combinable, no sort, no
    window.

    ``checkpoint=False`` skips the final localCheckpoint so callers can
    inspect the full iteration plan (the checkpoint replaces it with an
    ExistingRDD scan); execution-bound callers keep the default.
    """
    und = _symmetrize(edges).repartition("src").persist()
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    try:
        for _ in range(iters):
            cnt = (
                und.join(labels, und["src"] == labels["node"])
                .groupBy(F.col("dst").alias("nbr"), "lbl")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            labels = cnt.groupBy(F.col("nbr").alias("node")).agg(
                F.expr("max_by(lbl, struct(c, -lbl))").alias("lbl")
            )
        return labels.localCheckpoint() if checkpoint else labels
    finally:
        und.unpersist()


def bfs_hops(
    edges: DataFrame, n_seeds: int = 3, max_hops: int = 3
) -> DataFrame:
    """Multi-source BFS over an undirected (src < dst) edge table:
    returns (seed, node, dist) — minimum hop distance <= ``max_hops``
    from each of the ``n_seeds`` lowest-id nodes (deterministic seed
    rule, so the run is a pure function of the graph).

    Frontier iteration, the scale shape for distributed BFS: per hop,
    only the FRONTIER (nodes first reached that hop) joins the
    once-partitioned persisted adjacency, and the expansion is
    anti-joined against the visited set so a node is settled exactly
    once per seed — without the anti-join the walk set grows by degree
    products per hop (the oracle's recursive CTE does exactly that,
    affordable only at test scale). One isEmpty action per round and a
    localCheckpoint per frontier, the same loop discipline as the
    connected-components operator (operators/coref.py).
    """
    und = _symmetrize(edges).repartition("src").persist()
    try:
        seeds = (
            und.select(F.col("src").alias("node"))
            .distinct()
            .orderBy("node")
            .limit(n_seeds)
            .select(F.col("node").alias("seed"), "node")
        )
        visited = seeds.withColumn("dist", F.lit(0)).localCheckpoint()
        frontier = visited
        for hop in range(1, max_hops + 1):
            frontier = (
                frontier.join(und, frontier["node"] == und["src"])
                .select("seed", F.col("dst").alias("node"))
                .distinct()
                .join(visited, ["seed", "node"], "left_anti")
                .withColumn("dist", F.lit(hop))
                .localCheckpoint()
            )
            if frontier.isEmpty():
                break
            visited = visited.unionByName(frontier).localCheckpoint()
        return visited
    finally:
        und.unpersist()


def jaccard_similarity(edges: DataFrame) -> DataFrame:
    """Neighbor-set Jaccard similarity for every node pair sharing at
    least one neighbor: |N(a) ∩ N(c)| / |N(a) ∪ N(c)| — the classic
    link-prediction / entity-consolidation signal over the KG edge
    table. Returns (a, c, n_common, jaccard) with a < c.

    Candidate pairs come from the WEDGE join (two adjacency rows
    meeting at a shared neighbor) — an equi-join on the neighbor id,
    never an all-pairs product — and the union size is computed from
    degrees (deg(a) + deg(c) - common), so neighbor SETS are never
    materialized per pair. Per-neighbor fanout is deg(n)^2, the same
    hub hazard as triangle counting: at 100 TB the guards are the
    co-occurrence threshold upstream, a degree cap on hubs, or swapping
    exact Jaccard for the MinHash estimate this repo already owns
    (functions/dedup.py) over adjacency lists."""
    und = _symmetrize(edges)
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    a = und.select(F.col("src").alias("a"), F.col("dst").alias("n"))
    c = und.select(F.col("src").alias("c"), F.col("dst").alias("n"))
    common = (
        a.join(c, "n")
        .where(F.col("a") < F.col("c"))
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(deg.select(F.col("src").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("src").alias("c"), F.col("deg").alias("deg_c")), "c")
        .select(
            "a",
            "c",
            "n_common",
            (
                F.col("n_common")
                / (F.col("deg_a") + F.col("deg_c") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
