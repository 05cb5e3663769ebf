"""Unit tests for graph operators (operators/graph.py) on hand-built
graphs with independently computed expectations; the DuckDB differential
for the registered queries lives in test_queries_duckdb.py.
"""

from __future__ import annotations

from ner_spark.operators.graph import (
    cooccurrence_edges,
    label_propagation,
    oriented_edges,
    pagerank,
    triangle_counts,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _pagerank_ref(pairs, iters, damping=0.85):
    """Independent dict-based reference of the same formulation."""
    nbrs: dict[int, list[int]] = {}
    for a, b in pairs:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    deg = {n: len(v) for n, v in nbrs.items()}
    r = {n: 1.0 for n in nbrs}
    for _ in range(iters):
        r = {
            n: (1 - damping) + damping * sum(r[u] / deg[u] for u in nbrs[n])
            for n in nbrs
        }
    return r


def test_pagerank_matches_reference(spark):
    # triangle {1,2,3} with a tail 3-4-5: asymmetric degrees
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    got = {
        row["node"]: row["rank"]
        for row in pagerank(_edges_df(spark, pairs), iters=3).collect()
    }
    exp = _pagerank_ref(pairs, iters=3)
    assert set(got) == set(exp)
    for n in exp:
        assert abs(got[n] - exp[n]) < 1e-12, (n, got[n], exp[n])
    # the hub (3) must outrank the leaf (5)
    assert got[3] > got[5]


def test_triangle_counts_k4(spark):
    # K4: four triangles, every node in exactly three
    pairs = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    got = {
        row["node"]: row["n_triangles"]
        for row in triangle_counts(_edges_df(spark, pairs)).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_one_triangle_with_tail(spark):
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    got = {
        row["node"]: row["n_triangles"]
        for row in triangle_counts(_edges_df(spark, pairs)).collect()
    }
    # only the triangle corners appear; tail nodes are in no triangle
    assert got == {1: 1, 2: 1, 3: 1}


def test_oriented_edges_is_a_permutation_low_to_high_degree(spark):
    # star around 1 (degree 4) plus edge 2-3: orientation must point
    # into the hub, and every input edge appears exactly once
    pairs = [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3)]
    got = {
        (row["src"], row["dst"])
        for row in oriented_edges(_edges_df(spark, pairs)).collect()
    }
    assert len(got) == len(pairs)
    # hub has degree 4 > everyone: all star edges point leaf -> hub
    for leaf in (2, 3, 4, 5):
        assert (leaf, 1) in got
    # 2 and 3 both have degree 2: tie broken by id
    assert (2, 3) in got


def test_cooccurrence_edges_threshold(spark):
    # groups: {1,2} together 3x, {1,3} once, {2,3} once
    rows = []
    for g in ("a", "b", "c"):
        rows += [(g, 1), (g, 2)]
    rows += [("d", 1), ("d", 3), ("e", 2), ("e", 3)]
    items = spark.createDataFrame(rows, "g string, i long")
    got = {
        (row["src"], row["dst"])
        for row in cooccurrence_edges(items, "g", "i").collect()
    }
    # weights: (1,2)=3, (1,3)=1, (2,3)=1 → avg 5/3; only (1,2) survives
    assert got == {(1, 2)}


def _label_prop_ref(pairs, iters):
    """Independent dict-based reference: most frequent neighbor label,
    smallest label on ties, synchronous updates."""
    nbrs: dict[int, list[int]] = {}
    for a, b in pairs:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lbl = {n: n for n in nbrs}
    for _ in range(iters):
        new = {}
        for n, vs in nbrs.items():
            cnt: dict[int, int] = {}
            for v in vs:
                cnt[lbl[v]] = cnt.get(lbl[v], 0) + 1
            new[n] = min(cnt, key=lambda c: (-cnt[c], c))
        lbl = new
    return lbl


def test_label_propagation_two_cliques(spark):
    # two triangles joined by one bridge edge: communities must not merge
    # in 2 deterministic iterations (each triangle converges to its min id)
    pairs = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    got = {
        r["node"]: r["lbl"]
        for r in label_propagation(_edges_df(spark, pairs), iters=2).collect()
    }
    exp = _label_prop_ref(pairs, iters=2)
    assert got == exp
    # the left triangle's interior nodes agree on a community distinct
    # from the right triangle's interior
    assert got[1] == got[2] and got[5] == got[6]
    assert got[1] != got[5]


def test_label_propagation_star_adopts_hub_minimum(spark):
    # star: leaves see only the hub; after 1 iter every leaf has the
    # hub's label and the hub has the smallest leaf label
    pairs = [(1, 9), (2, 9), (3, 9)]
    got = {
        r["node"]: r["lbl"]
        for r in label_propagation(_edges_df(spark, pairs), iters=1).collect()
    }
    assert got == {1: 9, 2: 9, 3: 9, 9: 1}


def test_jaccard_similarity_hand_computed(spark):
    from ner_spark.operators.graph import jaccard_similarity

    # path 1-2-3 plus edge 1-3 (triangle) with tail 3-4:
    # N(1)={2,3} N(2)={1,3} N(3)={1,2,4} N(4)={3}
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4)]
    got = {
        (r["a"], r["c"]): (r["n_common"], r["jaccard"])
        for r in jaccard_similarity(_edges_df(spark, pairs)).collect()
    }
    # (1,2): common={3} union={1,2,3} -> 1/3 ; (1,3): common={2} deg 2+3-1=4
    # (2,3): common={1} -> 1/4 ; (1,4)&(2,4): common={3} -> 1/2 and 1/2
    exp = {
        (1, 2): (1, 1 / 3),
        (1, 3): (1, 1 / 4),
        (2, 3): (1, 1 / 4),
        (1, 4): (1, 1 / 2),
        (2, 4): (1, 1 / 2),
    }
    assert set(got) == set(exp), got
    for k, (n, j) in exp.items():
        assert got[k][0] == n and abs(got[k][1] - j) < 1e-12, (k, got[k])
