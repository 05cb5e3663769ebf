"""Production-path dedup (ner_spark/functions/dedup.py) vs the
differential MD5 variant and vs exact Jaccard ground truth.

LSH with 8 bands of r=1 recovers a pair with prob 1-(1-J)^8-8J(1-J)^7
(>= 2 band hits); at J >= 0.6 that is ~0.996 per pair. The two hash
families (MD5 / xxhash64) sample different random permutations, so their
candidate sets legitimately differ on mid-Jaccard pairs — the contract
is recall of the true near-dup set plus bounded candidate blowup, and
that is what is asserted for BOTH variants.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"


def _pairs(df):
    return {(int(r["doc_a"]), int(r["doc_b"])) for r in df.collect()}


@pytest.fixture(scope="module")
def truth_pairs():
    """Exact word-3-gram Jaccard >= 0.6 pairs, independently via DuckDB."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    rows = con.sql(
        """
        WITH sh AS (
          SELECT doc_id, list_distinct([
                   array_to_string(toks[i:i+2], ' ')
                   FOR i IN range(1, len(toks) - 1)
                 ]) AS shingles
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3),
        ex AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
        sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
        pc AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b FROM pc
        JOIN sizes sa ON sa.doc_id = pc.doc_a
        JOIN sizes sb ON sb.doc_id = pc.doc_b
        WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.6
        """
    ).fetchall()
    con.close()
    return {(int(a), int(b)) for a, b in rows}


def test_both_variants_recall_true_near_dups(spark, truth_pairs):
    from ner_spark.queries_text import dedup_minhash_fast, dedup_minhash_lsh

    fast = _pairs(dedup_minhash_fast(spark, SF_DIR))
    md5 = _pairs(dedup_minhash_lsh(spark, SF_DIR))
    assert len(truth_pairs) > 0
    # candidate sets must cover every true near-dup pair on this corpus
    assert truth_pairs <= fast, f"fast missed {sorted(truth_pairs - fast)[:5]}"
    assert truth_pairs <= md5, f"md5 missed {sorted(truth_pairs - md5)[:5]}"
    # and stay a candidate set, not a cross product: bounded blowup
    assert len(fast) <= 10 * len(truth_pairs)
    assert len(md5) <= 10 * len(truth_pairs)


def test_signatures_are_per_row(spark):
    """The signature stage must not hash-shuffle: its physical plan has no
    key-based Exchange (the whole point of the per-row higher-order-function
    formulation). A single round-robin repartition IS allowed — shingles()
    inserts one when the parquet scan under-partitions a small input (see
    _parallelize_small_input), and it carries no key semantics."""
    from ner_spark.functions.dedup import minhash_signatures, shingles

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        minhash_signatures(shingles(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lower = plan.lower()
    n_ex = lower.count("exchange")
    assert n_ex <= 1, plan
    if n_ex:  # the single allowed exchange must be the keyless spread
        assert "roundrobinpartitioning" in lower, plan
        assert "hashpartitioning" not in lower and "rangepartitioning" not in lower


def test_dedup_cluster_is_valid_partition(spark):
    """dedup_cluster output must be a valid clustering of the LSH pair
    graph: every doc maps to exactly one cluster, the cluster id is the
    member minimum, and every candidate pair lands in one cluster."""
    from __spark_entry__ import queries

    sf = "/root/testdata/sf0.001"
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in queries()["dedup_minhash_lsh"](spark, sf).collect()
    }
    assign = {
        r["doc_id"]: r["cluster_id"]
        for r in queries()["dedup_cluster"](spark, sf).collect()
    }
    # exactly the docs appearing in some pair are clustered
    assert set(assign) == {d for p in pairs for d in p}
    # pair endpoints always share a cluster
    assert all(assign[a] == assign[b] for a, b in pairs)
    # cluster id is the min member id of its cluster
    by_cluster = {}
    for doc, cl in assign.items():
        by_cluster.setdefault(cl, []).append(doc)
    assert all(cl == min(members) for cl, members in by_cluster.items())


def test_bucket_cap_drops_degenerate_buckets(spark):
    """lsh_pairs_from_signatures must refuse pair enumeration inside
    buckets larger than max_bucket (the d^2 guard) while still pairing
    normal buckets."""
    from ner_spark.functions.dedup import lsh_pairs_from_signatures

    rows = []
    # degenerate bucket: 50 docs colliding in both bands
    for d in range(50):
        rows += [(d, 0, "HOT"), (d, 1, "HOT2")]
    # normal bucket: docs 100, 101 collide in 2 bands
    rows += [(100, 0, "ok0"), (101, 0, "ok0"), (100, 1, "ok1"), (101, 1, "ok1")]
    sig = spark.createDataFrame(rows, "doc_id long, band int, minhash string")

    capped = lsh_pairs_from_signatures(sig, max_bucket=10).collect()
    assert [(r.doc_a, r.doc_b, r.n_band_hits) for r in capped] == [(100, 101, 2)]

    uncapped = lsh_pairs_from_signatures(sig, max_bucket=None)
    assert uncapped.count() == 50 * 49 // 2 + 1  # the d^2 the cap refuses


# ---------------------------------------------------------------------------
# dedup_substring_spans: exact maximal-span boundaries on planted runs
# ---------------------------------------------------------------------------


def test_substring_spans_exact_boundaries(spark):
    """Hand-planted shared runs: the operator must emit exactly the maximal
    duplicated token spans — cross-document only (a within-doc repeat does
    not count), disjoint runs stay separate islands, and docs shorter than
    the window are excluded."""
    import tempfile

    from ner_spark.queries_text import dedup_substring_spans

    S = [f"s{i}" for i in range(12)]  # shared by docs 1, 2, 3
    T = [f"t{i}" for i in range(12)]  # shared by docs 3, 4
    rows = [
        (1, " ".join([f"a{i}" for i in range(5)] + S + ["a5", "a6", "a7", "a8"])),
        (2, " ".join(["b0", "b1", "b2"] + S + [f"b{i}" for i in range(3, 9)])),
        (3, " ".join(S + [f"c{i}" for i in range(5)] + T)),
        (4, " ".join(T + [f"d{i}" for i in range(8)])),
        (5, " ".join([f"u{i}" for i in range(10)] * 2)),  # within-doc repeat
        (6, "e0 e1 e2 e3 e4"),  # shorter than the window
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            f"{td}/documents.parquet"
        )
        got = sorted(
            tuple(r) for r in dedup_substring_spans(spark, td).collect()
        )
    assert got == [
        (1, 5, 16, 12),
        (2, 3, 14, 12),
        (3, 0, 11, 12),
        (3, 17, 28, 12),
        (4, 0, 11, 12),
    ]
