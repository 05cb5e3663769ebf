"""Sketch-accuracy gates for sketch_distinct_quantiles: the estimates are
engine-specific (no DuckDB differential possible), so the check is an
error bound against exact answers computed on the same data — the
standard way to verify approximate operators.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sketch_df(spark):
    from __spark_entry__ import queries

    rows = queries()["sketch_distinct_quantiles"](spark, SF_DIR).collect()
    return {r["event_type"]: r for r in rows}


@pytest.fixture(scope="module")
def exact():
    con = duckdb.connect()
    per_type = con.execute(
        f"""
        SELECT event_type,
               COUNT(DISTINCT event_id) AS n_ids,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.95) AS p95
        FROM '{SF_DIR}/events.parquet' GROUP BY event_type
        """
    ).fetchall()
    total = con.execute(
        f"SELECT COUNT(DISTINCT event_id) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    con.close()
    return {r[0]: r for r in per_type}, total


def test_hll_and_hllpp_estimates_within_5pct(sketch_df, exact):
    per_type, _ = exact
    for et, (_, n_exact, _, _) in per_type.items():
        row = sketch_df[et]
        for col in ("n_ids_hll", "n_ids_hllpp"):
            err = abs(row[col] - n_exact) / n_exact
            assert err <= 0.05, f"{et}.{col}: {row[col]} vs exact {n_exact}"


def test_merged_hll_union_estimates_global_distinct(sketch_df, exact):
    _, total = exact
    est = sketch_df["__all__"]["n_ids_hll"]
    assert abs(est - total) / total <= 0.05, (est, total)


def test_approx_percentiles_are_rank_accurate(sketch_df, exact, spark):
    # approx_percentile guarantees a RANK error bound (<= n/accuracy), not
    # a value bound: assert the returned value's true rank is within
    # n/accuracy of the target rank.
    import pandas as pd

    vals = pd.read_parquet(f"{SF_DIR}/events.parquet")[["event_type", "value"]]
    per_type, _ = exact
    for et in per_type:
        s = vals[vals.event_type == et]["value"].sort_values().to_numpy()
        n = len(s)
        tol = max(1.0, n / 10000) + 1  # accuracy=10000 + boundary slack
        for col, q in (("p50", 0.5), ("p95", 0.95)):
            v = sketch_df[et][col]
            rank = (s <= v).sum()
            assert abs(rank - q * n) <= tol, (et, col, v, rank, q * n)


def test_sketch_aggregation_is_partial(spark):
    # the shuffle must carry sketch state, not raw values: both HLL aggs
    # appear as partial_ (map-side) before the exchange
    from __spark_entry__ import queries

    df = queries()["sketch_distinct_quantiles"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_hll_sketch_agg" in plan
    assert "partial_approx_count_distinct" in plan or "partial_hllpp" in plan


# ---------------------------------------------------------------------------
# heavy_hitters_tokens: MG candidate recall + exactness + plan shape
# ---------------------------------------------------------------------------


def test_heavy_hitters_exact_under_adversarial_partitioning(spark):
    """The sketch-then-recount output must equal the brute-force answer
    for ANY partitioning (recall from the Misra-Gries bound, precision
    from the exact recount). Probe with a skewed corpus rearranged three
    ways, including one that concentrates the hitters in one partition."""
    from pyspark.sql import functions as F

    from ner_spark.queries_text import heavy_hitters_tokens

    # 3 planted hitters (5%/2%/1% of tokens) over a long uniform tail
    rows = []
    for i in range(2000):
        toks = [f"tail{(i * 17 + j) % 4000}" for j in range(8)]
        if i % 20 == 0:
            toks += ["alpha"] * 8
        if i % 50 == 0:
            toks += ["beta"] * 8
        if i % 100 == 0:
            toks += ["gamma"] * 8
        rows.append((i, " ".join(toks)))
    base = spark.createDataFrame(rows, "doc_id long, text string")

    import tempfile

    exact = None
    for arrange in (
        lambda d: d,
        lambda d: d.repartition(37),
        lambda d: d.orderBy("doc_id").coalesce(2),
        # high-partition-count case: hundreds of tiny files so the scan
        # yields enough partitions to engage the sqrt(P) mid merge level
        lambda d: d.repartition(400),
    ):
        with tempfile.TemporaryDirectory() as td:
            arrange(base).write.parquet(f"{td}/documents.parquet")
            got = sorted(
                tuple(r)
                for r in heavy_hitters_tokens(spark, td, phi=0.005).collect()
            )
        if exact is None:
            toks = base.select(
                F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("t")
            ).where(F.col("t") != "")
            n = toks.count()
            import math

            thresh = math.ceil(n * 0.005)
            exact = sorted(
                (r["t"], r["c"])
                for r in toks.groupBy("t")
                .agg(F.count(F.lit(1)).alias("c"))
                .where(F.col("c") >= thresh)
                .collect()
            )
            assert {t for t, _ in exact} >= {"alpha", "beta", "gamma"}
        assert got == exact


def test_heavy_hitters_merge_tree_width_scales_sqrt():
    """The mid merge level must scale ~sqrt(P) (round-4 VERDICT: a fixed
    32-wide mid level leaves the FINAL merge task reading P/32 summaries,
    which stops being summary-sized past ~10^4 input partitions)."""
    from ner_spark.queries_text import _mg_merge_width

    assert _mg_merge_width(1) == 32  # floored: no extra stage small
    assert _mg_merge_width(32) == 32
    assert _mg_merge_width(10_000) == 100
    assert _mg_merge_width(1_000_000) == 1000
    # both levels stay balanced: mid tasks each read ~P/width summaries,
    # the final task reads `width` — neither side grows past ~sqrt(P)
    for p in (10_000, 250_000, 1_000_000):
        w = _mg_merge_width(p)
        assert max(p / w, w) <= 2 * (p ** 0.5) + 32


def test_heavy_hitters_recount_is_broadcast_and_candidate_bounded(spark):
    """Plan shape: the recount join must BROADCAST the candidate set (the
    corpus never shuffles for the join) and the only aggregation shuffle
    carries candidate tokens, not the full vocabulary."""
    from ner_spark.queries_text import heavy_hitters_tokens

    df = heavy_hitters_tokens(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
