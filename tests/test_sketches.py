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
