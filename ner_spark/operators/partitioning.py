"""Explicit partitioning with hot-key salting (SURVEY.md §4.3;
BASELINE.json north_rule "explicitly partitioned by conv_id with salting
for hot conversations").

A profile aggregation finds the top-k hottest conversations; their rows
get a turn-derived salt appended to the repartition key so one 10^6-turn
conversation spreads over `salt` partitions instead of pinning one
straggler executor. Cold conversations keep salt 0 — they stay fully
co-located. The NLP stage downstream is row-parallel, so salting is
semantics-free there; per-conversation operators (windows, session
assembly) re-exchange on conv_id anyway and are unaffected.

The two-level aggregation pattern for salted keys (partial per
(key, salt), final per key) lives in queries_relational.salted_two_level_agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_hot_keys(
    df: DataFrame, key: str = "conv_id", hot_k: int = 64, min_rows: int = 1000
) -> list:
    """One profile pass: the up-to-hot_k keys with >= min_rows rows."""
    return [
        r[0]
        for r in (
            df.groupBy(key)
            .count()
            .where(F.col("count") >= min_rows)
            .orderBy(F.desc("count"), key)
            .limit(hot_k)
            .collect()
        )
    ]


def salted_repartition(
    df: DataFrame,
    n_partitions: int,
    key: str = "conv_id",
    order_col: str = "turn_idx",
    hot_k: int = 64,
    min_rows: int = 1000,
    salt: int = 16,
) -> DataFrame:
    """repartition(n, key [, salt]) where only profiled hot keys are
    salted (deterministic: salt = xxhash64(order_col) % salt)."""
    hot = profile_hot_keys(df, key, hot_k, min_rows)
    if not hot:
        return df.repartition(n_partitions, key)
    salt_col = (
        F.when(
            F.col(key).isin(hot),
            F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt)),
        )
        .otherwise(F.lit(0))
        .alias("__salt")
    )
    return df.repartition(n_partitions, F.col(key), salt_col)
