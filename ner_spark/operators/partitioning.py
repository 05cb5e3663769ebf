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
    df: DataFrame,
    key: str = "conv_id",
    hot_k: int = 64,
    min_rows: int = 1000,
    sample_mod: int = 100,
    sample_col: str = "turn_idx",
) -> list:
    """One profile pass: the up-to-hot_k keys with >= min_rows rows,
    estimated from a deterministic ~1/sample_mod row sample (round-4:
    VERDICT r03 item 6) — hot keys by definition survive sampling (a key
    at the min_rows threshold keeps ~min_rows/sample_mod sampled rows),
    so the profile scan shuffles 1% of the input instead of all of it.
    The sample predicate is xxhash64(key, sample_col) — never rand() —
    so retries and repartitions see the same profile. sample_mod=1
    disables sampling (the exact count profile). Salting is
    semantics-free downstream, so profile noise near the threshold can
    only shift WHICH borderline keys get salted, never any result."""
    cutoff = max(1, min_rows // sample_mod)
    src = df
    if sample_mod > 1:
        src = df.where(
            F.pmod(
                F.xxhash64(F.col(key), F.col(sample_col)), F.lit(sample_mod)
            )
            == 0
        )
    return [
        r[0]
        for r in (
            src.groupBy(key)
            .count()
            .where(F.col("count") >= cutoff)
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
    hot = profile_hot_keys(df, key, hot_k, min_rows, sample_col=order_col)
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
