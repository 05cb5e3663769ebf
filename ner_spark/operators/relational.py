"""Relational operator helpers beyond plain DataFrame calls
(SURVEY.md §2.4 C11–C12).

asof_join: the union+window trick — no cogroup/UDF, stays JVM-side, one
shuffle on (keys, ts). For each left row, the latest right row with
right_ts <= left_ts within the key group (inclusive: right rows sort before
left rows at equal ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """Left as-of join: left columns + latest `payload` columns from right."""
    l_cols = left.columns
    lhs = left.select(
        *l_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"__p_{p}") for p in payload],
    )
    rhs = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c not in keys],
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(p).alias(f"__p_{p}") for p in payload],
    ).select(*l_cols, "__ts", "__is_left", *[f"__p_{p}" for p in payload])
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = lhs.unionByName(rhs)
    for p in payload:
        out = out.withColumn(f"__p_{p}", F.last(f"__p_{p}", ignorenulls=True).over(w))
    return (
        out.where(F.col("__is_left") == 1)
        .select(*l_cols, *[F.col(f"__p_{p}").alias(p) for p in payload])
    )
