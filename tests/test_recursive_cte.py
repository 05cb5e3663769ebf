"""WITH RECURSIVE (Spark 4): the recursive running-total chain must
equal the classic window cumsum — an in-engine identity that pins the
recursion semantics independently of the DuckDB differential."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Window as W


def test_recursive_chain_equals_window_cumsum(spark):
    import ner_spark.queries_relational  # noqa: F401

    from ner_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    rec = QUERIES["recursive_cte_chain"](spark, sf).toPandas()

    o = spark.read.parquet(f"{sf}/orders.parquet")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    win = (
        o.select(
            "o_custkey",
            F.row_number().over(w).alias("rn"),
            "o_orderkey",
            F.round(
                F.sum("o_totalprice").over(
                    w.rowsBetween(W.unboundedPreceding, W.currentRow)
                ),
                6,
            ).alias("running_total"),
        )
        .where(F.col("rn") <= 12)  # the query caps recursion depth at 12
    ).toPandas()

    key = ["o_custkey", "rn"]
    a = rec.sort_values(key).reset_index(drop=True)
    b = win[rec.columns].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-6)
    assert len(a) == len(b) > 0  # every in-cap order appears exactly once
