"""Query registry plumbing for the driver harness (__spark_entry__).

Each entry pairs a Spark DataFrame builder (spark, sf_dir) -> DataFrame with
an equivalent ANSI SQL string for DuckDB (pre-registered views: region
nation customer supplier part orders lineitem events documents embeddings).
Entries registered with sql=None are non-SQL-expressible (streaming, KG
pipeline) and get the driver's weaker rows-only check.

Cross-engine numeric policy (applies to every paired query):
- alias every computed column identically on both sides;
- CAST DuckDB's HUGEINT sums to BIGINT (Spark's sum(long) is long);
- ROUND(x, 6) every floating aggregate on both sides (kills add-order
  noise between engines; both engines produce the nearest 6-decimal
  double for non-boundary values);
- deterministic tiebreaks on every window/top-k ranking.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # ship repo packages to python workers (driver CWD–independent)
            from ner_spark.deploy import ensure_py_files

            ensure_py_files(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
