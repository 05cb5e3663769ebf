"""Schema evolution on the transcript warehouse: a 10^12-turn table
accretes columns over time (new telemetry fields land in new partitions
only). Reads must (a) merge schemas across heterogeneous parquet parts
and (b) union old and new extracts without manual padding — both with
the added column NULL for old data, never a crash or a silent drop.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F


def _old_new_dirs(spark, tmp_path):
    old = spark.createDataFrame(
        [("c1", 0, "user", "hi", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    new = old.withColumn("model_id", F.lit("m-7b")).withColumn(
        "turn_idx", F.lit(1)
    )
    d = str(tmp_path / "tx")
    old.write.parquet(f"{d}/part=old")
    new.write.parquet(f"{d}/part=new")
    return d


def test_merge_schema_read_fills_missing_with_null(spark, tmp_path):
    d = _old_new_dirs(spark, tmp_path)
    got = (
        spark.read.option("mergeSchema", "true")
        .parquet(d)
        .orderBy("turn_idx")
        .toPandas()
    )
    assert "model_id" in got.columns
    assert pd.isna(got.model_id[0]) and got.model_id[1] == "m-7b"
    assert list(got.turn_idx) == [0, 1]


def test_union_by_name_allows_missing_columns(spark, tmp_path):
    d = _old_new_dirs(spark, tmp_path)
    old = spark.read.parquet(f"{d}/part=old")
    new = spark.read.parquet(f"{d}/part=new")
    u = old.unionByName(new, allowMissingColumns=True).orderBy("turn_idx")
    got = u.toPandas()
    assert list(got.columns)[-1] == "model_id"
    assert pd.isna(got.model_id[0]) and got.model_id[1] == "m-7b"
    # the widened frame feeds the pipeline entry schema unchanged
    assert u.where(F.col("text").isNotNull()).count() == 2
