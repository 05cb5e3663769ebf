"""Warehouse write/read operations the 100-TB deployment relies on:
dynamic partition overwrite (backfill one partition, leave siblings
untouched) and text-format ingest (JSONL / CSV with explicit schemas —
never schema inference on a production path).
"""

from __future__ import annotations

import pyspark.sql.functions as F

SCHEMA = "conv_id string, turn_idx int, role string, text string"


def test_dynamic_partition_overwrite_backfills_one_partition(spark, tmp_path):
    d = str(tmp_path / "tx")
    base = spark.createDataFrame(
        [("c1", 0, "user", "hi"), ("c1", 1, "assistant", "yo"),
         ("c2", 0, "user", "ok")],
        SCHEMA,
    )
    base.write.partitionBy("role").parquet(d)

    fix = spark.createDataFrame([("c9", 9, "user", "patched")], SCHEMA)
    (
        fix.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("role")
        .parquet(d)
    )
    got = spark.read.parquet(d)
    # only role=user was rewritten; role=assistant untouched
    assert got.where("role = 'assistant'").count() == 1
    users = [r.conv_id for r in got.where("role = 'user'").collect()]
    assert users == ["c9"], users


def test_jsonl_and_csv_ingest_with_explicit_schema(spark, tmp_path):
    pdf = spark.createDataFrame(
        [("c1", 0, "user", "hi, there"), ("c2", 1, "tool", '{"a": 1}')],
        SCHEMA,
    ).toPandas()

    jl = str(tmp_path / "tx.jsonl")
    pdf.to_json(jl, orient="records", lines=True)
    got_j = spark.read.schema(SCHEMA).json(jl).orderBy("conv_id").toPandas()
    assert got_j.equals(pdf.sort_values("conv_id").reset_index(drop=True))

    cs = str(tmp_path / "tx.csv")
    pdf.to_csv(cs, index=False)
    got_c = (
        spark.read.schema(SCHEMA)
        .option("header", "true")
        # RFC-4180 escaping (doubled quotes, what pandas writes) — Spark
        # defaults to backslash escapes and silently misparses otherwise
        .option("escape", '"')
        .csv(cs)
        .orderBy("conv_id")
        .toPandas()
    )
    # embedded comma and JSON braces survive quoting round-trips
    assert got_c.equals(pdf.sort_values("conv_id").reset_index(drop=True))


def test_corrupt_jsonl_rows_are_quarantined_not_fatal(spark, tmp_path):
    jl = str(tmp_path / "bad.jsonl")
    with open(jl, "w") as f:
        f.write('{"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi"}\n')
        f.write("this is not json\n")
        f.write('{"conv_id": "c2", "turn_idx": 1}\n')  # missing fields -> null
    got = (
        spark.read.schema(SCHEMA + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(jl)
    )
    rows = got.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == 1 and bad[0].conv_id is None
    ok = [r for r in rows if r.conv_id == "c2"]
    assert ok and ok[0].text is None  # missing field -> null, not an error
