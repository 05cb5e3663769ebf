"""Write-audit-publish transcript ingest (plans/wap, SURVEY.md §4.4).

Contract: a green batch publishes atomically and the downstream
incremental KG tick consumes it exactly as a direct append; a red batch
(null keys, in-batch duplicate turns, turns colliding with main) leaves
main byte-untouched and stays inspectable on its audit branch; a
refused batch does not poison later batches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ner_spark.iceberg.spark_io import read_iceberg, write_iceberg
from ner_spark.iceberg.table import IcebergLocalTable
from ner_spark.plans.incremental import incremental_kg_update
from ner_spark.plans.wap import wap_ingest


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def split(small_inputs):
    tx = small_inputs["transcripts"]
    half = F.abs(F.xxhash64("conv_id")) % 2
    return tx.filter(half == 0), tx.filter(half == 1)


def test_green_batches_publish_and_tick_consumes(
    spark, small_inputs, split, tmp_path
):
    b1, b2 = split
    src = str(tmp_path / "transcripts")

    r1 = wap_ingest(spark, b1, src, "b1")
    assert r1["published"] and all(c["ok"] for c in r1["checks"].values())
    r2 = wap_ingest(spark, b2, src, "b2")
    assert r2["published"]
    assert "key_collision_with_main" in r2["checks"]

    t = IcebergLocalTable(src)
    assert set(t.refs()) == {"main"}  # staging branches dropped on publish
    assert _rows(read_iceberg(spark, src)) == _rows(b1.unionByName(b2))

    # downstream maintenance tick sees exactly the published state
    wh = str(tmp_path / "wh")
    tick = incremental_kg_update(
        spark, src, wh, small_inputs["gazetteer_pdf"],
        small_inputs["entity_embeddings"],
    )
    assert tick["processed_rows"] == b1.count() + b2.count()


def test_red_batch_refused_main_untouched(spark, split, tmp_path):
    b1, b2 = split
    src = str(tmp_path / "transcripts")
    assert wap_ingest(spark, b1, src, "b1")["published"]
    main_before = _rows(read_iceberg(spark, src))
    head_before = IcebergLocalTable(src).current_snapshot()["snapshot-id"]

    bad = b2.withColumn(
        "text", F.when(F.col("turn_idx") % 5 == 0, F.lit(None))
                 .otherwise(F.col("text"))
    )
    r = wap_ingest(spark, bad, src, "b2bad")
    assert not r["published"]
    assert not r["checks"]["schema_nulls"]["ok"]

    t = IcebergLocalTable(src)
    assert t.current_snapshot()["snapshot-id"] == head_before
    assert _rows(read_iceberg(spark, src)) == main_before
    # refused batch stays inspectable on its branch
    assert "audit-b2bad" in t.refs()
    staged = read_iceberg(spark, src, ref="audit-b2bad")
    assert staged.filter("text is null").count() > 0

    # re-staging under the same id refuses until the branch is dropped
    with pytest.raises(ValueError, match="already exists"):
        wap_ingest(spark, b2, src, "b2bad")
    t.drop_ref("audit-b2bad")

    # a later good batch is unaffected by the refused one
    r2 = wap_ingest(spark, b2, src, "b2")
    assert r2["published"]
    assert _rows(read_iceberg(spark, src)) == _rows(b1.unionByName(b2))


def test_duplicate_and_collision_checks(spark, split, tmp_path):
    b1, b2 = split
    src = str(tmp_path / "transcripts")
    assert wap_ingest(spark, b1, src, "b1")["published"]

    # in-batch duplicate turn ordinals
    dup = b2.unionByName(b2.limit(3))
    r = wap_ingest(spark, dup, src, "dup")
    assert not r["published"]
    assert not r["checks"]["dup_keys_in_batch"]["ok"]
    IcebergLocalTable(src).drop_ref("audit-dup")

    # re-appending turns main already has (corrections belong on MOR)
    r2 = wap_ingest(spark, b2.unionByName(b1.limit(5)), src, "coll")
    assert not r2["published"]
    assert not r2["checks"]["key_collision_with_main"]["ok"]
    assert r2["checks"]["dup_keys_in_batch"]["ok"]


def test_extra_checks_gate_publish(spark, split, tmp_path):
    b1, _ = split
    src = str(tmp_path / "transcripts")

    def min_rows(df):
        n = df.count()
        return n >= 10**9, f"{n} rows < 10^9"

    r = wap_ingest(spark, b1, src, "b1", extra_checks=[min_rows])
    assert not r["published"]
    assert not r["checks"]["min_rows"]["ok"]
    # first-ever batch refused → table head still empty
    assert read_iceberg(spark, src).count() == 0
