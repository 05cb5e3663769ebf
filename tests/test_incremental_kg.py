"""Incremental KG maintenance over Iceberg snapshots (plans/incremental).

The contract under test: per-turn stages are exactly incremental —
accumulated mentions/links state after N append ticks is byte-equal to a
from-scratch run over all transcripts — and the globally-recomputed
entity rollup matches the batch pipeline's. Consumption is
exactly-once-per-snapshot (an idempotent re-tick is a no-op).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ner_spark.iceberg.spark_io import write_iceberg
from ner_spark.iceberg.table import IcebergLocalTable
from ner_spark.plans.incremental import incremental_kg_update
from ner_spark.plans.kg import build_kg

MENTION_KEY = ["conv_id", "turn_idx", "start", "end"]


def _sorted_pdf(df, key):
    pdf = df.toPandas()
    if "ctx_emb" in pdf.columns:
        pdf["ctx_emb"] = pdf["ctx_emb"].map(bytes)
    return pdf.sort_values(key, kind="mergesort").reset_index(drop=True)


def test_incremental_matches_full_rebuild(spark, small_inputs, tmp_path):
    tx = small_inputs["transcripts"]
    gaz = small_inputs["gazetteer_pdf"]
    emb = small_inputs["entity_embeddings"]
    src = str(tmp_path / "transcripts")
    wh = str(tmp_path / "wh")

    half = F.abs(F.xxhash64("conv_id")) % 2
    b1, b2 = tx.filter(half == 0), tx.filter(half == 1)

    # batch 1 lands; first tick processes the whole table
    write_iceberg(b1, src)
    r1 = incremental_kg_update(spark, src, wh, gaz, emb)
    assert r1["from_snapshot"] is None
    assert r1["processed_rows"] == b1.count() > 0

    # batch 2 lands as an append snapshot; tick 2 processes ONLY it
    write_iceberg(b2, src, mode="append")
    r2 = incremental_kg_update(spark, src, wh, gaz, emb)
    assert r2["from_snapshot"] is not None
    assert r2["processed_rows"] == b2.count() > 0

    # accumulated per-turn state ≡ from-scratch run over all transcripts
    from ner_spark.nlp.stage import detect_mentions

    full_mentions = detect_mentions(tx, gaz, spark)
    pd.testing.assert_frame_equal(
        _sorted_pdf(r2["mentions"], MENTION_KEY),
        _sorted_pdf(full_mentions, MENTION_KEY),
    )

    # globally-recomputed entities ≡ the batch pipeline's
    full = build_kg(spark, tx, gaz, emb)
    key = ["entity_id"]
    got = _sorted_pdf(r2["entities"], key)
    want = _sorted_pdf(full["entities"], key)
    got["aliases"] = got["aliases"].map(tuple)
    want["aliases"] = want["aliases"].map(tuple)
    pd.testing.assert_frame_equal(got, want)

    # idempotent re-tick: no new source data → nothing processed, no new
    # snapshots on either derived table
    men_t = IcebergLocalTable(f"{wh}/mentions")
    links_t = IcebergLocalTable(f"{wh}/links")
    men_snaps = len(men_t.snapshots())
    links_snaps = len(links_t.snapshots())
    r3 = incremental_kg_update(spark, src, wh, gaz, emb)
    assert r3["processed_rows"] == 0
    assert len(men_t.snapshots()) == men_snaps
    assert len(links_t.snapshots()) == links_snaps
    # the derived tables record which source snapshot they cover
    assert (
        int(men_t.current_snapshot()["summary"]["source-snapshot-id"])
        == r2["to_snapshot"]
    )


def test_cdc_repair_matches_full_rebuild(spark, small_inputs, tmp_path):
    """Transcript corrections (MOR upsert by conv_id) and a GDPR-style
    erasure propagate through a repair tick: derived state ends byte-
    equal to a from-scratch run over the CURRENT transcripts, erased
    conversations vanish from the derived tables, and only the touched
    conversations are reprocessed."""
    from ner_spark.iceberg.spark_io import (
        delete_iceberg_where,
        merge_upsert_iceberg_mor,
        read_iceberg,
    )
    from ner_spark.nlp.stage import detect_mentions

    tx = small_inputs["transcripts"]
    gaz = small_inputs["gazetteer_pdf"]
    emb = small_inputs["entity_embeddings"]
    src = str(tmp_path / "transcripts")
    wh = str(tmp_path / "wh")

    write_iceberg(tx, src)
    incremental_kg_update(spark, src, wh, gaz, emb)  # tick 1: full

    convs = sorted(
        r["conv_id"] for r in tx.select("conv_id").distinct().collect()
    )
    corrected_conv, donor_conv, erased_conv = convs[0], convs[1], convs[2]
    # correction: conv A's turns get conv B's texts (same turn grid)
    donor = tx.filter(F.col("conv_id") == donor_conv).select(
        "turn_idx", F.col("text").alias("new_text")
    )
    corrected = (
        tx.filter(F.col("conv_id") == corrected_conv)
        .join(donor, "turn_idx", "inner")
        .drop("text")
        .withColumnRenamed("new_text", "text")
        .select(*tx.columns)
    )
    n_corrected = corrected.count()
    assert n_corrected > 0
    merge_upsert_iceberg_mor(spark, src, corrected, key="conv_id")
    delete_iceberg_where(spark, src, [("conv_id", "=", erased_conv)])

    r = incremental_kg_update(spark, src, wh, gaz, emb)  # repair tick
    # only the touched conversations were reprocessed
    assert r["processed_rows"] == n_corrected

    cur_tx = read_iceberg(spark, src)
    assert cur_tx.filter(F.col("conv_id") == erased_conv).count() == 0
    full_mentions = detect_mentions(cur_tx, gaz, spark)
    pd.testing.assert_frame_equal(
        _sorted_pdf(r["mentions"], MENTION_KEY),
        _sorted_pdf(full_mentions, MENTION_KEY),
    )
    # the erased conversation left no derived rows behind
    assert (
        r["links"].filter(F.col("conv_id") == erased_conv).count() == 0
    )
    # entities ≡ batch pipeline over current transcripts
    full = build_kg(spark, cur_tx, gaz, emb)
    got = _sorted_pdf(r["entities"], ["entity_id"])
    want = _sorted_pdf(full["entities"], ["entity_id"])
    got["aliases"] = got["aliases"].map(tuple)
    want["aliases"] = want["aliases"].map(tuple)
    pd.testing.assert_frame_equal(got, want)

    # idempotent re-tick after repair: no-op
    men_t = IcebergLocalTable(f"{wh}/mentions")
    n = len(men_t.snapshots())
    r2 = incremental_kg_update(spark, src, wh, gaz, emb)
    assert r2["processed_rows"] == 0
    assert len(IcebergLocalTable(f"{wh}/mentions").snapshots()) == n

    # appends still take the fast path after a repair (stamp advanced)
    extra = cur_tx.filter(F.col("conv_id") == donor_conv).withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("_new"))
    )
    write_iceberg(extra, src, mode="append")
    r3 = incremental_kg_update(spark, src, wh, gaz, emb)
    assert r3["processed_rows"] == extra.count()
    full_mentions2 = detect_mentions(read_iceberg(spark, src), gaz, spark)
    pd.testing.assert_frame_equal(
        _sorted_pdf(r3["mentions"], MENTION_KEY),
        _sorted_pdf(full_mentions2, MENTION_KEY),
    )
