"""Iceberg table as a streaming SOURCE (sources/iceberg_stream).

Contract: a readStream over an iceberg-local table emits every row the
MAIN lineage gains, exactly once across checkpointed restarts — offsets
are snapshot sequence numbers, partitions are the appended data files
(identity-partition columns reattached from manifest metadata),
compaction/manifest rewrites emit nothing, row deltas refuse loudly
(or stream append-half-only under the opt-in), and a WAP publish is the
moment staged rows become visible to the stream.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ner_spark.iceberg.spark_io import (
    compact_iceberg,
    delete_iceberg_where,
    iceberg_sink,
    read_iceberg,
    write_iceberg,
)
from ner_spark.plans.wap import wap_publish_stream
from ner_spark.sources.iceberg_stream import IcebergStreamDataSource

_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp_ntz"
)


def _turns(spark, conv, lo, hi):
    return spark.range(lo, hi).select(
        F.lit(conv).alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit(conv), F.col("id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _drain(spark, loc, ckpt, out, **opts):
    spark.dataSource.register(IcebergStreamDataSource)
    reader = spark.readStream.format("iceberg_stream").option(
        "location", loc
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()
    return spark.read.schema(_DDL).parquet(out)


def test_stream_matches_batch_and_is_exactly_once(spark, tmp_path):
    loc = str(tmp_path / "t")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    # identity + bucket layout: the identity column is dropped from file
    # contents by the hive layout and must come back from the manifests
    write_iceberg(_turns(spark, "cA", 0, 5), loc, mode="append",
                  partition_by=["role", "bucket(4, conv_id)"])
    write_iceberg(_turns(spark, "cB", 0, 7), loc, mode="append")
    compact_iceberg(spark, loc)  # replace snapshot: no logical rows

    got = _drain(spark, loc, ckpt, out)
    assert _rows(got) == _rows(read_iceberg(spark, loc))

    # new appends arrive incrementally on the same checkpoint; a drain
    # with nothing new appends nothing (exactly-once)
    write_iceberg(_turns(spark, "cC", 0, 3), loc, mode="append")
    assert _drain(spark, loc, ckpt, out).count() == 15
    assert _drain(spark, loc, ckpt, out).count() == 15


def test_row_deltas_refuse_unless_opted_in(spark, tmp_path):
    loc = str(tmp_path / "t")
    write_iceberg(_turns(spark, "cA", 0, 6), loc, mode="append")
    delete_iceberg_where(spark, loc, [("turn_idx", "<", 2)])
    spark.dataSource.register(IcebergStreamDataSource)
    q = (
        spark.readStream.format("iceberg_stream").option("location", loc)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="row-level retractions"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()
    # opt-in streams the append half only: the delete added no data
    # files, so exactly the appended rows arrive
    got = _drain(spark, loc, str(tmp_path / "c2"), str(tmp_path / "o2"),
                 skip_row_deltas="true")
    assert got.count() == 6


def test_wap_publish_feeds_the_stream(spark, tmp_path):
    """The composition the engine is built for: gated ingest stages on a
    branch (invisible to the stream), publish fast-forwards main, and
    the stream's next drain emits exactly the published rows."""
    loc = str(tmp_path / "t")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    write_iceberg(_turns(spark, "c_base", 0, 4), loc, mode="append")
    assert _drain(spark, loc, ckpt, out).count() == 4

    sink = iceberg_sink(loc, branch="st")
    sink(_turns(spark, "c_s1", 0, 3), 0)
    sink(_turns(spark, "c_s2", 0, 2), 1)
    # staged rows are NOT visible to the stream yet
    assert _drain(spark, loc, ckpt, out).count() == 4

    assert wap_publish_stream(spark, loc, "st")["published"]
    got = _drain(spark, loc, ckpt, out)
    assert got.count() == 9
    assert {r["conv_id"] for r in got.collect()} == {
        "c_base", "c_s1", "c_s2"
    }


def test_iceberg_to_iceberg_kg_tick_matches_batch(
    spark, small_inputs, kg_small, tmp_path
):
    """The north-rule loop end to end: transcripts WAP-ingested into an
    Iceberg table, tailed by the iceberg_stream source, pushed through
    the fused NLP+link stage, landed exactly-once in an Iceberg links
    table — and the final links equal the batch pipeline's, byte for
    byte. Re-ticks are no-ops; each publish is consumed exactly once."""
    import pandas as pd

    from ner_spark.plans.wap import wap_ingest
    from ner_spark.streaming.incremental import stream_kg_iceberg_tick

    tx = small_inputs["transcripts"]
    emb_pdf = small_inputs["entity_embeddings"].toPandas()
    gaz = small_inputs["gazetteer_pdf"]
    half = F.abs(F.xxhash64("conv_id")) % 2
    tloc = str(tmp_path / "transcripts")
    lloc = str(tmp_path / "links")
    ckpt = str(tmp_path / "ckpt")

    assert wap_ingest(spark, tx.filter(half == 0), tloc, "b1")["published"]
    links1 = stream_kg_iceberg_tick(
        spark, tloc, lloc, gaz, emb_pdf, ckpt
    )
    n1 = links1.count()
    assert n1 > 0
    # nothing new → the tick is a no-op on both source and sink
    assert stream_kg_iceberg_tick(
        spark, tloc, lloc, gaz, emb_pdf, ckpt
    ).count() == n1

    assert wap_ingest(spark, tx.filter(half == 1), tloc, "b2")["published"]
    got = stream_kg_iceberg_tick(
        spark, tloc, lloc, gaz, emb_pdf, ckpt
    ).toPandas()
    assert len(got) > n1

    exp = kg_small["links"].toPandas()
    cols = sorted(exp.columns)
    key = ["conv_id", "turn_idx", "mention_id"] \
        if "mention_id" in exp.columns else list(exp.columns)
    got_s = got.sort_values(key, kind="mergesort").reset_index(drop=True)
    exp_s = exp.sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s[cols], exp_s[cols])


def test_start_after_seq_and_retention_error(spark, tmp_path):
    from ner_spark.iceberg.table import IcebergLocalTable

    loc = str(tmp_path / "t")
    write_iceberg(_turns(spark, "cA", 0, 4), loc, mode="append")
    write_iceberg(_turns(spark, "cB", 0, 3), loc, mode="append")
    t = IcebergLocalTable(loc)
    first_seq = min(s["sequence-number"] for s in t.snapshots())
    got = _drain(spark, loc, str(tmp_path / "c1"), str(tmp_path / "o1"),
                 start_after_seq=str(first_seq))
    assert {r["conv_id"] for r in got.collect()} == {"cB"}
    # a consumer whose lag exceeded retention gets a loud error: drain
    # once, expire history past the checkpointed offset, append, drain
    ckpt, out = str(tmp_path / "c2"), str(tmp_path / "o2")
    assert _drain(spark, loc, ckpt, out).count() == 7
    write_iceberg(_turns(spark, "cC", 0, 2), loc, mode="append")
    write_iceberg(_turns(spark, "cD", 0, 2), loc, mode="append")
    t = IcebergLocalTable(loc)
    t.expire_snapshots(keep_last=1)
    q = (
        spark.readStream.format("iceberg_stream").option("location", loc)
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="retention"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()
