"""Spark 4 Python streaming DataSource (sources/transcript_stream.py):
micro-batched deterministic transcript feed vs the batch generator."""

from __future__ import annotations

import tempfile
import time

import pandas as pd


def test_stream_source_matches_batch_generator(spark):
    from fixtures.gen import entity_catalog, transcripts_df
    from ner_spark.sources.transcript_stream import TranscriptStreamDataSource

    spark.dataSource.register(TranscriptStreamDataSource)
    st = (
        spark.readStream.format("transcript_gen")
        .option("n_convs", "24")
        .option("convs_per_batch", "8")
        .load()
    )
    exp = transcripts_df(entity_catalog(42), seed=42, n_convs=24, n_hot=0)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            st.writeStream.option("checkpointLocation", ckpt)
            .format("memory")
            .queryName("tgen_test")
            .start()
        )
        try:
            # poll on PROGRESS, not the sink count: rows land in the
            # memory sink before the batch's progress event is appended,
            # so a count-based break can observe only 2 of 3 events
            deadline = time.time() + 120
            while time.time() < deadline:
                batches = [
                    p for p in q.recentProgress if p["numInputRows"] > 0
                ]
                if sum(p["numInputRows"] for p in batches) >= len(exp):
                    break
                time.sleep(0.5)
        finally:
            q.stop()

    # genuinely micro-batched: 24 convs / 8 per batch = 3 non-empty batches
    assert len(batches) == 3, [p["numInputRows"] for p in batches]
    got = spark.table("tgen_test").toPandas()
    key = ["conv_id", "turn_idx"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp[got.columns].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, exp_s, check_dtype=False)


def test_distributed_stream_source_parity_and_fanout(spark):
    """option('distributed','true'): rows are generated ON EXECUTORS,
    one task per conv slice; row-identical to the single-process
    range_corpus_pdf oracle and genuinely partition-parallel."""
    import pyspark.sql.functions as F

    from ner_spark.sources.transcript_stream import (
        TranscriptStreamDataSource,
        range_corpus_pdf,
    )

    spark.dataSource.register(TranscriptStreamDataSource)
    st = (
        spark.readStream.format("transcript_gen")
        .option("distributed", "true")
        .option("n_convs", "32")
        .option("convs_per_partition", "8")
        .load()
        .select("*", F.spark_partition_id().alias("pid"))
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            st.writeStream.option("checkpointLocation", ckpt)
            .format("memory")
            .queryName("tgen_dist")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "availableNow drain timed out"
    got = spark.table("tgen_dist").toPandas()
    assert got.pid.nunique() == 4, sorted(got.pid.unique())  # 32/8 slices
    exp = pd.concat(
        [range_corpus_pdf(42, a, a + 8) for a in range(0, 32, 8)],
        ignore_index=True,
    )
    key = ["conv_id", "turn_idx"]
    g = got.drop(columns=["pid"]).sort_values(key).reset_index(drop=True)
    e = exp[g.columns].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_stream_transcript_source_registry_entry(spark):
    import ner_spark.queries_kg  # noqa: F401 — populates the registry

    from ner_spark.registry import QUERIES

    out = QUERIES["stream_transcript_source"](spark, "unused").toPandas()
    assert set(out.role) == {"user", "assistant", "tool"}
    assert out.n_turns.sum() > 0 and (out.n_chars > 0).all()


def test_connector_feeds_streaming_nlp(spark, tmp_path):
    """Composition check: the distributed connector feeds the incremental
    NLP+link stage, and its output is row-identical to the batch
    detect_mentions -> link_mentions path on the same generated corpus."""
    import pyspark.sql.functions as F

    from fixtures.gen import (
        entity_catalog,
        entity_embeddings_df,
        gazetteer_df,
    )
    from ner_spark.nlp.stage import detect_mentions
    from ner_spark.operators.linking import gazetteer_norm, link_mentions
    from ner_spark.sources.transcript_stream import (
        TranscriptStreamDataSource,
        range_corpus_pdf,
    )
    from ner_spark.streaming import incremental as S

    cat = entity_catalog(42)
    gaz = gazetteer_df(cat)
    emb_pdf = entity_embeddings_df(cat)

    spark.dataSource.register(TranscriptStreamDataSource)
    st = (
        spark.readStream.format("transcript_gen")
        .option("distributed", "true")
        .option("n_convs", "16")
        .option("convs_per_partition", "4")
        .load()
        # the connector emits timestamp_ntz (generator parity); event-time
        # ops want the session-zoned type, same as the file-stream schema
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    links = S.streaming_links(st, gaz, emb_pdf, spark)
    got = S.run_available_now(links, str(tmp_path / "ck_conn"), "s_conn").toPandas()

    exp_tx = pd.concat(
        [range_corpus_pdf(42, a, a + 4) for a in range(0, 16, 4)],
        ignore_index=True,
    )
    men = detect_mentions(spark.createDataFrame(exp_tx), gaz, spark)
    exp = link_mentions(
        men, gazetteer_norm(spark, gaz), spark.createDataFrame(emb_pdf)
    ).toPandas()

    assert len(exp) > 0
    key = ["conv_id", "turn_idx", "start"]
    cols = sorted(exp.columns)
    g = got.sort_values(key, kind="mergesort").reset_index(drop=True)[cols]
    e = exp.sort_values(key, kind="mergesort").reset_index(drop=True)[cols]
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_stream_source_kill_and_resume_exactly_once(spark, tmp_path):
    """Checkpoint recovery over the custom source: stop the query after
    the first micro-batch commits, restart on the SAME checkpoint and
    sink — the WAL + readBetweenOffsets replay must deliver every turn
    exactly once (no dups from replay, no gaps from the kill)."""
    from fixtures.gen import entity_catalog, transcripts_df
    from ner_spark.sources.transcript_stream import TranscriptStreamDataSource

    spark.dataSource.register(TranscriptStreamDataSource)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.format("transcript_gen")
            .option("n_convs", "24")
            .option("convs_per_batch", "6")
            .load()
            .writeStream.option("checkpointLocation", ckpt)
            # a real trigger cadence so the kill lands MID-stream (with
            # the default ASAP trigger the 4 tiny batches drain before
            # the poll loop ever sees the first progress event)
            .trigger(processingTime="1 second")
            .format("parquet")
            .option("path", sink)
            .start()
        )

    exp = transcripts_df(entity_catalog(42), seed=42, n_convs=24, n_hot=0)

    q1 = start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if any(p["numInputRows"] > 0 for p in q1.recentProgress):
                break
            time.sleep(0.3)
    finally:
        q1.stop()
    q1.awaitTermination(60)

    n_mid = spark.read.parquet(sink).count()
    assert 0 < n_mid, "first batch never committed"

    q2 = start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.read.parquet(sink).count() >= len(exp):
                break
            time.sleep(0.5)
    finally:
        q2.stop()

    got = spark.read.parquet(sink).toPandas()
    assert len(got) == len(exp), (len(got), len(exp), n_mid)
    key = ["conv_id", "turn_idx"]
    assert not got.duplicated(key).any()
    g = got.sort_values(key).reset_index(drop=True)
    e = exp[got.columns].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_available_now_fallback_contract(spark, tmp_path):
    """Trigger.AvailableNow on the Python streaming source (round-4:
    VERDICT r03 item 7). The Python DataSource API has no
    SupportsTriggerAvailableNow hook, so Spark logs a fallback to
    single-batch execution — this test pins the resulting CONTRACT so
    nobody mistakes it for full availableNow semantics:

    - each availableNow run processes exactly ONE micro-batch
      (convs_per_batch conversations), commits it, and terminates;
    - repeated runs on the same checkpoint drain the feed EXACTLY-ONCE
      (offsets resume; replay is bit-identical);
    - runs after exhaustion are clean no-ops (0 rows, no error).

    A full drain therefore needs ceil(n_convs / convs_per_batch) runs —
    i.e. availableNow degrades to Trigger.Once here. For a one-shot full
    drain, use processingTime + the drain helpers in
    streaming/incremental.py (what run_incremental does)."""
    from ner_spark.sources.transcript_stream import TranscriptStreamDataSource

    spark.dataSource.register(TranscriptStreamDataSource)
    st = (
        spark.readStream.format("transcript_gen")
        .option("n_convs", "24")
        .option("convs_per_batch", "8")
        .load()
    )
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    batch_rows = []
    for _ in range(5):
        q = (
            st.writeStream.option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", out)
            .start()
        )
        assert q.awaitTermination(120), "availableNow run did not terminate"
        assert q.exception() is None
        batch_rows.append(
            sum(p.numInputRows for p in q.recentProgress)
        )
    # one micro-batch per run until exhaustion, then no-ops
    assert all(n > 0 for n in batch_rows[:3]), batch_rows
    assert batch_rows[3:] == [0, 0], batch_rows
    got = spark.read.parquet(out)
    assert got.count() == got.select("conv_id", "turn_idx").distinct().count()
    assert got.select("conv_id").distinct().count() == 24  # full drain
