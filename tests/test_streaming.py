"""M7 — streaming incremental variant (SURVEY.md §2.9, §3.4).

Batch/stream parity on bounded input: draining the transcripts fixture with
trigger(availableNow) must reproduce the batch pipeline's rows exactly —
links (fused NLP+link stage), stateful exactly-once mentions (S4), and
session-window stats (S3, same expression both modes). Plus the S6 resume
property: rerunning against the same checkpoint processes nothing new.
"""

from __future__ import annotations

import pandas as pd
import pytest

from ner_spark.streaming import incremental as S

KEY = ["conv_id", "turn_idx", "start"]


def _sorted(df: pd.DataFrame, key) -> pd.DataFrame:
    return (
        df.sort_values(key, kind="mergesort")
        .reset_index(drop=True)
        .astype({c: "int64" for c in df.columns if df[c].dtype.kind in "iu"})
    )


@pytest.fixture(scope="module")
def stream_tx(spark, small_dir):
    from fixtures.gen import ensure_stream_dir

    return S.stream_transcripts(spark, ensure_stream_dir("small"))


def test_streaming_links_batch_parity(spark, small_inputs, kg_small, stream_tx,
                                      tmp_path):
    emb_pdf = small_inputs["entity_embeddings"].toPandas()
    links = S.streaming_links(
        stream_tx, small_inputs["gazetteer_pdf"], emb_pdf, spark
    )
    sink, ck = str(tmp_path / "links_sink"), str(tmp_path / "ck")
    got = S.run_to_parquet(links, sink, ck).toPandas()
    exp = kg_small["links"].toPandas()
    cols = sorted(exp.columns)
    pd.testing.assert_frame_equal(
        _sorted(got, KEY)[cols], _sorted(exp, KEY)[cols]
    )

    # S6 resume: same checkpoint again → no new rows appended
    again = S.run_to_parquet(
        S.streaming_links(stream_tx, small_inputs["gazetteer_pdf"], emb_pdf, spark),
        sink,
        ck,
    )
    assert again.count() == len(got)


def test_streaming_links_missing_embedding_parity(spark, small_inputs,
                                                  stream_tx, tmp_path):
    """A gazetteer entity with no embedding row must score cos=0.0 in the
    streaming path exactly like the batch path — the left-merge turns the
    missing embedding into float NaN, which regressed to a crash when the
    null check was `e is None` only."""
    from ner_spark.nlp.stage import detect_mentions
    from ner_spark.operators.linking import gazetteer_norm, link_mentions

    emb = small_inputs["entity_embeddings"]
    # drop ~half the embedding rows so linked entities are actually missing
    emb_partial = emb.where("substring(entity_id, -1, 1) IN ('0','2','4','6','8')")
    links = S.streaming_links(
        stream_tx,
        small_inputs["gazetteer_pdf"],
        emb_partial.toPandas(),
        spark,
    )
    got = S.run_available_now(links, str(tmp_path / "ck_miss"), "s_miss").toPandas()
    men = detect_mentions(
        small_inputs["transcripts"], small_inputs["gazetteer_pdf"], spark
    )
    exp = link_mentions(
        men, gazetteer_norm(spark, small_inputs["gazetteer_pdf"]), emb_partial
    ).toPandas()
    assert len(exp) > 0
    cols = sorted(exp.columns)
    pd.testing.assert_frame_equal(
        _sorted(got, KEY)[cols], _sorted(exp, KEY)[cols]
    )


def test_stateful_mentions_exactly_once(spark, small_inputs, stream_tx, tmp_path):
    """S4: per-conversation state dedups turn replays without a time bound.
    The union of the fixture stream with itself (every turn delivered twice)
    must still yield each mention exactly once == batch NLP output."""
    from ner_spark.nlp.stage import detect_mentions

    doubled = stream_tx.union(stream_tx)
    st = S.stateful_incremental_mentions(
        doubled, small_inputs["gazetteer_pdf"], spark
    )
    got = S.run_available_now(st, str(tmp_path / "ck2"), "s_state").toPandas()
    exp = (
        detect_mentions(
            small_inputs["transcripts"], small_inputs["gazetteer_pdf"], spark
        )
        .drop("ctx_emb")
        .toPandas()
    )
    cols = sorted(exp.columns)
    pd.testing.assert_frame_equal(
        _sorted(got, KEY)[cols], _sorted(exp, KEY)[cols]
    )


def test_session_windows_batch_parity(spark, small_inputs, stream_tx, tmp_path):
    """S3: identical session_window expression, streaming vs static input.

    Append mode emits exactly the sessions finalized by the watermark
    (session_end <= max_ts - 1h); later sessions are correctly withheld on
    bounded input, so parity is asserted on the finalized subset and the
    withheld set is checked to be exactly the non-finalized remainder."""
    got = S.run_available_now(
        S.session_stats(S.deduped(stream_tx)),
        str(tmp_path / "ck3"),
        "s_sessions",
    ).toPandas()
    tx = small_inputs["transcripts"].dropDuplicates(["conv_id", "turn_idx"])
    exp = S.session_stats(tx).toPandas()
    watermark = tx.agg({"ts": "max"}).collect()[0][0] - pd.Timedelta(hours=1)
    finalized = exp[exp.session_end <= watermark]
    withheld = exp[exp.session_end > watermark]
    key = ["conv_id", "session_start"]
    cols = sorted(exp.columns)
    pd.testing.assert_frame_equal(_sorted(got, key)[cols],
                                  _sorted(finalized, key)[cols])
    assert len(withheld) == len(exp) - len(got) and len(got) > 0


def test_merge_intervals_unit():
    """Interval-set state primitive: minimal disjoint sorted cover."""
    m = S._merge_intervals
    assert m([], [3]) == [(3, 4)]
    assert m([(3, 4)], [4]) == [(3, 5)]                      # adjacent coalesce
    assert m([(0, 2), (5, 7)], [2, 3, 4]) == [(0, 7)]        # gap fill joins
    assert m([(0, 1)], [10]) == [(0, 1), (10, 11)]           # disjoint stays
    assert m([(5, 9)], [6, 7]) == [(5, 9)]                   # covered no-op
    assert m([], [9, 5, 7]) == [(5, 6), (7, 8), (9, 10)]     # unsorted points


def test_stateful_mentions_offset_and_gapped_turn_idx(spark, small_inputs,
                                                      tmp_path):
    """S4 state must stay exactly-once AND compact when a conversation's
    turn_idx does not start at 0 and permanently skips an index — the
    contiguous-from-zero watermark formulation silently regrew state to
    O(n) here; the interval-set state handles any index pattern."""
    from ner_spark.nlp.stage import detect_mentions

    base = pd.Timestamp("2024-01-01 00:00:00")
    # texts the fixture model actually detects mentions in
    texts = [
        r["text"]
        for r in small_inputs["transcripts"].limit(6).collect()
    ]
    rows = []
    n = 0
    for conv, idxs in [("cA", [5, 6, 8, 9]), ("cB", [1000000, 1000002])]:
        for k, ti in enumerate(idxs):
            rows.append(
                (conv, ti, "user", texts[n % len(texts)], None,
                 base + pd.Timedelta(minutes=k))
            )
            n += 1
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")  # match TRANSCRIPT_SCHEMA
    src = tmp_path / "offset_stream"
    src.mkdir()
    pdf.iloc[:3].to_parquet(src / "p0.parquet", index=False)
    pdf.iloc[3:].to_parquet(src / "p1.parquet", index=False)

    stream = S.stream_transcripts(spark, str(src), max_files_per_trigger=1)
    doubled = stream.union(stream)  # every turn delivered twice
    st = S.stateful_incremental_mentions(
        doubled, small_inputs["gazetteer_pdf"], spark
    )
    got = S.run_available_now(st, str(tmp_path / "ck_off"), "s_state_off"
                              ).toPandas()
    exp = (
        detect_mentions(
            spark.createDataFrame(pdf), small_inputs["gazetteer_pdf"], spark
        )
        .drop("ctx_emb")
        .toPandas()
    )
    assert len(exp) > 0  # the fixture text must actually produce mentions
    cols = sorted(exp.columns)
    pd.testing.assert_frame_equal(
        _sorted(got, KEY)[cols], _sorted(exp, KEY)[cols]
    )


def test_merge_intervals_property():
    """Property (hypothesis): _merge_intervals over any sequence of point
    batches is equivalent to the naive processed-set model, and the
    interval list stays minimal (sorted, disjoint, non-adjacent)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(min_value=-50, max_value=50), max_size=12),
            max_size=8,
        )
    )
    def run(batches):
        ivs, model = [], set()
        for points in batches:
            ivs = S._merge_intervals(ivs, points)
            model |= set(points)
            # equivalence: interval cover == the naive set
            cover = {x for s, e in ivs for x in range(s, e)}
            assert cover == model
            # minimality: sorted, disjoint, and never adjacent
            assert all(
                ivs[i][1] < ivs[i + 1][0] for i in range(len(ivs) - 1)
            )
            assert all(s < e for s, e in ivs)

    run()


def test_stream_stream_join_multibatch_parity(spark, tmp_path):
    """Stream-stream interval join across MULTIPLE micro-batches: events
    split into 3 time-ordered files, one file per trigger. With the 1h
    watermark delay and <=1h join range, no in-order row is ever late, so
    the multi-batch drain must equal the batch interval join exactly —
    this is the state-eviction-correctness check the single-batch harness
    entry can't provide."""
    import duckdb

    src = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    src = src.sort_values("ts").reset_index(drop=True)
    d = tmp_path / "events_split"
    d.mkdir()
    n = len(src)
    for i in range(3):
        src.iloc[i * n // 3 : (i + 1) * n // 3].to_parquet(
            d / f"part{i}.parquet", index=False
        )

    from pyspark.sql import functions as F

    def side(event_type, prefix):
        return (
            spark.readStream.schema(S.EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
            .where(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user_id"),
                F.col("ts").alias(f"{prefix}_ts"),
                F.col("value").alias(f"{prefix}_value"),
            )
            .withWatermark(f"{prefix}_ts", "1 hour")
        )

    j = side("click", "click").join(
        side("purchase", "purchase"),
        F.expr(
            "click_user_id = purchase_user_id AND "
            "purchase_ts BETWEEN click_ts - INTERVAL 1 HOUR AND click_ts"
        ),
    ).select("click_id", "purchase_id")
    got = (
        S.run_available_now(j, str(tmp_path / "ck_ssj"), "s_ssjoin")
        .toPandas()
        .sort_values(["click_id", "purchase_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = con.execute(
        """
        SELECT c.event_id AS click_id, p.event_id AS purchase_id
        FROM '/root/testdata/sf0.001/events.parquet' c
        JOIN '/root/testdata/sf0.001/events.parquet' p ON c.user_id = p.user_id
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts BETWEEN c.ts - INTERVAL 1 HOUR AND c.ts
        ORDER BY click_id, purchase_id
        """
    ).df()
    con.close()
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"), check_names=False
    )


class TestCdcMerge:
    """Streaming CDC apply: foreachBatch -> io.merge_upsert keeps a
    table current from a change feed (run_cdc_merge)."""

    # the feed carries a seq column the maintained table does NOT have:
    # run_cdc_merge must treat it as transport metadata and project the
    # delta onto the target schema before merging
    SCHEMA = "k long, price double, status string, seq long"

    def _setup(self, spark, tmp_path):
        import json
        import os

        target = str(tmp_path / "maintained")
        spark.createDataFrame(
            [(1, 10.0, "O"), (2, 20.0, "O"), (3, 30.0, "F")],
            "k long, price double, status string",
        ).write.parquet(target)
        feed = tmp_path / "cdc"
        feed.mkdir()
        # batch 1 carries TWO changes for k=2: only seq=1 may apply
        b1 = [
            {"k": 2, "price": 77.0, "status": "X", "seq": 0},
            {"k": 2, "price": 99.0, "status": "U", "seq": 1},
            {"k": 4, "price": 40.0, "status": "N", "seq": 1},
        ]
        b2 = [
            {"k": 2, "price": 150.0, "status": "U2", "seq": 2},
            {"k": 5, "price": 50.0, "status": "N", "seq": 2},
        ]
        for i, rows in enumerate([b1, b2]):
            p = feed / f"batch{i}.json"
            p.write_text("\n".join(json.dumps(r) for r in rows))
            # force distinct mtimes so the file source's batch order is
            # deterministic (b1 strictly before b2)
            os.utime(p, (1000 + i * 100, 1000 + i * 100))
        return target, str(feed)

    def _stream(self, spark, feed):
        return (
            spark.readStream.schema(self.SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(feed)
        )

    def test_merge_applies_batches_in_order(self, spark, tmp_path):
        target, feed = self._setup(spark, tmp_path)
        ckpt = str(tmp_path / "ckpt")
        out = S.run_cdc_merge(
            self._stream(spark, feed), target, "k", "seq", ckpt
        )
        rows = {r["k"]: (r["price"], r["status"]) for r in out.collect()}
        assert rows == {
            1: (10.0, "O"),    # untouched
            2: (150.0, "U2"),  # batch-2 update wins over both batch-1 rows
            3: (30.0, "F"),
            4: (40.0, "N"),    # inserted in batch 1
            5: (50.0, "N"),    # inserted in batch 2
        }

    def test_resume_with_same_checkpoint_is_noop(self, spark, tmp_path):
        target, feed = self._setup(spark, tmp_path)
        ckpt = str(tmp_path / "ckpt")
        S.run_cdc_merge(self._stream(spark, feed), target, "k", "seq", ckpt)
        before = sorted(
            tuple(r) for r in spark.read.parquet(target).collect()
        )
        # same checkpoint: WAL already covers every feed file -> no-op
        out = S.run_cdc_merge(
            self._stream(spark, feed), target, "k", "seq", ckpt
        )
        assert sorted(tuple(r) for r in out.collect()) == before
