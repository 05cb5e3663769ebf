#!/usr/bin/env python
"""Regenerate the committed golden parquet snapshots under golden/
(ner_spark/goldens.py attaches them as DuckDB oracles for the
deterministic rows-only registry entries).

Protocol per entry: FIRST assert parity against an independent
recomputation — the single-process oracle (oracle/ref_pipeline.py) for
the KG family, plain-pandas recomputes for the stream aggregates, the
pure-function range generator for the connector feed, raw-payload
recomputes for the media stats — and only then snapshot the Spark output
byte-for-byte. A regression either trips an assertion here at
regeneration time or hash-mismatches the committed snapshot in the
driver gate / value sweep at run time.

    python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from fixtures.gen import ensure_fixture_dir, ensure_stream_dir  # noqa: E402
from ner_spark.goldens import (  # noqa: E402
    GOLDEN_DIR,
    GOLDEN_FIXED,
    GOLDEN_PER_SF,
    GOLDEN_SF_DIRS,
)
from ner_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"  # sf arg for entries that ignore it anyway


def _norm(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    out = df[cols].copy()
    for c in out.columns:
        if out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
    return out.sort_values(cols, kind="mergesort").reset_index(drop=True)


def _assert_subset_parity(got: pd.DataFrame, exp: pd.DataFrame, cols, what):
    g, e = _norm(got, cols), _norm(exp, cols)
    assert len(g) == len(e), f"{what}: {len(g)} vs {len(e)} rows"
    pd.testing.assert_frame_equal(g, e, check_dtype=False, atol=1e-9)
    print(f"  parity ok: {what} ({len(g)} rows, cols={cols})")


def main() -> None:
    from oracle.ref_pipeline import run_on_dir

    import __spark_entry__ as E

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    q = E.queries()
    tiny = ensure_fixture_dir("tiny")
    oracle = run_on_dir(tiny)
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    outs: dict[str, pd.DataFrame] = {}
    for name in GOLDEN_FIXED:
        outs[name] = q[name](spark, SF).toPandas()

    # --- independent checks before snapshotting -------------------------
    _assert_subset_parity(
        outs["kg_mentions"], oracle["mentions"],
        ["conv_id", "turn_idx", "sent_idx", "start", "end", "surface",
         "ner_type", "score"], "kg_mentions vs python oracle")
    _assert_subset_parity(
        outs["kg_links"], oracle["links"],
        ["conv_id", "turn_idx", "start", "end", "entity_id", "link_score"],
        "kg_links vs python oracle")
    _assert_subset_parity(
        outs["kg_entities_canonical"], oracle["entities"],
        ["entity_id", "canonical_id"], "kg_canon vs python oracle")
    tri_cols = sorted(
        set(outs["kg_triples"].columns) & set(oracle["triples"].columns)
    )
    _assert_subset_parity(
        outs["kg_triples"], oracle["triples"], tri_cols,
        "kg_triples vs python oracle")
    # rollup: totals must reconcile with the oracle link/canon tables
    assert outs["kg_entity_rollup"].n_mentions.sum() == len(oracle["links"])
    assert set(outs["kg_entity_rollup"].entity_id) == set(
        oracle["entities"].canonical_id
    )
    print("  parity ok: kg_entity_rollup totals reconcile")
    # eval: Spark NLP equals the oracle gold exactly -> all P/R/F = 1
    prf = outs["kg_eval_prf"]
    assert (prf.precision == 1.0).all() and (prf.recall == 1.0).all(), prf
    print("  parity ok: kg_eval_prf all P/R = 1.0")

    # streaming paths reproduce their batch twins / plain recomputes
    link_cols = sorted(
        set(outs["stream_incremental_links"].columns)
        & set(outs["kg_links"].columns)
    )
    _assert_subset_parity(
        outs["stream_incremental_links"], outs["kg_links"], link_cols,
        "stream links vs batch links")
    men_cols = sorted(
        set(outs["stream_stateful_mentions"].columns)
        & set(outs["kg_mentions"].columns)
    )
    _assert_subset_parity(
        outs["stream_stateful_mentions"], outs["kg_mentions"], men_cols,
        "stateful mentions vs batch mentions")

    sdir = ensure_stream_dir("tiny", n_files=2)
    tx = pd.concat(
        [pd.read_parquet(os.path.join(sdir, f)) for f in sorted(os.listdir(sdir))
         if f.endswith(".parquet")],
        ignore_index=True,
    ).drop_duplicates(["conv_id", "turn_idx"])
    win = (
        tx.assign(window_start=tx.ts.dt.floor("10min"))
        .groupby(["window_start", "role"], as_index=False)
        .size().rename(columns={"size": "n_turns"})
    )
    _assert_subset_parity(
        outs["stream_windowed_mentions"], win,
        ["window_start", "role", "n_turns"], "windowed counts vs pandas")

    # session windows: gaps-and-islands recompute (merge at exactly gap)
    g = tx.sort_values(["conv_id", "ts"], kind="mergesort")
    gap = pd.Timedelta("30 minutes")
    new = (g.ts - g.groupby("conv_id").ts.shift()).gt(gap) | (
        g.conv_id != g.conv_id.shift()
    )
    g = g.assign(sid=new.cumsum())
    sess = g.groupby(["conv_id", "sid"], as_index=False).agg(
        session_start=("ts", "min"),
        last_ts=("ts", "max"),
        n_turns=("ts", "size"),
        n_chars=("text", lambda s: int(s.str.len().sum())),
    )
    sess["session_end"] = sess.last_ts + gap
    # streaming append mode only emits sessions CLOSED by the final
    # watermark (max event time - the 1h dedup watermark): the last
    # conversations' still-open sessions are correctly withheld
    wm = tx.ts.max() - pd.Timedelta("1 hour")
    sess = sess[sess.session_end < wm]
    _assert_subset_parity(
        outs["stream_session_stats"], sess,
        ["conv_id", "session_start", "session_end", "n_turns", "n_chars"],
        "session stats vs gaps-and-islands")

    # connector feed: pure-function regenerate and re-aggregate
    from ner_spark.sources.transcript_stream import range_corpus_pdf

    feed = pd.concat(
        [range_corpus_pdf(42, a, a + 8) for a in range(0, 32, 8)],
        ignore_index=True,
    )
    agg = feed.groupby("role", as_index=False).agg(
        n_turns=("text", "size"),
        n_chars=("text", lambda s: int(s.str.len().sum())),
        max_turn_idx=("turn_idx", "max"),
    )
    _assert_subset_parity(
        outs["stream_transcript_source"], agg,
        ["role", "n_turns", "n_chars", "max_turn_idx"],
        "transcript_gen rollup vs pure-function feed")

    # conll: independent minimal block parser over the same file
    path = os.path.join(_ROOT, "data", "tiny", "conll", "eval.conll")
    rows, doc, sent, tok = [], -1, 0, 0
    for line in open(path, encoding="utf-8"):
        line = line.rstrip("\n")
        if line.startswith("-DOCSTART-"):
            doc, sent, tok = doc + 1, 0, 0
            continue
        if not line.strip():
            if tok:
                sent, tok = sent + 1, 0
            continue
        parts = line.split()
        rows.append((doc, sent, tok, parts[0], parts[-1]))
        tok += 1
    conll_exp = pd.DataFrame(
        rows, columns=["doc_idx", "sent_idx", "tok_idx", "token", "gold"]
    )
    _assert_subset_parity(
        outs["conll_ingest"], conll_exp,
        ["doc_idx", "sent_idx", "tok_idx", "token", "gold"],
        "conll_ingest vs independent parser")

    # --- sf-dependent entries: one snapshot per testdata scale ----------
    import json

    sf_keys: dict[str, list[int]] = {}
    per_sf_outs: dict[tuple[str, str], pd.DataFrame] = {}
    for tag, sf_dir in GOLDEN_SF_DIRS.items():
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
        # oracle-side selector key: (row count, content-weighted checksum)
        # — SUM(n_chars) alone could collide with a regenerated corpus of
        # identical total length (ADVICE r03 item 3)
        sf_keys[tag] = [
            int(len(docs)),
            int((docs.doc_id.astype("int64") * docs.n_chars).sum()),
        ]
        for name in GOLDEN_PER_SF:
            per_sf_outs[(name, tag)] = q[name](spark, sf_dir).toPandas()

        # minhash_fast: candidate set must cover the true near-dup set
        # (word-3-gram Jaccard >= 0.6, independently via DuckDB — the
        # same truth recipe tests/test_dedup_functions.py gates on)
        import duckdb

        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * "
            f"FROM '{sf_dir}/documents.parquet'"
        )
        truth = {
            (int(a), int(b))
            for a, b in con.sql(
                """
                WITH sh AS (
                  SELECT doc_id, list_distinct([
                           array_to_string(toks[i:i+2], ' ')
                           FOR i IN range(1, len(toks) - 1)
                         ]) AS shingles
                  FROM (SELECT doc_id, string_split(text, ' ') AS toks
                        FROM documents)
                  WHERE len(toks) >= 3),
                ex AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
                sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
                pc AS (
                  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
                  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
                SELECT doc_a, doc_b FROM pc
                JOIN sizes sa ON sa.doc_id = pc.doc_a
                JOIN sizes sb ON sb.doc_id = pc.doc_b
                WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.6
                """
            ).fetchall()
        }
        con.close()
        pairs = {tuple(r) for r in per_sf_outs[("dedup_minhash_fast", tag)][
            ["doc_a", "doc_b"]].itertuples(index=False)}
        assert truth, f"{tag}: no true near-dup pairs in the corpus"
        missed = {
            p for p in truth if p not in pairs and (p[1], p[0]) not in pairs
        }
        assert not missed, f"{tag}: minhash_fast missed {sorted(missed)[:5]}"

        # media stats recomputed from the raw deterministic payload
        # stream. png/x-fake rows reconstruct EXACTLY (lossless), so the
        # recompute is fully independent of the codecs; jpeg rows are
        # LOSSY — for those the recompute replays the encode→decode
        # chain (determinism + wiring check; decoder CORRECTNESS for
        # jpeg is established by the hand-built T.81 spec fixtures in
        # tests/test_codecs.py) and additionally bounds the decoded
        # stats against the raw stream so a grossly-broken decode can't
        # be snapshotted as golden.
        from ner_spark.codecs import (
            decode_jpeg,
            decode_jpeg_gray,
            encode_jpeg,
            encode_jpeg_gray,
            encode_jpeg_progressive,
        )

        def _is_jpeg(doc_id: int) -> bool:
            return doc_id % 12 == 3  # media_table's format rule

        def _is_color(doc_id: int) -> bool:
            # baseline color 4:2:0 slice OR progressive color slice
            return doc_id % 24 == 3 or doc_id % 48 == 15

        def _is_progressive(doc_id: int) -> bool:
            return doc_id % 48 == 15  # the SOF2 slice (round 5)

        def _luma(a: np.ndarray) -> np.ndarray:
            # decode_image's integer collapse, replicated independently
            r = a[..., 0].astype(np.int32)
            g = a[..., 1].astype(np.int32)
            b = a[..., 2].astype(np.int32)
            return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)

        def _jpeg_decoded(doc_id: int, w0: int, h0: int) -> np.ndarray:
            rng = np.random.default_rng(int(doc_id))
            if _is_color(doc_id):
                rgb = rng.integers(
                    0, 256, h0 * w0 * 3, dtype=np.uint8
                ).reshape(h0, w0, 3)
                enc = (
                    encode_jpeg_progressive
                    if _is_progressive(doc_id) else encode_jpeg
                )
                return _luma(decode_jpeg(enc(rgb, subsampling="420")))
            raw = rng.integers(0, 256, w0 * h0, dtype=np.uint8)
            return decode_jpeg_gray(encode_jpeg_gray(raw.reshape(h0, w0)))

        feats = per_sf_outs[("mm_image_features", tag)].set_index("doc_id")
        meta_wh = {}
        for doc_id, row in feats.iterrows():
            meta_wh[doc_id] = (int(row.width), int(row.height))
        # verify EVERY row (ADVICE r03 item 5: a head-only sample would
        # snapshot a payload regression affecting later doc_ids as golden)
        for doc_id, row in feats.iterrows():
            w0, h0 = int(row.width), int(row.height)
            raw = np.random.default_rng(int(doc_id)).integers(
                0, 256, w0 * h0, dtype=np.uint8
            )
            if _is_jpeg(int(doc_id)):
                dec = _jpeg_decoded(int(doc_id), w0, h0)
                assert abs(float(dec.mean()) - row.mean_intensity) < 1e-9, doc_id
                assert abs(float(dec.std()) - row.std_intensity) < 1e-9, doc_id
                if not _is_color(int(doc_id)):
                    assert abs(float(raw.mean()) - row.mean_intensity) < 8, doc_id
                else:
                    # color rows: decoded luma must stay near the raw
                    # RGB stream's luma mean (~127.5 for uniform bytes)
                    assert abs(row.mean_intensity - 127.5) < 8, doc_id
            else:
                assert abs(float(raw.mean()) - row.mean_intensity) < 1e-9, doc_id
                assert abs(float(raw.std()) - row.std_intensity) < 1e-9, doc_id
        # resize: decoded pixel sums must equal an independent
        # nearest-neighbor resample of the raw payload (zlib-free check);
        # jpeg rows replay the full lossy chain
        rs = per_sf_outs[("mm_image_resize", tag)].set_index("doc_id")
        for doc_id, row in rs.iterrows():
            w0, h0 = meta_wh[doc_id]
            raw = np.random.default_rng(int(doc_id)).integers(
                0, 256, w0 * h0, dtype=np.uint8
            ).reshape(h0, w0)
            if _is_jpeg(int(doc_id)):
                raw = _jpeg_decoded(int(doc_id), w0, h0)
            yi = (np.arange(int(row.height)) * h0 // int(row.height))[:, None]
            xi = (np.arange(int(row.width)) * w0 // int(row.width))[None, :]
            resized = raw[yi, xi]
            if _is_jpeg(int(doc_id)):
                resized = decode_jpeg_gray(encode_jpeg_gray(resized))
            assert int(resized.sum()) == row.pixel_sum, doc_id
            assert int(row.n_pixels) == int(row.width) * int(row.height)
        print(f"  parity ok: {tag} minhash truth ({len(truth)} pairs) + mm stats")

    # --- snapshot -------------------------------------------------------
    for name in GOLDEN_FIXED:
        out_path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        outs[name].to_parquet(out_path, index=False)
        print(f"wrote {out_path} ({len(outs[name])} rows)")
    for (name, tag), df in per_sf_outs.items():
        out_path = os.path.join(GOLDEN_DIR, f"{name}.{tag}.parquet")
        df.to_parquet(out_path, index=False)
        print(f"wrote {out_path} ({len(df)} rows)")
    with open(os.path.join(GOLDEN_DIR, "sf_keys.json"), "w") as f:
        json.dump(sf_keys, f, indent=1)
    print(f"wrote sf_keys.json {sf_keys}")
    spark.stop()


if __name__ == "__main__":
    main()
