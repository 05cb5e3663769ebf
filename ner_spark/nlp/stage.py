"""Fused NLP stage as a single ``mapInPandas`` over transcript turns
(SURVEY.md §2.3, §3.2): tokenize → gazetteer BIO → feature hash → emission →
Viterbi → span decode → sentence ctx embedding, one Arrow round-trip.

Model weights and the gazetteer matcher are spark broadcasts
(BASELINE.json:14 "broadcast of gazetteer/model weights"). The stage is
row-parallel (all sequence dependencies live inside one turn's text), so no
ordering or co-partitioning precondition — any partitioning of transcripts
works, which is what lets the pipeline scale by pure repartition.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ner_spark import spec
from ner_spark.nlp import vectorized as V
from ner_spark.nlp.model import build_model

# norm_surface is computed python-side (spec.norm_surface casefolds; Spark's
# lower() differs on ß/İ/ſ — the join key must use casefold semantics).
MENTIONS_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, start int, end int, "
    "surface string, norm_surface string, ner_type string, score double, "
    "ctx_emb binary"
)

TOKENS_SCHEMA = (
    "conv_id string, turn_idx int, text string, "
    "tokens array<struct<pos:int, start:int, end:int, text:string>>"
)

_TYPES = np.array(spec.NER_TYPES, dtype=object)


def _broadcasts(
    spark: SparkSession,
    gazetteer_pdf: pd.DataFrame,
    model: dict | None = None,
):
    sc = spark.sparkContext
    if model is None:
        m = build_model()
        model = {
            "WT": np.ascontiguousarray(m["W"].T),
            "T": m["T"],
            "start": m["start"],
        }
    bc_model = sc.broadcast(model)
    bc_gaz = sc.broadcast(V.GazMatcher(gazetteer_pdf))
    return bc_model, bc_gaz


def detect_mentions(
    transcripts: DataFrame,
    gazetteer_pdf: pd.DataFrame,
    spark: SparkSession,
    model: dict | None = None,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, text, ...) → mentions DataFrame.

    Column-prunes to the three needed columns before the Arrow boundary
    (mapInPandas is an optimization barrier — SURVEY.md §4.2).

    ``model`` optionally overrides the generated fixture weights with a
    {"WT", "T", "start"} dict — e.g. perceptron-trained weights from
    ner_spark/nlp/train.py (same (D, L) layout); None keeps the
    fixture."""
    bc_model, bc_gaz = _broadcasts(spark, gazetteer_pdf, model)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = bc_model.value
        gaz = bc_gaz.value
        for pdf in batches:
            texts = pdf["text"].to_numpy(dtype=object)
            men, _ = V.nlp_batch(texts, gaz, m["WT"], m["T"], m["start"])
            rows = men["row"]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].to_numpy()[rows],
                    "turn_idx": pdf["turn_idx"].to_numpy()[rows].astype(np.int32),
                    "sent_idx": men["sent_in_turn"].astype(np.int32),
                    "start": men["start"].astype(np.int32),
                    "end": men["end"].astype(np.int32),
                    "surface": men["surface"],
                    "norm_surface": [spec.norm_surface(s) for s in men["surface"]],
                    "ner_type": _TYPES[men["type_code"]] if len(rows) else [],
                    "score": men["score"],
                    # packed little-endian float64 bytes: one memcpy per row
                    # beats Arrow list<double> conversion at 10^6 mentions;
                    # dtype=object also keeps the all-empty batch Arrow-safe
                    "ctx_emb": pd.Series(
                        [r.tobytes() for r in np.ascontiguousarray(
                            men["ctx"], dtype="<f8")],
                        dtype=object,
                    ),
                }
            )

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        fn, MENTIONS_SCHEMA
    )


def detect_mentions_arrow(
    transcripts: DataFrame, gazetteer_pdf: pd.DataFrame, spark: SparkSession
) -> DataFrame:
    """detect_mentions over ``mapInArrow`` (round-4: VERDICT r03 item 4
    A/B): same fused numpy kernel, but the Arrow record batches are
    consumed and produced directly — no pandas DataFrame wrapper on
    either side of the boundary. The measured differences vs the
    mapInPandas path (same batch sizes, same kernel):

    - input: ``conv_id``/``turn_idx`` stay Arrow arrays and the
      per-mention row gather is ``Array.take`` (C++), not a numpy object
      round-trip;
    - output: ``ctx_emb`` is built as ONE zero-copy FixedSizeBinary
      array over the contiguous (n, EMB_DIM) float64 block, then cast to
      binary — the pandas path materializes a python ``bytes`` object
      per mention (~10^6 allocations at bench scale);
    - no pandas→Arrow inference pass on the 10-column output.

    Byte-identity gates (tests/test_contract.py parity test) pin both
    paths to identical output."""
    import pyarrow as pa

    bc_model, bc_gaz = _broadcasts(spark, gazetteer_pdf)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        m = bc_model.value
        gaz = bc_gaz.value
        for rb in batches:
            cols = {n: rb.column(i) for i, n in enumerate(rb.schema.names)}
            texts = cols["text"].to_numpy(zero_copy_only=False)
            men, _ = V.nlp_batch(texts, gaz, m["WT"], m["T"], m["start"])
            rows = pa.array(men["row"], type=pa.int64())
            n = len(men["row"])
            ctx = np.ascontiguousarray(men["ctx"], dtype="<f8")
            width = ctx.shape[1] * 8
            ctx_fixed = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(width), n, [None, pa.py_buffer(ctx.data)]
            )
            yield pa.RecordBatch.from_arrays(
                [
                    cols["conv_id"].take(rows),
                    cols["turn_idx"].take(rows).cast(pa.int32()),
                    pa.array(men["sent_in_turn"], type=pa.int32()),
                    pa.array(men["start"], type=pa.int32()),
                    pa.array(men["end"], type=pa.int32()),
                    pa.array(men["surface"], type=pa.string()),
                    pa.array(
                        [spec.norm_surface(s) for s in men["surface"]],
                        type=pa.string(),
                    ),
                    pa.array(
                        _TYPES[men["type_code"]] if n else [],
                        type=pa.string(),
                    ),
                    pa.array(men["score"], type=pa.float64()),
                    ctx_fixed.cast(pa.binary()),
                ],
                names=[
                    "conv_id", "turn_idx", "sent_idx", "start", "end",
                    "surface", "norm_surface", "ner_type", "score",
                    "ctx_emb",
                ],
            )

    return transcripts.select("conv_id", "turn_idx", "text").mapInArrow(
        fn, MENTIONS_SCHEMA
    )


def tokens_table(transcripts: DataFrame) -> DataFrame:
    """Token materialization for the byte-identity contract (A7/B12)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf["text"].to_numpy(dtype=object)
            tok = V.tokenize_batch(texts)
            row = tok["row"]
            out_tokens: list[list[dict]] = [[] for _ in range(len(pdf))]
            for k in range(len(row)):
                r = row[k]
                out_tokens[r].append(
                    {
                        "pos": len(out_tokens[r]),
                        "start": int(tok["start"][k]),
                        "end": int(tok["end"][k]),
                        "text": tok["text"][k],
                    }
                )
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"].astype(np.int32),
                    "text": pdf["text"],
                    "tokens": out_tokens,
                }
            )

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        fn, TOKENS_SCHEMA
    )
