"""Robustness: a 100-TB transcript corpus WILL contain malformed tool
payloads and degenerate text. The pipeline must degrade row-wise (drop
the unparseable triple, keep the turn) — never crash the job.

The tiny fixture is corrupted in place: truncated JSON, non-JSON text,
JSON with missing keys, wrong-typed args, empty text, and
whitespace-only text. The full build_kg must still run end-to-end, emit
the same triples for untouched conversations, and emit no P_TOOL triple
from the corrupted turns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def tiny_inputs(spark):
    import pandas as pd

    from fixtures.gen import ensure_fixture_dir

    d = ensure_fixture_dir("tiny")
    return {
        "transcripts": spark.read.parquet(f"{d}/transcripts.parquet"),
        "gazetteer_pdf": pd.read_parquet(f"{d}/gazetteer.parquet"),
        "entity_embeddings": spark.read.parquet(
            f"{d}/entity_embeddings.parquet"
        ),
    }


_BAD_TEXTS = [
    '{"tool": "search", "args": {"entity": ',  # truncated JSON
    "not json at all",
    '{"tool": "search"}',  # missing args.entity
    '{"tool": "search", "args": "entity"}',  # wrong-typed args
    "",  # empty text
    "   ",  # whitespace only
]


def test_build_kg_survives_corrupted_tool_turns(spark, tiny_inputs, tmp_path):
    from ner_spark.plans.kg import build_kg

    tx = tiny_inputs["transcripts"]
    # corrupt every tool turn of the first 3 conversations, cycling the
    # malformation list by turn_idx; leave all other conversations intact
    bad_convs = [r.conv_id for r in tx.select("conv_id").distinct().orderBy("conv_id").limit(3).collect()]
    bad_expr = F.element_at(
        F.array(*[F.lit(s) for s in _BAD_TEXTS]),
        (F.col("turn_idx") % len(_BAD_TEXTS) + 1).cast("int"),
    )
    is_bad = F.col("conv_id").isin(bad_convs) & (F.col("role") == "tool")
    corrupted = tx.withColumn(
        "text", F.when(is_bad, bad_expr).otherwise(F.col("text"))
    )

    out = build_kg(
        spark,
        corrupted,
        tiny_inputs["gazetteer_pdf"],
        tiny_inputs["entity_embeddings"],
        warehouse=str(tmp_path / "wh"),
        run_id="corrupt",
        resume=False,
    )
    triples = out["triples"].collect()  # must not raise
    assert len(triples) > 0

    # corrupted tool turns must yield no P_TOOL triples in those convs
    from ner_spark import spec

    bad_tool = [
        r
        for r in triples
        if r.conv_id in bad_convs
        and r.pred.startswith(spec.TOOL_PRED_PREFIX)
    ]
    assert bad_tool == [], bad_tool[:3]

    # untouched conversations are byte-identical to a clean build
    clean = build_kg(
        spark,
        tx,
        tiny_inputs["gazetteer_pdf"],
        tiny_inputs["entity_embeddings"],
        warehouse=str(tmp_path / "wh_clean"),
        run_id="clean",
        resume=False,
    )["triples"]
    cols = sorted(clean.columns)
    got = {
        tuple(r[c] for c in cols)
        for r in triples
        if r.conv_id not in bad_convs
    }
    exp = {
        tuple(r[c] for c in cols)
        for r in clean.collect()
        if r.conv_id not in bad_convs
    }
    assert got == exp
