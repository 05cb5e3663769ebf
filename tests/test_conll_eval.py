"""A2 CoNLL ingest round-trip + B6 span-eval join."""

from __future__ import annotations

import pandas as pd
import pytest

from ner_spark.nlp.stage import detect_mentions
from ner_spark.operators.evaluate import span_prf
from ner_spark.sources.conll import read_conll, write_conll_fixture


@pytest.fixture(scope="module")
def conll_path(tmp_path_factory):
    return write_conll_fixture(
        str(tmp_path_factory.mktemp("conll") / "eval.conll"), "small"
    )


def test_conll_round_trip(spark, conll_path, oracle_small):
    got = read_conll(spark, conll_path).toPandas()
    tokens = oracle_small["tokens"]
    # every oracle token appears, in order, with a valid BIO tag
    n_tokens = int(tokens.tokens.map(len).sum())
    assert len(got) == n_tokens
    assert set(got.gold) <= {
        f"{b}-{t}" for t in ("PER", "LOC", "ORG", "MISC") for b in ("B", "I")
    } | {"O"}
    # B- tag count equals oracle mention count (one B per span)
    n_b = int((got.gold.str.startswith("B-")).sum())
    assert n_b == len(oracle_small["mentions"])
    # doc/sent/tok indices are dense and well-formed
    one_doc = got[got.doc_idx == 0]
    assert (one_doc.groupby("sent_idx").tok_idx.min() == 0).all()


def test_span_prf_exact_match(spark, small_inputs, oracle_small):
    pred = detect_mentions(
        small_inputs["transcripts"], small_inputs["gazetteer_pdf"], spark
    )
    gold = spark.createDataFrame(
        oracle_small["mentions"][["conv_id", "turn_idx", "start", "end", "ner_type"]]
    )
    prf = span_prf(pred, gold).toPandas().set_index("ner_type")
    assert prf.loc["__all__", "precision"] == 1.0
    assert prf.loc["__all__", "recall"] == 1.0
    assert prf.loc["__all__", "f1"] == 1.0
    assert (prf.fp == 0).all() and (prf.fn == 0).all()


def test_span_prf_counts_errors(spark, oracle_small):
    """Perturbed predictions produce the exact expected tp/fp/fn."""
    gold_pdf = oracle_small["mentions"][
        ["conv_id", "turn_idx", "start", "end", "ner_type"]
    ].drop_duplicates()
    pred_pdf = gold_pdf.copy()
    dropped = pred_pdf.iloc[:5]          # 5 false negatives
    pred_pdf = pred_pdf.iloc[5:]
    fake = dropped.copy()
    fake["start"] = fake["start"] + 1000  # 5 false positives (shifted spans)
    pred_pdf = pd.concat([pred_pdf, fake])
    prf = (
        span_prf(
            spark.createDataFrame(pred_pdf), spark.createDataFrame(gold_pdf)
        )
        .toPandas()
        .set_index("ner_type")
    )
    assert prf.loc["__all__", "fn"] == 5
    assert prf.loc["__all__", "fp"] == 5
    assert prf.loc["__all__", "tp"] == len(gold_pdf) - 5


def test_datasource_matches_mapinpandas_reader(spark, conll_path):
    """The registered Python DataSource (format 'conll') must produce the
    same token rows as the mapInPandas reader — one parse implementation,
    two ingest surfaces."""
    from ner_spark.sources.conll import ConllDataSource

    spark.dataSource.register(ConllDataSource)
    via_ds = spark.read.format("conll").load(conll_path).toPandas()
    via_map = read_conll(spark, conll_path).toPandas()
    key = ["doc_idx", "sent_idx", "tok_idx"]
    # normalize the file column (input_file_name yields a file:// URI)
    via_map["file"] = via_map["file"].str.replace("file://", "", regex=False)
    a = via_ds.sort_values(key).reset_index(drop=True)
    b = via_map.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
