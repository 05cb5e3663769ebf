"""A2 — CoNLL corpus ingest (SURVEY.md §2.1).

CoNLL column text: one token per line (whitespace-separated columns,
first = token, last = gold BIO tag), blank line = sentence boundary,
``-DOCSTART-`` line = document boundary. The block structure spans line
boundaries, so the parse unit is a FILE: ``spark.read.text(wholetext)``
yields one row per file and a mapInPandas stage parses each file's blocks
(files are the parallelism grain, as in the reference CLI whose unit of
work is an input corpus file).

Also provides ``write_conll_fixture`` — a deterministic corpus generator
(gold tags derived from the oracle NLP pipeline over the transcript
fixture) used by tests and the eval-join operator (B6).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CONLL_SCHEMA = (
    "file string, doc_idx int, sent_idx int, tok_idx int, "
    "token string, gold string"
)


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """Parse a CoNLL file/directory into one row per token."""
    files = spark.read.text(path, wholetext=True).withColumn(
        "file", F.input_file_name()
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, text in zip(pdf["file"], pdf["value"]):
                doc, sent, tok = -1, 0, 0
                started = False
                for line in text.splitlines():
                    line = line.strip()
                    if line.startswith("-DOCSTART-"):
                        doc, sent, tok, started = doc + 1, 0, 0, False
                        continue
                    if not line:
                        if started:
                            sent, tok, started = sent + 1, 0, False
                        continue
                    cols = line.split()
                    rows.append(
                        (fname, max(doc, 0), sent, tok, cols[0], cols[-1])
                    )
                    tok, started = tok + 1, True
            yield pd.DataFrame(
                rows,
                columns=["file", "doc_idx", "sent_idx", "tok_idx", "token", "gold"],
            )

    return files.mapInPandas(parse, CONLL_SCHEMA)


def write_conll_fixture(out_path: str, size: str = "small") -> str:
    """Deterministic CoNLL eval corpus from the oracle pipeline's gold
    mentions over the transcript fixture: one document per conversation,
    blank line per turn, BIO tags from oracle mention spans."""
    from fixtures.gen import ensure_fixture_dir
    from oracle.ref_pipeline import run_on_dir

    d = ensure_fixture_dir(size)
    out = run_on_dir(d)
    tokens = out["tokens"]
    mentions = out["mentions"]
    by_turn: dict[tuple, list] = {}
    for r in mentions.itertuples(index=False):
        by_turn.setdefault((r.conv_id, r.turn_idx), []).append(r)

    lines: list[str] = []
    for t in tokens.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).itertuples(index=False):
        if t.turn_idx == 0:
            lines.append("-DOCSTART- -X- -X- O")
            lines.append("")
        for tk in t.tokens:
            tag = "O"
            for m in by_turn.get((t.conv_id, t.turn_idx), []):
                if tk["start"] == m.start:
                    tag = f"B-{m.ner_type}"
                    break
                if m.start < tk["start"] < m.end:
                    tag = f"I-{m.ner_type}"
                    break
            lines.append(f"{tk['text']} -X- -X- {tag}")
        lines.append("")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return out_path
