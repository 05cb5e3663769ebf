"""Unit / property tests of the vectorized NLP core against the naive
oracle implementations (no Spark needed — pure numpy differential)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fixtures.gen import ensure_fixture_dir
from ner_spark import spec
from ner_spark.nlp import vectorized as V
from ner_spark.nlp.model import build_model
from oracle import ref_pipeline as O


def test_vectorized_feat_index_matches_scalar():
    rng = np.random.default_rng(0)
    hs = rng.integers(0, 2**63, size=200, dtype=np.uint64)
    for tid in (0, 3, 8):
        got = V.vfeat_index(tid, hs)
        exp = [spec.feat_index(tid, int(h)) for h in hs]
        assert got.tolist() == exp


def test_viterbi_batch_matches_naive():
    rng = np.random.default_rng(1)
    model = build_model()
    T, start = model["T"], model["start"]
    lens = [1, 2, 3, 7, 19, 64]
    em_list = [rng.normal(size=(n, spec.L)).astype(np.float64) for n in lens]
    em = np.concatenate(em_list)
    sent = np.repeat(np.arange(len(lens)), lens)
    got = V.viterbi_batch(em, sent, T, start, cells_budget=100)  # force buckets
    off = 0
    for e in em_list:
        exp = O.viterbi(e, T, start)
        assert got[off : off + len(e)].tolist() == exp
        off += len(e)


def test_tokenize_batch_matches_oracle():
    texts = [
        "Hello world. Two sentences! Three?",
        "",
        "   ",
        "no-split here; just one",
        "Emoji 🚀 and CJK 北京 mixed. End.",
        "A" * 5 + ". " + "b c " * 600 + ".",  # long sentence → MAX_SENT_LEN split
    ]
    tok = V.tokenize_batch(np.array(texts, dtype=object))
    for r, text in enumerate(texts):
        sel = tok["row"] == r
        got = list(zip(tok["start"][sel], tok["end"][sel], tok["text"][sel]))
        sents = O.tokenize_turn(text)
        exp = [t for s in sents for t in s]
        assert [(int(a), int(b), c) for a, b, c in got] == exp
        # sentence numbering identical
        got_sent = tok["sent_in_turn"][sel].tolist()
        exp_sent = [si for si, s in enumerate(sents) for _ in s]
        assert got_sent == exp_sent


def test_gaz_matcher_matches_oracle():
    gaz = pd.read_parquet(f"{ensure_fixture_dir('small')}/gazetteer.parquet")
    phrases = O.build_gaz_phrases(gaz)
    gm = V.GazMatcher(gaz)
    texts = np.array(
        [
            "Anna Müller visited Anna Müller.",
            "müller and MÜLLER and Müller!",
            "Acme Systems Acme Acme Systems",
            "nothing to see",
        ],
        dtype=object,
    )
    tok = V.tokenize_batch(texts)
    uniq, inv = np.unique(tok["text"], return_inverse=True)
    h = V.unique_token_attrs(uniq)["h_lower"][inv]
    code, is_b = V.gaz_tag_batch(tok, h, gm)
    # oracle per sentence
    exp_tags = []
    for text in texts:
        for sent in O.tokenize_turn(text):
            exp_tags.extend(O.gaz_bio([t for _, _, t in sent], phrases))
    got_tags = []
    for c, b in zip(code, is_b):
        if c < 0:
            got_tags.append("O")
        else:
            got_tags.append(("B-" if b else "I-") + spec.NER_TYPES[c])
    assert got_tags == exp_tags


def test_tokenizer_offsets_partition_bytes():
    """Property: token offsets slice the original string exactly."""
    texts = ["ħęllo wörld… 𝔘nicode! ok?", "tabs\tand\nnewlines innit."]
    tok = V.tokenize_batch(np.array(texts, dtype=object))
    for k in range(len(tok["row"])):
        t = texts[tok["row"][k]]
        assert t[tok["start"][k] : tok["end"][k]] == tok["text"][k]


@pytest.mark.parametrize("seed", [0, 7])
def test_nlp_batch_random_text_no_crash(seed):
    """Fuzz-ish: random unicode soup must round-trip without error and all
    mentions must slice to their surfaces."""
    rng = np.random.default_rng(seed)
    alphabet = list("abZ 9.!?—🚀北ß\t\n'\"{}")
    texts = np.array(
        ["".join(rng.choice(alphabet, size=rng.integers(0, 80))) for _ in range(50)],
        dtype=object,
    )
    gaz = pd.read_parquet(f"{ensure_fixture_dir('small')}/gazetteer.parquet")
    m = build_model()
    men, _ = V.nlp_batch(
        texts, V.GazMatcher(gaz), np.ascontiguousarray(m["W"].T), m["T"], m["start"]
    )
    for r, s, e, surf in zip(men["row"], men["start"], men["end"], men["surface"]):
        assert texts[r][s:e] == surf
