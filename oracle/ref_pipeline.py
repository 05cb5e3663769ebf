"""Single-process deterministic reference pipeline (SURVEY.md §5.2 [SPEC]).

The Java reference binary is absent (/root/reference is empty — SURVEY.md
§0), so this module *is* the executable reference the Spark engine is
measured against: per-turn byte identity, span parity, and triple P/R>=0.95
(BASELINE.json). It is intentionally naive — plain Python loops, per-sentence
Viterbi, union-find — sharing only the constants in ``ner_spark.spec`` and
the model fixture with the Spark path, so the pytest parity gates are a real
differential test of the vectorized/distributed implementation.

Input/output are pandas DataFrames; run on fixture-scale data only.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from ner_spark import spec
from ner_spark.nlp.model import build_model

# ---------------------------------------------------------------------------
# tokenize
# ---------------------------------------------------------------------------


def tokenize_turn(text: str) -> list[list[tuple[int, int, str]]]:
    """Sentences of (start, end, token) with offsets into the turn text."""
    sents = []
    pos = 0
    for piece in spec.SENT_SPLIT_RE.split(text):
        start = text.index(piece, pos) if piece else pos
        toks = [
            (start + m.start(), start + m.end(), m.group(0))
            for m in spec.TOKEN_RE.finditer(piece)
        ]
        if toks:
            # hard-split over-long sentences (spec.MAX_SENT_LEN)
            for i in range(0, len(toks), spec.MAX_SENT_LEN):
                sents.append(toks[i : i + spec.MAX_SENT_LEN])
        pos = start + len(piece)
    return sents


# ---------------------------------------------------------------------------
# gazetteer structures
# ---------------------------------------------------------------------------


def build_gaz_phrases(gaz: pd.DataFrame) -> dict[tuple[str, ...], str]:
    """casefolded token tuple -> ner_type (lexicographically min on conflict)."""
    out: dict[tuple[str, ...], str] = {}
    for surface, typ in zip(gaz.surface_form, gaz.ner_type):
        key = tuple(spec.TOKEN_RE.findall(surface.casefold()))
        if not key or len(key) > spec.GAZ_MAX_LEN:
            continue
        if key not in out or typ < out[key]:
            out[key] = typ
    return out


def build_link_index(gaz: pd.DataFrame) -> dict[str, list[tuple[str, str]]]:
    """norm_surface -> sorted [(entity_id, ner_type)]."""
    out: dict[str, set[tuple[str, str]]] = {}
    for eid, surface, typ in zip(gaz.entity_id, gaz.surface_form, gaz.ner_type):
        out.setdefault(spec.norm_surface(surface), set()).add((eid, typ))
    return {k: sorted(v) for k, v in out.items()}


def gaz_bio(sent_tokens: list[str], phrases: dict[tuple[str, ...], str]) -> list[str]:
    """Greedy longest-match left-to-right; returns 'B-X'/'I-X'/'O' per token."""
    lower = [t.casefold() for t in sent_tokens]
    tags = ["O"] * len(lower)
    i = 0
    while i < len(lower):
        hit = 0
        for n in range(min(spec.GAZ_MAX_LEN, len(lower) - i), 0, -1):
            typ = phrases.get(tuple(lower[i : i + n]))
            if typ is not None:
                tags[i] = f"B-{typ}"
                for j in range(i + 1, i + n):
                    tags[j] = f"I-{typ}"
                hit = n
                break
        i += hit if hit else 1
    return tags


# ---------------------------------------------------------------------------
# features + emissions + viterbi (naive)
# ---------------------------------------------------------------------------


def token_features(toks: list[str], gaz_tags: list[str]) -> list[list[int]]:
    """Per-token list of feature bucket indices (spec templates T_*)."""
    feats = []
    lower = [t.casefold() for t in toks]
    for i, tok in enumerate(toks):
        f = [
            spec.feat_index(spec.T_BIAS, spec.fnv1a(spec.BIAS_PAYLOAD)),
            spec.feat_index(spec.T_WORD, spec.fnv1a(lower[i])),
            spec.feat_index(spec.T_SHAPE, spec.fnv1a(spec.shape(tok))),
        ]
        if tok.istitle():
            f.append(spec.feat_index(spec.T_FLAG, spec.fnv1a("CAP")))
        elif tok.isupper() and len(tok) > 1:
            f.append(spec.feat_index(spec.T_FLAG, spec.fnv1a("UPP")))
        elif tok.isdigit():
            f.append(spec.feat_index(spec.T_FLAG, spec.fnv1a("DIG")))
        for n in (1, 2, 3):
            if len(lower[i]) >= n:
                f.append(spec.feat_index(spec.T_PREFIX, spec.fnv1a(f"{n}:{lower[i][:n]}")))
                f.append(spec.feat_index(spec.T_SUFFIX, spec.fnv1a(f"{n}:{lower[i][-n:]}")))
        prev = lower[i - 1] if i > 0 else spec.BOS_PAYLOAD
        nxt = lower[i + 1] if i + 1 < len(toks) else spec.EOS_PAYLOAD
        f.append(spec.feat_index(spec.T_PREV, spec.fnv1a(prev)))
        f.append(spec.feat_index(spec.T_NEXT, spec.fnv1a(nxt)))
        if gaz_tags[i] != "O":
            f.append(spec.feat_index(spec.T_GAZ, spec.fnv1a(gaz_tags[i])))
        feats.append(f)
    return feats


def viterbi(emissions: np.ndarray, T: np.ndarray, start: np.ndarray) -> list[int]:
    """Naive per-sentence Viterbi. emissions: (n, L) float64."""
    n, L = emissions.shape
    dp = start.astype(np.float64) + emissions[0]
    back = np.zeros((n, L), dtype=np.int64)
    for t in range(1, n):
        cand = dp[:, None] + T  # (L_prev, L_cur)
        back[t] = np.argmax(cand, axis=0)
        dp = cand[back[t], np.arange(L)] + emissions[t]
    path = [int(np.argmax(dp))]
    for t in range(n - 1, 0, -1):
        path.append(int(back[t][path[-1]]))
    return path[::-1]


def decode_spans(tags: list[str], offsets: list[tuple[int, int]], text: str,
                 margins: list[float]) -> list[dict]:
    """BIO runs -> mentions; score = round(mean margin over tokens, 6)."""
    out = []
    i = 0
    while i < len(tags):
        if tags[i].startswith("B-"):
            typ = tags[i][2:]
            j = i + 1
            while j < len(tags) and tags[j] == f"I-{typ}":
                j += 1
            s, e = offsets[i][0], offsets[j - 1][1]
            out.append(
                {
                    "start": s,
                    "end": e,
                    "surface": text[s:e],
                    "ner_type": typ,
                    "score": round(float(np.mean(margins[i:j])), spec.SCORE_NDIGITS),
                }
            )
            i = j
        else:
            i += 1
    return out


# ---------------------------------------------------------------------------
# linking helpers
# ---------------------------------------------------------------------------


def ctx_embedding(sent_tokens: list[str]) -> np.ndarray:
    v = np.zeros(spec.EMB_DIM, dtype=np.float64)
    for t in sent_tokens:
        i, sgn = spec.emb_index_sign(spec.fnv1a(t.casefold()))
        v[i] += sgn
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


class UnionFind:
    def __init__(self):
        self.p: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.p[hi] = lo


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------


def run_pipeline(
    transcripts: pd.DataFrame,
    gazetteer: pd.DataFrame,
    entity_embeddings: pd.DataFrame,
) -> dict[str, pd.DataFrame]:
    """Returns tokens / mentions / links / entities (canon map) / edges /
    triples DataFrames. Deterministic; defines the acceptance semantics."""
    model = build_model()
    W, T, start = model["W"], model["T"], model["start"]
    o_idx = spec.LABEL_IDX["O"]
    phrases = build_gaz_phrases(gazetteer)
    link_index = build_link_index(gazetteer)
    emb = {e: np.asarray(v, dtype=np.float64) for e, v in
           zip(entity_embeddings.entity_id, entity_embeddings.embedding)}

    tx = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort")

    token_rows, mention_rows = [], []
    mid = 0
    for conv_id, turn_idx, text in zip(tx.conv_id, tx.turn_idx, tx.text):
        sents = tokenize_turn(text)
        flat_tokens = []
        for si, sent in enumerate(sents):
            toks = [t for _, _, t in sent]
            offsets = [(s, e) for s, e, _ in sent]
            gtags = gaz_bio(toks, phrases)
            feats = token_features(toks, gtags)
            # float64 accumulation: order-independent to ~1e-16, so the
            # vectorized engine's different add order is bit-compatible
            em = np.stack([W[:, f].sum(axis=1, dtype=np.float64) for f in feats])
            path = viterbi(em, T, start)
            tags = [spec.LABELS[p] for p in path]
            margins = [float(em[t, path[t]] - em[t, o_idx]) for t in range(len(toks))]
            for m in decode_spans(tags, offsets, text, margins):
                mention_rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": int(turn_idx),
                        "mention_id": f"m{mid:09d}",
                        "sent_idx": si,
                        "sent_tokens": toks,
                        **m,
                    }
                )
                mid += 1
            base = len(flat_tokens)
            flat_tokens.extend(
                {"pos": base + k, "start": s, "end": e, "text": t}
                for k, (s, e, t) in enumerate(sent)
            )
        token_rows.append(
            {"conv_id": conv_id, "turn_idx": int(turn_idx), "text": text,
             "tokens": flat_tokens}
        )

    tokens_df = pd.DataFrame(token_rows)
    mentions = pd.DataFrame(
        mention_rows,
        columns=["conv_id", "turn_idx", "mention_id", "sent_idx", "sent_tokens",
                 "start", "end", "surface", "ner_type", "score"],
    )

    # ---- linking -----------------------------------------------------------
    link_rows = []
    for r in mentions.itertuples(index=False):
        cands = link_index.get(spec.norm_surface(r.surface), [])
        cands = [(e, t) for e, t in cands if t == r.ner_type]
        if not cands:
            continue
        ctx = ctx_embedding(list(r.sent_tokens))
        best = None
        for eid, _t in cands:
            cos = spec.cosine64(ctx, emb[eid]) if eid in emb else 0.0
            score = round(spec.LINK_W_GAZ * spec.GAZ_SCORE_EXACT
                          + spec.LINK_W_EMB * cos, spec.SCORE_NDIGITS)
            if best is None or score > best[0] or (score == best[0] and eid < best[1]):
                best = (score, eid)
        link_rows.append(
            {"conv_id": r.conv_id, "turn_idx": r.turn_idx, "mention_id": r.mention_id,
             "start": r.start, "end": r.end, "sent_idx": r.sent_idx,
             "norm_surface": spec.norm_surface(r.surface),
             "entity_id": best[1], "link_score": best[0]}
        )
    links = pd.DataFrame(
        link_rows,
        columns=["conv_id", "turn_idx", "mention_id", "start", "end", "sent_idx",
                 "norm_surface", "entity_id", "link_score"],
    )

    # ---- co-reference edges + connected components -------------------------
    uf = UnionFind()
    edge_set = set()
    if len(links):
        for (_conv, _surf), grp in links.groupby(["conv_id", "norm_surface"]):
            ents = sorted(set(grp.entity_id))
            for i in range(len(ents)):
                for j in range(i + 1, len(ents)):
                    edge_set.add((ents[i], ents[j]))
                    uf.union(ents[i], ents[j])
        for e in links.entity_id:
            uf.find(e)
    canon = {e: uf.find(e) for e in uf.p}
    edges = pd.DataFrame(sorted(edge_set), columns=["src_entity", "dst_entity"])
    entities = pd.DataFrame(
        sorted(canon.items()), columns=["entity_id", "canonical_id"]
    )

    # ---- triples ------------------------------------------------------------
    triple_rows = []
    text_by_turn = {(c, int(t)): x for c, t, x in zip(tx.conv_id, tx.turn_idx, tx.text)}
    links_by_turn: dict[tuple[str, int], list] = {}
    for r in links.itertuples(index=False):
        links_by_turn.setdefault((r.conv_id, r.turn_idx), []).append(r)
    for v in links_by_turn.values():
        v.sort(key=lambda r: r.start)

    # P_REL / P_COOC over consecutive linked mentions per turn
    for (conv, turn), ms in links_by_turn.items():
        text = text_by_turn[(conv, turn)]
        for a, b in zip(ms, ms[1:]):
            between = text[a.end : b.start].strip().casefold()
            conf = round(a.link_score * b.link_score, spec.SCORE_NDIGITS)
            if a.sent_idx == b.sent_idx and between in spec.REL_PHRASES:
                pred = spec.REL_PHRASES[between]
            else:
                pred = spec.COOC_PRED
            triple_rows.append((canon[a.entity_id], pred, canon[b.entity_id],
                                conv, turn, conf))

    # P_TOOL
    unambiguous = {s: lst[0][0] for s, lst in link_index.items()
                   if len({e for e, _ in lst}) == 1}
    tool_turns = tx[tx.role == "tool"]
    for r in tool_turns.itertuples(index=False):
        try:
            payload = json.loads(r.text)
            tool_name = payload["tool"]
            surf = payload["args"]["entity"]
        except (ValueError, KeyError, TypeError):
            continue
        subj_ent = unambiguous.get(spec.norm_surface(surf))
        if subj_ent is None:
            continue
        prev = [t for (c, t) in links_by_turn if c == r.conv_id and t < int(r.turn_idx)]
        if not prev:
            continue
        obj_ent = links_by_turn[(r.conv_id, max(prev))][0].entity_id
        triple_rows.append((canon.get(subj_ent, subj_ent),
                            spec.TOOL_PRED_PREFIX + tool_name,
                            canon[obj_ent], r.conv_id, int(r.turn_idx), 1.0))

    triples = (
        pd.DataFrame(triple_rows,
                     columns=["subj", "pred", "obj", "conv_id", "turn_idx",
                              "confidence"])
        .groupby(["subj", "pred", "obj", "conv_id", "turn_idx"], as_index=False)
        .agg(confidence=("confidence", "max"))
        .sort_values(["conv_id", "turn_idx", "subj", "pred", "obj"], kind="mergesort")
        .reset_index(drop=True)
    )
    return {
        "tokens": tokens_df,
        "mentions": mentions.drop(columns=["sent_tokens"]),
        "links": links,
        "edges": edges,
        "entities": entities,
        "triples": triples,
    }


def run_on_dir(fixture_dir: str) -> dict[str, pd.DataFrame]:
    tx = pd.read_parquet(f"{fixture_dir}/transcripts.parquet")
    gaz = pd.read_parquet(f"{fixture_dir}/gazetteer.parquet")
    emb = pd.read_parquet(f"{fixture_dir}/entity_embeddings.parquet")
    return run_pipeline(tx, gaz, emb)
