"""Vectorized batch NLP core: tokenize → featurize/hash → emission → Viterbi
→ span decode → sentence context embeddings (SURVEY.md §2.3 A7–A12).

This is the engine counterpart of ``oracle/ref_pipeline.py``: same semantics
(defined in ``ner_spark.spec``), re-expressed as numpy array programs so it
runs inside a single fused ``mapInPandas`` stage with no per-row Python in
the hot path. Python string work is amortized over *unique* tokens per batch
(``pd.factorize``); the DP, feature hashing, gazetteer matching and context
embeddings are pure numpy over flat token arrays.

Numeric contract (matches the oracle bit-for-bit up to add-order ~1e-16):
emissions accumulated in float64; Viterbi in float64 with first-occurrence
argmax; mention score = np.mean(float64 margins) rounded to 6; context
embeddings are integer-valued sums normalized in float64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ner_spark import spec

U64 = np.uint64
_MASK = U64(0xFFFFFFFFFFFFFFFF)
_CHAIN_PRIME = U64(0x100000001B3)


def vsplitmix64(x: np.ndarray) -> np.ndarray:
    x = x + U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> U64(30))) * U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> U64(27))) * U64(0x94D049BB133111EB)
    return x ^ (x >> U64(31))


def vfeat_index(template_id: int, h: np.ndarray) -> np.ndarray:
    """Vectorized spec.feat_index over uint64 payload-hash arrays."""
    salt = U64((template_id * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    return (vsplitmix64(h ^ salt) % U64(spec.D)).astype(np.int64)


def chain_step(c: np.ndarray, h: np.ndarray) -> np.ndarray:
    """n-gram chain hash step (engine-internal 64-bit phrase key)."""
    return vsplitmix64((c * _CHAIN_PRIME) ^ h)


# ---------------------------------------------------------------------------
# Gazetteer matcher (built once on the driver, broadcast to workers)
# ---------------------------------------------------------------------------
class GazMatcher:
    """Phrase table keyed by chain hashes of casefolded token fnv1a hashes.

    Semantics equal the oracle's tuple-dict (greedy longest match,
    lexicographically-min type on conflict) modulo 64-bit collisions (~0).
    """

    def __init__(self, gazetteer: pd.DataFrame):
        per_n: dict[int, dict[np.uint64, int]] = {n: {} for n in range(1, spec.GAZ_MAX_LEN + 1)}
        for surface, typ in zip(gazetteer["surface_form"], gazetteer["ner_type"]):
            toks = spec.TOKEN_RE.findall(surface.casefold())
            if not toks or len(toks) > spec.GAZ_MAX_LEN:
                continue
            h = np.array([spec.fnv1a(t) for t in toks], dtype=U64)
            c = U64(0)
            for i in range(len(toks)):
                c = chain_step(np.array([c], dtype=U64), h[i : i + 1])[0]
            # conflict resolution: lexicographically-min type *string*
            # (NER_TYPES order is not lexicographic)
            d = per_n[len(toks)]
            if c not in d or typ < spec.NER_TYPES[d[c]]:
                d[c] = spec.NER_TYPES.index(typ)
        self.tables: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for n, d in per_n.items():
            if d:
                keys = np.fromiter(d.keys(), dtype=U64, count=len(d))
                order = np.argsort(keys)
                vals = np.fromiter(d.values(), dtype=np.int8, count=len(d))
                self.tables[n] = (keys[order], vals[order])

    def lookup(self, chains: np.ndarray, n: int) -> np.ndarray:
        """Return type code per position (-1 = no phrase of length n)."""
        out = np.full(len(chains), -1, dtype=np.int8)
        tab = self.tables.get(n)
        if tab is None or len(chains) == 0:
            return out
        keys, vals = tab
        pos = np.searchsorted(keys, chains)
        pos_c = np.minimum(pos, len(keys) - 1)
        hit = keys[pos_c] == chains
        out[hit] = vals[pos_c[hit]]
        return out


# ---------------------------------------------------------------------------
# Tokenization over a batch of turn texts
# ---------------------------------------------------------------------------
def tokenize_batch(texts: np.ndarray) -> dict[str, np.ndarray]:
    """Flat token arrays for a batch of texts.

    Returns row (turn index in batch), start/end char offsets, token text
    (object array), sent (global sentence id across the batch, dense,
    ordered by (row, piece, chunk) — matching the oracle's per-turn
    enumeration), and sent_idx_in_turn.
    """
    starts, ends, toks = [], [], []
    counts = np.zeros(len(texts), dtype=np.int64)
    tok_find = spec.TOKEN_RE.finditer
    sent_find = spec.SENT_SPLIT_RE.finditer
    # sentence bounds from every text collapse into ONE searchsorted at
    # the end: key = row*OFF + offset keeps per-text order (offsets are
    # char positions < OFF), and subtracting the per-row running bound
    # count recovers the per-text insertion position
    OFF = 1 << 32
    bkeys: list[int] = []
    cumb = np.zeros(len(texts), dtype=np.int64)
    running = 0
    for r, text in enumerate(texts):
        cumb[r] = running
        spans = [m.span() for m in tok_find(text)]
        counts[r] = len(spans)
        if not spans:
            continue
        st, en = zip(*spans)
        starts.extend(st)
        ends.extend(en)
        toks.extend([text[s:e] for s, e in spans])
        base = r * OFF
        bl = [base + m.end() for m in sent_find(text)]
        bkeys.extend(bl)
        running += len(bl)
    # row ids materialize once from per-text counts instead of one append
    # per token — same (row asc, start asc) order as the emitted offsets
    row_a = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    start_np = np.asarray(starts, dtype=np.int64)
    if len(row_a):
        piece_a = (
            np.searchsorted(
                np.asarray(bkeys, dtype=np.int64),
                row_a * OFF + start_np,
                side="right",
            )
            - cumb[row_a]
        )
    else:
        piece_a = np.zeros(0, dtype=np.int64)
    # rank of token within its (row, piece) for MAX_SENT_LEN chunking
    if len(row_a):
        key_change = np.empty(len(row_a), dtype=bool)
        key_change[0] = True
        key_change[1:] = (row_a[1:] != row_a[:-1]) | (piece_a[1:] != piece_a[:-1])
        grp_start = np.maximum.accumulate(np.where(key_change, np.arange(len(row_a)), 0))
        rank = np.arange(len(row_a)) - grp_start
        chunk = rank // spec.MAX_SENT_LEN
        sent_change = key_change | (np.r_[False, chunk[1:] != chunk[:-1]])
        sent = np.cumsum(sent_change) - 1
        # sentence index within each turn
        turn_change = np.r_[True, row_a[1:] != row_a[:-1]]
        first_sent_of_turn = np.maximum.accumulate(np.where(turn_change, sent, 0))
        sent_in_turn = sent - first_sent_of_turn
    else:
        sent = np.zeros(0, dtype=np.int64)
        sent_in_turn = np.zeros(0, dtype=np.int64)
    return {
        "row": row_a,
        "start": start_np,
        "end": np.asarray(ends, dtype=np.int64),
        "text": np.asarray(toks, dtype=object),
        "sent": sent,
        "sent_in_turn": sent_in_turn,
    }


# ---------------------------------------------------------------------------
# Per-unique-token lexical attributes
# ---------------------------------------------------------------------------
def unique_token_attrs(uniq: np.ndarray) -> dict[str, np.ndarray]:
    n = len(uniq)
    h_lower = np.empty(n, dtype=U64)
    h_shape = np.empty(n, dtype=U64)
    flag = np.zeros(n, dtype=np.int8)  # 0 none, 1 CAP, 2 UPP, 3 DIG
    pre = np.full((n, 3), -1, dtype=np.int64)
    suf = np.full((n, 3), -1, dtype=np.int64)
    for i, tok in enumerate(uniq):
        cf = tok.casefold()
        h_lower[i] = spec.fnv1a(cf)
        h_shape[i] = spec.fnv1a(spec.shape(tok))
        if tok.istitle():
            flag[i] = 1
        elif tok.isupper() and len(tok) > 1:
            flag[i] = 2
        elif tok.isdigit():
            flag[i] = 3
        for k in (1, 2, 3):
            if len(cf) >= k:
                pre[i, k - 1] = spec.feat_index(spec.T_PREFIX, spec.fnv1a(f"{k}:{cf[:k]}"))
                suf[i, k - 1] = spec.feat_index(spec.T_SUFFIX, spec.fnv1a(f"{k}:{cf[-k:]}"))
    return {"h_lower": h_lower, "h_shape": h_shape, "flag": flag, "pre": pre, "suf": suf}


# scalar constants (computed once at import)
_BIAS_IDX = spec.feat_index(spec.T_BIAS, spec.fnv1a(spec.BIAS_PAYLOAD))
_FLAG_IDX = np.array(
    [0]
    + [spec.feat_index(spec.T_FLAG, spec.fnv1a(p)) for p in ("CAP", "UPP", "DIG")],
    dtype=np.int64,
)
_BOS_H = U64(spec.fnv1a(spec.BOS_PAYLOAD))
_EOS_H = U64(spec.fnv1a(spec.EOS_PAYLOAD))
_GAZ_IDX = {
    (bi, t): spec.feat_index(spec.T_GAZ, spec.fnv1a(f"{bi}-{typ}"))
    for t, typ in enumerate(spec.NER_TYPES)
    for bi in ("B", "I")
}
# same table as a (2, n_types) array for vectorized gather: row 0 = "I",
# row 1 = "B" (indexed by the boolean is-B flag)
_GAZ_IDX_ARR = np.asarray(
    [
        [_GAZ_IDX[("I", t)] for t in range(len(spec.NER_TYPES))],
        [_GAZ_IDX[("B", t)] for t in range(len(spec.NER_TYPES))],
    ],
    dtype=np.int64,
)
_O = spec.LABEL_IDX["O"]


def _prev_next_hashes(
    h_lower: np.ndarray, sent: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-token previous/next lowercase-token hashes with BOS/EOS at
    sentence boundaries — shared by the fused scorer and the training
    path's explicit-index extraction so the boundary semantics cannot
    drift between them."""
    n = len(h_lower)
    prev_h = np.empty(n, dtype=U64)
    next_h = np.empty(n, dtype=U64)
    prev_h[1:] = h_lower[:-1]
    next_h[:-1] = h_lower[1:]
    if n:
        first = np.r_[True, sent[1:] != sent[:-1]]
        last = np.r_[sent[1:] != sent[:-1], True]
        prev_h[first] = _BOS_H
        next_h[last] = _EOS_H
    return prev_h, next_h


def _gaz_feature_gather(
    gaz_code: np.ndarray, gaz_bi: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(mask, bucket indices for the masked tokens) of the gazetteer BIO
    membership feature — shared by scorer and trainer."""
    gm = gaz_code >= 0
    if not gm.any():
        return gm, np.empty(0, dtype=np.int64)
    return gm, _GAZ_IDX_ARR[
        gaz_bi[gm].astype(np.int64), gaz_code[gm].astype(np.int64)
    ]


def emissions_for_batch(
    tok: dict[str, np.ndarray],
    attrs: dict[str, np.ndarray],
    inv: np.ndarray,
    gaz_code: np.ndarray,
    gaz_bi: np.ndarray,
    WT: np.ndarray,
) -> np.ndarray:
    """(n_tokens, L) float64 emission scores. WT = W.T (D, L) float32."""
    n = len(inv)
    h_lower = attrs["h_lower"][inv]
    em = np.zeros((n, spec.L), dtype=np.float64)
    em += WT[_BIAS_IDX]
    em += WT[vfeat_index(spec.T_WORD, h_lower)]
    em += WT[vfeat_index(spec.T_SHAPE, attrs["h_shape"][inv])]
    flag = attrs["flag"][inv]
    fm = flag > 0
    if fm.any():
        em[fm] += WT[_FLAG_IDX[flag[fm]]]
    for k in range(3):
        for mat in (attrs["pre"], attrs["suf"]):
            col = mat[inv, k]
            m = col >= 0
            if m.any():
                em[m] += WT[col[m]]
    prev_h, next_h = _prev_next_hashes(h_lower, tok["sent"])
    em += WT[vfeat_index(spec.T_PREV, prev_h)]
    em += WT[vfeat_index(spec.T_NEXT, next_h)]
    gm, gidx = _gaz_feature_gather(gaz_code, gaz_bi)
    if gm.any():
        em[gm] += WT[gidx]
    return em


# column count of feature_indices_for_batch: bias, word, shape, flag,
# pre x3, suf x3, prev, next, gaz
N_FEAT_COLS = 13


def feature_indices_for_batch(
    tok: dict[str, np.ndarray],
    attrs: dict[str, np.ndarray],
    inv: np.ndarray,
    gaz_code: np.ndarray,
    gaz_bi: np.ndarray,
) -> np.ndarray:
    """(n_tokens, N_FEAT_COLS) int64 feature-bucket indices, -1 = absent.

    The SAME feature set emissions_for_batch scores — kept in lockstep by
    tests/test_train.py::test_feature_indices_match_emissions, which
    asserts sum(WT[indices]) == emissions_for_batch(WT) on a real batch.
    emissions_for_batch stays hand-fused (the hot path skips gathering
    absent features); this explicit index form is what training needs
    (perceptron updates touch W rows by index)."""
    n = len(inv)
    out = np.full((n, N_FEAT_COLS), -1, dtype=np.int64)
    h_lower = attrs["h_lower"][inv]
    out[:, 0] = _BIAS_IDX
    out[:, 1] = vfeat_index(spec.T_WORD, h_lower)
    out[:, 2] = vfeat_index(spec.T_SHAPE, attrs["h_shape"][inv])
    flag = attrs["flag"][inv]
    fm = flag > 0
    out[fm, 3] = _FLAG_IDX[flag[fm]]
    for k in range(3):
        out[:, 4 + k] = attrs["pre"][inv, k]
        out[:, 7 + k] = attrs["suf"][inv, k]
    prev_h, next_h = _prev_next_hashes(h_lower, tok["sent"])
    out[:, 10] = vfeat_index(spec.T_PREV, prev_h)
    out[:, 11] = vfeat_index(spec.T_NEXT, next_h)
    gm, gidx = _gaz_feature_gather(gaz_code, gaz_bi)
    if gm.any():
        out[gm, 12] = gidx
    return out


def emissions_from_indices(fidx: np.ndarray, WT: np.ndarray) -> np.ndarray:
    """(n, L) emission scores from explicit feature indices: the training-
    path scorer. Equals emissions_for_batch by the lockstep test."""
    valid = fidx >= 0
    g = WT[np.where(valid, fidx, 0)]  # (n, F, L)
    g[~valid] = 0.0
    return g.sum(axis=1, dtype=np.float64)


def gaz_tag_batch(tok: dict[str, np.ndarray], h_lower_tok: np.ndarray, gaz: GazMatcher):
    """Greedy longest-match gazetteer BIO per token.

    Returns (code, is_b): code = NER type index or -1; is_b bool.
    """
    n = len(h_lower_tok)
    sent = tok["sent"]
    code = np.full(n, -1, dtype=np.int8)
    is_b = np.zeros(n, dtype=bool)
    if n == 0:
        return code, is_b
    # chain hashes C_m[i] over positions i..i+m-1, invalid across sentences
    valid = np.ones(n, dtype=bool)
    chains = chain_step(np.zeros(n, dtype=U64), h_lower_tok)
    cand_len = np.zeros(n, dtype=np.int8)
    cand_typ = np.full(n, -1, dtype=np.int8)
    for m in range(1, spec.GAZ_MAX_LEN + 1):
        if m > 1:
            # extend chain with token at offset m-1
            chains = chains[:-1].copy()
            chains = chain_step(chains, h_lower_tok[m - 1 :])
            valid = valid[:-1] & (sent[: n - m + 1] == sent[m - 1 :])
        cur_valid = valid if m > 1 else np.ones(n, dtype=bool)
        t = gaz.lookup(chains, m)
        hit = (t >= 0) & cur_valid
        # longest match wins at each start position
        idx = np.nonzero(hit)[0]
        cand_len[idx] = m
        cand_typ[idx] = t[idx]
    # greedy left-to-right non-overlapping scan (sparse python loop)
    next_free = -1
    last_sent = -1
    for i in np.nonzero(cand_len > 0)[0]:
        if sent[i] != last_sent:
            next_free = -1
            last_sent = sent[i]
        if i < next_free:
            # position consumed by a previous match; oracle's scan would
            # also skip it (it jumps by the hit length)
            continue
        ln = int(cand_len[i])
        code[i : i + ln] = cand_typ[i]
        is_b[i] = True
        next_free = i + ln
    return code, is_b


def viterbi_batch(
    em: np.ndarray, sent: np.ndarray, T: np.ndarray, start: np.ndarray,
    cells_budget: int = 4_000_000,
) -> np.ndarray:
    """Viterbi over all sentences of a batch; returns label id per token.

    Sentences are length-bucketed so padded tensors stay within
    ``cells_budget`` cells (spill-aware: bounds worker memory regardless of
    sentence-length skew, SURVEY.md §4.3).
    """
    n = len(sent)
    out = np.zeros(n, dtype=np.int8)
    if n == 0:
        return out
    # transposed transitions: cand[k, j, i] = dp[k, i] + T[i, j] keeps the
    # per-step argmax on the contiguous last axis (measurably faster than
    # reducing the strided middle axis of dp + T)
    TT = np.ascontiguousarray(T.astype(np.float64).T)
    start64 = start.astype(np.float64)
    # sentence ptr boundaries (sent ids are dense & sorted)
    change = np.r_[True, sent[1:] != sent[:-1]]
    ptr = np.r_[np.nonzero(change)[0], n]
    lens = np.diff(ptr)
    order = np.argsort(lens, kind="stable")
    s_i = 0
    while s_i < len(order):
        # grow bucket until padded cells exceed budget
        s_j = s_i + 1
        while s_j < len(order) and (s_j + 1 - s_i) * lens[order[s_j]] <= cells_budget:
            s_j += 1
        sel = order[s_i:s_j]
        _viterbi_bucket(em, ptr, lens, sel, TT, start64, out)
        s_i = s_j
    return out


def _viterbi_bucket(em, ptr, lens, sel, TT, start64, out) -> None:
    S = len(sel)
    maxlen = int(lens[sel].max())
    L = spec.L
    emp = np.zeros((S, maxlen, L), dtype=np.float64)
    for k, s in enumerate(sel):  # gather (cheap: S rows)
        emp[k, : lens[s]] = em[ptr[s] : ptr[s] + lens[s]]
    lens_sel = lens[sel]
    dp = start64 + emp[:, 0]
    backs = np.zeros((S, maxlen, L), dtype=np.int8)
    for t in range(1, maxlen):
        # sel is length-sorted ascending, so "still active at step t" is
        # the suffix [a:] — slice views instead of boolean-mask copies
        a = int(np.searchsorted(lens_sel, t, side="right"))
        if a >= S:
            break
        cand = dp[a:, None, :] + TT[None]
        bk = np.argmax(cand, axis=2)
        mx = np.take_along_axis(cand, bk[:, :, None], axis=2)[:, :, 0]
        dp[a:] = mx + emp[a:, t]
        backs[a:, t] = bk.astype(np.int8)
    cur = np.argmax(dp, axis=1).astype(np.int8)
    tags = np.zeros((S, maxlen), dtype=np.int8)
    tags[np.arange(S), lens_sel - 1] = cur
    for t in range(maxlen - 1, 0, -1):
        a = int(np.searchsorted(lens_sel, t, side="right"))
        if a >= S:
            continue
        sub = backs[a:, t]
        tags[a:, t - 1] = sub[np.arange(S - a), tags[a:, t]]
    for k, s in enumerate(sel):  # scatter back
        out[ptr[s] : ptr[s] + lens[s]] = tags[k, : lens[s]]


def decode_mentions(
    tok: dict[str, np.ndarray],
    labels: np.ndarray,
    em: np.ndarray,
    texts: np.ndarray,
) -> dict[str, np.ndarray]:
    """BIO runs → mention arrays (row, sent_in_turn, start, end, surface,
    type_code, score). Sparse python loop over B- positions only."""
    sent = tok["sent"]
    n = len(labels)
    margins = em[np.arange(n), labels] - em[:, _O]
    is_b = (labels > 0) & (labels % 2 == 1)  # B-* ids are odd (1,3,5,7)
    b_pos = np.nonzero(is_b)[0]
    if not len(b_pos):
        return {
            "row": np.zeros(0, dtype=np.int64),
            "sent_in_turn": np.zeros(0, dtype=np.int64),
            "start": np.zeros(0, dtype=np.int64),
            "end": np.zeros(0, dtype=np.int64),
            "surface": np.zeros(0, dtype=object),
            "type_code": np.zeros(0, dtype=np.int8),
            "score": np.zeros(0, dtype=np.float64),
            "tok_sent": np.zeros(0, dtype=np.int64),
        }
    # position k continues the run of k-1 iff its label is the matching
    # I-label (B odd -> +1, I even -> same; O prev gives expected 0,
    # excluded by labels>0) and the sentence is unchanged
    expected = labels[:-1] + (labels[:-1] % 2)
    cont = np.empty(n, dtype=bool)
    cont[0] = False
    cont[1:] = (labels[1:] > 0) & (labels[1:] == expected) & (
        sent[1:] == sent[:-1]
    )
    # run end j per B = first non-continuation position after it
    stops = np.flatnonzero(~cont)
    stops = np.append(stops, n)
    j = stops[np.searchsorted(stops, b_pos, side="right")]
    rows = tok["row"][b_pos]
    starts = tok["start"][b_pos]
    ends = tok["end"][j - 1]
    # per-run margin mean: reduceat over [b, j) pairs (odd slots are the
    # discarded gaps; the pad makes j == n a valid index). For runs of
    # <8 tokens numpy's pairwise mean degenerates to the same sequential
    # sum, so this is bit-identical to np.mean; longer runs (rare) fall
    # back to np.mean itself to keep the binding score semantics exact.
    idx = np.empty(2 * len(b_pos), dtype=np.intp)
    idx[0::2] = b_pos
    idx[1::2] = j
    sums = np.add.reduceat(np.append(margins, 0.0), idx)[0::2]
    lens = j - b_pos
    means = sums / lens
    for t in np.flatnonzero(lens >= 8):
        means[t] = np.mean(margins[b_pos[t] : j[t]])
    nd = spec.SCORE_NDIGITS
    return {
        "row": rows.astype(np.int64, copy=False),
        "sent_in_turn": tok["sent_in_turn"][b_pos].astype(np.int64, copy=False),
        "start": starts.astype(np.int64, copy=False),
        "end": ends.astype(np.int64, copy=False),
        "surface": np.asarray(
            [
                texts[r][s:e]
                for r, s, e in zip(rows.tolist(), starts.tolist(), ends.tolist())
            ],
            dtype=object,
        ),
        "type_code": ((labels[b_pos] - 1) // 2).astype(np.int8),
        # python-round semantics (correctly-rounded half-even — np.round
        # alone differs on scaled-halfway representations), vectorized
        # with the guarded fix-up in spec.round_half_even_batch
        "score": spec.round_half_even_batch(means, nd),
        "tok_sent": sent[b_pos],
    }


def ctx_embeddings(tok: dict[str, np.ndarray], h_lower_tok: np.ndarray) -> np.ndarray:
    """(n_sentences, EMB_DIM) float64 unit-normalized hash embeddings."""
    sent = tok["sent"]
    n_sent = int(sent.max()) + 1 if len(sent) else 0
    V = np.zeros((n_sent, spec.EMB_DIM), dtype=np.float64)
    if n_sent:
        idx = (h_lower_tok % U64(spec.EMB_DIM)).astype(np.int64)
        sign = np.where((h_lower_tok >> U64(32)) & U64(1) == 1, 1.0, -1.0)
        np.add.at(V, (sent, idx), sign)
        norms = np.linalg.norm(V, axis=1)
        nz = norms > 0
        V[nz] /= norms[nz, None]
    return V


def nlp_batch(
    texts: np.ndarray, gaz: GazMatcher, WT: np.ndarray, T: np.ndarray,
    start: np.ndarray,
) -> tuple[dict[str, np.ndarray], np.ndarray]:
    """Full fused stage for one batch of turn texts.

    Returns (mentions dict incl. ctx_emb rows, labels per token) — labels
    returned for tests/debug.
    """
    tok = tokenize_batch(texts)
    if len(tok["row"]) == 0:
        empty = {k: np.zeros(0, dtype=object if k == "surface" else np.int64)
                 for k in ("row", "sent_in_turn", "start", "end", "surface")}
        empty["type_code"] = np.zeros(0, dtype=np.int8)
        empty["score"] = np.zeros(0, dtype=np.float64)
        empty["ctx"] = np.zeros((0, spec.EMB_DIM), dtype=np.float64)
        return empty, np.zeros(0, dtype=np.int8)
    # hash-table factorize instead of np.unique: O(n) hashing beats the
    # object-array argsort, and every per-unique attr is a pure function
    # of the token string, so first-occurrence order is as good as sorted
    import pandas as pd

    inv, uniq = pd.factorize(tok["text"], use_na_sentinel=False)
    inv = inv.astype(np.int64, copy=False)
    uniq = np.asarray(uniq, dtype=object)
    attrs = unique_token_attrs(uniq)
    h_lower_tok = attrs["h_lower"][inv]
    g_code, g_isb = gaz_tag_batch(tok, h_lower_tok, gaz)
    em = emissions_for_batch(tok, attrs, inv, g_code, g_isb, WT)
    labels = viterbi_batch(em, tok["sent"], T, start)
    men = decode_mentions(tok, labels, em, texts)
    ctx_all = ctx_embeddings(tok, h_lower_tok)
    men["ctx"] = ctx_all[men.pop("tok_sent")] if len(men["row"]) else np.zeros(
        (0, spec.EMB_DIM), dtype=np.float64
    )
    return men, labels
