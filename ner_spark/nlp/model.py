"""Deterministic maxent/CRF model fixture (SURVEY.md §5.3 B5).

The reference is a trained CRF/maxent tagger (BASELINE.json:6); with the
reference tree empty (SURVEY.md §0) we *generate* weights deterministically
(seed=42) instead of training: Gaussian noise plus strong structured weights
on gazetteer-membership and capitalization features, so the tagger is
near-perfect on planted gazetteer entities and imperfect on ambiguous /
noisy text. Both the oracle and the Spark engine consume this same fixture;
it is data, not algorithm, so sharing it keeps the parity test meaningful.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ner_spark import spec


def apply_structural(T: np.ndarray, start: np.ndarray) -> None:
    """Overwrite (T, start) in place with the BIO-legality constraints —
    the single source of the structural transition semantics, shared by
    the generated fixture below and the trainer
    (ner_spark/nlp/train.py.structural_transitions)."""
    for t in spec.NER_TYPES:
        b, i = spec.LABEL_IDX[f"B-{t}"], spec.LABEL_IDX[f"I-{t}"]
        T[:, i] = spec.TRANS_ILLEGAL          # I-X reachable only from B-X/I-X
        T[b, i] = spec.TRANS_SAME
        T[i, i] = spec.TRANS_SAME
        start[i] = spec.TRANS_ILLEGAL         # sentence cannot start with I-X


@lru_cache(maxsize=1)
def build_model() -> dict[str, np.ndarray]:
    """Return {'W': (L, D) float32 emissions, 'T': (L, L) float32 transitions,
    'start': (L,) float32}. Pure function of spec constants; cached."""
    rng = np.random.default_rng(spec.MODEL_SEED)
    W = rng.normal(0.0, spec.NOISE_SCALE, size=(spec.L, spec.D)).astype(np.float32)

    # default-to-O prior on the bias feature every token carries
    W[spec.LABEL_IDX["O"], spec.feat_index(spec.T_BIAS, spec.fnv1a(spec.BIAS_PAYLOAD))] += (
        spec.BIAS_O_WEIGHT
    )
    # gazetteer BIO membership features dominate
    for t in spec.NER_TYPES:
        for bi in ("B", "I"):
            lab = f"{bi}-{t}"
            W[spec.LABEL_IDX[lab], spec.feat_index(spec.T_GAZ, spec.fnv1a(lab))] += (
                spec.GAZ_WEIGHT
            )
    # capitalization leans entity-ish (shared across all non-O labels)
    cap_idx = spec.feat_index(spec.T_FLAG, spec.fnv1a("CAP"))
    for lab, i in spec.LABEL_IDX.items():
        if lab != "O":
            W[i, cap_idx] += spec.CAP_WEIGHT

    T = rng.normal(0.0, spec.NOISE_SCALE, size=(spec.L, spec.L)).astype(np.float32)
    start = rng.normal(0.0, spec.NOISE_SCALE, size=(spec.L,)).astype(np.float32)
    apply_structural(T, start)
    return {"W": W, "T": T, "start": start}
