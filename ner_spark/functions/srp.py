"""Signed-random-projection (SRP) LSH primitives, shared by
``ann_lsh_bucketed``, ``ann_recall`` and ``dedup_embedding_cosine``
(SURVEY.md §2 "similarity search"; round-3 VERDICT items 2 and 3).

The hyperplanes are deterministic Rademacher (+1/-1) vectors derived from
an LCG over (plane, dim) — the SAME sign matrix is inlined into both the
Spark column expression and the DuckDB oracle SQL, so the bucket id of a
vector is engine-independent by construction. Dot products are rounded to
9 decimals before the sign test (the repo-wide cross-engine float policy)
so accumulation-order noise cannot flip a bit.

Scale notes:
- bucket count is 2**n_bits, a FUNCTION ARGUMENT — at 100 TB you raise
  n_bits with log2(N) so expected bucket occupancy (N / 2**n_bits) stays
  bounded, keeping the within-bucket candidate join linear, never the
  O(N^2 / buckets) blowup a fixed 3-bit hash had;
- multi-probe (Hamming-radius bucket flips on the QUERY side only) buys
  recall without growing the index: probes multiply the small query side
  of the equi-join, the N-row index side still carries exactly one bucket
  per vector.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column
from pyspark.sql import functions as F


def srp_signs(n_bits: int, dim: int) -> list[list[float]]:
    """Deterministic +-1.0 hyperplane matrix (n_bits x dim). Pure integer
    LCG parity — bit-identical in any engine/language that inlines it."""
    return [
        [
            1.0 if ((1103515245 * (i * 97 + j) + 12345) // 65536) % 2 == 0 else -1.0
            for j in range(dim)
        ]
        for i in range(n_bits)
    ]


def hamming_masks(n_bits: int, radius: int) -> list[int]:
    """XOR masks enumerating all buckets within Hamming distance
    ``radius`` of a base bucket (mask 0 = the bucket itself)."""
    if radius > 3:
        raise ValueError(
            f"hamming_masks implements radius <= 3, got {radius} — "
            "add the combination tier rather than silently under-probing"
        )
    masks = [0]
    if radius >= 1:
        masks += [1 << i for i in range(n_bits)]
    if radius >= 2:
        masks += [(1 << i) | (1 << j) for i, j in combinations(range(n_bits), 2)]
    if radius >= 3:  # pragma: no cover - not used by current queries
        masks += [
            (1 << i) | (1 << j) | (1 << k)
            for i, j, k in combinations(range(n_bits), 3)
        ]
    return masks


def srp_bucket_col(emb: str | Column, n_bits: int, dim: int) -> Column:
    """Spark bucket id (bigint in [0, 2**n_bits)): packed sign bits of the
    hyperplane dot products. Pure built-in expressions (zip_with fold per
    plane) — whole-stage-codegen'd, no Python crossing."""
    emb_col = F.col(emb) if isinstance(emb, str) else emb
    bucket = F.lit(0).cast("long")
    for i, signs in enumerate(srp_signs(n_bits, dim)):
        plane = F.array(*[F.lit(s) for s in signs])
        dot = F.aggregate(
            F.zip_with(emb_col, plane, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(F.round(dot, 9) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        ).cast("long")
    return bucket


def srp_bucket_sql(emb_expr: str, n_bits: int, dim: int) -> str:
    """DuckDB expression computing the SAME bucket id: identical sign
    matrix inlined as list literals, identical 9-decimal rounding."""
    terms = []
    for i, signs in enumerate(srp_signs(n_bits, dim)):
        lit = "[" + ", ".join(str(s) for s in signs) + "]"
        dot = (
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"j -> CAST({emb_expr}[j] AS DOUBLE) * ({lit})[j]))"
        )
        terms.append(
            f"(CASE WHEN ROUND({dot}, 9) > 0 THEN {1 << i} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def probe_masks_sql(n_bits: int, radius: int) -> str:
    """DuckDB list literal of the multi-probe XOR masks."""
    return "[" + ", ".join(str(m) for m in hamming_masks(n_bits, radius)) + "]"
