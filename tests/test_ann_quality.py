"""ANN index quality gates (round-3 VERDICT items 1–2 "done" criteria):
the trained-IVF and multi-probe SRP-LSH indexes must each recover at
least as much of the brute-force truth at sf0.1 as the round-2
fixed-3-bit-bucket path did — the recall floor that makes the new
parameterizations an improvement, not just a different approximation.

The floor (0.2667 avg recall@3 over the 20-query sample at sf0.1) is the
measured recall of the round-2 path (3 axis-aligned sign bits, exact
probe), recomputed from the same parquet in the numpy prototype; it is a
CONSTANT here because the round-2 code is gone.
"""

from __future__ import annotations

import pytest

SF01 = "/root/testdata/sf0.1"
ROUND2_BUCKETED_RECALL = 0.2667  # 16/60 hits: 3-bit sign bucket, no probe


def _avg_recall(spark, name: str) -> float:
    from __spark_entry__ import queries

    rows = queries()[name](spark, SF01).collect()
    assert rows, f"{name} returned no per-query rows"
    return sum(r.n_hit for r in rows) / sum(r.n_true for r in rows)


def test_lsh_multiprobe_recall_beats_round2_floor(spark):
    # measured 0.4167 at sf0.1 (25/60) with FEWER candidates per query
    # (224 vs 254) — multi-probe buys recall without bucket occupancy
    r = _avg_recall(spark, "ann_recall")
    assert r >= ROUND2_BUCKETED_RECALL, r


def test_trained_ivf_recall_beats_round2_floor(spark):
    # measured 0.3667 at sf0.1 (22/60) at ~1/3 the candidates (91 vs 254)
    r = _avg_recall(spark, "ann_recall_ivf")
    assert r >= ROUND2_BUCKETED_RECALL, r


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
