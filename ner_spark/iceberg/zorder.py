"""Z-order (Morton) clustering for the sorted-rewrite path.

A single-column sort rewrite (``compact_iceberg_partitions(sort_by=...)``)
buys file-level pruning on ONE hot column: per-file min/max bounds become
disjoint along the sort key, and every other column's bounds stay as wide
as the file. When two or more columns take hot range/equality probes
(``ts`` AND ``user_id``; ``o_orderdate`` AND ``o_totalprice``), upstream
engines cluster on an interleaved-bit curve instead — Iceberg's
``rewrite_data_files(strategy => 'sort', sort_order => 'zorder(a, b)')``
and Delta's ``OPTIMIZE ... ZORDER BY``. Files then cover compact
hyper-rectangles of the combined key space, so the manifest min/max
bounds prune probes on EITHER column (at ~sqrt efficiency per dimension
vs a dedicated sort — the classic space-filling-curve tradeoff).

Construction (mirrors Delta's range_partition_id approach, which is
robust to skew where fixed-width binning is not):

1. Per column, estimate ``2^bits`` quantile boundaries from a
   deterministic value-hash sample (``xxhash64(col) % p == 0`` — the
   same sampling primitive as ``profile_hot_keys``; weighted by the
   sampled duplicate counts so heavy hitters don't tilt the buckets;
   ``p`` sized from the column's approx DISTINCT count so
   low-cardinality columns keep their full value set). Driver-side cost
   is one bounded ``groupBy(col).count()`` collect per column (~``8k``
   distinct values), independent of table size.
2. Bucket each row JVM-side: ``sum(col >= boundary_i)`` — a chain of
   ``2^bits - 1`` comparisons that stays inside whole-stage codegen
   (no UDF, no Python). Nulls bucket to 0 (the low corner), matching
   NULLS FIRST.
3. Interleave the bucket bits into one Morton code
   (``shiftleft``/``shiftright``/``bitwiseAND`` expression tree) and
   range-cluster + sort the rewrite on it.

``bits`` defaults to 6 (64 buckets/dimension, 4096 cells for two
columns): file-level pruning only needs more cells than files, and a
maintenance window rewrites at most a few thousand files per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def sampled_boundaries(
    df: DataFrame,
    col: str,
    n_buckets: int,
    est_rows: int = 0,
    sample_target: int = 8192,
) -> list:
    """``n_buckets - 1`` ascending quantile boundaries for ``col``,
    estimated from a deterministic value-hash sample.

    The sample keeps every row whose ``xxhash64(col) % p == 0`` —
    deterministic (retry/repartition stable) — and is collected as
    ``(value, count)`` pairs so the driver transfer is bounded by
    DISTINCT sampled values, not rows, even on heavy-hitter columns.
    ``p`` is sized from the column's approx DISTINCT count (one cheap
    pre-scan), NOT the row count: value-hash sampling thins the distinct
    VALUE set, so ``p = distinct / sample_target`` keeps ~``sample_target``
    values whatever the row count, while the old row-count sizing drove
    ``p`` into the tens of thousands on big tables and silently emptied
    the sample for low-cardinality columns (a few hundred countries /
    statuses → zero boundaries → no clustering on that column at all).
    Low-cardinality columns now take the ``p == 1`` path: a full
    ``groupBy(col).count()``, whose shuffle is bounded by the distinct
    count — cheap exactly when it engages. Boundaries are weighted
    empirical quantiles of the sampled (value, weight) pairs — per-value
    weights are exact counts, so heavy hitters occupy their true mass —
    and duplicates collapse, so constant columns degrade gracefully to
    fewer buckets. ``est_rows`` is accepted for back-compat but unused.
    """
    nd = df.select(
        F.approx_count_distinct(col).alias("nd")
    ).first()["nd"]
    p = max(1, nd // sample_target)
    c = F.col(col)
    rows = (
        df.select(col)
        .where(c.isNotNull() & (F.pmod(F.xxhash64(c), F.lit(p)) == 0))
        .groupBy(col)
        .count()
        .collect()
    )
    if not rows:
        return []
    vw = sorted((r[0], r[1]) for r in rows)
    total = sum(w for _, w in vw)
    bounds: list = []
    acc, bi = 0, 1
    for v, w in vw:
        acc += w
        while bi < n_buckets and acc >= total * bi / n_buckets:
            bounds.append(v)
            bi += 1
    out: list = []
    for b in bounds:
        if not out or b > out[-1]:
            out.append(b)
    return out[: n_buckets - 1]


def bucket_expr(col: str, boundaries: list) -> Column:
    """Rank-bucket of ``col`` against ``boundaries``: the number of
    boundaries at or below the value — 0..len(boundaries), computed as a
    codegen-friendly comparison chain. NULL rows take bucket 0."""
    c = F.col(col)
    e: Column = F.lit(0)
    for b in boundaries:
        e = e + F.when(c >= F.lit(b), 1).otherwise(0)
    return e.cast("bigint")


def interleave_expr(bucket_exprs: list[Column], bits: int) -> Column:
    """Morton code: interleave the low ``bits`` bits of each bucket
    column (column ``ci`` owns bit positions ``i * n + ci``).

    Built on BIGINT throughout — Spark's shiftleft on a 32-bit int takes
    the shift amount mod 32, so any position >= 31 would silently wrap
    onto another column's bits (or flip the sign) and scramble the
    clustering with no error. 64-bit arithmetic gives 62 safe positions;
    the guard makes an over-budget request loud instead of wrong."""
    n = len(bucket_exprs)
    if bits * n > 62:
        raise ValueError(
            f"z-order bit budget exceeded: {bits} bits x {n} columns"
            f" = {bits * n} interleaved bits > 62 (bigint, sign-safe);"
            " lower zorder_bits or drop columns"
        )
    z: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        for ci, b in enumerate(bucket_exprs):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + ci
                )
            )
    return z


def zorder_column(
    df: DataFrame, cols: list[str], est_rows: int = 0, bits: int = 6
) -> Column:
    """The Morton-code clustering column for ``cols`` over ``df``.

    Runs one boundary-sampling collect per column (bounded, see
    ``sampled_boundaries``) and returns a pure-JVM expression; callers
    range-partition + sort on it and drop it before writing. ``bits`` is
    auto-capped so the interleaved code fits 62 bigint bit positions
    (e.g. 6 columns cap at 10 bits/column = 1024 buckets each — still
    far more cells than files): file pruning only needs cell count >
    file count, so capping costs nothing while an overflow would
    silently destroy the layout."""
    if len(cols) < 2:
        raise ValueError(
            f"zorder needs >= 2 columns (got {cols!r}); use sort_by for one"
        )
    if len(cols) > 62:
        raise ValueError(f"zorder supports at most 62 columns, got {len(cols)}")
    bits = max(1, min(bits, 62 // len(cols)))
    bexprs = [
        bucket_expr(c, sampled_boundaries(df, c, 1 << bits))
        for c in cols
    ]
    return interleave_expr(bexprs, bits)
