"""Iceberg partition transforms — the *hidden partitioning* half of the
table format (spec §Partitioning + Appendix B).

A partition spec field is ``(source column, transform)``; the table
layout is derived data (``ts_day=18263/conv_id_bucket=3/``) that queries
never mention — predicates on the SOURCE column prune partitions because
the planner applies the same transform to the predicate's constants.
That is what keeps a 10^12-turn transcript table scannable: an
incremental KG tick filtering ``ts >= yesterday`` touches one day
partition out of thousands, and an entity-repair touching one
conversation reads 1/N of the data via ``bucket(N, conv_id)``, all
decided from manifest metadata before any file opens.

Supported transforms (names + semantics per the public Iceberg spec):

- ``identity``
- ``bucket[N]`` — ``(murmur3_x86_32(encode(v)) & Integer.MAX_VALUE) % N``
  with the spec's encodings (int/long/date/timestamp hashed as the
  8-byte little-endian long; string as UTF-8 bytes) so bucket ids are
  bit-identical to any real Iceberg writer's. Known-answer values from
  the spec's Appendix B are pinned in tests.
- ``truncate[W]`` — int/long: ``v - (v % W)`` (floored mod, so
  ``-1 % 10 → -10``); string: first ``W`` codepoints.
- ``year`` / ``month`` / ``day`` / ``hour`` — ordinals since the epoch
  (1970-01-01 UTC), computed on the wire units (micros for timestamps,
  days for dates) with floor division so pre-epoch values land in the
  correct negative ordinal.

Two implementations of murmur3 live here on purpose: a pure-python one
(the planner's constant-folding path and the test oracle) and a
vectorized numpy one (the write path's pandas-UDF body — no per-row
python). They are differentially tested against each other and against
the spec's published hash values.
"""
from __future__ import annotations

import datetime as _dt
import re
import struct

import numpy as np

_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF

MICROS_PER_DAY = 86_400_000_000
MICROS_PER_HOUR = 3_600_000_000


# ------------------------------------------------------------- murmur3
def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 → signed int32 (the JVM's return type, which the
    bucket transform masks with ``& Integer.MAX_VALUE``)."""
    h = seed & _M32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[nblocks * 4 :]
    k = 0
    if len(tail) == 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def murmur3_32_numpy(buf: np.ndarray, lengths: np.ndarray, seed: int = 0):
    """Vectorized murmur3_x86_32 over ``rows`` byte strings.

    ``buf``: uint8 array of shape (rows, padded_width) — each row's first
    ``lengths[i]`` bytes are the payload, the rest is padding (content
    irrelevant; it is masked out). ``padded_width`` must be ≥
    ``lengths.max() + 3`` so tail gathers never index out of bounds.
    Returns signed int32 hashes. The per-block mix loop runs
    ``max(lengths)//4`` times — vectorized over rows, so cost is
    O(rows × max_len / 4) numpy ops, never per-row python.
    """
    rows = buf.shape[0]
    lengths = lengths.astype(np.int64)
    h = np.full(rows, seed, dtype=np.uint32)
    nblocks = lengths // 4
    max_blocks = int(nblocks.max()) if rows else 0
    u32 = buf.astype(np.uint32)
    for j in range(max_blocks):
        b = j * 4
        k = (
            u32[:, b]
            | (u32[:, b + 1] << 8)
            | (u32[:, b + 2] << 16)
            | (u32[:, b + 3] << 24)
        )
        k = k * np.uint32(_C1)
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k = k * np.uint32(_C2)
        hm = h ^ k
        hm = (hm << np.uint32(13)) | (hm >> np.uint32(19))
        hm = hm * np.uint32(5) + np.uint32(0xE6546B64)
        active = j < nblocks
        h = np.where(active, hm, h)
    rem = (lengths % 4).astype(np.int64)
    tail_start = nblocks * 4
    if rows and rem.any():
        idx = np.arange(rows)
        k = np.zeros(rows, dtype=np.uint32)
        t0 = buf[idx, np.minimum(tail_start, buf.shape[1] - 1)].astype(np.uint32)
        t1 = buf[idx, np.minimum(tail_start + 1, buf.shape[1] - 1)].astype(
            np.uint32
        )
        t2 = buf[idx, np.minimum(tail_start + 2, buf.shape[1] - 1)].astype(
            np.uint32
        )
        k = np.where(rem == 3, k ^ (t2 << np.uint32(16)), k)
        k = np.where(rem >= 2, k ^ (t1 << np.uint32(8)), k)
        k = np.where(rem >= 1, k ^ t0, k)
        k = k * np.uint32(_C1)
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k = k * np.uint32(_C2)
        h = np.where(rem > 0, h ^ k, h)
    h = h ^ lengths.astype(np.uint32)
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> np.uint32(16))
    return h.view(np.int32)


def bucket_longs_numpy(vals: np.ndarray, n: int) -> np.ndarray:
    """bucket[n] over an int64 array (spec: hash the 8-byte little-endian
    long). NaN-free input; caller handles nulls."""
    buf = np.ascontiguousarray(vals.astype("<i8")).view(np.uint8).reshape(-1, 8)
    # widen so tail gathers (unused here: 8 % 4 == 0) stay in bounds
    buf = np.pad(buf, ((0, 0), (0, 3)))
    lengths = np.full(len(vals), 8, dtype=np.int64)
    h = murmur3_32_numpy(buf, lengths).astype(np.int64)
    return (h & 0x7FFFFFFF) % n


def bucket_strings_numpy(vals: list, n: int) -> np.ndarray:
    """bucket[n] over UTF-8 strings, vectorized: one encode pass builds a
    padded (rows × maxlen+3) byte matrix, then the numpy murmur3 runs
    max_len/4 vectorized block rounds. Null entries (None) → -1
    (caller re-masks)."""
    enc = [v.encode("utf-8") if v is not None else b"" for v in vals]
    lengths = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
    width = int(lengths.max()) + 3 if len(enc) else 3
    buf = np.zeros((len(enc), width), dtype=np.uint8)
    for i, b in enumerate(enc):  # bounded by batch size; C-level memcpy per row
        if b:
            buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = murmur3_32_numpy(buf, lengths).astype(np.int64)
    out = (h & 0x7FFFFFFF) % n
    return np.where([v is None for v in vals], -1, out)


# ----------------------------------------------------------- transforms
_BUCKET = re.compile(r"^bucket\[(\d+)\]$")
_TRUNC = re.compile(r"^truncate\[(\d+)\]$")
# accepted in partition_by: "col", "day(col)", "days(col)",
# "bucket(16, col)", "truncate(4, col)", "hours(col)", ...
_CALL = re.compile(r"^\s*(\w+)\s*\(\s*(?:(\d+)\s*,\s*)?(\w+)\s*\)\s*$")
_UNARY = {
    "year": "year", "years": "year",
    "month": "month", "months": "month",
    "day": "day", "days": "day",
    "hour": "hour", "hours": "hour",
    "identity": "identity",
}


def parse_partition_field(expr: str) -> tuple[str, str]:
    """``partition_by`` entry → (source column, canonical transform).

    ``"conv_id"`` → identity; ``"days(ts)"`` → ``day``;
    ``"bucket(16, conv_id)"`` → ``bucket[16]``;
    ``"truncate(4, sku)"`` → ``truncate[4]``.
    """
    m = _CALL.match(expr)
    if not m:
        return expr.strip(), "identity"
    fn, arg, col = m.group(1).lower(), m.group(2), m.group(3)
    if fn in _UNARY:
        if arg is not None:
            raise ValueError(f"{fn}() takes no width: {expr!r}")
        return col, _UNARY[fn]
    if fn == "bucket":
        if not arg or int(arg) <= 0:
            raise ValueError(f"bucket needs N ≥ 1: {expr!r}")
        return col, f"bucket[{int(arg)}]"
    if fn == "truncate":
        if not arg or int(arg) <= 0:
            raise ValueError(f"truncate needs W ≥ 1: {expr!r}")
        return col, f"truncate[{int(arg)}]"
    raise ValueError(f"unknown partition transform {expr!r}")


def default_field_name(source: str, transform: str) -> str:
    """Iceberg's default partition field names: ``ts_day``,
    ``conv_id_bucket``, ``sku_trunc`` — or the column itself for
    identity."""
    if transform == "identity":
        return source
    if _BUCKET.match(transform):
        return f"{source}_bucket"
    if _TRUNC.match(transform):
        return f"{source}_trunc"
    return f"{source}_{transform}"


_TEMPORAL_RESULT = {"year": "int", "month": "int", "day": "int", "hour": "int"}


def result_type(transform: str, source_type: str) -> str:
    """Iceberg type of the partition field a transform produces."""
    if transform == "identity":
        return source_type
    if _BUCKET.match(transform):
        return "int"
    if transform in _TEMPORAL_RESULT:
        _check_temporal(transform, source_type)
        return "int"
    m = _TRUNC.match(transform)
    if m:
        if source_type not in ("int", "long", "string"):
            raise NotImplementedError(
                f"truncate over {source_type!r} not supported"
            )
        return source_type
    raise ValueError(f"unknown transform {transform!r}")


def _check_temporal(transform: str, source_type: str) -> None:
    ok = ("timestamp", "timestamptz", "date")
    if source_type not in ok or (source_type == "date" and transform == "hour"):
        raise NotImplementedError(f"{transform} over {source_type!r}")


def _bucket_encode(source_type: str, v) -> bytes:
    if source_type in ("int", "long", "date", "timestamp", "timestamptz", "time"):
        return struct.pack("<q", int(v))
    if source_type == "string":
        return v.encode("utf-8")
    if source_type == "binary":
        return bytes(v)
    raise NotImplementedError(f"bucket over {source_type!r} not supported")


def _ym(source_type: str, v) -> tuple[int, int]:
    """(year, month) in UTC from the wire value (micros or epoch days)."""
    if source_type == "date":
        d = _dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))
        return d.year, d.month
    t = _EPOCH + _dt.timedelta(microseconds=int(v))
    return t.year, t.month


def apply_transform(transform: str, source_type: str, v):
    """Planner-side transform of a single value in WIRE units (timestamps
    as epoch micros, dates as epoch days — the same normalization
    ``scan()`` applies to predicate constants). Returns None for None —
    every transform in the spec is null-preserving."""
    if v is None:
        return None
    if transform == "identity":
        return v
    m = _BUCKET.match(transform)
    if m:
        h = murmur3_32(_bucket_encode(source_type, v))
        return (h & 0x7FFFFFFF) % int(m.group(1))
    m = _TRUNC.match(transform)
    if m:
        w = int(m.group(1))
        if source_type in ("int", "long"):
            return int(v) - (int(v) % w)  # python % floors → spec semantics
        if source_type == "string":
            return v[:w]
        raise NotImplementedError(f"truncate over {source_type!r}")
    _check_temporal(transform, source_type)
    if transform == "day":
        return int(v) if source_type == "date" else int(v) // MICROS_PER_DAY
    if transform == "hour":
        return int(v) // MICROS_PER_HOUR
    y, mo = _ym(source_type, v)
    if transform == "month":
        return (y - 1970) * 12 + (mo - 1)
    if transform == "year":
        return y - 1970
    raise ValueError(f"unknown transform {transform!r}")


def is_order_preserving(transform: str) -> bool:
    """Order-preserving transforms admit range pruning (v <= c implies
    T(v) <= T(c)); bucket admits only equality."""
    return transform == "identity" or bool(_TRUNC.match(transform)) or (
        transform in _TEMPORAL_RESULT
    )


# ------------------------------------------------------ spark write side
def spark_partition_column(transform: str, source: str, source_type: str):
    """The derived Column that materializes a transform for
    ``partitionBy`` on the write path — built-in expressions where Spark
    has them (temporal / truncate: whole-stage codegen), a vectorized
    pandas UDF for bucket (Arrow-batched numpy murmur3, no per-row
    python). Session timezone must be UTC (ner_spark.session pins it) so
    ``year()/month()`` agree with the planner's UTC math.
    """
    from pyspark.sql import functions as F

    c = F.col(source)
    if transform == "identity":
        return c
    m = _TRUNC.match(transform)
    if m:
        w = int(m.group(1))
        if source_type in ("int", "long"):
            return (c - F.pmod(c, F.lit(w))).cast(
                "int" if source_type == "int" else "long"
            )
        return F.substring(c, 1, w)
    if transform in _TEMPORAL_RESULT:
        _check_temporal(transform, source_type)
        if source_type == "date":
            if transform == "day":
                return F.datediff(c, F.to_date(F.lit("1970-01-01")))
            if transform == "month":
                return ((F.year(c) - 1970) * 12 + F.month(c) - 1).cast("int")
            return (F.year(c) - 1970).cast("int")
        # unix_micros wants TIMESTAMP; an NTZ source casts losslessly
        # because the session timezone is pinned to UTC
        micros = F.unix_micros(c.cast("timestamp"))
        if transform == "day":
            d = F.lit(MICROS_PER_DAY)
        elif transform == "hour":
            d = F.lit(MICROS_PER_HOUR)
        else:
            if transform == "month":
                return ((F.year(c) - 1970) * 12 + F.month(c) - 1).cast("int")
            return (F.year(c) - 1970).cast("int")
        # floor division via floored mod: exact in long arithmetic
        return ((micros - F.pmod(micros, d)) / d).cast("int")
    m = _BUCKET.match(transform)
    if m:
        n = int(m.group(1))
        if source_type in ("int", "long", "date", "timestamp", "timestamptz"):
            # Arrow hands a NULLABLE long to pandas as float64 — lossy
            # above 2^53 — so nulls are coalesced away JVM-side (the UDF
            # sees exact int64) and restored by the outer ``when``.
            longs = (
                F.unix_micros(c.cast("timestamp"))
                if source_type in ("timestamp", "timestamptz")
                else c.cast("long")
            )

            @F.pandas_udf("int")
            def _bucket_long(s):
                import pandas as pd

                return pd.Series(
                    bucket_longs_numpy(s.to_numpy(dtype=np.int64), n)
                )

            return F.when(
                c.isNotNull(), _bucket_long(F.coalesce(longs, F.lit(0)))
            )
        if source_type == "string":

            @F.pandas_udf("int")
            def _bucket_str(s):
                import pandas as pd

                vals = [None if v is None else str(v) for v in s]
                b = bucket_strings_numpy(vals, n)
                return pd.Series(
                    [None if v is None else int(x) for v, x in zip(vals, b)]
                )

            return _bucket_str(c)
        raise NotImplementedError(f"bucket over {source_type!r}")
    raise ValueError(f"unknown transform {transform!r}")
