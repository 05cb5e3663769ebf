"""Property-based gates for the Iceberg pruning math (pure functions).

File pruning is only correct if the interval logic never prunes a file
that could match (false negatives lose rows silently — the worst failure
mode a scan can have). These properties pin:

- `_range_may_match` is conservative: if ANY value in [lo, hi] satisfies
  the predicate, the range must be kept (checked against brute force on
  integer ranges).
- bound truncation keeps bounds valid: truncate_lower(v) <= v and
  truncate_upper(v) >= v (or None), for arbitrary unicode strings and
  bytes — and truncated bounds stay conservative when substituted into
  the range check.
- single-value serialization round-trips (order-preserving encodings are
  what make byte bounds comparable at all).
"""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from ner_spark.iceberg.table import (
    _range_may_match,
    decode_single,
    encode_single,
    truncate_lower,
    truncate_upper,
)

OPS = ["=", "<", "<=", ">", ">="]
SMALL_INT = st.integers(min_value=-50, max_value=50)


def _holds(op, x, val):
    return {
        "=": x == val, "<": x < val, "<=": x <= val,
        ">": x > val, ">=": x >= val,
    }[op]


@given(
    lo=SMALL_INT, width=st.integers(min_value=0, max_value=20),
    val=SMALL_INT, op=st.sampled_from(OPS),
)
def test_range_may_match_is_conservative(lo, width, val, op):
    hi = lo + width
    any_match = any(_holds(op, x, val) for x in range(lo, hi + 1))
    keep = _range_may_match(op, val, lo, hi, None)
    if any_match:
        assert keep, (op, val, lo, hi)  # never prune a possible match


@given(val=SMALL_INT, op=st.sampled_from(OPS), lo=st.none() | SMALL_INT,
       hi=st.none() | SMALL_INT)
def test_range_missing_bounds_keep(val, op, lo, hi):
    # a missing bound is unknown: with BOTH missing the file must be kept
    assert _range_may_match(op, val, None, None, None)
    # and one-sided checks only use the side they have
    if lo is not None and hi is not None and lo > hi:
        return  # nonsensical range — not produced by the writer
    keep_full = _range_may_match(op, val, lo, hi, None)
    if lo is None and hi is None:
        assert keep_full


@given(s=st.text(max_size=64))
def test_string_truncation_bounds_stay_valid(s):
    lo = truncate_lower("string", s)
    hi = truncate_upper("string", s)
    assert lo <= s
    if hi is not None:
        assert hi >= s
    assert len(lo) <= 16
    if hi is not None:
        assert len(hi) <= 16
    # substituted into the range check, a file holding exactly {s} is
    # never pruned by its own truncated bounds
    for op, val in [("=", s), ("<=", s), (">=", s)]:
        assert _range_may_match(op, val, lo, hi if hi is not None else None,
                                None)


@given(b=st.binary(max_size=64))
def test_binary_truncation_bounds_stay_valid(b):
    lo = truncate_lower("binary", b)
    hi = truncate_upper("binary", b)
    assert lo <= b
    if hi is not None:
        assert hi >= b
    for op, val in [("=", b), ("<=", b), (">=", b)]:
        assert _range_may_match(op, val, lo, hi, None)


@given(v=st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_int_single_value_roundtrip_and_order(v):
    assert decode_single("int", encode_single("int", v)) == v


@given(
    a=st.integers(min_value=-(2**62), max_value=2**62),
    b=st.integers(min_value=-(2**62), max_value=2**62),
)
def test_long_roundtrip(a, b):
    assert decode_single("long", encode_single("long", a)) == a
    assert decode_single("long", encode_single("long", b)) == b


@given(s=st.text(max_size=32))
def test_string_roundtrip(s):
    assert decode_single("string", encode_single("string", s)) == s


@given(x=st.floats(allow_nan=False, width=64))
def test_double_roundtrip(x):
    assert decode_single("double", encode_single("double", x)) == x
