"""Roundtrip property tests for Gorilla XOR / delta-of-delta kernels
(FIXTURES.md B.7)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from transcriptts.kernels.gorilla import (
    decode_floats,
    decode_timestamps,
    encode_floats,
    encode_timestamps,
)


def roundtrip_f(values):
    out = decode_floats(encode_floats(values))
    np.testing.assert_array_equal(
        np.asarray(values, dtype=np.float64).view(np.uint64), out.view(np.uint64)
    )
    return out


def test_float_roundtrip_basics():
    roundtrip_f([])
    roundtrip_f([1.5])
    roundtrip_f([3.0] * 50)  # constant → 1 bit/point after the first
    roundtrip_f([1, 2, 3, 4, 5, 6])  # the B.1 fixture vector
    roundtrip_f([2, 2.5, 3.4, 2.7, 2.6, 5.4, 6.2, 7.2, 4.2, 3.5, 3.25, 2])  # B.2
    roundtrip_f([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-308, 1e308])


def test_float_constant_series_compresses_hard():
    enc = encode_floats(np.full(1000, 42.5))
    assert len(enc) < 1000 * 8 / 40  # >40x on constant data
    smooth = 100 + np.cumsum(np.full(1000, 0.01))
    assert len(encode_floats(smooth)) < 1000 * 8  # better than raw


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(allow_nan=False, width=64), max_size=80))
def test_float_roundtrip_property(vals):
    roundtrip_f(vals)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=60
    )
)
def test_timestamp_roundtrip_property(ts):
    out = decode_timestamps(encode_timestamps(ts))
    np.testing.assert_array_equal(np.asarray(ts, dtype=np.int64), out)


def test_timestamp_regular_cadence_compresses_hard():
    base = 1_735_689_600_000_000
    ts = base + np.arange(10000, dtype=np.int64) * 1_000_000  # 1s metronome
    enc = encode_timestamps(ts)
    assert len(enc) < 10000 * 8 / 50  # dod == 0 → 1 bit/point


def test_timestamp_mixed_gaps():
    rng = np.random.default_rng(9)
    gaps = np.where(rng.random(500) < 0.8, rng.integers(1_000_000, 30_000_000, 500),
                    rng.integers(120_000_000, 2_400_000_000, 500))
    ts = np.cumsum(gaps).astype(np.int64)
    out = decode_timestamps(encode_timestamps(ts))
    np.testing.assert_array_equal(ts, out)
    assert len(encode_timestamps(ts)) < 500 * 8  # still beats raw int64
