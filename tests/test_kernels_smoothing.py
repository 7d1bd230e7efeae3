"""Golden parity tests for smoothing kernels — expectations ported from
SignalSharp.Tests/Smoothing/* (no Spark; pure numpy)."""

from __future__ import annotations

import numpy as np
import pytest

from transcriptts.kernels import smoothing as K

EPS = 1e-9


def eq(a, b, eps=EPS):
    np.testing.assert_allclose(np.asarray(a, dtype=float), np.asarray(b, dtype=float), atol=eps, rtol=0)


# --- SMA (MovingAverageTests.cs) -------------------------------------------


def test_sma_valid():
    eq(K.sma([1, 2, 3, 4, 5], 3), [2, 3, 4])  # MovingAverageTests.cs:9-18


def test_sma_window_equals_length():
    eq(K.sma([1, 2, 3, 4, 5], 5), [3.0])


def test_sma_rejects_window_gt_signal_when_no_padding():
    with pytest.raises(ValueError):
        K.sma([1, 2, 3], 4)


def test_sma_constant_padding_same_length():
    # padded with 0 each side (half=1): windows over [0,1,2,3,4,5,0]
    eq(K.sma([1, 2, 3, 4, 5], 3, padding="constant"), [1.0, 2.0, 3.0, 4.0, 3.0])


def test_sma_even_window_truncates_to_input_length():
    out = K.sma([1, 2, 3, 4], 2, padding="nearest")
    assert len(out) == 4
    eq(out, [1.0, 1.5, 2.5, 3.5])  # ext=[1,1,2,3,4,4]; first 4 windows


# --- EMA ---------------------------------------------------------------------


def test_ema_golden():
    eq(K.ema([1, 2, 3, 4, 5], 0.5), [1, 1.5, 2.25, 3.125, 4.0625])  # :51-60


def test_ema_alpha_validation():
    for bad in (0.0, -0.1, 1.1):
        with pytest.raises(ValueError):
            K.ema([1.0], bad)


def test_ema_matches_pandas_ewm():
    rng = np.random.default_rng(1)
    x = rng.normal(size=200)
    import pandas as pd

    eq(K.ema(x, 0.3), pd.Series(x).ewm(alpha=0.3, adjust=False).mean().to_numpy(), eps=1e-12)


# --- WMA ---------------------------------------------------------------------


def test_wma_valid():
    eq(K.wma([1, 2, 3, 4, 5], [0.1, 0.3, 0.6]), [2.5, 3.5, 4.5])  # :86-94


def test_wma_constant_padded():
    # documented example MovingAverage.cs:216-224
    eq(K.wma([1, 2, 3, 4, 5], [0.1, 0.3, 0.6], padding="constant"), [1.5, 2.5, 3.5, 4.5, 1.9])


def test_wma_zero_weight_sum_raises():
    with pytest.raises(ValueError):
        K.wma([1, 2, 3], [1.0, -1.0])


# --- padding semantics (SignalPadding.cs:99-133) -----------------------------


def test_padding_modes():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    eq(K.apply_padding(x, 4, "constant", 9.0), [9, 9, 1, 2, 3, 4, 9, 9])
    # mirror == symmetric: left [s[h-1..0]] = [2,1], right [s[n-1..n-h]] = [4,3]
    eq(K.apply_padding(x, 4, "mirror"), [2, 1, 1, 2, 3, 4, 4, 3])
    eq(K.apply_padding(x, 4, "nearest"), [1, 1, 1, 2, 3, 4, 4, 4])
    # periodic quirk: left wraps [3,4]; right is REVERSED first half [2,1]
    eq(K.apply_padding(x, 4, "periodic"), [3, 4, 1, 2, 3, 4, 2, 1])


def test_trim_padding_roundtrip():
    x = np.arange(6, dtype=float)
    for mode in ("constant", "mirror", "nearest", "periodic"):
        ext = K.apply_padding(x, 5, mode)
        eq(K.trim_padding(ext, 6, 5), x)


# --- Savitzky-Golay (SavitzkyGolayFilterTests.cs) ----------------------------


def test_savgol_short_input_passthrough():
    x = [1.0, 2.0, 3.0, 4.0, 5.0]
    eq(K.savgol(x, 3, 1), x)  # n=5 < 2*3+1 → unchanged (:9-19, quirk :112-113)


def test_savgol_constant_signal_unchanged():
    eq(K.savgol([3.0] * 9, 3, 1), [3.0] * 9)  # :109-119


def test_savgol_linear_signal_unchanged():
    x = np.arange(1.0, 8.0)
    eq(K.savgol(x, 3, 1), x)  # :123-133


def test_savgol_golden_middle_restore():
    # SavitzkyGolayFilterTests.cs:51-62 — middle = input, edges poly-fitted
    x = np.array([2, 2.5, 3.4, 2.7, 2.6, 5.4, 6.2, 7.2, 4.2, 3.5, 3.25, 2.0])
    out = K.savgol(x, 5, 2)
    expected = [1.96, 2.7, 3.4, 2.7, 2.6, 5.4, 6.2, 7.2, 4.2, 3.5, 2.61, 2.32]
    eq(out, expected, eps=1e-2)
    eq(out[2:-2], x[2:-2], eps=1e-12)  # middle restored exactly


def test_savgol_validations():
    with pytest.raises(ValueError):
        K.savgol(np.zeros(20), 3, 3)  # poly >= window
    with pytest.raises(ValueError):
        K.savgol(np.zeros(20), 5, 2, derivative_order=3)  # deriv > poly
