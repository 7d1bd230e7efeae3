"""Property tests: vectorized smoothing kernels vs naive index-loop
transcriptions of the reference semantics (SignalPadding.cs:43-133,
MovingAverage.cs:50-298). Pure numpy — no Spark session.

The naive forms below are written as per-index loops straight from the C#
(including the Periodic right-pad quirk: ext[len-1-i] = signal[i], i.e. the
REVERSED first half-window), independent of the kernels' np.pad/cumsum/
correlate mechanics. Tolerance is 1e-9 absolute: cumsum-based windows and
direct means differ by ulps, and the goldens pin exact reference values.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from transcriptts.kernels import smoothing as S


def naive_pad(x: np.ndarray, window: int, mode: str, padded_value: float = 0.0) -> np.ndarray:
    half = window // 2
    n = len(x)
    if half == 0 or mode == "none":
        return x.copy()
    left = np.empty(half)
    right = np.empty(half)
    for j in range(half):
        if mode == "constant":
            left[j] = padded_value
            right[j] = padded_value
        elif mode == "mirror":
            left[j] = x[half - 1 - j]          # symmetric: edge repeats
            right[j] = x[n - 1 - j]
        elif mode == "nearest":
            left[j] = x[0]
            right[j] = x[n - 1]
        elif mode == "periodic":
            left[j] = x[n - half + j]          # wraps
            right[half - 1 - j] = x[j]         # ext[len-1-i] = signal[i]
    return np.concatenate([left, x, right])


def naive_sma(x: np.ndarray, window: int, mode: str, padded_value: float = 0.0) -> np.ndarray:
    n = len(x)
    ext = x if mode == "none" else naive_pad(x, window, mode, padded_value)
    out = np.array([ext[i : i + window].sum() / window for i in range(len(ext) - window + 1)])
    return out if mode == "none" else out[:n]


def naive_wma(x: np.ndarray, w: np.ndarray, mode: str, padded_value: float = 0.0) -> np.ndarray:
    n = len(x)
    ext = x if mode == "none" else naive_pad(x, len(w), mode, padded_value)
    out = np.array(
        [sum(ext[i + j] * w[j] for j in range(len(w))) / w.sum()
         for i in range(len(ext) - len(w) + 1)]
    )
    return out if mode == "none" else out[:n]


signals = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1, max_size=40
)


@settings(max_examples=120, deadline=None)
@given(
    values=signals,
    window=st.integers(min_value=1, max_value=9),
    mode=st.sampled_from(S.PAD_MODES),
    padded_value=st.sampled_from([0.0, -3.5]),
)
def test_sma_matches_naive(values, window, mode, padded_value):
    x = np.array(values)
    n, half = len(x), window // 2
    if mode == "none" and window > n:
        with pytest.raises(ValueError):
            S.sma(x, window, padding=mode)
        return
    if mode in ("mirror", "nearest", "periodic") and half > n:
        with pytest.raises(ValueError):
            S.sma(x, window, padding=mode, padded_value=padded_value)
        return
    got = S.sma(x, window, padding=mode, padded_value=padded_value)
    want = naive_sma(x, window, mode, padded_value)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-9, rtol=0)


@settings(max_examples=120, deadline=None)
@given(
    values=signals,
    weights=st.lists(
        st.floats(min_value=-5, max_value=5, allow_nan=False), min_size=1, max_size=7
    ),
    mode=st.sampled_from(S.PAD_MODES),
)
def test_wma_matches_naive(values, weights, mode):
    x = np.array(values)
    w = np.array(weights)
    if abs(w.sum()) < 1e-6:
        return  # weight-sum guard territory, golden-tested separately
    n, half = len(x), len(w) // 2
    if mode == "none" and len(w) > n:
        with pytest.raises(ValueError):
            S.wma(x, w, padding=mode)
        return
    if mode in ("mirror", "nearest", "periodic") and half > n:
        with pytest.raises(ValueError):
            S.wma(x, w, padding=mode)
        return
    got = S.wma(x, w, padding=mode)
    want = naive_wma(x, w, mode)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-8, rtol=1e-9)
