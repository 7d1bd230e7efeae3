"""Golden tests for forecasting kernels — expectations from
SignalSharp.Tests/Extrapolation/*."""

from __future__ import annotations

import numpy as np
import pytest

from transcriptts.kernels.forecast import holt, linear, ses


def eq(a, b, eps=1e-9):
    np.testing.assert_allclose(np.asarray(a, float), np.asarray(b, float), atol=eps, rtol=0)


# --- SES (SimpleExponentialSmoothingExtrapolatorTests.cs) --------------------


def test_ses_golden():
    # SimpleExponentialSmoothingExtrapolatorTests.cs:91-105 — alpha=0.2,
    # L0=x[0]=10 then the fold consumes x[0] again → 11.32
    eq(ses([10, 12, 15], 3, alpha=0.2), [11.32] * 3)


def test_ses_initial_level():
    eq(ses([10, 12, 15], 1, alpha=0.2, initial_level=8.0), [10.296])  # :108-122


def test_ses_single_point():
    eq(ses([10.0], 2, alpha=0.5), [10.0, 10.0])  # :60-75
    eq(ses([10.0], 1, alpha=0.5, initial_level=5.0), [7.5])  # :79-87


def test_ses_validation():
    with pytest.raises(ValueError):
        ses([], 1, alpha=0.5)
    with pytest.raises(ValueError):
        ses([1.0], 0, alpha=0.5)
    with pytest.raises(ValueError):
        ses([1.0], 1, alpha=1.5)


# --- Holt (HoltMethodExtrapolatorTests.cs) -----------------------------------


def test_holt_additive_golden():
    # :166-183 — [1,2,3,4], alpha=beta=0.5, L0=1, T0=1, fit includes t=0
    eq(holt([1, 2, 3, 4], 2, alpha=0.5, beta=0.5), [4.64453125, 5.46875])


def test_holt_damped_golden():
    # :186-211 — hand-derived damped example
    eq(
        holt([11.5, 12, 12.8, 13.5], 1, alpha=0.2, beta=0.3, damp_trend=True,
             phi=0.9, initial_level=10.0, initial_trend=1.0),
        [14.0385570389],
        eps=1e-9,
    )


def test_holt_multiplicative_golden():
    # :214-226 — [10,12,15,18], alpha=0.4, beta=0.6
    eq(holt([10, 12, 15, 18], 1, alpha=0.4, beta=0.6, trend_type="multiplicative"),
       [20.1240675210], eps=1e-9)


def test_holt_grid_search_runs():
    x = np.arange(1.0, 21.0) + np.sin(np.arange(20)) * 0.3
    f = holt(x, 3)  # alpha/beta optimized
    assert np.all(np.diff(f) > 0)  # upward trend extrapolated
    assert f[0] > x[-1] - 2


def test_holt_validation():
    with pytest.raises(ValueError):
        holt([1.0], 1, alpha=0.5, beta=0.5)
    with pytest.raises(ValueError):
        holt([1, -2, 3], 1, alpha=0.5, beta=0.5, trend_type="multiplicative")


# --- Linear (LinearExtrapolator.cs quirks) -----------------------------------


def test_linear_anchored_at_last_value():
    # perfect line y=2x+1 over 5 pts: slope 2, last value 9 → 11, 13, 15
    eq(linear([1, 3, 5, 7, 9], 3), [11, 13, 15])


def test_linear_anchor_quirk_offset_point():
    # last value off the fitted line: forecast still starts from it
    x = [0.0, 1.0, 2.0, 3.0, 10.0]  # OLS slope over all 5 points
    xi = np.arange(5.0)
    slope = np.polyfit(xi, x, 1)[0]
    eq(linear(x, 2), [10 + slope, 10 + 2 * slope])


def test_linear_constant_signal_zero_slope():
    eq(linear([4.0, 4.0, 4.0], 2), [4.0, 4.0])


def test_linear_window():
    # window of last 2 points [7,9] → slope 2 regardless of earlier junk
    eq(linear([100, -50, 7, 9], 2, window_size=2), [11, 13])


def test_linear_validation():
    with pytest.raises(ValueError):
        linear([1.0], 1)


def test_holt_grid_vectorized_matches_scalar_fold():
    """The broadcast SSE grid is bit-equal to the per-combo scalar fold for
    additive trend (the oracle replays this), <=1e-9 rel for multiplicative
    (numpy SIMD pow vs scalar pow)."""
    from transcriptts.kernels.forecast import _holt_sse, _holt_sse_grid

    rng = np.random.default_rng(11)
    a_vals = np.linspace(0, 1, 10)
    b_vals = np.linspace(0, 1, 10)
    p_vals = np.array([1.0])
    for trend in ("additive", "multiplicative"):
        x = np.abs(rng.normal(size=25)) + 0.1 if trend == "multiplicative" else rng.normal(size=25)
        grid = _holt_sse_grid(x, a_vals, b_vals, p_vals, trend, None, None, 1e-10)
        for ia in (0, 3, 9):
            for ib in (0, 5, 9):
                ref = _holt_sse(x, a_vals[ia], b_vals[ib], 1.0, trend, None, None, 1e-10)
                got = grid[ia, ib, 0]
                if np.isinf(ref) or np.isinf(got):
                    assert np.isinf(ref) == np.isinf(got)
                elif trend == "additive":
                    assert ref == got
                else:
                    assert abs(ref - got) <= 1e-9 * max(1.0, abs(ref))
