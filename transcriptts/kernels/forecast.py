"""Extrapolation kernels (numpy): SES, Holt double exponential smoothing,
linear trend — reference-parity layer.

Reference quirks reproduced (each golden-tested):
- SES: level starts at InitialLevel ?? signal[0], then the fold consumes
  EVERY point including signal[0] again
  (SimpleExponentialSmoothingExtrapolator.cs:36-53); forecast = constant
  last level (:63-71).
- Holt (HoltMethodExtrapolator.cs): L0 = InitialLevel ?? x[0]; T0 =
  InitialTrend ?? (x[1]-x[0]) additive / x[1]/L0 multiplicative (:639-709);
  the fit loop also includes t=0 (:118-148); updates (:419-493):
    additive:        L = a*x + (1-a)(L- + phi*T-);  T = b(L - L-) + (1-b)*phi*T-
    multiplicative:  L = a*x + (1-a)(L- * T-^phi);  T = b(L/L-) + (1-b)*T-^phi
  forecast (:540-614): additive L + (sum_{k=1..h} phi^k) T (phi≈1 → h);
  multiplicative L * T^(sum phi^k). Unset parameters are grid-searched over
  one-step-ahead SSE (default 10 steps/param, phi in [eps, 1-eps];
  :201-299); after search phi resets to 1.0 when DampTrend is false (:292).
- Linear (LinearExtrapolator.cs:53-124): OLS over the last WindowSize points
  (x = 0..w-1); zero denominator → slope 0, intercept mean; forecast is
  anchored at the LAST OBSERVED VALUE, not the fitted line:
  yhat(h) = x[n-1] + slope*h.
"""

from __future__ import annotations

import numpy as np

from ..constants import DEFAULT_EPSILON, STRICT_EPSILON


def ses(signal, horizon: int, alpha: float, initial_level: float | None = None) -> np.ndarray:
    """Simple exponential smoothing forecast (constant at the final level)."""
    x = np.asarray(signal, dtype=np.float64)
    if len(x) == 0:
        raise ValueError("signal cannot be empty")
    if not (0 < alpha <= 1):
        raise ValueError("alpha must be in (0, 1]")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    level = x[0] if initial_level is None else float(initial_level)
    for v in x:  # the fold includes x[0] even when level started from it
        level = alpha * v + (1 - alpha) * level
    return np.full(horizon, level)


class _HoltState:
    __slots__ = ("level", "trend")

    def __init__(self, level: float, trend: float):
        self.level = level
        self.trend = trend


def _holt_init(x, trend_type, initial_level, initial_trend, eps) -> _HoltState:
    level = x[0] if initial_level is None else float(initial_level)
    if trend_type == "multiplicative" and level <= eps:
        raise ValueError("Initial level must be strictly positive for multiplicative trend")
    if trend_type == "additive":
        trend = (x[1] - x[0]) if initial_trend is None else float(initial_trend)
    else:
        if initial_trend is not None:
            trend = float(initial_trend)
        else:
            if abs(level) < eps:
                raise ValueError("Initial level too close to zero for multiplicative trend")
            trend = x[1] / level
        if trend <= eps:
            raise ValueError("Initial multiplicative trend must be strictly positive")
    return _HoltState(level, trend)


def _holt_update(st: _HoltState, v: float, a: float, b: float, phi: float, trend_type: str, eps: float):
    pl, pt = st.level, st.trend
    if trend_type == "additive":
        comp = pl + phi * pt
        st.level = a * v + (1 - a) * comp
        st.trend = b * (st.level - pl) + (1 - b) * phi * pt
    else:
        if pl <= eps:
            raise ValueError("Multiplicative update failed: previous level non-positive")
        if pt <= eps and abs(phi) > eps:
            raise ValueError("Multiplicative update failed: previous trend non-positive")
        tp = pt**phi
        st.level = a * v + (1 - a) * (pl * tp)
        st.trend = b * (st.level / pl) + (1 - b) * tp


def _holt_one_step(st: _HoltState, phi: float, trend_type: str, eps: float) -> float:
    if trend_type == "additive":
        return st.level + phi * st.trend
    if st.level <= eps or (st.trend <= eps and abs(phi) > eps):
        raise ValueError("Cannot forecast: non-positive multiplicative state")
    return st.level * st.trend**phi


def _holt_sse(x, a, b, phi, trend_type, initial_level, initial_trend, eps) -> float:
    try:
        st = _holt_init(x, trend_type, initial_level, initial_trend, eps)
        sse = 0.0
        for v in x:
            err = v - _holt_one_step(st, phi, trend_type, eps)
            sse += err * err
            if not np.isfinite(sse):
                return np.inf
            _holt_update(st, v, a, b, phi, trend_type, eps)
        return sse
    except (ValueError, FloatingPointError, OverflowError):
        return np.inf


def _holt_sse_grid(x, a_vals, b_vals, p_vals, trend_type, initial_level, initial_trend, eps):
    """One-step-ahead SSE for EVERY (a, b, phi) combination at once: the state
    recursion runs over t with the three parameter axes broadcast, replacing
    the reference's triple parameter loop around a per-combo Python fold
    (HoltMethodExtrapolator.cs:201-299) with len(x) vectorized steps.

    Expression order inside each step is identical to _holt_sse / _holt_update
    per element, so every ADDITIVE grid cell's SSE is bit-equal to the scalar
    fold's (this is what the holt_opt oracle replays). Multiplicative cells
    agree to ~1 ulp: numpy's array `**` may route through a SIMD libm whose
    rounding differs from the scalar pow. The scalar guards (multiplicative
    non-positive level/trend raises, the mid-loop non-finite check) become
    masks: a cell that would have raised or gone non-finite freezes at +inf.
    Returns shape (len(a), len(b), len(p)).
    """
    A = np.asarray(a_vals)[:, None, None]
    B = np.asarray(b_vals)[None, :, None]
    P = np.asarray(p_vals)[None, None, :]
    shape = np.broadcast_shapes(A.shape, B.shape, P.shape)
    try:
        st0 = _holt_init(x, trend_type, initial_level, initial_trend, eps)
    except (ValueError, FloatingPointError, OverflowError):
        return np.full(shape, np.inf)
    L = np.full(shape, st0.level)
    T = np.full(shape, st0.trend)
    sse = np.zeros(shape)
    valid = np.ones(shape, dtype=bool)
    with np.errstate(over="ignore", invalid="ignore", divide="ignore"):
        if trend_type == "additive":
            for v in x:
                comp = L + P * T
                err = v - comp
                sse = sse + err * err
                Ln = A * v + (1 - A) * comp
                T = B * (Ln - L) + (1 - B) * (P * T)
                L = Ln
            return np.where(np.isfinite(sse), sse, np.inf)
        for v in x:
            ok = valid & (L > eps) & ((T > eps) | (np.abs(P) <= eps))
            sse = np.where(valid & ~ok, np.inf, sse)
            valid = ok
            Tp = np.where(valid, T, 1.0) ** np.where(valid, P, 1.0)
            err = v - L * Tp
            sse = np.where(valid, sse + err * err, sse)
            nf = valid & ~np.isfinite(sse)
            sse = np.where(nf, np.inf, sse)
            valid &= ~nf
            Lp = L
            L = np.where(valid, A * v + (1 - A) * (Lp * Tp), L)
            T = np.where(valid, B * (L / np.where(valid, Lp, 1.0)) + (1 - B) * Tp, T)
    return np.where(np.isfinite(sse), sse, np.inf)


def holt(
    signal,
    horizon: int,
    alpha: float | None = None,
    beta: float | None = None,
    trend_type: str = "additive",
    damp_trend: bool = False,
    phi: float | None = None,
    initial_level: float | None = None,
    initial_trend: float | None = None,
    optimization_grid_steps: int = 10,
) -> np.ndarray:
    """Holt's linear/damped/multiplicative trend forecast."""
    if trend_type not in ("additive", "multiplicative"):
        raise ValueError("trend_type must be 'additive' or 'multiplicative'")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    x = np.asarray(signal, dtype=np.float64)
    if len(x) < 2:
        raise ValueError("Holt's method requires at least 2 data points")
    eps = DEFAULT_EPSILON
    if trend_type == "multiplicative" and (x <= eps).any():
        raise ValueError("Multiplicative trend requires strictly positive signal values")

    opt_a, opt_b = alpha is None, beta is None
    opt_p = damp_trend and phi is None
    if opt_a or opt_b or opt_p:
        steps = max(2, optimization_grid_steps)
        grid = np.clip(np.arange(steps) / (steps - 1), 0.0, 1.0)
        a_vals = grid if opt_a else np.array([alpha])
        b_vals = grid if opt_b else np.array([beta])
        geps = STRICT_EPSILON
        if opt_p:
            pstep = (1.0 - 2 * geps) / max(1, steps - 1)
            p_vals = np.clip(geps + np.arange(steps) * pstep, geps, 1.0 - geps)
        else:
            p_vals = np.array([phi if damp_trend else 1.0])
        sse = _holt_sse_grid(x, a_vals, b_vals, p_vals, trend_type, initial_level, initial_trend, eps)
        # np.argmin returns the FIRST flat-index minimum, i.e. the first
        # strict-'<' winner in (a, b, phi) loop-nesting order — the
        # reference's selection exactly
        flat = int(np.argmin(sse))
        if not np.isfinite(sse.flat[flat]):
            raise ValueError("Parameter optimization failed to find valid parameters")
        ia, ib, ip = np.unravel_index(flat, sse.shape)
        ea, eb, ep = float(a_vals[ia]), float(b_vals[ib]), float(p_vals[ip])
        if not damp_trend:
            ep = 1.0
    else:
        ea, eb = float(alpha), float(beta)
        ep = float(phi) if damp_trend else 1.0

    st = _holt_init(x, trend_type, initial_level, initial_trend, eps)
    for v in x:
        _holt_update(st, v, ea, eb, ep, trend_type, eps)

    out = np.empty(horizon)
    phi_sum = 0.0
    for h in range(1, horizon + 1):
        phi_sum = float(h) if abs(ep - 1.0) <= eps else phi_sum + ep**h
        if trend_type == "additive":
            out[h - 1] = st.level + phi_sum * st.trend
        else:
            if st.level <= eps or (st.trend <= eps and abs(phi_sum) > eps):
                raise ValueError("Cannot extrapolate: non-positive multiplicative state")
            out[h - 1] = st.level * st.trend**phi_sum
    return out


def linear(signal, horizon: int, window_size: int | None = None) -> np.ndarray:
    """OLS line over the last window; forecast anchored at the last value."""
    x = np.asarray(signal, dtype=np.float64)
    n = len(x)
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    w = min(window_size if window_size is not None else n, n)
    if w < 2:
        raise ValueError("Cannot fit linear trend with less than 2 data points")
    seg = x[n - w :]
    xi = np.arange(w, dtype=np.float64)
    sum_x, sum_y = xi.sum(), seg.sum()
    sum_xy, sum_x2 = (xi * seg).sum(), (xi * xi).sum()
    denom = w * sum_x2 - sum_x * sum_x
    slope = 0.0 if abs(denom) < DEFAULT_EPSILON else (w * sum_xy - sum_x * sum_y) / denom
    return x[-1] + slope * np.arange(1, horizon + 1)
