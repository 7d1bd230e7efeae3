"""Sliding-window smoothing kernels (numpy), reference-parity layer.

Each function reproduces the observable semantics of the reference's
smoothing operators, including boundary quirks that golden tests exercise:

- padding modes (SignalSharp/Common/SignalPadding.cs:43-133). NOTE the
  verified loop semantics: Mirror == numpy 'symmetric' (edge value repeats),
  Nearest == 'edge', Constant == 'constant', and Periodic wraps on the left
  but emits the REVERSED first half-window on the right (SignalPadding.cs:
  126-133: ext[len-1-i] = signal[i]) — replicated literally;
- SMA/WMA 'valid' vs same-length padded output (MovingAverage.cs:50-126,
  :235-298), weight-sum guard 1e-10 (:244);
- EMA recursion ema[t] = a*x[t] + (1-a)*ema[t-1], ema[0] = x[0]
  (MovingAverage.cs:155-174);
- Savitzky-Golay (SavitzkyGolayFilter.cs:96-134) with its quirks: input
  shorter than 2*window+1 returned unchanged (:112-113); kernel solved from
  normal equations of the w x (p+1) Vandermonde — so the convolution kernel
  has length p+1, not w (:143-219); edge-clamped convolution (:228-251);
  polynomial re-fit of both edges on the ORIGINAL input (:260-311); middle
  section restored to the original input when derivativeOrder == 0
  (:320-329). scipy.signal.savgol_filter does none of this — hence a
  hand-rolled kernel.
"""

from __future__ import annotations

import math

import numpy as np

from ..constants import WEIGHT_SUM_EPSILON

PAD_MODES = ("none", "constant", "mirror", "nearest", "periodic")


def apply_padding(
    signal: np.ndarray, window_size: int, padding: str, padded_value: float = 0.0
) -> np.ndarray:
    """SignalPadding.ApplyPadding — extend by window_size//2 on each side."""
    x = np.asarray(signal, dtype=np.float64)
    if padding == "none":
        return x
    if padding not in PAD_MODES:
        raise ValueError(f"unknown padding mode {padding!r}")
    half = window_size // 2
    n = len(x)
    if half == 0:
        return x.copy()
    if padding == "constant":
        return np.pad(x, half, mode="constant", constant_values=padded_value)
    if half > n:
        # C# loops would index out of range for mirror/nearest/periodic
        raise ValueError(f"half window {half} exceeds signal length {n}")
    if padding == "mirror":
        return np.pad(x, half, mode="symmetric")
    if padding == "nearest":
        return np.pad(x, half, mode="edge")
    # periodic: left pad wraps (= numpy 'wrap'), right pad is the REVERSED
    # first half-window (SignalPadding.cs:131: ext[len-1-i] = signal[i]).
    return np.concatenate([x[n - half :], x, x[:half][::-1]])


def trim_padding(extended: np.ndarray, original_length: int, window_size: int) -> np.ndarray:
    """SignalPadding.TrimPadding (:89-97)."""
    half = window_size // 2
    return np.asarray(extended, dtype=np.float64)[half : half + original_length]


def sma(
    signal: np.ndarray, window_size: int, padding: str = "none", padded_value: float = 0.0
) -> np.ndarray:
    """Simple moving average (MovingAverage.cs:50-126)."""
    x = np.asarray(signal, dtype=np.float64)
    if window_size <= 0:
        raise ValueError("window_size must be positive")
    n = len(x)
    if padding == "none":
        if window_size > n:
            raise ValueError("window_size larger than signal with Padding.None")
        if n == 0:
            return np.empty(0)
        c = np.concatenate([[0.0], np.cumsum(x)])
        return (c[window_size:] - c[: n - window_size + 1]) / window_size
    if n == 0:
        return np.empty(0)
    ext = apply_padding(x, window_size, padding, padded_value)
    c = np.concatenate([[0.0], np.cumsum(ext)])
    out = (c[window_size:] - c[: len(ext) - window_size + 1]) / window_size
    return out[:n]  # same-length output (even windows yield one extra)


def ema(signal: np.ndarray, alpha: float) -> np.ndarray:
    """Exponential moving average (MovingAverage.cs:155-174).

    Matches pandas ewm(alpha, adjust=False).mean(); implemented directly so
    the kernel stays pandas-free."""
    if not (0 < alpha <= 1):
        raise ValueError("alpha must be in (0, 1]")
    x = np.asarray(signal, dtype=np.float64)
    n = len(x)
    if n == 0:
        return np.empty(0)
    out = np.empty(n)
    out[0] = x[0]
    a1 = 1.0 - alpha
    for i in range(1, n):  # short per-series recursion; groups are the parallel unit
        out[i] = alpha * x[i] + a1 * out[i - 1]
    return out


def wma(
    signal: np.ndarray,
    weights: np.ndarray,
    padding: str = "none",
    padded_value: float = 0.0,
) -> np.ndarray:
    """Weighted moving average (MovingAverage.cs:235-298) —
    result[i] = sum(signal[i+j] * weights[j]) / sum(weights)."""
    x = np.asarray(signal, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    if len(w) == 0:
        raise ValueError("weights must not be empty")
    ws = w.sum()
    if abs(ws) < WEIGHT_SUM_EPSILON:
        raise ValueError("Sum of weights cannot be zero.")
    n, wn = len(x), len(w)
    if padding == "none":
        if wn > n:
            raise ValueError("weights longer than signal with Padding.None")
        if n == 0:
            return np.empty(0)
        return np.correlate(x, w, mode="valid") / ws
    if n == 0:
        return np.empty(0)
    ext = apply_padding(x, wn, padding, padded_value)
    return (np.correlate(ext, w, mode="valid") / ws)[:n]


# --- Savitzky-Golay ---------------------------------------------------------


def _solve_normal_equations(A: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Overdetermined solve via normal equations, as the reference's
    MatrixOperations.TrySolveLinearSystem does (MatrixOperations.cs:300-318)."""
    return np.linalg.solve(A.T @ A, A.T @ y)


def savgol_coefficients(window_length: int, poly_order: int, derivative_order: int) -> np.ndarray:
    """SavitzkyGolayFilter.ComputeCoefficients (:143-219): x values reversed
    and centered at halfWindow-0.5; impulse y at the center scaled by
    derivative factorial; solution reversed. Result length = poly_order+1."""
    half = window_length // 2
    x = (np.arange(window_length) - (half - 0.5))[::-1]
    A = np.vander(x, poly_order + 1, increasing=True)
    y = np.zeros(window_length)
    y[half] = float(math.factorial(derivative_order))
    return _solve_normal_equations(A, y)[::-1]


def _clamped_convolution(signal: np.ndarray, coeffs: np.ndarray, half: int) -> np.ndarray:
    """ApplyConvolution (:228-251): indices clamped to [0, n-1]."""
    n = len(signal)
    idx = np.arange(n)[:, None] + np.arange(len(coeffs))[None, :] - half
    np.clip(idx, 0, n - 1, out=idx)
    return signal[idx] @ coeffs


def fit_polynomial(xv: np.ndarray, yv: np.ndarray, order: int) -> np.ndarray:
    """PolynomialFitter.FitPolynomial (normal equations; PolynomialFitter.cs:21-98)."""
    A = np.vander(np.asarray(xv, dtype=np.float64), order + 1, increasing=True)
    return _solve_normal_equations(A, np.asarray(yv, dtype=np.float64))


def eval_polynomial(coeffs: np.ndarray, x) -> np.ndarray:
    """PolynomialFitter.EvaluatePolynomial — c0 + c1*x + ... + cp*x^p."""
    x = np.asarray(x, dtype=np.float64)
    return np.vander(np.atleast_1d(x), len(coeffs), increasing=True) @ coeffs


def savgol(
    signal: np.ndarray,
    window_length: int,
    poly_order: int,
    derivative_order: int = 0,
    padding: str = "none",
    padded_value: float = 0.0,
) -> np.ndarray:
    """SavitzkyGolayFilter.Apply (:96-134), quirks included."""
    if poly_order >= window_length:
        raise ValueError("poly_order must be < window_length")
    if derivative_order > poly_order:
        raise ValueError("derivative_order must be <= poly_order")
    x = np.asarray(signal, dtype=np.float64)
    n = len(x)
    if n == 0:
        return np.empty(0)
    if n < 2 * window_length + 1:  # short-input pass-through (:112-113)
        return x.copy()
    half = window_length // 2

    ext = apply_padding(x, window_length, padding, padded_value) if padding != "none" else x
    coeffs = savgol_coefficients(window_length, poly_order, derivative_order)
    filtered = _clamped_convolution(ext, coeffs, half)
    if padding != "none":
        filtered = trim_padding(filtered, n, window_length).copy()

    if n >= window_length:  # polynomial edge re-fit on the ORIGINAL input (:260-311)
        c0 = fit_polynomial(np.arange(window_length), x[:window_length], poly_order)
        filtered[:half] = eval_polynomial(c0, np.arange(half))
        start = n - window_length
        c1 = fit_polynomial(np.arange(window_length), x[start:], poly_order)
        filtered[n - half :] = eval_polynomial(c1, np.arange(n - half, n) - start)

    if derivative_order == 0:  # middle restore (:320-329)
        filtered[half : n - half] = x[half : n - half]
    return filtered
