"""PELT segment cost functions (numpy) — reference-parity layer.

All operate on a (D, N) float matrix (row = dimension, column = time point),
matching the reference layout (PELTAlgorithm.cs:33). Each class mirrors one
IPELTCostFunction implementation; likelihood ones expose the metric and
per-segment parameter count used by BIC/AIC/AICc penalty selection
(ILikelihoodCostFunction.cs:26-50).

Deliberate divergences from the reference (documented, value-identical):
- L1 computes each segment's medians on demand (O(n) per call) instead of
  precomputing all O(n^2) segment medians (L1CostFunction.cs:149-167) — same
  numbers, sane complexity;
- AR solves the OLS system with numpy normal equations instead of hand-rolled
  Gaussian elimination (MatrixOperations.cs:300-318) — same solution within
  the library's 1e-9 test epsilon.
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    DEFAULT_EPSILON,
    RBF_EXPONENT_MAX,
    RBF_EXPONENT_MIN,
    VARIANCE_EPSILON,
)


def as_matrix(signal) -> np.ndarray:
    """1D -> 1xN lift (CostFunctionBase.cs:32-42); 2D passed through."""
    x = np.asarray(signal, dtype=np.float64)
    if x.ndim == 1:
        return x[None, :]
    if x.ndim == 2:
        return x
    raise ValueError("signal must be 1- or 2-dimensional")


class CostFunction:
    supports_ic = False

    def fit(self, signal) -> "CostFunction":
        raise NotImplementedError

    def cost(self, start: int, end: int) -> float:
        raise NotImplementedError

    def cost_batch(self, starts: np.ndarray, end: int) -> np.ndarray:
        """cost(s, end) for every s in `starts` (all with end-s >= 1).

        The PELT DP inner loop runs on this: prefix-sum costs override it
        with one numpy expression over the whole candidate array. A cost
        failure (the scalar path's ValueError/FloatingPointError, i.e. the
        reference's SegmentCostException) is encoded as NaN — the DP skips
        NaN candidates exactly as the scalar loop skipped raising ones.
        """
        out = np.empty(len(starts))
        for i, s in enumerate(starts):
            try:
                out[i] = self.cost(int(s), end)
            except (ValueError, FloatingPointError):
                out[i] = np.nan
        return out

    def likelihood_metric(self, start: int, end: int) -> float:
        raise NotImplementedError(f"{type(self).__name__} has no likelihood metric")

    def segment_param_count(self, segment_length: int) -> int:
        raise NotImplementedError

    def min_segment_length(self) -> int:
        return 1

    def _check(self, start: int, end: int, n: int) -> int:
        if start < 0 or end > n:
            raise ValueError(f"segment [{start}, {end}) out of bounds for n={n}")
        length = end - start
        if length < 1:
            raise ValueError("segment length must be >= 1")
        return length


class L2Cost(CostFunction):
    """SSE around the segment mean: sum(x^2) - sum(x)^2/n per dimension
    (L2CostFunction.cs:105-139, prefix sums :56-79)."""

    def fit(self, signal):
        x = as_matrix(signal)
        z = np.zeros((x.shape[0], 1))
        self._s = np.hstack([z, np.cumsum(x, axis=1)])
        self._s2 = np.hstack([z, np.cumsum(x * x, axis=1)])
        self._n = x.shape[1]
        return self

    def cost(self, start, end):
        length = self._check(start, end, self._n)
        seg_sum = self._s[:, end] - self._s[:, start]
        seg_sum2 = self._s2[:, end] - self._s2[:, start]
        return float(np.sum(seg_sum2 - seg_sum * seg_sum / length))

    def cost_batch(self, starts, end):
        starts = np.asarray(starts, dtype=np.int64)
        lengths = (end - starts).astype(np.float64)
        seg_sum = self._s[:, end][:, None] - self._s[:, starts]
        seg_sum2 = self._s2[:, end][:, None] - self._s2[:, starts]
        return np.sum(seg_sum2 - seg_sum * seg_sum / lengths, axis=0)


class L1Cost(CostFunction):
    """Sum of absolute deviations from the segment median per dimension
    (L1CostFunction.cs:89-115); medians computed on demand."""

    # below this length the FULL O(n^2) segment-cost table is materialized in
    # one vectorized pass (n^3/2 doubles transient; 200 -> ~32 MB), making the
    # DP's per-endpoint batch a pure table gather, same shape as L2's
    _FULL_TABLE_MAX_N = 200

    def fit(self, signal):
        self._x = as_matrix(signal)
        self._n = self._x.shape[1]
        self._table = None
        return self

    def cost(self, start, end):
        self._check(start, end, self._n)
        seg = self._x[:, start:end]
        med = np.median(seg, axis=1, keepdims=True)
        return float(np.abs(seg - med).sum())

    # keep transient sort matrices under ~32 MB of doubles per chunk
    _BATCH_CHUNK_ELEMS = 4 << 20

    # class-level so every L1Cost instance in a worker process shares one
    # grow-only workspace: a Spark applyInPandas batch fits one cost object
    # per conversation, and per-instance buffers would re-pay the first-touch
    # page-fault cost (catastrophic on cgroup-limited hosts: ~1000x the
    # arithmetic) for every series. Python workers are single-threaded, so a
    # shared mutable buffer is safe.
    _ws = None

    @classmethod
    def _workspace(cls, elems: int):
        ws = cls._ws
        if ws is None or ws[0].size < elems:
            cap = max(elems, 2 * (ws[0].size if ws else 0))
            ws = (
                np.empty(cap),                 # segment values (sorted in place)
                np.empty(cap),                 # row prefix sums
                np.empty(cap, dtype=np.int64), # gather indices
                np.empty(cap, dtype=bool),     # pad mask
            )
            cls._ws = ws
        return ws

    def _sad_batch(self, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """Vectorized sum-of-absolute-deviations for arbitrary (start, length)
        segment pairs.

        Uses the identity  sum|x - median(x)| = sum(upper half) - sum(lower
        half)  over the SORTED segment (with half = len//2, both parities):
        the median itself never needs materializing. One right-padded
        (segments x maxlen) matrix per dimension is sorted row-wise (+inf
        pads sort last) and prefix-summed; the two half-sums are then plain
        gathers. Values equal the scalar path up to summation-order ulp —
        inside the DP's PELT_TIE_EPSILON band. Rows are chunked so the
        transient matrix stays memory-bounded; all intermediates live in
        reused workspace buffers (fresh allocations pay first-touch page
        faults per call on cgroup-limited hosts — measurably ~1000x the
        arithmetic cost)."""
        maxlen = int(lengths.max())
        out = np.zeros(starts.size)
        chunk = max(1, self._BATCH_CHUNK_ELEMS // maxlen)
        offs = np.arange(maxlen, dtype=np.int64)
        bufA, bufC, bufI, bufP = self._workspace(min(chunk, starts.size) * maxlen)
        for c0 in range(0, starts.size, chunk):
            sl = slice(c0, min(c0 + chunk, starts.size))
            s_c, l_c = starts[sl], lengths[sl]
            rows = s_c.size
            shape = (rows, maxlen)
            idx = bufI[: rows * maxlen].reshape(shape)
            np.add(s_c[:, None], offs[None, :], out=idx)
            np.minimum(idx, self._n - 1, out=idx)
            pad = bufP[: rows * maxlen].reshape(shape)
            np.greater_equal(offs[None, :], l_c[:, None], out=pad)
            half = l_c // 2
            for dim in range(self._x.shape[0]):
                A = bufA[: rows * maxlen].reshape(shape)
                np.take(self._x[dim], idx, out=A)
                A[pad] = np.inf
                A.sort(axis=1)
                A[pad] = 0.0  # pad positions are sort-invariant (suffix per row)
                C = bufC[: rows * maxlen].reshape(shape)
                np.cumsum(A, axis=1, out=C)
                # C[i, p-1] = sum of the p smallest; p = 0 → 0
                pick = lambda pos: np.take_along_axis(C, pos[:, None], axis=1)[:, 0]
                up = pick(l_c - 1) - pick(l_c - half - 1)
                low = np.where(half > 0, pick(np.maximum(half - 1, 0)), 0.0)
                out[sl] += np.where(half > 0, up - low, 0.0)
        return out

    def _full_table(self) -> np.ndarray:
        """All-pairs segment costs, flat-indexed by t(t-1)/2 + s for
        0 <= s < t <= n: one _sad_batch call covering every segment, built
        lazily on the first batch request. Bench-scale series (tens to low
        hundreds of turns per conversation) hit this path, collapsing the
        DP's per-endpoint work to a single gather — the same shape as L2."""
        if self._table is None:
            t = np.repeat(np.arange(1, self._n + 1), np.arange(1, self._n + 1))
            s = np.concatenate([np.arange(tt) for tt in range(1, self._n + 1)])
            self._table = self._sad_batch(s, t - s)
        return self._table

    def cost_batch(self, starts, end):
        """Batch L1 costs: full-table gather for short series, per-endpoint
        vectorized sort for long ones (replacing the per-candidate Python
        np.median loop — one interpreted call per admissible s)."""
        starts = np.asarray(starts, dtype=np.int64)
        if starts.size == 0:
            return np.empty(0)
        lengths = (end - starts).astype(np.int64)
        if (lengths < 1).any():
            return super().cost_batch(starts, end)  # preserve scalar's raise→NaN
        if self._n <= self._FULL_TABLE_MAX_N:
            return self._full_table()[end * (end - 1) // 2 + starts]
        return self._sad_batch(starts, lengths)


class RBFCost(CostFunction):
    """Kernel cost n - sum(K_seg)/n per dimension (RBFCostFunction.cs:122-142).

    K(i,j) = 1 if d == 0 else exp(-clamp(d * gamma, 1e-2, 1e2)), with
    d = squared distance per dimension (:258-284). gamma defaults to
    1/median(strict upper-triangle distances) computed from the FIRST
    dimension and reused for the rest (the reference's `gamma ??=` at
    GenerateGramMatrix, :219). O(N^2) memory per series — intended for
    per-conversation lengths.
    """

    def __init__(self, gamma: float | None = None, max_points: int = 20000):
        self._gamma0 = gamma
        self._max_points = max_points

    def fit(self, signal):
        x = as_matrix(signal)
        d, n = x.shape
        if n > self._max_points:
            raise ValueError(
                f"RBF cost is O(N^2); series length {n} exceeds max_points={self._max_points}"
            )
        self._n = n
        gamma = self._gamma0
        self._sat = np.empty((d, n + 1, n + 1))
        for dim in range(d):
            diff = x[dim][:, None] - x[dim][None, :]
            dist = diff * diff
            if gamma is None:
                iu = np.triu_indices(n, k=1)
                vals = dist[iu]
                med = float(np.median(vals)) if vals.size else 1.0
                gamma = 1.0 / med if med != 0.0 else 1.0
            val = np.clip(dist * gamma, RBF_EXPONENT_MIN, RBF_EXPONENT_MAX)
            K = np.exp(-val)
            K[dist == 0] = 1.0
            sat = np.zeros((n + 1, n + 1))
            np.cumsum(np.cumsum(K, axis=0), axis=1, out=sat[1:, 1:])
            self._sat[dim] = sat
        self.gamma_ = gamma
        return self

    def cost(self, start, end):
        length = self._check(start, end, self._n)
        total = 0.0
        for dim in range(self._sat.shape[0]):
            sat = self._sat[dim]
            s = sat[end, end] - sat[start, end] - sat[end, start] + sat[start, start]
            total += length - s / length
        return float(total)

    def cost_batch(self, starts, end):
        starts = np.asarray(starts, dtype=np.int64)
        lengths = (end - starts).astype(np.float64)
        out = np.zeros(len(starts))
        for dim in range(self._sat.shape[0]):
            sat = self._sat[dim]
            s = sat[end, end] - sat[starts, end] - sat[end, starts] + sat[starts, starts]
            out += lengths - s / lengths
        return out


class GaussianCost(CostFunction):
    """n * ln(max(SSE/n, 1e-10)) per dimension — MLE variance with the
    observable VarianceEpsilon floor (GaussianLikelihoodCostFunction.cs:
    209-243, Constants.cs:48). Cost == likelihood metric (:132)."""

    supports_ic = True

    def fit(self, signal):
        x = as_matrix(signal)
        z = np.zeros((x.shape[0], 1))
        self._s = np.hstack([z, np.cumsum(x, axis=1)])
        self._s2 = np.hstack([z, np.cumsum(x * x, axis=1)])
        self._d, self._n = x.shape
        return self

    def likelihood_metric(self, start, end):
        length = self._check(start, end, self._n)
        seg_sum = self._s[:, end] - self._s[:, start]
        seg_sum2 = self._s2[:, end] - self._s2[:, start]
        sse = np.maximum(seg_sum2 - seg_sum * seg_sum / length, 0.0)
        var = np.maximum(sse / length, VARIANCE_EPSILON)
        total = float(length * np.log(var).sum())
        return np.inf if not np.isfinite(total) else total

    cost = likelihood_metric

    def cost_batch(self, starts, end):
        starts = np.asarray(starts, dtype=np.int64)
        lengths = (end - starts).astype(np.float64)
        seg_sum = self._s[:, end][:, None] - self._s[:, starts]
        seg_sum2 = self._s2[:, end][:, None] - self._s2[:, starts]
        sse = np.maximum(seg_sum2 - seg_sum * seg_sum / lengths, 0.0)
        var = np.maximum(sse / lengths, VARIANCE_EPSILON)
        total = lengths * np.log(var).sum(axis=0)
        return np.where(np.isfinite(total), total, np.inf)

    def segment_param_count(self, segment_length):
        return 2 * self._d  # mean + variance per dimension (:166-176)


class PoissonCost(CostFunction):
    """2*(S - S ln S + S ln n) per dimension; S≈0 → 0
    (PoissonLikelihoodCostFunction.cs:128-150). Inputs must be counts
    >= -1e-9; tiny negatives clamp to 0 (:110-120)."""

    supports_ic = True

    def fit(self, signal):
        x = as_matrix(signal)
        if (x < -DEFAULT_EPSILON).any():
            raise ValueError("Input data must be non-negative for Poisson likelihood cost")
        x = np.maximum(x, 0.0)
        self._s = np.hstack([np.zeros((x.shape[0], 1)), np.cumsum(x, axis=1)])
        self._d, self._n = x.shape
        return self

    def likelihood_metric(self, start, end):
        length = self._check(start, end, self._n)
        S = self._s[:, end] - self._s[:, start]
        out = np.where(
            np.abs(S) <= DEFAULT_EPSILON,
            0.0,
            2.0 * (S - S * np.log(np.maximum(S, 1e-300)) + S * np.log(length)),
        )
        total = float(out.sum())
        return np.inf if not np.isfinite(total) else total

    cost = likelihood_metric

    def cost_batch(self, starts, end):
        starts = np.asarray(starts, dtype=np.int64)
        lengths = (end - starts).astype(np.float64)
        S = self._s[:, end][:, None] - self._s[:, starts]
        out = np.where(
            np.abs(S) <= DEFAULT_EPSILON,
            0.0,
            2.0 * (S - S * np.log(np.maximum(S, 1e-300)) + S * np.log(lengths)),
        )
        total = out.sum(axis=0)
        return np.where(np.isfinite(total), total, np.inf)

    def segment_param_count(self, segment_length):
        return 1 * self._d  # rate lambda per dimension (:190-200)


class BernoulliCost(CostFunction):
    """-2*(S ln S + (n-S) ln(n-S) - n ln n) per dim; all-0s/all-1s → 0
    (BernoulliLikelihoodCostFunction.cs:240-265)."""

    supports_ic = True

    def fit(self, signal):
        x = as_matrix(signal)
        ok = (np.abs(x) <= DEFAULT_EPSILON) | (np.abs(x - 1) <= DEFAULT_EPSILON)
        if not ok.all():
            raise ValueError("Input data must be effectively 0 or 1 for Bernoulli likelihood cost")
        self._s = np.hstack([np.zeros((x.shape[0], 1)), np.cumsum(x, axis=1)])
        self._d, self._n = x.shape
        return self

    def likelihood_metric(self, start, end):
        length = self._check(start, end, self._n)
        S = self._s[:, end] - self._s[:, start]
        F_ = length - S
        total = 0.0
        for s, f in zip(S, F_):
            if abs(s) <= DEFAULT_EPSILON or abs(s - length) <= DEFAULT_EPSILON:
                continue
            total += -2.0 * (s * np.log(s) + f * np.log(f) - length * np.log(length))
        return np.inf if not np.isfinite(total) else float(total)

    cost = likelihood_metric

    def cost_batch(self, starts, end):
        starts = np.asarray(starts, dtype=np.int64)
        lengths = (end - starts).astype(np.float64)
        S = self._s[:, end][:, None] - self._s[:, starts]
        F_ = lengths - S
        degenerate = (np.abs(S) <= DEFAULT_EPSILON) | (np.abs(S - lengths) <= DEFAULT_EPSILON)
        Ss = np.where(degenerate, 1.0, S)
        Fs = np.where(degenerate, 1.0, F_)
        term = np.where(
            degenerate,
            0.0,
            -2.0 * (Ss * np.log(Ss) + Fs * np.log(Fs) - lengths * np.log(lengths)),
        )
        total = term.sum(axis=0)
        return np.where(np.isfinite(total), total, np.inf)

    def segment_param_count(self, segment_length):
        return 1 * self._d


def _xlogx(x: float) -> float:
    """0*log(0) == 0 convention (BinomialLikelihoodCostFunction.cs:320)."""
    return 0.0 if abs(x) <= DEFAULT_EPSILON else x * np.log(x)


class BinomialCost(CostFunction):
    """-(K lnK + (N-K) ln(N-K) - N lnN), K = sum successes, N = sum trials.
    Input is EXACTLY 2 rows: row 0 = successes k, row 1 = trials n
    (BinomialLikelihoodCostFunction.cs:73-143). K≈0, K≈N, N≈0 → 0; result
    floored at 0 (:276-310)."""

    supports_ic = True

    def fit(self, signal):
        x = as_matrix(signal)
        if x.shape[0] != 2:
            raise ValueError("Binomial cost requires exactly 2 rows (successes; trials)")
        k, t = x[0], x[1]
        if not (np.abs(k - np.round(k)) <= DEFAULT_EPSILON).all() or not (
            np.abs(t - np.round(t)) <= DEFAULT_EPSILON
        ).all():
            raise ValueError("Binomial inputs must be integers")
        if (t < 1 - DEFAULT_EPSILON).any() or (k < -DEFAULT_EPSILON).any() or (k > t + DEFAULT_EPSILON).any():
            raise ValueError("Binomial inputs require 0 <= k <= n and n >= 1")
        self._sk = np.concatenate([[0.0], np.cumsum(k)])
        self._st = np.concatenate([[0.0], np.cumsum(t)])
        self._n = x.shape[1]
        return self

    def likelihood_metric(self, start, end):
        self._check(start, end, self._n)
        K = self._sk[end] - self._sk[start]
        N = self._st[end] - self._st[start]
        if abs(N) <= DEFAULT_EPSILON or abs(K) <= DEFAULT_EPSILON or abs(K - N) <= DEFAULT_EPSILON:
            return 0.0
        metric = -(_xlogx(K) + _xlogx(N - K) - _xlogx(N))
        if not np.isfinite(metric):
            return np.inf
        return max(0.0, float(metric))

    cost = likelihood_metric

    def cost_batch(self, starts, end):
        starts = np.asarray(starts, dtype=np.int64)
        K = self._sk[end] - self._sk[starts]
        N = self._st[end] - self._st[starts]
        degenerate = (
            (np.abs(N) <= DEFAULT_EPSILON)
            | (np.abs(K) <= DEFAULT_EPSILON)
            | (np.abs(K - N) <= DEFAULT_EPSILON)
        )

        def xlogx(v):
            safe = np.where(np.abs(v) <= DEFAULT_EPSILON, 1.0, v)
            return np.where(np.abs(v) <= DEFAULT_EPSILON, 0.0, safe * np.log(safe))

        Ks, Ns = np.where(degenerate, 1.0, K), np.where(degenerate, 2.0, N)
        metric = -(xlogx(Ks) + xlogx(Ns - Ks) - xlogx(Ns))
        out = np.where(degenerate, 0.0, np.maximum(0.0, metric))
        return np.where(np.isfinite(out), out, np.inf)

    def segment_param_count(self, segment_length):
        return 1  # success probability p (:214-225)


def _solve_stack(M: np.ndarray, c: np.ndarray):
    """Solve a stack of tiny SYMMETRIC PSD systems M[i] @ a[i] = c[i] with
    vectorized pivot-free Gaussian elimination, returning (a, det).

    np.linalg.solve/det on an (m, p, p) stack dispatch LAPACK per matrix —
    ~250us per call at p=3, which dominated the AR(p>2) PELT inner loop.
    Eliminating across the stack with a handful of whole-array numpy ops is
    ~10x cheaper for the p <= 6 systems AR uses. The matrices here are Gram
    / covariance matrices (symmetric PSD), for which pivot-free elimination
    is numerically stable — so no partial-pivoting row swaps. det falls out
    as the product of pivots (used by the caller's relative singularity
    guard). Singular systems yield inf/nan via ~0 pivots — the caller masks
    them by det, so no pre-masking is needed here."""
    # layout: M is (p, p, m), c is (p, m) — the stack axis LAST, so every
    # (row, col) entry is one contiguous m-vector and each elimination step
    # is a handful of flat numpy ops
    p = M.shape[0]
    A = np.concatenate([M, c[:, None, :]], axis=1)  # (p, p+1, m) augmented
    det = np.ones(M.shape[2])
    for k in range(p):
        pivval = A[k, k]
        det = det * pivval
        if k + 1 < p:
            factors = A[k + 1 :, k] / pivval
            A[k + 1 :, k:] -= factors[:, None, :] * A[k, None, k:]
    a = np.empty_like(c)
    for k in range(p - 1, -1, -1):
        acc = A[k, p]
        for j in range(k + 1, p):
            acc = acc - A[k, j] * a[j]
        a[k] = acc / A[k, k]
    return a, det


class ARCost(CostFunction):
    """AR(p) OLS residual sum of squares (ARCostFunction.cs:133-147).

    cost = RSS; +inf on constant-with-intercept segments or singular systems
    (:339-352). metric = n_eff * ln(RSS/n_eff), +inf if var < 1e-10
    (:160-243). Univariate only. Min segment length =
    max(p+1, 2p + intercept) (:270-277)."""

    supports_ic = True

    def __init__(self, order: int = 1, include_intercept: bool = True):
        if order < 1:
            raise ValueError("order must be >= 1")
        self.order = order
        self.include_intercept = include_intercept

    def fit(self, signal):
        x = as_matrix(signal)
        if x.shape[0] != 1:
            raise ValueError("AR cost supports univariate signals only")
        self._x = x[0]
        self._n = len(self._x)
        # Prefix sums reducing every normal-equation moment of ANY order to
        # prefix differences: values, squares, and gap-d cross products
        # x[t]*x[t+d] for d = 1..p (the (j,k) Gram entry only depends on the
        # lag gap |j-k|). O(p*n) memory, built once per fit.
        xv = self._x
        z = np.zeros(1)
        self._ps = np.concatenate([z, np.cumsum(xv)])
        self._ps2 = np.concatenate([z, np.cumsum(xv * xv)])
        self._pg = [
            np.concatenate([z, np.cumsum(xv[:-d] * xv[d:])]) if self._n > d else z.copy()
            for d in range(1, self.order + 1)
        ]
        # aliases used by the closed-form AR(1)/AR(2) Cramer paths below
        self._pzy = self._pg[0]
        if self.order >= 2:
            self._pz2y = self._pg[1]
        if self.order > 2 or not self.include_intercept:
            self._build_term_table()
        return self

    def _build_term_table(self):
        """One flat buffer + index tables so _batch_general fetches EVERY
        normal-equation moment with a single fancy-index gather per call
        (dozens of separate prefix-difference gathers otherwise dominate the
        PELT inner loop's Python/numpy dispatch overhead).

        Each moment is flat[base + end - hi_shift] - flat[base + lo_shift + sc]
        for one (base, hi_shift, lo_shift) row; rows are ordered
        [Sy, Syy, S_1..S_p, S_1y..S_py, G_11..G_pp, G_jk (j<k)]."""
        p = self.order
        parts = [self._ps, self._ps2] + self._pg
        bases = np.cumsum([0] + [len(a) for a in parts[:-1]])
        self._flat = np.concatenate(parts)
        rows = [(bases[0], 0, p), (bases[1], 0, p)]  # Sy, Syy
        rows += [(bases[0], j, p - j) for j in range(1, p + 1)]  # S_j
        rows += [(bases[1 + j], j, p - j) for j in range(1, p + 1)]  # S_jy (pg[j-1])
        rows += [(bases[1], j, p - j) for j in range(1, p + 1)]  # G_jj
        self._offdiag = [(j, k) for j in range(1, p + 1) for k in range(j + 1, p + 1)]
        rows += [(bases[1 + (k - j)], k, p - k) for j, k in self._offdiag]
        r = np.asarray(rows, dtype=np.int64)
        self._t_hi = r[:, 0] - r[:, 1]  # add `end` at call time
        self._t_lo = (r[:, 0] + r[:, 2])[:, None]  # add `sc` at call time

    def min_segment_length(self):
        p = self.order
        return max(p + 1, 2 * p + (1 if self.include_intercept else 0))

    def _rss(self, start, end) -> float | None:
        seg = self._x[start:end]
        p = self.order
        n_eq = len(seg) - p
        if n_eq <= 0:
            return None
        if self.include_intercept and np.allclose(seg, seg[0], atol=DEFAULT_EPSILON, rtol=0):
            return None  # perfect collinearity (:339-349)
        cols = []
        if self.include_intercept:
            cols.append(np.ones(n_eq))
        for lag in range(1, p + 1):
            cols.append(seg[p - lag : p - lag + n_eq])
        A = np.column_stack(cols)
        y = seg[p:]
        try:
            coef = np.linalg.solve(A.T @ A, A.T @ y)  # normal equations, as reference
        except np.linalg.LinAlgError:
            return None
        resid = y - A @ coef
        rss = float(resid @ resid)
        return rss if np.isfinite(rss) else None

    def cost(self, start, end):
        length = self._check(start, end, self._n)
        if length < self.min_segment_length():
            raise ValueError(
                f"AR({self.order}) needs at least {self.min_segment_length()} points, got {length}"
            )
        rss = self._rss(start, end)
        return np.inf if rss is None else rss

    def cost_batch(self, starts, end):
        """Closed-form AR(1)/AR(2)-with-intercept RSS from prefix sums: the
        2x2 / 3x3 normal equations solve explicitly (Cramer), so the whole
        candidate array is one numpy expression. Failure encoding matches the
        scalar path exactly: segments shorter than min_segment_length (a
        scalar-path raise, i.e. the reference's SegmentCostException) encode
        as NaN; legitimately degenerate segments — near-constant (the
        allclose collinearity guard) and singular systems — return +inf.
        Values agree with the scalar np.linalg.solve path to ~ulp; orders
        > 2 and intercept-free models take the stacked normal-equations
        path (_batch_general): same vectorization, one np.linalg.solve on
        an (m, p, p) stack per endpoint instead of explicit Cramer."""
        if self.order > 2 or not self.include_intercept:
            return self._batch_general(starts, end)
        starts = np.asarray(starts, dtype=np.int64)
        if starts.size == 0:
            return np.empty(0)
        x = self._x
        lengths = end - starts
        short = lengths < self.min_segment_length()
        p = self.order
        n_eq = (lengths - p).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            if p == 1:
                # pair i covers (z, y) = (x[i-1], x[i]) for i in [s+1, end)
                Sy = self._ps[end] - self._ps[starts + 1]
                Sz = self._ps[end - 1] - self._ps[starts]
                Sy2 = self._ps2[end] - self._ps2[starts + 1]
                Sz2 = self._ps2[end - 1] - self._ps2[starts]
                Szy = self._pzy[end - 1] - self._pzy[starts]
                det = n_eq * Sz2 - Sz * Sz
                a0 = (Sz2 * Sy - Sz * Szy) / det
                a1 = (n_eq * Szy - Sz * Sy) / det
                rss = (
                    Sy2
                    + a0 * a0 * n_eq
                    + a1 * a1 * Sz2
                    - 2.0 * a0 * Sy
                    - 2.0 * a1 * Szy
                    + 2.0 * a0 * a1 * Sz
                )
            else:
                # row i covers (y, z1, z2) = (x[i], x[i-1], x[i-2]),
                # i in [s+2, end). Short rows (-> NaN below) are index-clamped
                # so s+2 never exceeds the prefix arrays.
                sc = np.minimum(starts, max(end - p, 0))
                Sy = self._ps[end] - self._ps[sc + 2]
                S1 = self._ps[end - 1] - self._ps[sc + 1]
                S2 = self._ps[end - 2] - self._ps[sc]
                Sy2 = self._ps2[end] - self._ps2[sc + 2]
                S11 = self._ps2[end - 1] - self._ps2[sc + 1]
                S22 = self._ps2[end - 2] - self._ps2[sc]
                S1y = self._pzy[end - 1] - self._pzy[sc + 1]
                S12 = self._pzy[end - 2] - self._pzy[sc]
                S2y = self._pz2y[end - 2] - self._pz2y[sc]
                # centered (covariance-form) 2x2 Cramer: raw-moment 3x3
                # Cramer cancels catastrophically when segment means dominate;
                # centering removes the mean scale, and the intercept never
                # needs materializing (RSS depends only on centered moments)
                C11 = S11 - S1 * S1 / n_eq
                C22 = S22 - S2 * S2 / n_eq
                C12 = S12 - S1 * S2 / n_eq
                C1y = S1y - S1 * Sy / n_eq
                C2y = S2y - S2 * Sy / n_eq
                Cyy = Sy2 - Sy * Sy / n_eq
                det = C11 * C22 - C12 * C12
                a1 = (C1y * C22 - C2y * C12) / det
                a2 = (C2y * C11 - C1y * C12) / det
                rss = Cyy - a1 * C1y - a2 * C2y
                # relative singularity guard: collinear lag columns make det
                # underflow relative to the covariance scale; the scalar
                # np.linalg.solve may return unstable finite garbage there,
                # so the batch path (and its oracle twin) declare +inf
                det = np.where(
                    np.abs(det) <= 1e-12 * np.maximum(C11 * C22, 1e-300), 0.0, det
                )
        constant = self._constant_mask(starts, end)
        bad = constant | (det == 0.0) | ~np.isfinite(rss)
        out = np.where(bad, np.inf, np.maximum(rss, 0.0))
        return np.where(short, np.nan, out)

    def _constant_mask(self, starts, end):
        """Vectorized twin of the scalar path's allclose(seg, seg[0])
        collinearity guard: suffix max/min scans answer 'is x[s:end]
        constant' for every start at once."""
        x = self._x
        seg0 = x[np.minimum(starts, self._n - 1)]
        lo = int(starts.min())
        sufmax = np.maximum.accumulate(x[lo:end][::-1])[::-1]
        sufmin = np.minimum.accumulate(x[lo:end][::-1])[::-1]
        rmax = sufmax[np.minimum(starts - lo, sufmax.size - 1)]
        rmin = sufmin[np.minimum(starts - lo, sufmin.size - 1)]
        return (np.abs(rmax - seg0) <= DEFAULT_EPSILON) & (
            np.abs(seg0 - rmin) <= DEFAULT_EPSILON
        )

    def _batch_general(self, starts, end):
        """General vectorized AR(p) RSS for any small p, with or without
        intercept (reference: ARCostFunction.cs:297-350 supports arbitrary
        order; the per-candidate design-matrix solve there is re-expressed
        as ONE stacked solve per endpoint).

        For segment [s, end) the OLS equations run over rows
        i in [s+p, end): y_i = x[i], regressors z_j,i = x[i-j]. Every Gram /
        moment entry is a prefix difference: the (j, k) entry depends only on
        the lag gap d = |j-k| via cumsum(x[t]*x[t+d]) (self._pg). With
        intercept the moments are centered (covariance form — same
        mean-scale cancellation rationale as the AR(2) Cramer path, and the
        intercept column never materializes); without intercept the raw
        moments solve directly. Singular systems are detected with a
        relative determinant guard against the Gram diagonal product
        (Hadamard bound) and declared +inf, matching the batch AR(2)
        convention. Failure encoding matches cost_batch: short → NaN,
        degenerate → +inf. One np.linalg.det + one np.linalg.solve on an
        (m, p, p) stack — no Python loop over candidates."""
        starts = np.asarray(starts, dtype=np.int64)
        if starts.size == 0:
            return np.empty(0)
        p = self.order
        lengths = end - starts
        short = lengths < self.min_segment_length()
        if end < p + 1 or bool(np.all(short)):
            return np.where(short, np.nan, np.inf)
        sc = np.clip(starts, 0, end - p)  # short rows index-clamped (→ NaN below)
        m = starts.size
        n_eq = (end - sc - p).astype(np.float64)
        # ALL moments in one gather (see _build_term_table for row order)
        S = self._flat[self._t_hi + end][:, None] - self._flat[self._t_lo + sc[None, :]]
        Sy, Syy = S[0], S[1]
        Sj = S[2 : 2 + p]  # (p, m)
        Sjy = S[2 + p : 2 + 2 * p]
        G = np.empty((p, p, m))
        for j in range(p):
            G[j, j] = S[2 + 2 * p + j]
        for row, (j, k) in enumerate(self._offdiag):
            G[j - 1, k - 1] = G[k - 1, j - 1] = S[2 + 3 * p + row]
        with np.errstate(divide="ignore", invalid="ignore"):
            if self.include_intercept:
                M = G - Sj[:, None, :] * (Sj[None, :, :] / n_eq)
                c = Sjy - Sj * (Sy / n_eq)
                yy = Syy - Sy * Sy / n_eq
            else:
                M, c, yy = G, Sjy, Syy
            diagprod = np.prod(M[np.arange(p), np.arange(p)], axis=0)
            a, det = _solve_stack(M, c)
            singular = ~np.isfinite(det) | (
                np.abs(det) <= 1e-12 * np.maximum(np.abs(diagprod), 1e-300)
            )
            rss = yy - (a * c).sum(axis=0)
        bad = singular | ~np.isfinite(rss)
        if self.include_intercept:
            bad = bad | self._constant_mask(starts, end)
        out = np.where(bad, np.inf, np.maximum(rss, 0.0))
        return np.where(short, np.nan, out)

    def likelihood_metric(self, start, end):
        length = self._check(start, end, self._n)
        if length < self.min_segment_length():
            raise ValueError(
                f"AR({self.order}) needs at least {self.min_segment_length()} points, got {length}"
            )
        rss = self._rss(start, end)
        n_eq = length - self.order
        if rss is None or n_eq <= 0:
            return np.inf
        var = rss / n_eq
        if abs(var) <= VARIANCE_EPSILON:
            return np.inf
        metric = n_eq * np.log(var)
        return np.inf if not np.isfinite(metric) else float(metric)

    def segment_param_count(self, segment_length):
        return self.order + 1 + (1 if self.include_intercept else 0)  # (:244-252)


COSTS = {
    "l2": L2Cost,
    "l1": L1Cost,
    "rbf": RBFCost,
    "gaussian": GaussianCost,
    "poisson": PoissonCost,
    "bernoulli": BernoulliCost,
    "binomial": BinomialCost,
    "ar": ARCost,
}


def make_cost(name: str, **params) -> CostFunction:
    if name not in COSTS:
        raise ValueError(f"unknown cost function {name!r}; choose from {sorted(COSTS)}")
    return COSTS[name](**params)
