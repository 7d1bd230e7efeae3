"""PELT changepoint detection + automatic penalty selection (numpy).

Faithful re-implementation of the reference's dynamic program:
- F[0] = -penalty, endpoints t = MinSize..n (PELTAlgorithm.cs:199-220);
- candidate scan from t-MinSize down to 0 stepping by Jump, restricted to the
  admissible set, with the reference's extra hop that re-checks index 0 when
  Jump > 1 would step past it (:224-268);
- candidates whose cost computation raises are skipped (:247-257);
- pruning keeps s if F[s] + cost(s,t) <= F[t] (cost failures keep s
  conservatively when reachable); not-yet-MinSize candidates survive while
  reachable; t joins the set when reachable (:287-338);
- breakpoints extracted by backtracking CP[] from n (:349-383).

Penalty selection (PELTPenaltySelector.cs): log-spaced grid (default 50
steps) between heuristic bounds minP = max(0.1, params*ln n) (:642-669) and
maxP = max(n*ln n, 20*minP) (:677-687); per penalty score =
BIC L + P*ln n / AIC L + 2P / AICc AIC + 2P(P+1)/(n-P-1) with
P = sum of per-segment params + K (:321-488); segments shorter than MinSize
or non-finite metrics invalidate the penalty; ties prefer fewer changepoints
(:160-171).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..constants import DEFAULT_EPSILON, PELT_TIE_EPSILON
from .costs import CostFunction, make_cost


def pelt_segment(
    cost_fn: CostFunction, n: int, penalty: float, min_size: int = 1, jump: int = 1
) -> np.ndarray:
    """Core DP; returns CP[] (optimal last changepoint per endpoint).

    Vectorized: per endpoint t the candidate scan AND the pruning mask are
    single numpy expressions over the admissible array (costs come from
    CostFunction.cost_batch — one prefix-sum gather for the whole array).
    Semantics are identical to the reference's sequential loop
    (PELTAlgorithm.cs:224-338), including:
    - tie-breaking: the scan walks prev DESCENDING with strict `<`, so among
      equal candidates the LARGEST prev wins; equality is banded by
      PELT_TIE_EPSILON so discrete-cost exact ties resolve identically
      across engines (constants.py documents why);
    - cost failures (NaN from cost_batch == SegmentCostException): skipped
      as candidates; kept by pruning while F[s] is finite (:247-257, 315);
    - the Jump hop quirk (:258-266): when Jump > 1 and the scan reaches an
      ADMISSIBLE prev in (0, jump) while 0 is admissible, 0 is also visited.
    """
    F = np.full(n + 1, np.inf)
    F[0] = -penalty
    CP = np.zeros(n + 1, dtype=np.int64)
    adm = np.zeros(1, dtype=np.int64)  # sorted ascending; starts as {0}

    for t in range(min_size, n + 1):
        r = t - min_size
        k = int(np.searchsorted(adm, r, side="right"))
        mature = adm[:k]  # admissible s with t - s >= min_size
        costs = cost_fn.cost_batch(mature, t) if k else np.empty(0)

        # --- candidate scan -------------------------------------------------
        if jump <= 1:
            elig_idx = np.arange(k)
        else:
            mask = ((r - mature) % jump) == 0
            m = r % jump
            if m > 0 and adm.size and adm[0] == 0:
                pos = int(np.searchsorted(mature, m))
                if pos < k and mature[pos] == m:
                    mask[0] = True  # the hop visits 0 (mature[0] == 0 here)
            elig_idx = np.nonzero(mask)[0]
        best = np.inf
        best_cp = 0
        if elig_idx.size:
            cands = F[mature[elig_idx]] + costs[elig_idx] + penalty
            vc = np.where(np.isnan(cands), np.inf, cands)
            best = float(vc.min())
            if math.isfinite(best):
                # ties within PELT_TIE_EPSILON of the min → largest prev (the
                # reference's tie direction), banded so the choice is stable
                # across engines' libm ulp noise (see constants.py)
                tied = np.nonzero(vc <= best + PELT_TIE_EPSILON)[0]
                best_cp = int(mature[elig_idx[tied[-1]]])

        if math.isinf(best):
            F[t] = np.inf
            CP[t] = -1
        else:
            F[t] = best
            CP[t] = best_cp

        # --- pruning --------------------------------------------------------
        parts = []
        if k:
            keep_mature = np.where(
                np.isnan(costs),
                np.isfinite(F[mature]),
                F[mature] + costs <= F[t] + PELT_TIE_EPSILON,
            )
            parts.append(mature[keep_mature])
        young = adm[k:]
        parts.append(young[np.isfinite(F[young])])
        if math.isfinite(F[t]):
            parts.append(np.array([t], dtype=np.int64))
        adm = np.concatenate(parts)  # stays sorted: mature < young < t
    return CP


def pelt_segment_grid(
    cost_fn: CostFunction, n: int, penalties: np.ndarray, min_size: int = 1
) -> np.ndarray:
    """DP for a whole penalty grid at once; returns CP of shape (P, n+1).

    Bit-identical to running `pelt_segment` once per penalty with jump=1
    (asserted by tests/test_pelt_grid.py) but ~P× fewer Python-loop
    iterations: the segment costs cost(s, t) do not depend on the penalty,
    so each endpoint t does ONE `cost_batch` gather over the full candidate
    range 0..t-min_size shared by every penalty, and the per-penalty state
    (F, pruning set) advances as 2-D vector ops over a (P, ·) axis. The
    pruned candidate sets differ per penalty (pruning compares against
    F[t], which embeds the penalty), so they are kept as a boolean mask
    rather than index lists — evaluating the recurrence at penalty-pruned s
    is wasted arithmetic but masked out, a good trade below ~10^3 points
    where the per-call numpy overhead dominates the extra flops.

    Only jump == 1 is supported (the hop quirk at :258-266 makes the
    eligible set depend on per-penalty admissibility; callers fall back to
    the scalar loop for jump > 1).
    """
    pens = np.asarray(penalties, dtype=np.float64)
    P = pens.shape[0]
    F = np.full((P, n + 1), np.inf)
    F[:, 0] = -pens
    CP = np.zeros((P, n + 1), dtype=np.int64)
    # admissible mask; indices 1..min_size-1 never join (mirrors adm = {0})
    R = np.zeros((P, n + 1), dtype=bool)
    R[:, 0] = True

    for t in range(min_size, n + 1):
        r = t - min_size
        starts = np.arange(r + 1, dtype=np.int64)
        costs = cost_fn.cost_batch(starts, t)  # (r+1,), NaN = cost failure
        nan_cost = np.isnan(costs)
        Fm = F[:, : r + 1]
        Rm = R[:, : r + 1]

        cand = Fm + costs[np.newaxis, :] + pens[:, np.newaxis]
        cand = np.where(Rm & ~nan_cost[np.newaxis, :], cand, np.inf)
        cand = np.where(np.isnan(cand), np.inf, cand)
        vmin = cand.min(axis=1)
        finite = np.isfinite(vmin)
        # ties within PELT_TIE_EPSILON → largest prev, like the scalar scan
        tied = cand <= (vmin[:, np.newaxis] + PELT_TIE_EPSILON)
        best_cp = r - np.argmax(tied[:, ::-1], axis=1)
        F[:, t] = np.where(finite, vmin, np.inf)
        CP[:, t] = np.where(finite, best_cp, -1)

        # pruning over the mature range; NaN-cost candidates survive while
        # F[s] is finite (conservative keep, as in the scalar loop)
        keep = np.where(
            nan_cost[np.newaxis, :],
            np.isfinite(Fm),
            Fm + costs[np.newaxis, :] <= F[:, t, np.newaxis] + PELT_TIE_EPSILON,
        )
        Rm &= keep
        R[:, t] = np.isfinite(F[:, t])  # t joins the set when reachable
    return CP


def extract_breakpoints(CP: np.ndarray, n: int) -> list[int]:
    """Backtrack CP[] from n; breakpoints exclude 0 and n (:349-383)."""
    bps: list[int] = []
    idx = n
    while idx > 0:
        prev = int(CP[idx])
        if prev <= 0:
            break
        bps.insert(0, prev)
        idx = prev
    return bps


def pelt(
    signal,
    penalty: float,
    cost: str | CostFunction = "l2",
    min_size: int = 1,
    jump: int = 1,
    **cost_params,
) -> list[int]:
    """Fit + detect: breakpoints = first index after each change
    (PELTAlgorithm.cs:75-154). Guards: n < MinSize or n < 2*MinSize → []."""
    if penalty < 0:
        raise ValueError("penalty must be non-negative")
    if min_size < 1 or jump < 1:
        raise ValueError("min_size and jump must be >= 1")
    cost_fn = make_cost(cost, **cost_params) if isinstance(cost, str) else cost
    x = np.asarray(signal, dtype=np.float64)
    n = x.shape[-1]
    eff_min = max(min_size, cost_fn.min_segment_length())
    if n < eff_min or n < eff_min * 2:
        return []
    cost_fn.fit(x)
    CP = pelt_segment(cost_fn, n, penalty, eff_min, jump)
    return extract_breakpoints(CP, n)


@dataclass
class PenaltySelectionResult:
    selected_penalty: float
    breakpoints: list[int]
    method: str
    diagnostics: list[tuple[float, float, int]] = field(default_factory=list)


def _log_spaced_penalties(min_p: float, max_p: float, count: int) -> list[float]:
    """GenerateLogSpacedPenalties (:560-635), incl. the zero-min special case."""
    if count <= 0:
        return []
    if count == 1 or min_p >= max_p:
        return [min_p]
    out: list[float] = []
    if abs(min_p) <= DEFAULT_EPSILON:
        out.append(0.0)
        eff_min = max(1e-9, max_p * 1e-6)
        if eff_min >= max_p:
            if abs(max_p) > DEFAULT_EPSILON:
                out.append(max_p)
            return out
        log_min, log_max = math.log(eff_min), math.log(max_p)
        if count == 2 or log_min >= log_max:
            out.append(max_p)
            return out
        step = (log_max - log_min) / (count - 2)
        for i in range(count - 1):
            p = math.exp(log_min + step * i)
            if i == count - 2 or p >= max_p:
                out.append(max_p)
                return out
            out.append(p)
        return out
    log_min, log_max = math.log(min_p), math.log(max_p)
    step = (log_max - log_min) / (count - 1)
    for i in range(count):
        p = math.exp(log_min + step * i)
        if i == count - 1 or p >= max_p:
            out.append(max_p)
            return out
        out.append(p)
    return out


def _score(
    method: str,
    breakpoints: list[int],
    n: int,
    cost_fn: CostFunction,
    min_size: int,
) -> float:
    """CalculateScore + CalculateLikelihoodScoreComponents (:321-488)."""
    K = len(breakpoints)
    total_metric = 0.0
    total_params = 0.0
    last = 0
    for cp in [*breakpoints, n]:
        seg_len = cp - last
        if seg_len < min_size:
            return np.inf
        try:
            m = cost_fn.likelihood_metric(last, cp)
        except ValueError:
            return np.inf
        if not np.isfinite(m):
            return np.inf
        total_metric += m
        total_params += cost_fn.segment_param_count(seg_len)
        last = cp
    P = total_params + K
    if method == "bic":
        return total_metric + P * math.log(n)
    aic = total_metric + 2.0 * P
    if method == "aic":
        return aic
    if method == "aicc":
        if n > P + 1.0:
            corr = (2.0 * P * (P + 1.0)) / (n - P - 1.0)
            if np.isfinite(corr):
                return aic + corr
        return np.inf
    raise ValueError(f"unknown selection method {method!r}")


def select_penalty(
    signal,
    cost: str | CostFunction = "gaussian",
    method: str = "bic",
    min_penalty: float | None = None,
    max_penalty: float | None = None,
    num_steps: int = 50,
    min_size: int = 1,
    jump: int = 1,
    **cost_params,
) -> PenaltySelectionResult:
    """PELTPenaltySelector.FitAndSelect (:65-204)."""
    cost_fn = make_cost(cost, **cost_params) if isinstance(cost, str) else cost
    if not cost_fn.supports_ic:
        raise ValueError(f"{type(cost_fn).__name__} does not support information criteria")
    x = np.asarray(signal, dtype=np.float64)
    n = x.shape[-1]
    cost_fn.fit(x)
    eff_min = max(min_size, cost_fn.min_segment_length())

    if min_penalty is None:
        nn = max(2.0, float(n))
        sample_len = max(eff_min, min(n, 10))
        try:
            typical = max(1.0, cost_fn.segment_param_count(sample_len)) if n >= sample_len else 2.0
        except Exception:
            typical = 2.0
        min_penalty = max(0.1, typical * math.log(nn))
    if max_penalty is None:
        nn = max(2.0, float(n))
        max_penalty = max(nn * math.log(nn), min_penalty * 20.0)
        max_penalty = max(max_penalty, max(1.0, min_penalty * 1.1 + 1.0))
    min_penalty = max(0.0, min_penalty)
    if max_penalty <= min_penalty:
        max_penalty = min_penalty + max(1.0, abs(min_penalty * 0.1) + 0.1)

    penalties = _log_spaced_penalties(min_penalty, max_penalty, max(2, num_steps))
    degenerate = n < eff_min or n < eff_min * 2
    CP_grid = None
    if not degenerate and jump <= 1:
        # one stacked DP for the whole grid (segment costs are shared)
        CP_grid = pelt_segment_grid(cost_fn, n, np.asarray(penalties), eff_min)

    best_score, best_penalty, best_bps = np.inf, -1.0, []
    diagnostics = []
    for pi, penalty in enumerate(penalties):
        if degenerate:
            bps = []
        elif CP_grid is not None:
            bps = extract_breakpoints(CP_grid[pi], n)
        else:
            CP = pelt_segment(cost_fn, n, penalty, eff_min, jump)
            bps = extract_breakpoints(CP, n)
        score = _score(method, bps, n, cost_fn, eff_min)
        diagnostics.append((penalty, score, len(bps)))
        if not np.isfinite(score):
            continue
        if score < best_score:
            best_score, best_penalty, best_bps = score, penalty, bps
        elif abs(score - best_score) <= DEFAULT_EPSILON and len(bps) < len(best_bps):
            best_penalty, best_bps = penalty, bps
    if best_penalty < 0:
        raise RuntimeError("Could not find a suitable penalty: all candidates invalid")
    return PenaltySelectionResult(best_penalty, best_bps, method, diagnostics)
