"""Penalty-grid stacked DP parity vs the scalar per-penalty loop.

`pelt_segment_grid` exists purely as a batching optimization for
`select_penalty` (segment costs are penalty-independent, so one DP sweep
serves the whole log-spaced grid); its contract is BIT-IDENTICAL CP tables
to running `pelt_segment` once per penalty with jump=1, including the
tie-epsilon band and the conservative NaN-cost pruning keep. Reference
semantics: SignalSharp/PELTAlgorithm.cs:199-338 +
PELTPenaltySelector.cs:65-204.
"""

import numpy as np
import pytest

from transcriptts.kernels.costs import make_cost
from transcriptts.kernels.pelt import (
    _log_spaced_penalties,
    pelt_segment,
    pelt_segment_grid,
    select_penalty,
)


def _grid_vs_scalar(x: np.ndarray, kind: str, min_size: int, pens: np.ndarray):
    cost = make_cost(kind)
    cost.fit(x)
    n = x.shape[-1]
    G = pelt_segment_grid(cost, n, pens, min_size)
    for i, p in enumerate(pens):
        S = pelt_segment(cost, n, float(p), min_size, 1)
        np.testing.assert_array_equal(G[i], S, err_msg=f"{kind} n={n} ms={min_size} pen={p}")


@pytest.mark.parametrize("kind", ["l2", "l1", "rbf", "gaussian", "poisson", "bernoulli"])
def test_grid_matches_scalar_random(kind):
    rng = np.random.default_rng(hash(kind) % 2**32)
    for _ in range(6):
        n = int(rng.integers(6, 220))
        if kind == "poisson":
            x = rng.poisson(3.0, n).astype(float)
        elif kind == "bernoulli":
            x = rng.integers(0, 2, n).astype(float)
        else:
            x = np.concatenate([rng.normal(0, 1, n // 2), rng.normal(2, 1.5, n - n // 2)])
        ms = int(rng.integers(1, 5))
        if n < 2 * ms:
            continue
        pens = np.asarray(
            _log_spaced_penalties(0.1, max(n * np.log(max(n, 2.0)), 2.0), 20)
        )
        _grid_vs_scalar(x, kind, ms, pens)


def test_grid_exact_ties_discrete_signal():
    # constant-ish integer signal → many exact cost ties; the band must pick
    # the same (largest) prev as the scalar descending scan at every penalty
    x = np.array([1.0, 1.0, 2.0, 2.0, 1.0, 1.0, 2.0, 2.0, 1.0, 1.0] * 4)
    pens = np.asarray(_log_spaced_penalties(0.0, 30.0, 15))  # includes the zero-min case
    _grid_vs_scalar(x, "l2", 2, pens)
    _grid_vs_scalar(x, "l1", 1, pens)


def test_grid_nan_cost_candidates_ar():
    # AR cost raises (→ NaN in cost_batch) on short/singular windows; the
    # grid's conservative keep must mirror the scalar path
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, 60)
    x[10:20] = 0.0  # constant run → singular normal equations for some (s, t)
    _grid_vs_scalar(x, "ar", 4, np.asarray(_log_spaced_penalties(0.5, 50.0, 10)))


def test_select_penalty_uses_grid_and_matches_jump_fallback():
    # jump > 1 falls back to the scalar loop; jump = 1 takes the grid path —
    # both must select the identical penalty/breakpoints they did before
    rng = np.random.default_rng(3)
    x = np.concatenate([rng.normal(0, 1, 50), rng.normal(4, 1, 50)])
    r1 = select_penalty(x, cost="gaussian", method="bic", min_size=3, num_steps=20)
    assert r1.breakpoints == [50]
    # brute-force replay of the grid path through the scalar DP
    from transcriptts.kernels.pelt import _score  # noqa: PLC0415

    cost = make_cost("gaussian")
    cost.fit(x)
    best = (np.inf, None)
    for p in [d[0] for d in r1.diagnostics]:
        bps = []
        CP = pelt_segment(cost, 100, p, 3, 1)
        from transcriptts.kernels.pelt import extract_breakpoints  # noqa: PLC0415

        bps = extract_breakpoints(CP, 100)
        s = _score("bic", bps, 100, cost, 3)
        if np.isfinite(s) and s < best[0]:
            best = (s, p, bps)
    assert r1.selected_penalty == best[1]
    assert r1.breakpoints == best[2]
