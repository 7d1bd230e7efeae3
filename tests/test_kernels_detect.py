"""Golden tests for PELT / CUSUM / cost functions — expectations ported from
SignalSharp.Tests/Detection/* and SignalSharp.Tests/CostFunctions/*."""

from __future__ import annotations

import math

import numpy as np
import pytest

from transcriptts.kernels import costs as C
from transcriptts.kernels.cusum import cusum
from transcriptts.kernels.pelt import pelt, select_penalty

STEP = [1.0, 1, 1, 5, 5, 5, 1, 1, 1]


# --- PELT (PELTTests.cs) -----------------------------------------------------


def test_pelt_l2_step_signal():
    assert pelt(STEP, penalty=2.0, cost="l2") == [3, 6]  # PELTTests.cs:35-54


def test_pelt_rbf_step_signal():
    assert pelt(STEP, penalty=0.1, cost="rbf") == [3, 6]  # :118-137


@pytest.fixture(scope="module")
def long_pattern():
    return np.tile([1, 1, 1, 5, 5, 5, 1, 1, 1, 2, 2, 3, 4, 2, 1], 100).astype(float)


def test_pelt_rbf_long_jump5(long_pattern):
    # :94-115 — approximate mode, Jump=5, MinSize=2, penalty=10 → [1496,1498]
    assert pelt(long_pattern, penalty=10.0, cost="rbf", min_size=2, jump=5) == [1496, 1498]


def test_pelt_rbf_long_exact_no_breaks(long_pattern):
    assert pelt(long_pattern, penalty=10.0, cost="rbf", min_size=2, jump=1) == []  # :75-91


def test_pelt_short_signal_guards():
    assert pelt([1.0], penalty=1.0) == []
    assert pelt([1.0, 5.0, 1.0], penalty=1.0, min_size=2) == []  # n < 2*MinSize


def test_pelt_gaussian_variance_change():
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(0, 0.1, 50), rng.normal(0, 5.0, 50)])
    assert pelt(x, penalty=20.0, cost="gaussian", min_size=5) == [50]


def test_pelt_negative_penalty_rejected():
    with pytest.raises(ValueError):
        pelt(STEP, penalty=-1.0)


# --- CUSUM (CUSUMTests.cs) ---------------------------------------------------


def test_cusum_doc_example():
    # CUSUMAlgorithm.cs:46-58 doc example
    sig = [0.2, 0.1, 0.2, 4.0, 0.1, 0.2, -2.0, 0.2, 0.1]
    assert cusum(sig, expected_mean=0.2, expected_std_dev=1.0, slack_factor=0.1, threshold_factor=1.2) == [3, 6]


def test_cusum_spike_defaults():
    assert cusum([0.1, 0.2, 10.0, -10.0, 0.1, 0.2]) == [2, 3]  # CUSUMTests.cs:175-186


def test_cusum_short_and_validation():
    assert cusum([1.0]) == []
    with pytest.raises(ValueError):
        cusum([1.0, 2.0], expected_std_dev=0.0)


# --- cost functions (CostFunctionTests) --------------------------------------


def test_gaussian_cost_variance_floor():
    # GaussianLikelihoodCostFunctionTests.cs:104-126 — zero-variance segments
    c = C.GaussianCost().fit([1.0, 1, 1, 5, 5, 5])
    assert c.cost(0, 3) == pytest.approx(3 * math.log(1e-10), abs=1e-9)
    assert c.cost(3, 6) == pytest.approx(3 * math.log(1e-10), abs=1e-9)


def test_gaussian_cost_whole_signal():
    # :128-137 — n=6, SSE=24, varMLE=4 → 6*ln(4)
    c = C.GaussianCost().fit([1.0, 1, 1, 5, 5, 5])
    assert c.cost(0, 6) == pytest.approx(6 * math.log(4.0), abs=1e-9)


def test_l2_cost():
    c = C.L2Cost().fit([1.0, 1, 1, 5, 5, 5])
    assert c.cost(0, 3) == pytest.approx(0.0, abs=1e-12)
    assert c.cost(0, 6) == pytest.approx(24.0, abs=1e-9)  # SSE around mean 3


def test_l1_cost():
    c = C.L1Cost().fit([1.0, 2, 9, 4, 5])
    seg = np.array([1.0, 2, 9, 4, 5])
    assert c.cost(0, 5) == pytest.approx(np.abs(seg - 4.0).sum(), abs=1e-12)


def test_poisson_cost_zero_segment():
    # PoissonLikelihoodCostFunction.cs:147-150 doc example
    c = C.PoissonCost().fit([0.0, 0, 0, 5, 5])
    assert c.cost(0, 3) == 0.0
    S, n = 10.0, 2
    assert c.cost(3, 5) == pytest.approx(2 * (S - S * math.log(S) + S * math.log(n)), abs=1e-9)


def test_poisson_rejects_negative():
    with pytest.raises(ValueError):
        C.PoissonCost().fit([1.0, -0.5])


def test_bernoulli_cost():
    c = C.BernoulliCost().fit([0.0, 0, 1, 1, 1, 0])
    assert c.cost(0, 2) == 0.0  # all zeros
    assert c.cost(2, 5) == 0.0  # all ones
    S, F_, n = 3.0, 3.0, 6
    expected = -2 * (S * math.log(S) + F_ * math.log(F_) - n * math.log(n))
    assert c.cost(0, 6) == pytest.approx(expected, abs=1e-9)
    with pytest.raises(ValueError):
        C.BernoulliCost().fit([0.0, 0.5])


def test_binomial_cost():
    k = [2.0, 3, 1, 0]
    t = [5.0, 5, 5, 5]
    c = C.BinomialCost().fit(np.array([k, t]))
    K, N = 6.0, 20.0
    expected = -(K * math.log(K) + (N - K) * math.log(N - K) - N * math.log(N))
    assert c.cost(0, 4) == pytest.approx(expected, abs=1e-9)
    assert c.cost(3, 4) == 0.0  # K == 0
    with pytest.raises(ValueError):
        C.BinomialCost().fit([1.0, 2.0])  # not 2 rows


def test_ar_cost_constant_with_intercept_is_inf():
    c = C.ARCost(order=1).fit([5.0] * 10)
    assert c.cost(0, 10) == np.inf  # collinearity (ARCostFunction.cs:35)


def test_ar_cost_matches_lstsq_rss():
    rng = np.random.default_rng(7)
    x = np.zeros(60)
    for t in range(1, 60):
        x[t] = 0.6 * x[t - 1] + rng.normal()
    c = C.ARCost(order=1).fit(x)
    A = np.column_stack([np.ones(59), x[:-1]])
    resid = x[1:] - A @ np.linalg.lstsq(A, x[1:], rcond=None)[0]
    rss = float(resid @ resid)
    assert c.cost(0, 60) == pytest.approx(rss, abs=1e-9)
    assert c.likelihood_metric(0, 60) == pytest.approx(59 * math.log(rss / 59), abs=1e-9)
    assert c.segment_param_count(10) == 3  # p + variance + intercept
    with pytest.raises(ValueError):
        c.cost(0, 2)  # below min segment length max(p+1, 2p+1)=3


def test_param_counts():
    g = C.GaussianCost().fit(np.zeros((2, 10)))
    assert g.segment_param_count(5) == 4  # 2 per dimension
    p = C.PoissonCost().fit(np.zeros((2, 10)))
    assert p.segment_param_count(5) == 2
    b = C.BinomialCost().fit(np.array([[1.0, 2], [3.0, 3]]))
    assert b.segment_param_count(5) == 1


# --- penalty selection (PELTPenaltySelectorTests.cs) -------------------------


def test_select_penalty_bic_recovers_step():
    x = np.concatenate([np.full(30, 0.0), np.full(30, 8.0), np.full(30, -3.0)])
    x += np.sin(np.arange(90)) * 0.1  # break exact-constant degeneracy
    res = select_penalty(x, cost="gaussian", method="bic", min_size=2)
    assert res.breakpoints == [30, 60]
    assert res.selected_penalty > 0
    assert len(res.diagnostics) > 10


def test_select_penalty_rejects_non_ic_cost():
    with pytest.raises(ValueError):
        select_penalty(STEP, cost="l2")


@pytest.mark.parametrize("method", ["aic", "aicc"])
def test_select_penalty_other_methods(method):
    x = np.concatenate([np.full(25, 1.0), np.full(25, 9.0)]) + np.cos(np.arange(50)) * 0.2
    res = select_penalty(x, cost="gaussian", method=method, min_size=2)
    assert res.breakpoints == [25]


# --- vectorized batch paths vs scalar costs ----------------------------------


def test_l1_cost_batch_matches_scalar_both_paths():
    """Full-table (short series) and per-endpoint (long series) L1 batch paths
    agree with the scalar on-demand-median cost to summation-order ulp."""
    rng = np.random.default_rng(7)
    for n, force_long in ((37, False), (37, True)):
        x = rng.normal(size=(2, n))
        c = C.L1Cost().fit(x)
        if force_long:
            c._FULL_TABLE_MAX_N = 0  # exercise the per-endpoint path
        for end in (1, 5, n // 2, n):
            starts = np.arange(end)
            got = c.cost_batch(starts, end)
            ref = np.array([c.cost(int(s), end) for s in starts])
            assert np.allclose(ref, got, atol=1e-9)


def test_ar2_cost_batch_matches_lstsq_rss():
    """AR(2) closed-form centered Cramer vs an explicit OLS solve."""
    rng = np.random.default_rng(8)
    x = rng.normal(size=80).cumsum() * 0.3 + rng.normal(size=80)
    c = C.ARCost(order=2).fit(x)
    end = 80
    starts = np.arange(0, end - 4)
    got = c.cost_batch(starts, end)
    for s in (0, 10, 40, 70):
        seg = x[s:end]
        L = len(seg)
        A = np.column_stack([np.ones(L - 2), seg[1 : L - 1], seg[0 : L - 2]])
        y = seg[2:]
        coef, *_ = np.linalg.lstsq(A, y, rcond=None)
        rss = float(((y - A @ coef) ** 2).sum())
        assert abs(got[s] - rss) <= 1e-6 * max(1.0, rss)


def test_ar_cost_batch_failure_encoding():
    """Unified encoding: too-short segments (scalar raise) -> NaN; degenerate
    (constant / singular) segments (scalar +inf) -> +inf."""
    x = np.concatenate([np.full(10, 2.0), np.arange(10.0)])
    for order in (1, 2):
        c = C.ARCost(order=order).fit(x)
        m = c.min_segment_length()
        got = c.cost_batch(np.array([20 - m + 1, 20 - m]), 20)
        assert np.isnan(got[0])  # length m-1: scalar raises
        assert np.isfinite(got[1]) or np.isinf(got[1])
        # constant segment -> +inf on both paths
        gc = c.cost_batch(np.array([0]), 10 if order == 1 else 9)
        assert np.isinf(gc[0])
        assert np.isinf(c.cost(0, 10 if order == 1 else 9))


def test_ar_general_batch_matches_scalar():
    """The stacked normal-equations path (orders > 2, intercept-free) agrees
    with the scalar per-segment np.linalg.solve across every candidate
    start, including the NaN (short) / +inf (degenerate) encoding."""
    rng = np.random.default_rng(11)
    x = rng.normal(size=90).cumsum() * 0.4 + rng.normal(size=90)
    for order, intercept in ((3, True), (4, True), (1, False), (2, False), (3, False)):
        c = C.ARCost(order=order, include_intercept=intercept).fit(x)
        for end in (c.min_segment_length() + 1, 30, 90):
            starts = np.arange(end)
            got = c.cost_batch(starts, end)
            for s in range(end):
                if end - s < c.min_segment_length():
                    assert np.isnan(got[s]), (order, intercept, s, end)
                else:
                    ref = c.cost(s, end)
                    if np.isinf(ref) or np.isinf(got[s]):
                        # singular-detection convention may differ at the
                        # boundary (scalar solve can return unstable finite
                        # garbage where the batch guard declares +inf);
                        # require agreement only when both are finite
                        continue
                    assert abs(got[s] - ref) <= 1e-6 * max(1.0, abs(ref)), (
                        order, intercept, s, end, got[s], ref,
                    )


def test_ar_general_batch_constant_and_singular():
    """Constant segments: +inf with intercept (collinearity), solvable
    without intercept when x != 0; all-zero segments singular either way."""
    x = np.concatenate([np.full(12, 3.0), np.zeros(12)])
    ci = C.ARCost(order=3, include_intercept=True).fit(x)
    assert np.isinf(ci.cost_batch(np.array([0]), 12)[0])
    # order >= 2 on a constant segment: identical lag columns -> collinear
    # Gram -> +inf even without intercept (scalar solve raises LinAlgError)
    cf3 = C.ARCost(order=3, include_intercept=False).fit(x)
    assert np.isinf(cf3.cost_batch(np.array([0]), 12)[0])
    # order 1 without intercept IS solvable on a nonzero constant: x[t] = 1*x[t-1]
    cf1 = C.ARCost(order=1, include_intercept=False).fit(x)
    got = cf1.cost_batch(np.array([0]), 12)[0]
    assert np.isfinite(got) and got <= 1e-9
    assert np.isinf(cf1.cost_batch(np.array([12]), 24)[0])  # all-zero: singular


def test_pelt_ar3_matches_ar_scalar_dp():
    """End-to-end: PELT with the general AR(3) batch path equals PELT with
    the per-candidate scalar fallback (forced via the base-class loop)."""
    rng = np.random.default_rng(12)
    x = np.concatenate([
        rng.normal(size=60) * 0.5,
        rng.normal(size=60) * 0.5 + np.sin(np.arange(60)) * 4.0,
    ])
    fast = pelt(x, penalty=25.0, cost="ar", order=3, min_size=8)

    class SlowAR(C.ARCost):
        def cost_batch(self, starts, end):
            return C.CostFunction.cost_batch(self, starts, end)

    slow = pelt(x, penalty=25.0, cost=SlowAR(order=3), min_size=8)
    assert fast == slow


def test_pelt_ar2_detects_variance_shift():
    rng = np.random.default_rng(9)
    x = np.concatenate([rng.normal(size=150), rng.normal(size=150) * 4 + 8])
    bps = pelt(x, penalty=30.0, cost="ar", order=2, min_size=5)
    assert any(abs(b - 150) <= 5 for b in bps)


def test_pelt_multivariate_l2_sums_dimensions():
    """A change visible only in dim 2 is found multivariate but invisible to
    dim 1 alone (reference PELTAlgorithm.cs:103-113: (D, N) matrix; multi-dim
    L2 sums per-dimension SSEs, L2CostFunction.cs:105-139)."""
    rng = np.random.default_rng(5)
    d1 = rng.normal(size=60) * 0.05
    d2 = np.concatenate([np.zeros(30), np.full(30, 4.0)]) + rng.normal(size=60) * 0.05
    assert pelt(d1, penalty=5.0, cost="l2", min_size=3) == []
    assert pelt(np.vstack([d1, d2]), penalty=5.0, cost="l2", min_size=3) == [30]
    # 1-row 2D lift == 1D (reference Detect_SimpleSignal 2D variant)
    sig = np.array([1.0, 1, 1, 5, 5, 5, 1, 1, 1])
    assert pelt(sig[None, :], penalty=2.0, cost="l2") == pelt(sig, penalty=2.0, cost="l2") == [3, 6]


def test_pelt_ar1_nointercept_oracle_parity():
    """The intercept-free AR(1) DuckDB oracle (oracles.pelt_ar1_nointercept_sql)
    replays the kernel DP exactly: randomized piecewise signals including
    CONSTANT segments, which are +inf under the intercept model's collinearity
    guard but a legitimate zero-RSS fit without intercept — the case that
    distinguishes the two oracles."""
    import duckdb
    import pandas as pd

    from transcriptts.oracles import pelt_ar1_nointercept_sql

    t_sql = """
t AS (
  SELECT cast(user_id AS varchar) AS conv_id,
         cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS int) AS turn_idx,
         event_type AS role, props AS text, event_type AS tool, ts, value
  FROM events
)
"""
    for seed, pen in [(1, 2.0), (3, 1.0)]:
        rng = np.random.default_rng(seed)
        rows = []
        for uid in range(40):
            segs = []
            for _ in range(int(rng.integers(1, 5))):
                n = int(rng.integers(4, 40))
                kind = rng.integers(0, 4)
                if kind == 0:
                    segs.append(np.full(n, float(rng.normal(0, 2))))
                elif kind == 1:
                    phi = rng.uniform(-0.9, 0.9)
                    v = np.zeros(n)
                    for i in range(1, n):
                        v[i] = phi * v[i - 1] + rng.normal()
                    segs.append(v + rng.normal(0, 2))
                elif kind == 2:
                    segs.append(rng.normal(rng.normal(0, 3), rng.uniform(0.2, 2), n))
                else:
                    segs.append(np.linspace(0, rng.normal(0, 5), n))
            for i, v in enumerate(np.concatenate(segs)):
                rows.append((uid, float(i), i, "msg", "p", float(v)))
        df = pd.DataFrame(
            rows, columns=["user_id", "ts", "event_id", "event_type", "props", "value"]
        )
        con = duckdb.connect()
        con.register("events", df)
        oracle = con.execute(pelt_ar1_nointercept_sql(t_sql, pen, 3)).df()
        expected = set()
        for uid, g in df.groupby("user_id"):
            v = g.sort_values(["ts", "event_id"])["value"].to_numpy(float)
            sd = v.std()
            z = (v - v.mean()) / sd if sd > 0 else np.zeros_like(v)
            for b in pelt(z, penalty=pen, cost="ar", min_size=3, order=1, include_intercept=False):
                expected.add((str(uid), int(b)))
        got = set(
            map(tuple, oracle[["conv_id", "breakpoint_idx"]].itertuples(index=False))
        )
        assert got == expected and len(got) > 30, (seed, pen, len(got))
