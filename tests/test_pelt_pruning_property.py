"""PELT pruning-semantics properties (pure numpy + DuckDB — no Spark).

Three layers:

1. The vectorized kernel (`pelt_segment`, searchsorted/mask mechanics over
   an admissible array) equals a direct SEQUENTIAL transcription of the
   reference's loop (PELTAlgorithm.cs:199-338: HashSet admissible set,
   descending candidate scan, Jump stride + hop quirk, pruning keep-rule),
   across randomized signals, costs, min_size and jump values.

2. Pruning is OBSERVABLE once min_size > 1 — it is NOT a pure optimization.
   The pruning theorem's "route through t" argument needs the (t, u) segment
   to be feasible, which fails for u - t < min_size; a candidate pruned via
   an infeasible route can be the true optimum later. [0,0,0,1,0,0,1] under
   the Gaussian cost (variance floor) is a concrete witness: the pruned
   (reference-faithful) DP returns [3, 5], the unpruned true optimum is [3].
   This is exactly why transcriptts/oracles.py simulates the pruned
   admissible set in its DuckDB fold instead of running a textbook O(n^2)
   unpruned DP.

3. The DuckDB oracle reproduces the ENGINE (pruned) on that witness input —
   i.e. the oracle follows reference semantics, not the textbook optimum.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from transcriptts.constants import PELT_TIE_EPSILON
from transcriptts.kernels.costs import make_cost
from transcriptts.kernels.pelt import extract_breakpoints, pelt_segment


def reference_transcription(cost_fn, n: int, penalty: float, min_size: int, jump: int = 1):
    """Sequential re-statement of PELTAlgorithm.cs:199-338 (set + loops), kept
    deliberately naive. Deviation shared with the kernel: ties within
    PELT_TIE_EPSILON resolve to the LARGEST prev (the reference's exact
    strict-< descending scan does the same for exact ties; the band exists
    for cross-engine float stability and is part of the engine contract)."""
    F = [math.inf] * (n + 1)
    F[0] = -penalty
    CP = [0] * (n + 1)
    admissible = {0}
    for t in range(min_size, n + 1):
        start_check = t - min_size
        # visited candidates: start_check, start_check - jump, ... (+ hop to 0)
        visited = [s for s in range(start_check, -1, -jump) if s in admissible]
        m = start_check % jump
        if jump > 1 and m > 0 and m in admissible and 0 in admissible and 0 not in visited:
            visited.append(0)
        cands = []
        for s in visited:
            c = float(cost_fn.cost_batch(np.array([s]), t)[0])
            v = F[s] + c + penalty
            if not math.isnan(v):
                cands.append((v, s))
        finite = [(v, s) for v, s in cands if math.isfinite(v)]
        if finite:
            best = min(v for v, _ in finite)
            F[t] = best
            CP[t] = max(s for v, s in finite if v <= best + PELT_TIE_EPSILON)
        else:
            F[t] = math.inf
            CP[t] = -1
        nxt = set()
        for s in admissible:
            if t - s >= min_size:
                c = float(cost_fn.cost_batch(np.array([s]), t)[0])
                if math.isnan(c):
                    if math.isfinite(F[s]):
                        nxt.add(s)
                elif F[s] + c <= F[t] + PELT_TIE_EPSILON:
                    nxt.add(s)
            elif math.isfinite(F[s]):
                nxt.add(s)
        if math.isfinite(F[t]):
            nxt.add(t)
        admissible = nxt
    return np.array(CP, dtype=np.int64)


def unpruned_dp(cost_fn, n: int, penalty: float, min_size: int) -> np.ndarray:
    """Textbook O(n^2) DP — every candidate at every endpoint (the TRUE
    optimum). Used only to witness that pruning is observable."""
    F = np.full(n + 1, np.inf)
    F[0] = -penalty
    CP = np.zeros(n + 1, dtype=np.int64)
    for t in range(min_size, n + 1):
        starts = np.arange(0, t - min_size + 1)
        costs = cost_fn.cost_batch(starts, t)
        v = F[starts] + costs + penalty
        v = np.where(np.isnan(v), np.inf, v)
        best = float(v.min())
        if np.isfinite(best):
            tied = np.nonzero(v <= best + PELT_TIE_EPSILON)[0]
            F[t] = best
            CP[t] = int(starts[tied[-1]])
        else:
            F[t] = np.inf
            CP[t] = -1
    return CP


def _kernel_vs_transcription(signal: np.ndarray, cost_name: str, penalty: float,
                             min_size: int, jump: int = 1):
    n = signal.shape[-1]
    cp_k = pelt_segment(make_cost(cost_name).fit(signal), n, penalty, min_size=min_size, jump=jump)
    cp_r = reference_transcription(
        make_cost(cost_name).fit(signal), n, penalty, min_size, jump=jump
    )
    assert extract_breakpoints(cp_k, n) == extract_breakpoints(cp_r, n), (
        cost_name, penalty, min_size, jump, signal.tolist(),
    )


@settings(max_examples=60, deadline=None)
@given(
    values=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False), min_size=6, max_size=40
    ),
    penalty=st.sampled_from([0.5, 2.0, 10.0]),
    min_size=st.sampled_from([1, 2, 3]),
    cost_name=st.sampled_from(["l2", "l1", "gaussian", "rbf"]),
)
def test_kernel_equals_reference_transcription_continuous(values, penalty, min_size, cost_name):
    _kernel_vs_transcription(np.array(values, dtype=np.float64), cost_name, penalty, min_size)


@settings(max_examples=40, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=0, max_value=30), min_size=6, max_size=40),
    penalty=st.sampled_from([0.5, 2.0, 10.0]),
    min_size=st.sampled_from([1, 2]),
    cost_name=st.sampled_from(["poisson", "bernoulli"]),
)
def test_kernel_equals_reference_transcription_discrete(counts, penalty, min_size, cost_name):
    sig = np.array([min(c, 1) for c in counts] if cost_name == "bernoulli" else counts,
                   dtype=np.float64)
    _kernel_vs_transcription(sig, cost_name, penalty, min_size)


@settings(max_examples=40, deadline=None)
@given(
    values=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False), min_size=8, max_size=60
    ),
    jump=st.sampled_from([2, 3, 5]),
    min_size=st.sampled_from([1, 2, 3]),
)
def test_kernel_equals_reference_transcription_jump(values, jump, min_size):
    """The Jump stride + hop quirk, against the sequential scan."""
    _kernel_vs_transcription(np.array(values, dtype=np.float64), "l2", 2.0, min_size, jump=jump)


PRUNING_WITNESS = np.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 1.0])


def test_pruning_is_observable_with_min_size_gt_1():
    """Layer 2: the engine (reference-faithful pruned DP) and the textbook
    unpruned optimum DIVERGE on the witness — pruned [3, 5] vs optimal [3]
    (the route through t=6 that justifies pruning s=3 is infeasible at u=7
    because 7 - 6 < min_size). Locks in why oracles.py simulates adm[]."""
    n = len(PRUNING_WITNESS)
    for sig in (PRUNING_WITNESS, (PRUNING_WITNESS - PRUNING_WITNESS.mean()) / PRUNING_WITNESS.std()):
        bp_pruned = extract_breakpoints(
            pelt_segment(make_cost("gaussian").fit(sig), n, 0.5, min_size=2), n
        )
        bp_ref = extract_breakpoints(
            reference_transcription(make_cost("gaussian").fit(sig), n, 0.5, 2), n
        )
        bp_opt = extract_breakpoints(unpruned_dp(make_cost("gaussian").fit(sig), n, 0.5, 2), n)
        assert bp_pruned == bp_ref == [3, 5]
        assert bp_opt == [3]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("cost_name,penalty", [("l2", 10.0), ("gaussian", 2.0)])
def test_duckdb_oracle_matches_engine_on_random_signals(seed, cost_name, penalty):
    """Random-signal oracle parity, independent of the driver's testdata:
    the DuckDB fold (z-score CTE + cost exprs + pruned DP) reproduces the
    kernel's breakpoints on seeded noise-with-steps signals."""
    import duckdb

    from transcriptts.oracles import pelt_gaussian_sql, pelt_l2_sql

    rng = np.random.default_rng(seed)
    sig = np.concatenate(
        [rng.normal(0, 1, 12), rng.normal(4, 1, 10), rng.normal(-2, 1, 12)]
    )
    z = (sig - sig.mean()) / sig.std()
    n = len(sig)
    bp_kernel = extract_breakpoints(
        pelt_segment(make_cost(cost_name).fit(z), n, penalty, min_size=3), n
    )

    vals = ", ".join(f"('c', {i}, {v!r})" for i, v in enumerate(sig))
    t_sql = f"t AS (SELECT * FROM (VALUES {vals}) AS v(conv_id, turn_idx, value))"
    builder = pelt_l2_sql if cost_name == "l2" else pelt_gaussian_sql
    sql = builder(t_sql, penalty=penalty, min_size=3)
    con = duckdb.connect()
    bp_oracle = sorted(int(r[1]) for r in con.sql(sql).fetchall())
    assert bp_oracle == bp_kernel, (seed, cost_name, bp_oracle, bp_kernel)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_duckdb_oracle_matches_engine_on_random_counts_poisson(seed):
    """Discrete-cost oracle parity on random count signals — exercises the
    epsilon-banded DP comparisons (libm-ulp-stable decisions)."""
    import duckdb

    from transcriptts.oracles import pelt_poisson_sql

    rng = np.random.default_rng(100 + seed)
    sig = np.concatenate([rng.poisson(3, 12), rng.poisson(12, 10), rng.poisson(1, 12)]).astype(
        np.float64
    )
    n = len(sig)
    bp_kernel = extract_breakpoints(
        pelt_segment(make_cost("poisson").fit(sig), n, 5.0, min_size=3), n
    )
    vals = ", ".join(f"('c', {i}, {v!r})" for i, v in enumerate(sig))
    t_sql = f"t AS (SELECT * FROM (VALUES {vals}) AS v(conv_id, turn_idx, value))"
    con = duckdb.connect()
    bp_oracle = sorted(
        int(r[1]) for r in con.sql(pelt_poisson_sql(t_sql, penalty=5.0, min_size=3)).fetchall()
    )
    assert bp_oracle == bp_kernel, (seed, bp_oracle, bp_kernel)


@pytest.mark.parametrize("seed", [0, 1])
def test_duckdb_oracle_matches_engine_on_random_bits_bernoulli(seed):
    import duckdb

    from transcriptts.oracles import pelt_bernoulli_sql

    rng = np.random.default_rng(200 + seed)
    raw = np.concatenate([rng.normal(-1, 1, 14), rng.normal(1.5, 1, 14)])
    z = (raw - raw.mean()) / raw.std()
    bits = (z > 0).astype(np.float64)
    n = len(raw)
    bp_kernel = extract_breakpoints(
        pelt_segment(make_cost("bernoulli").fit(bits), n, 1.0, min_size=3), n
    )
    vals = ", ".join(f"('c', {i}, {v!r})" for i, v in enumerate(raw))
    t_sql = f"t AS (SELECT * FROM (VALUES {vals}) AS v(conv_id, turn_idx, value))"
    con = duckdb.connect()
    bp_oracle = sorted(
        int(r[1]) for r in con.sql(pelt_bernoulli_sql(t_sql, penalty=1.0, min_size=3)).fetchall()
    )
    assert bp_oracle == bp_kernel, (seed, bp_oracle, bp_kernel)


def test_duckdb_oracle_matches_engine_on_pruning_witness():
    """Layer 3: the DuckDB PELT oracle follows ENGINE semantics (pruned
    admissible set), not the textbook optimum, on the witness input."""
    import duckdb

    from transcriptts.oracles import pelt_gaussian_sql

    vals = ", ".join(f"('c', {i}, {v!r})" for i, v in enumerate(PRUNING_WITNESS))
    t_sql = f"t AS (SELECT * FROM (VALUES {vals}) AS v(conv_id, turn_idx, value))"
    sql = pelt_gaussian_sql(t_sql, penalty=0.5, min_size=2)
    con = duckdb.connect()
    rows = con.sql(sql).fetchall()
    oracle_bps = sorted(int(r[1]) for r in rows)
    assert oracle_bps == [3, 5], oracle_bps
