"""DuckDB oracle SQL builders for the PELT DP family and grid-searched Holt.

These generate ANSI-ish SQL (DuckDB dialect) that reproduces the engine's
sequential kernels exactly, so the driver's CORRECTNESS gate can hash-compare
them against the Spark queries. They are verification infrastructure, not
engine code — the Spark side never imports them at query time.

The DP fold simulates the reference's PRUNED admissible set exactly — it
does NOT run a textbook unpruned O(n^2) DP. Pruning is only a pure
optimization when min_size == 1: the theorem's "s is dominated via the route
through t'" argument needs the (t', u) segment to be feasible, which fails
for u - t' < min_size, so with min_size > 1 a pruned candidate can re-emerge
as the true optimum at a nearby endpoint and the reference (which prunes
with F[s] + cost(s, t') <= F[t'], PELTAlgorithm.cs:287-338, no feasibility
guard) returns a different answer than the unpruned optimum. Witness:
[0,0,0,1,0,0,1] under the Gaussian cost, penalty 0.5, min_size 2 — pruned
(engine/reference) [3, 5] vs unpruned optimum [3]; property-tested in
tests/test_pelt_pruning_property.py, which also checks THESE oracles return
the engine's answer on that witness. The fold therefore carries adm[]
alongside F[]/CP[] and replays the reference's keep-rule verbatim.
Tie-breaking also matches: the reference scans prev descending with strict
'<', so the LARGEST prev among equal candidates wins — reproduced via
list_max over the argmin set.

The DP recursion (one recursive CTE per query) mirrors PELTAlgorithm.cs:199-268:
F[0] = -penalty, endpoints t = min_size..n, candidates s in [0, t - min_size],
F[t] = min_s F[s] + cost(s, t) + penalty; breakpoints by backtracking CP[]
from n (:349-383). Segment costs are precomputed as a plain (conv_id, t,
row_costs[]) table OUTSIDE the recursion — they never depend on F — so the
recursion state stays O(n) per series.

Floating-point parity notes: every cost is written with the same operation
order as the numpy `cost_batch` implementations (kernels/costs.py), and prefix
sums come from sequential running-window sums matching np.cumsum. Engine ulp
differences (z-score aggregation order, libm exp/ln) cannot flip DP decisions
whose margins are penalty-sized — but discrete costs (Poisson/Bernoulli/
Binomial) produce mathematically-EQUAL candidate decompositions whose computed
doubles differ by a libm ulp between numpy and DuckDB, so both the kernel DP
and these oracles band candidate/pruning comparisons by PELT_TIE_EPSILON
(constants.py) instead of exact equality. Integer breakpoint outputs are then
deterministic, and the real-valued outputs (penalty selection scores, Holt
forecasts) are compared after 6-dp rounding.
"""

from __future__ import annotations

# --- shared fragments --------------------------------------------------------

# Per-conversation z-scored signal (matches __spark_entry__._standardized_signal).
ZSCORE_CTE = """
zs AS (
  SELECT conv_id, turn_idx,
         (value - avg(value) OVER w) / stddev_pop(value) OVER w AS v
  FROM t WINDOW w AS (PARTITION BY conv_id)
)
"""


def _prefix_state_cte(src: str, min_size: int) -> str:
    """st(conv_id, n, vs, ps, ps2) — value list + prefix sums of v and v*v.

    Running-window sums accumulate left-to-right exactly like np.cumsum
    (L2Cost.fit / GaussianCost.fit prefix arrays, kernels/costs.py:88-94).
    """
    return f"""
sacc AS (
  SELECT conv_id, turn_idx, v,
         sum(v) OVER wacc AS sv, sum(v * v) OVER wacc AS sv2
  FROM {src}
  WINDOW wacc AS (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
slist AS (
  SELECT conv_id, list(v ORDER BY turn_idx) AS vs,
         list(sv ORDER BY turn_idx) AS pst, list(sv2 ORDER BY turn_idx) AS pst2
  FROM sacc GROUP BY conv_id
),
st AS (
  SELECT conv_id, len(vs) AS n, vs,
         list_prepend(0.0::DOUBLE, pst) AS ps,
         list_prepend(0.0::DOUBLE, pst2) AS ps2
  FROM slist WHERE len(vs) >= {2 * min_size}
)
"""


# SQL twins of the closed-form cost_batch expressions (1-indexed lists; sp =
# segment start, t = segment end, both in DP index space 0..n).
def l2_cost_expr() -> str:
    """L2Cost.cost_batch (kernels/costs.py:102-107)."""
    return (
        "((ps2[t + 1] - ps2[sp + 1])"
        " - (ps[t + 1] - ps[sp + 1]) * (ps[t + 1] - ps[sp + 1]) / (t - sp))"
    )


def gaussian_cost_expr() -> str:
    """GaussianCost.cost_batch (kernels/costs.py:214-222): len * ln(max(max(sse,0)/len, 1e-10))."""
    return (
        "((t - sp) * ln(greatest(greatest("
        + l2_cost_expr()
        + ", 0.0) / (t - sp), 1e-10)))"
    )


def poisson_cost_expr() -> str:
    """PoissonCost.cost_batch (kernels/costs.py:257-267); ps = prefix of counts."""
    s = "(ps[t + 1] - ps[sp + 1])"
    return (
        f"(CASE WHEN abs({s}) <= 1e-9 THEN 0.0 "
        f"ELSE 2.0 * ({s} - {s} * ln(greatest({s}, 1e-300)) + {s} * ln((t - sp)::DOUBLE)) END)"
    )


def bernoulli_cost_expr() -> str:
    """BernoulliCost.cost_batch (kernels/costs.py:301-315); ps = prefix of 0/1."""
    s = "(ps[t + 1] - ps[sp + 1])"
    f_ = f"((t - sp)::DOUBLE - {s})"
    return (
        f"(CASE WHEN abs({s}) <= 1e-9 OR abs({s} - (t - sp)::DOUBLE) <= 1e-9 THEN 0.0 "
        f"ELSE -2.0 * ({s} * ln({s}) + {f_} * ln({f_}) - (t - sp)::DOUBLE * ln((t - sp)::DOUBLE)) END)"
    )


def binomial_cost_expr() -> str:
    """BinomialCost.cost_batch (kernels/costs.py:363-380); psk/pstr prefixes of
    successes / trials. All quantities are integer-valued doubles → exact."""
    k = "(psk[t + 1] - psk[sp + 1])"
    nn = "(pstr[t + 1] - pstr[sp + 1])"
    nk = f"({nn} - {k})"
    return (
        f"(CASE WHEN abs({nn}) <= 1e-9 OR abs({k}) <= 1e-9 OR abs({k} - {nn}) <= 1e-9 THEN 0.0 "
        f"ELSE greatest(0.0, -(({k} * ln({k})) + ({nk} * ln({nk})) - ({nn} * ln({nn})))) END)"
    )


def _pairs_cte(cost_expr: str, min_size: int) -> str:
    """costt(conv_id, t, row_costs): all segment costs for t in [m, n], sp in [0, t-m]."""
    return f"""
pairs AS (
  SELECT conv_id, t, sp, {cost_expr} AS c
  FROM st,
       unnest(generate_series({min_size}, n)) AS ut(t),
       unnest(generate_series(0, t - {min_size})) AS us(sp)
),
costt AS (SELECT conv_id, t, list(c ORDER BY sp) AS row_costs FROM pairs GROUP BY conv_id, t)
"""


def _dp_state_expr(pen_expr: str, min_size: int, jump: int = 1) -> str:
    """The per-endpoint DP transition as a list_reduce lambda body.

    This simulates the reference's PRUNED admissible set exactly
    (PELTAlgorithm.cs:287-338 / kernels/pelt.py:90-101) — pruning is NOT a
    pure optimization once min_size > 1: a candidate pruned at t' is
    dominated via t' only at endpoints where t' is already mature
    (t - t' >= min_size), so inside that young window the pruned DP can pick
    a different (and that IS the reference semantics) optimum than an
    unpruned DP. The fold state therefore carries adm[] alongside F[]/CP[]:
    candidates come from the mature prefix of adm, pruning keeps mature s
    with F[s] + cost(s,t) <= F[t], young entries survive, and t joins when
    F[t] is finite.

    jump > 1 additionally reproduces the candidate stride AND the hop quirk
    (PELTAlgorithm.cs:258-266, kernels/pelt.py:64-73): with r = t - min_size,
    eligible mature candidates are s with (r - s) % jump == 0, plus s = 0
    whenever m = r % jump > 0 is itself in the admissible set.

    A list_reduce fold (not a recursive CTE) because DuckDB re-executes the
    full recursive-part plan per iteration — ~0.5 s/step makes an 80-step DP
    take ~45 s; the fold runs the identical transition in ~2 s total. The
    accumulator and the step elements share one struct type (list_reduce
    folds a single homogeneous list): steps carry (t, rc), state rows carry
    (fs, cps, adm); unused fields ride along as NULL. The nested
    single-element list_transform calls are let-bindings for best/fnew.
    """
    m = min_size
    cand_val = f"(acc.fs[s + 1] + x.rc[s + 1] + {pen_expr})"
    if jump <= 1:
        elig = "TRUE"
    else:
        elig = (
            f"(((x.t - {m}) - s) % {jump} = 0"
            f" OR (s = 0 AND (x.t - {m}) % {jump} > 0"
            f" AND list_contains(acc.adm, ((x.t - {m}) % {jump})::BIGINT)))"
        )
    return f"""
      (acc, x) -> list_transform(
        [list_min([CASE WHEN {elig} THEN {cand_val} END
                   FOR s IN acc.adm IF s <= x.t - {m}])],
        best -> list_transform(
          [CASE WHEN best IS NOT NULL AND isfinite(best)
                THEN best ELSE 'infinity'::DOUBLE END],
          fnew -> {{
            't': x.t, 'rc': NULL::DOUBLE[],
            'fs': list_append(acc.fs, fnew),
            'cps': list_append(acc.cps,
              CASE WHEN best IS NOT NULL AND isfinite(best)
                   THEN list_max([s FOR s IN acc.adm
                                  IF s <= x.t - {m} AND {elig}
                                  AND {cand_val} <= best + 1e-9])
                   ELSE -1::BIGINT END),
            'adm': list_concat(list_concat(
                     [s FOR s IN acc.adm IF s <= x.t - {m}
                      AND acc.fs[s + 1] + x.rc[s + 1] <= fnew + 1e-9],
                     [s FOR s IN acc.adm IF s > x.t - {m} AND isfinite(acc.fs[s + 1])]),
                   CASE WHEN isfinite(fnew) THEN [x.t::BIGINT] ELSE []::BIGINT[] END)
          }})[1])[1]"""


def _dp_init_expr(pen_expr: str, min_size: int) -> str:
    """Initial fold state: F[] = [-penalty, inf, ..], CP[] = [0, ..], adm = [0]."""
    fs = ", ".join([f"(-({pen_expr}))::DOUBLE"] + ["'infinity'::DOUBLE"] * (min_size - 1))
    cps = ", ".join(["0"] * min_size)
    return (
        f"{{'t': NULL::BIGINT, 'rc': NULL::DOUBLE[], "
        f"'fs': [{fs}], 'cps': [{cps}]::BIGINT[], 'adm': [0]::BIGINT[]}}"
    )


def _dp_fold_cte(pen_expr: str, min_size: int, jump: int = 1) -> str:
    """costl/dp/bpl: cost rows per conv folded through the DP, CP backtracked.

    Backtracking is also a bounded fold: the CP chain from n has at most
    ceil(n/min_size) links, so folding that many dummy steps with an
    (idx, bps) walker reproduces the reference's while-loop
    (PELTAlgorithm.cs:349-383)."""
    m = min_size
    return f"""
costl AS (
  SELECT c.conv_id, any_value(s.n) AS n,
         list({{'t': c.t, 'rc': c.row_costs,
               'fs': NULL::DOUBLE[], 'cps': NULL::BIGINT[], 'adm': NULL::BIGINT[]}}
              ORDER BY c.t) AS steps
  FROM costt c JOIN st s ON s.conv_id = c.conv_id
  GROUP BY c.conv_id
),
dp AS (
  SELECT conv_id, n,
    list_reduce(list_prepend({_dp_init_expr(pen_expr, m)}, steps),
{_dp_state_expr(pen_expr, m, jump)}
    ) AS fin
  FROM costl
),
bpl AS (
  SELECT conv_id,
    list_reduce(
      list_prepend({{'idx': n::BIGINT, 'bps': []::BIGINT[]}},
                   [{{'idx': 0::BIGINT, 'bps': []::BIGINT[]}}
                    FOR gi IN generate_series(1, cast(ceil(n / {m}.0) AS int) + 1)]),
      -- the single-element list_transform let-binding is load-bearing: DuckDB
      -- 1.0.0 mis-evaluates list-typed accumulator fields written directly in
      -- a list_reduce lambda's top-level struct (aliasing), but evaluates
      -- them correctly one lambda level down
      (acc, x) -> list_transform(
        [CASE WHEN acc.idx <= 0 OR fin.cps[acc.idx + 1] <= 0
              THEN 0::BIGINT ELSE fin.cps[acc.idx + 1] END],
        nxt -> {{'idx': nxt,
                 'bps': CASE WHEN nxt <= 0 THEN acc.bps
                             ELSE list_append(acc.bps, nxt) END}})[1]
    ).bps AS bps
  FROM dp
)
"""


_BPS_TAIL = "SELECT conv_id, unnest(bps) AS breakpoint_idx FROM bpl"


def pelt_sql(
    t_sql: str,
    signal_ctes: str,
    cost_expr: str,
    penalty: float,
    min_size: int = 3,
    jump: int = 1,
    pairs_cte: str | None = None,
    tail: str = _BPS_TAIL,
) -> str:
    """Assemble a full PELT oracle: transcripts CTE + signal/state CTEs +
    cost table + DP fold + backtracking + output tail.

    ``signal_ctes`` must end with a CTE named ``st(conv_id, n, ...)`` holding
    whatever state ``cost_expr`` (or ``pairs_cte``) references, filtered to
    n >= 2*min_size.
    """
    pairs = pairs_cte if pairs_cte is not None else _pairs_cte(cost_expr, min_size)
    return (
        f"WITH {t_sql}, {signal_ctes.strip().lstrip(',').strip()},"
        f"{pairs.strip().rstrip(',')},"
        f"{_dp_fold_cte(repr(penalty), min_size, jump).strip().rstrip(',')}\n{tail}"
    )


# --- per-query builders ------------------------------------------------------


def pelt_l2_sql(t_sql: str, penalty: float = 10.0, min_size: int = 3, jump: int = 1,
                tail: str = _BPS_TAIL) -> str:
    return pelt_sql(
        t_sql,
        ZSCORE_CTE + "," + _prefix_state_cte("zs", min_size),
        l2_cost_expr(), penalty, min_size, jump=jump, tail=tail,
    )


def pelt_l2_multi_sql(t_sql: str, penalty: float = 10.0, min_size: int = 3) -> str:
    """Multivariate (2-dim) L2: per-dimension SSE summed dim-0-first, exactly
    the kernel's np.sum over the (D, N) prefix matrices
    (kernels/costs.py:102-107; reference L2CostFunction.cs:105-139 loops
    dimensions). Dims: z-scored value, z-scored token count (word count of
    text, sigma==0 -> 0 as in stats.zscore)."""
    sig = f"""
zs AS (
  SELECT conv_id, turn_idx,
         (value - avg(value) OVER w) / stddev_pop(value) OVER w AS va,
         CASE WHEN stddev_pop(tc) OVER w = 0 THEN 0.0
              ELSE (tc - avg(tc) OVER w) / stddev_pop(tc) OVER w END AS vb
  FROM (
    SELECT conv_id, turn_idx, value,
           cast(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS double) AS tc
    FROM t
  ) WINDOW w AS (PARTITION BY conv_id)
),
sacc AS (
  SELECT conv_id, turn_idx,
         sum(va) OVER wacc AS sva, sum(va * va) OVER wacc AS sva2,
         sum(vb) OVER wacc AS svb, sum(vb * vb) OVER wacc AS svb2
  FROM zs
  WINDOW wacc AS (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
slist AS (
  SELECT conv_id, count(*) AS n,
         list(sva ORDER BY turn_idx) AS pa, list(sva2 ORDER BY turn_idx) AS pa2,
         list(svb ORDER BY turn_idx) AS pb, list(svb2 ORDER BY turn_idx) AS pb2
  FROM sacc GROUP BY conv_id
),
st AS (
  SELECT conv_id, n,
         list_prepend(0.0::DOUBLE, pa) AS psa, list_prepend(0.0::DOUBLE, pa2) AS ps2a,
         list_prepend(0.0::DOUBLE, pb) AS psb, list_prepend(0.0::DOUBLE, pb2) AS ps2b
  FROM slist WHERE n >= {2 * min_size}
)
"""
    dim = lambda ps, ps2: (
        f"(({ps2}[t + 1] - {ps2}[sp + 1])"
        f" - ({ps}[t + 1] - {ps}[sp + 1]) * ({ps}[t + 1] - {ps}[sp + 1]) / (t - sp))"
    )
    cost = f"({dim('psa', 'ps2a')} + {dim('psb', 'ps2b')})"
    return pelt_sql(t_sql, sig, cost, penalty, min_size)


def pelt_gaussian_sql(t_sql: str, penalty: float = 10.0, min_size: int = 3) -> str:
    return pelt_sql(
        t_sql,
        ZSCORE_CTE + "," + _prefix_state_cte("zs", min_size),
        gaussian_cost_expr(), penalty, min_size,
    )


def pelt_poisson_sql(t_sql: str, penalty: float = 20.0, min_size: int = 3) -> str:
    # floor(value + 0.5) == Spark's HALF_UP rounding for the (non-negative)
    # event values — DuckDB's round() is half-even, hence the explicit form.
    sig = """
zs AS (SELECT conv_id, turn_idx, floor(value + 0.5) AS v FROM t)
"""
    return pelt_sql(
        t_sql, sig + "," + _prefix_state_cte("zs", min_size),
        poisson_cost_expr(), penalty, min_size,
    )


def pelt_bernoulli_sql(t_sql: str, penalty: float = 2.0, min_size: int = 3) -> str:
    sig = (
        ZSCORE_CTE
        + """,
zb AS (SELECT conv_id, turn_idx, CASE WHEN v > 0 THEN 1.0 ELSE 0.0 END AS v FROM zs)
"""
    )
    return pelt_sql(
        t_sql, sig + "," + _prefix_state_cte("zb", min_size),
        bernoulli_cost_expr(), penalty, min_size,
    )


def pelt_binomial_sql(t_sql: str, penalty: float = 1.0, min_size: int = 3) -> str:
    """2-row (successes; trials) input: trials = 1 + turn_idx % 3, successes =
    trials when value > per-conv median else 0 (matches _q_pelt_binomial)."""
    sig = f"""
zb AS (
  SELECT conv_id, turn_idx,
         (1 + turn_idx % 3)::DOUBLE AS tr,
         CASE WHEN value > quantile_cont(value, 0.5) OVER (PARTITION BY conv_id)
              THEN (1 + turn_idx % 3)::DOUBLE ELSE 0.0 END AS sk
  FROM t
),
sacc AS (
  SELECT conv_id, turn_idx, sum(sk) OVER wacc AS ssk, sum(tr) OVER wacc AS str_
  FROM zb
  WINDOW wacc AS (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
slist AS (
  SELECT conv_id, list(ssk ORDER BY turn_idx) AS pk, list(str_ ORDER BY turn_idx) AS pt2
  FROM sacc GROUP BY conv_id
),
st AS (
  SELECT conv_id, len(pk) AS n,
         list_prepend(0.0::DOUBLE, pk) AS psk,
         list_prepend(0.0::DOUBLE, pt2) AS pstr
  FROM slist WHERE len(pk) >= {2 * 3}
)
"""
    return pelt_sql(t_sql, sig, binomial_cost_expr(), penalty, min_size)


def pelt_l1_sql(t_sql: str, penalty: float = 5.0, min_size: int = 3) -> str:
    """L1Cost: sum |x - median(segment)| (kernels/costs.py:119-123); segment
    medians via interpolating list median (= np.median)."""
    pairs = f"""
segs AS (
  SELECT conv_id, t, sp, vs[sp + 1 : t] AS seg
  FROM st,
       unnest(generate_series({min_size}, n)) AS ut(t),
       unnest(generate_series(0, t - {min_size})) AS us(sp)
),
segm AS (SELECT conv_id, t, sp, seg, list_aggregate(seg, 'median')::DOUBLE AS med FROM segs),
pairs AS (
  SELECT conv_id, t, sp,
         list_aggregate(list_transform(seg, x -> abs(x - med)), 'sum')::DOUBLE AS c
  FROM segm
),
costt AS (SELECT conv_id, t, list(c ORDER BY sp) AS row_costs FROM pairs GROUP BY conv_id, t)
"""
    return pelt_sql(
        t_sql,
        ZSCORE_CTE + "," + _prefix_state_cte("zs", min_size),
        "", penalty, min_size, pairs_cte=pairs,
    )


def _ar1_sig_cte(min_size: int) -> str:
    """Shared AR(1) prefix-moment CTE chain (values, squares, lag-1 cross
    products as 1-indexed lists with a prepended 0 for ps/ps2; pzy[i] = sum
    of the first i-1 lagged products, so pzy[1] = 0) — consumed by both the
    with-intercept and the intercept-free AR(1) oracles."""
    return (
        ZSCORE_CTE
        + f""",
lagp AS (
  SELECT conv_id, turn_idx, v,
         lag(v) OVER (PARTITION BY conv_id ORDER BY turn_idx) * v AS zy
  FROM zs
),
sacc AS (
  SELECT conv_id, turn_idx, v,
         sum(v) OVER wacc AS sv, sum(v * v) OVER wacc AS sv2,
         sum(coalesce(zy, 0.0)) OVER wacc AS szy
  FROM lagp
  WINDOW wacc AS (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
slist AS (
  SELECT conv_id, list(v ORDER BY turn_idx) AS vs,
         list(sv ORDER BY turn_idx) AS pst, list(sv2 ORDER BY turn_idx) AS pst2,
         list(szy ORDER BY turn_idx) AS pzyt
  FROM sacc GROUP BY conv_id
),
st AS (
  SELECT conv_id, len(vs) AS n, vs,
         list_prepend(0.0::DOUBLE, pst) AS ps,
         list_prepend(0.0::DOUBLE, pst2) AS ps2,
         pzyt AS pzy  -- pzy[i] = sum of first i-1 lagged products (pzy[1] = 0)
  FROM slist WHERE len(vs) >= {2 * min_size}
)
"""
    )


def pelt_ar1_sql(t_sql: str, penalty: float = 10.0, min_size: int = 3) -> str:
    """ARCost order=1 closed form (kernels/costs.py:455-501): 2x2 Cramer solve
    of the lagged-pair normal equations from five prefix moments, with the
    scalar path's constant-segment and singular-system guards mapped to +inf."""
    sig = _ar1_sig_cte(min_size)
    # kernel index map (0-based ps/pzy -> 1-indexed SQL lists):
    #   Sy  = ps[end] - ps[s+1]    -> ps[t+1]  - ps[sp+2]
    #   Sz  = ps[end-1] - ps[s]    -> ps[t]    - ps[sp+1]
    #   Szy = pzy[end-1] - pzy[s]  -> pzy[t]   - pzy[sp+1]
    pairs = f"""
mom AS (
  SELECT conv_id, t, sp, (t - sp - 1)::DOUBLE AS n_eq,
         (ps[t + 1] - ps[sp + 2]) AS sy, (ps[t] - ps[sp + 1]) AS sz,
         (ps2[t + 1] - ps2[sp + 2]) AS sy2, (ps2[t] - ps2[sp + 1]) AS sz2,
         (pzy[t] - pzy[sp + 1]) AS szy,
         vs[sp + 1] AS seg0,
         list_aggregate(vs[sp + 1 : t], 'max')::DOUBLE AS segmax,
         list_aggregate(vs[sp + 1 : t], 'min')::DOUBLE AS segmin
  FROM st,
       unnest(generate_series({min_size}, n)) AS ut(t),
       unnest(generate_series(0, t - {min_size})) AS us(sp)
),
sol AS (
  SELECT conv_id, t, sp, n_eq, sy, sz, sy2, sz2, szy, seg0, segmax, segmin,
         (n_eq * sz2 - sz * sz) AS det,
         (sz2 * sy - sz * szy) / (n_eq * sz2 - sz * sz) AS a0,
         (n_eq * szy - sz * sy) / (n_eq * sz2 - sz * sz) AS a1
  FROM mom
),
pairs AS (
  SELECT conv_id, t, sp,
         CASE WHEN (abs(segmax - seg0) <= 1e-9 AND abs(seg0 - segmin) <= 1e-9)
                   OR det = 0.0
                   OR NOT isfinite(sy2 + a0 * a0 * n_eq + a1 * a1 * sz2
                                   - 2.0 * a0 * sy - 2.0 * a1 * szy + 2.0 * a0 * a1 * sz)
              THEN 'infinity'::DOUBLE
              ELSE greatest(sy2 + a0 * a0 * n_eq + a1 * a1 * sz2
                            - 2.0 * a0 * sy - 2.0 * a1 * szy + 2.0 * a0 * a1 * sz, 0.0)
         END AS c
  FROM sol
),
costt AS (SELECT conv_id, t, list(c ORDER BY sp) AS row_costs FROM pairs GROUP BY conv_id, t)
"""
    return pelt_sql(t_sql, sig, "", penalty, min_size, pairs_cte=pairs)


def pelt_ar1_nointercept_sql(t_sql: str, penalty: float = 10.0, min_size: int = 3) -> str:
    """ARCost order=1 WITHOUT intercept — the stacked general path
    (kernels/costs.py _batch_general with include_intercept=False; reference
    ARCostFunction.cs:297-350 builds the design matrix without the ones
    column when the intercept is disabled): raw (uncentered) 1x1 normal
    equation a1 = Szy/Sz2, RSS = Syy - Szy^2/Sz2, from the same three prefix
    moments as the with-intercept AR(1) oracle. Guard mapping is exact:
    - singularity: |det| <= 1e-12 * max(|diagprod|, 1e-300) with
      det = diagprod = Sz2 for p=1, which only fires at Sz2 ~ 0 — written
      literally below so the twins stay in lockstep if the bound changes;
    - NO constant-segment guard: the allclose collinearity check applies
      only to intercept models (kernels/costs.py:774-775); a constant
      nonzero segment is a legitimate intercept-free fit (a1 = 1, RSS = 0);
    - non-finite RSS -> +inf; negative float residue clamps to 0.
    min_segment_length = max(p+1, 2p) = 2 <= min_size, so the kernel's
    short->NaN encoding never surfaces in DP space."""
    sig = _ar1_sig_cte(min_size)
    # index map (t = kernel segment end, sp = start; rows i in [sp+1, t)):
    #   Syy = ps2[t+1] - ps2[sp+2]   (sum y^2   over regression rows)
    #   Sz2 = ps2[t]   - ps2[sp+1]   (sum z^2,  z = lag-1 value)
    #   Szy = pzy[t]   - pzy[sp+1]   (sum z*y)
    pairs = f"""
mom AS (
  SELECT conv_id, t, sp,
         (ps2[t + 1] - ps2[sp + 2]) AS sy2,
         (ps2[t] - ps2[sp + 1]) AS sz2,
         (pzy[t] - pzy[sp + 1]) AS szy
  FROM st,
       unnest(generate_series({min_size}, n)) AS ut(t),
       unnest(generate_series(0, t - {min_size})) AS us(sp)
),
sol AS (
  SELECT conv_id, t, sp, sy2, szy,
         CASE WHEN abs(sz2) <= 1e-12 * greatest(abs(sz2), 1e-300)
              THEN 0.0 ELSE sz2 END AS det
  FROM mom
),
pairs AS (
  SELECT conv_id, t, sp,
         CASE WHEN det = 0.0 THEN 'infinity'::DOUBLE
              WHEN NOT coalesce(isfinite(sy2 - (szy * szy) / det), FALSE)
              THEN 'infinity'::DOUBLE
              ELSE greatest(sy2 - (szy * szy) / det, 0.0)
         END AS c
  FROM sol
),
costt AS (SELECT conv_id, t, list(c ORDER BY sp) AS row_costs FROM pairs GROUP BY conv_id, t)
"""
    return pelt_sql(t_sql, sig, "", penalty, min_size, pairs_cte=pairs)


def pelt_ar2_sql(t_sql: str, penalty: float = 10.0, min_size: int = 5) -> str:
    """ARCost order=2 closed form (kernels/costs.py:602-658): centered
    (covariance-form) 2x2 Cramer solve from nine prefix moments — raw-moment
    3x3 Cramer cancels catastrophically when segment means dominate, so both
    the kernel and this twin center first. The relative singularity guard
    (|det| <= 1e-12 * max(C11*C22, 1e-300) -> +inf) and the constant-segment
    guard map exactly; min_size must be >= the AR(2)-with-intercept
    min_segment_length of 5 (max(p+1, 2p+1)), matching the kernel's
    eff_min = max(min_size, cost.min_segment_length()).

    Index maps (1-indexed SQL lists; sp = segment start, t = segment end in
    kernel DP space): ps/ps2 carry a prepended 0 (ps[k] = kernel ps[k-1]);
    pzy[i] = sum of the first i-1 lag-1 products (pzy[1] = 0); pz2y[i] = sum
    of the first i-2 lag-2 products (pz2y[1] = pz2y[2] = 0). Then
      Sy  = ps[t+1]-ps[sp+3]    S1  = ps[t]-ps[sp+2]    S2  = ps[t-1]-ps[sp+1]
      S1y = pzy[t]-pzy[sp+2]    S12 = pzy[t-1]-pzy[sp+1] S2y = pz2y[t]-pz2y[sp+2]
    DuckDB returns NULL for double/0, so the CASE gates on det = 0 BEFORE the
    Cramer divisions (the kernel divides by raw det and discards via the bad
    mask — identical outcome, since the guard only rewrites det when it zeroes
    it)."""
    if min_size < 5:
        raise ValueError("AR(2)-with-intercept needs min_size >= 5")
    sig = (
        ZSCORE_CTE
        + f""",
lagp AS (
  SELECT conv_id, turn_idx, v,
         lag(v) OVER wlag * v AS zy,
         lag(v, 2) OVER wlag * v AS z2y
  FROM zs
  WINDOW wlag AS (PARTITION BY conv_id ORDER BY turn_idx)
),
sacc AS (
  SELECT conv_id, turn_idx, v,
         sum(v) OVER wacc AS sv, sum(v * v) OVER wacc AS sv2,
         sum(coalesce(zy, 0.0)) OVER wacc AS szy,
         sum(coalesce(z2y, 0.0)) OVER wacc AS sz2y
  FROM lagp
  WINDOW wacc AS (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
slist AS (
  SELECT conv_id, list(v ORDER BY turn_idx) AS vs,
         list(sv ORDER BY turn_idx) AS pst, list(sv2 ORDER BY turn_idx) AS pst2,
         list(szy ORDER BY turn_idx) AS pzyt, list(sz2y ORDER BY turn_idx) AS pz2yt
  FROM sacc GROUP BY conv_id
),
st AS (
  SELECT conv_id, len(vs) AS n, vs,
         list_prepend(0.0::DOUBLE, pst) AS ps,
         list_prepend(0.0::DOUBLE, pst2) AS ps2,
         pzyt AS pzy, pz2yt AS pz2y
  FROM slist WHERE len(vs) >= {2 * min_size}
)
"""
    )
    pairs = f"""
mom AS (
  SELECT conv_id, t, sp, (t - sp - 2)::DOUBLE AS n_eq,
         (ps[t + 1] - ps[sp + 3]) AS sy, (ps[t] - ps[sp + 2]) AS s1,
         (ps[t - 1] - ps[sp + 1]) AS s2,
         (ps2[t + 1] - ps2[sp + 3]) AS sy2, (ps2[t] - ps2[sp + 2]) AS s11,
         (ps2[t - 1] - ps2[sp + 1]) AS s22,
         (pzy[t] - pzy[sp + 2]) AS s1y, (pzy[t - 1] - pzy[sp + 1]) AS s12,
         (pz2y[t] - pz2y[sp + 2]) AS s2y,
         vs[sp + 1] AS seg0,
         list_aggregate(vs[sp + 1 : t], 'max')::DOUBLE AS segmax,
         list_aggregate(vs[sp + 1 : t], 'min')::DOUBLE AS segmin
  FROM st,
       unnest(generate_series({min_size}, n)) AS ut(t),
       unnest(generate_series(0, t - {min_size})) AS us(sp)
),
ctr AS (
  SELECT conv_id, t, sp, seg0, segmax, segmin,
         (s11 - s1 * s1 / n_eq) AS c11, (s22 - s2 * s2 / n_eq) AS c22,
         (s12 - s1 * s2 / n_eq) AS c12,
         (s1y - s1 * sy / n_eq) AS c1y, (s2y - s2 * sy / n_eq) AS c2y,
         (sy2 - sy * sy / n_eq) AS cyy
  FROM mom
),
sol AS (
  SELECT conv_id, t, sp, seg0, segmax, segmin, c11, c22, c12, c1y, c2y, cyy,
         CASE WHEN abs(c11 * c22 - c12 * c12)
                   <= 1e-12 * greatest(c11 * c22, 1e-300)
              THEN 0.0 ELSE (c11 * c22 - c12 * c12) END AS det
  FROM ctr
),
pairs AS (
  SELECT conv_id, t, sp,
         CASE WHEN (abs(segmax - seg0) <= 1e-9 AND abs(seg0 - segmin) <= 1e-9)
                   OR det = 0.0
              THEN 'infinity'::DOUBLE
              WHEN NOT coalesce(isfinite(
                     cyy - ((c1y * c22 - c2y * c12) / det) * c1y
                         - ((c2y * c11 - c1y * c12) / det) * c2y), FALSE)
              THEN 'infinity'::DOUBLE
              ELSE greatest(
                     cyy - ((c1y * c22 - c2y * c12) / det) * c1y
                         - ((c2y * c11 - c1y * c12) / det) * c2y, 0.0)
         END AS c
  FROM sol
),
costt AS (SELECT conv_id, t, list(c ORDER BY sp) AS row_costs FROM pairs GROUP BY conv_id, t)
"""
    return pelt_sql(t_sql, sig, "", penalty, min_size, pairs_cte=pairs)


def pelt_ar3_sql(t_sql: str, penalty: float = 10.0, min_size: int = 7) -> str:
    """ARCost order=3 — the general stacked path (kernels/costs.py
    _batch_general): centered (covariance-form) 3x3 normal equations from
    fourteen prefix moments, solved here by explicit Cramer adjugate. The
    kernel solves the SAME centered system by pivot-free Gaussian
    elimination (_solve_stack); the two are algebraically identical and any
    last-ulp float divergence is absorbed by the DP fold's
    PELT_TIE_EPSILON banding, exactly as for the libm differences the other
    cost oracles document. The relative singularity guard maps the kernel's
    |det| <= 1e-12 * max(|c11*c22*c33|, 1e-300) (Hadamard diagonal bound);
    an exactly-zero leading pivot implies a zero row/column of the centered
    Gram, which zeroes det in BOTH formulations, so the guard outcomes
    agree. min_size must be >= AR(3)-with-intercept min_segment_length = 7
    (max(p+1, 2p+1)), matching the kernel's eff_min.

    Index maps (1-indexed SQL lists; sp = kernel start, t = kernel end):
    ps/ps2 carry a prepended 0; pzy/pz2y/pz3y are the cumulative lag-1/2/3
    cross-product lists where kernel pg_d[a] = SQL list[a+d]. Then
      Sy  = ps[t+1]-ps[sp+4]   S1 = ps[t]-ps[sp+3]   S2 = ps[t-1]-ps[sp+2]
      S3  = ps[t-2]-ps[sp+1]   G11 = ps2[t]-ps2[sp+3] (etc. down the lags)
      S1y = pzy[t]-pzy[sp+3]   G12 = pzy[t-1]-pzy[sp+2] G23 = pzy[t-2]-pzy[sp+1]
      S2y = pz2y[t]-pz2y[sp+3] G13 = pz2y[t-1]-pz2y[sp+2]
      S3y = pz3y[t]-pz3y[sp+3]"""
    if min_size < 7:
        raise ValueError("AR(3)-with-intercept needs min_size >= 7")
    sig = (
        ZSCORE_CTE
        + f""",
lagp AS (
  SELECT conv_id, turn_idx, v,
         lag(v) OVER wlag * v AS zy,
         lag(v, 2) OVER wlag * v AS z2y,
         lag(v, 3) OVER wlag * v AS z3y
  FROM zs
  WINDOW wlag AS (PARTITION BY conv_id ORDER BY turn_idx)
),
sacc AS (
  SELECT conv_id, turn_idx, v,
         sum(v) OVER wacc AS sv, sum(v * v) OVER wacc AS sv2,
         sum(coalesce(zy, 0.0)) OVER wacc AS szy,
         sum(coalesce(z2y, 0.0)) OVER wacc AS sz2y,
         sum(coalesce(z3y, 0.0)) OVER wacc AS sz3y
  FROM lagp
  WINDOW wacc AS (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
slist AS (
  SELECT conv_id, list(v ORDER BY turn_idx) AS vs,
         list(sv ORDER BY turn_idx) AS pst, list(sv2 ORDER BY turn_idx) AS pst2,
         list(szy ORDER BY turn_idx) AS pzyt,
         list(sz2y ORDER BY turn_idx) AS pz2yt,
         list(sz3y ORDER BY turn_idx) AS pz3yt
  FROM sacc GROUP BY conv_id
),
st AS (
  SELECT conv_id, len(vs) AS n, vs,
         list_prepend(0.0::DOUBLE, pst) AS ps,
         list_prepend(0.0::DOUBLE, pst2) AS ps2,
         pzyt AS pzy, pz2yt AS pz2y, pz3yt AS pz3y
  FROM slist WHERE len(vs) >= {2 * min_size}
)
"""
    )
    pairs = f"""
mom AS (
  SELECT conv_id, t, sp, (t - sp - 3)::DOUBLE AS n_eq,
         (ps[t + 1] - ps[sp + 4]) AS sy,
         (ps[t] - ps[sp + 3]) AS s1,
         (ps[t - 1] - ps[sp + 2]) AS s2,
         (ps[t - 2] - ps[sp + 1]) AS s3,
         (ps2[t + 1] - ps2[sp + 4]) AS sy2,
         (ps2[t] - ps2[sp + 3]) AS g11,
         (ps2[t - 1] - ps2[sp + 2]) AS g22,
         (ps2[t - 2] - ps2[sp + 1]) AS g33,
         (pzy[t] - pzy[sp + 3]) AS s1y,
         (pzy[t - 1] - pzy[sp + 2]) AS g12,
         (pzy[t - 2] - pzy[sp + 1]) AS g23,
         (pz2y[t] - pz2y[sp + 3]) AS s2y,
         (pz2y[t - 1] - pz2y[sp + 2]) AS g13,
         (pz3y[t] - pz3y[sp + 3]) AS s3y,
         vs[sp + 1] AS seg0,
         list_aggregate(vs[sp + 1 : t], 'max')::DOUBLE AS segmax,
         list_aggregate(vs[sp + 1 : t], 'min')::DOUBLE AS segmin
  FROM st,
       unnest(generate_series({min_size}, n)) AS ut(t),
       unnest(generate_series(0, t - {min_size})) AS us(sp)
),
ctr AS (
  SELECT conv_id, t, sp, seg0, segmax, segmin,
         (g11 - s1 * s1 / n_eq) AS c11, (g22 - s2 * s2 / n_eq) AS c22,
         (g33 - s3 * s3 / n_eq) AS c33,
         (g12 - s1 * s2 / n_eq) AS c12, (g13 - s1 * s3 / n_eq) AS c13,
         (g23 - s2 * s3 / n_eq) AS c23,
         (s1y - s1 * sy / n_eq) AS c1y, (s2y - s2 * sy / n_eq) AS c2y,
         (s3y - s3 * sy / n_eq) AS c3y,
         (sy2 - sy * sy / n_eq) AS cyy
  FROM mom
),
sol AS (
  SELECT conv_id, t, sp, seg0, segmax, segmin,
         c11, c22, c33, c12, c13, c23, c1y, c2y, c3y, cyy,
         CASE WHEN abs(  c11 * (c22 * c33 - c23 * c23)
                       - c12 * (c12 * c33 - c23 * c13)
                       + c13 * (c12 * c23 - c22 * c13))
                   <= 1e-12 * greatest(abs(c11 * c22 * c33), 1e-300)
              THEN 0.0
              ELSE   c11 * (c22 * c33 - c23 * c23)
                   - c12 * (c12 * c33 - c23 * c13)
                   + c13 * (c12 * c23 - c22 * c13) END AS det
  FROM ctr
),
cram AS (
  SELECT conv_id, t, sp, seg0, segmax, segmin, c1y, c2y, c3y, cyy, det,
         (  c1y * (c22 * c33 - c23 * c23)
          - c12 * (c2y * c33 - c23 * c3y)
          + c13 * (c2y * c23 - c22 * c3y)) / det AS a1,
         (  c11 * (c2y * c33 - c3y * c23)
          - c1y * (c12 * c33 - c13 * c23)
          + c13 * (c12 * c3y - c2y * c13)) / det AS a2,
         (  c11 * (c22 * c3y - c23 * c2y)
          - c12 * (c12 * c3y - c13 * c2y)
          + c1y * (c12 * c23 - c22 * c13)) / det AS a3
  FROM sol
),
pairs AS (
  SELECT conv_id, t, sp,
         CASE WHEN (abs(segmax - seg0) <= 1e-9 AND abs(seg0 - segmin) <= 1e-9)
                   OR det = 0.0
              THEN 'infinity'::DOUBLE
              WHEN NOT coalesce(isfinite(cyy - a1 * c1y - a2 * c2y - a3 * c3y), FALSE)
              THEN 'infinity'::DOUBLE
              ELSE greatest(cyy - a1 * c1y - a2 * c2y - a3 * c3y, 0.0)
         END AS c
  FROM cram
),
costt AS (SELECT conv_id, t, list(c ORDER BY sp) AS row_costs FROM pairs GROUP BY conv_id, t)
"""
    return pelt_sql(t_sql, sig, "", penalty, min_size, pairs_cte=pairs)


def pelt_rbf_sql(t_sql: str, penalty: float = 2.0, min_size: int = 3) -> str:
    """RBFCost (kernels/costs.py:141-185): gamma = 1/median(strict upper-
    triangle squared distances), K = exp(-clip(d*gamma, 1e-2, 1e2)) with
    K[d==0] = 1, segment sums via a 2D summed-area table; cost = len - S/len.
    The SAT is flattened row-major into one list per conversation; the two
    running-sum passes match np.cumsum(axis=0) then axis=1."""
    sig = (
        ZSCORE_CTE
        + f""",
zcnt AS (SELECT conv_id, count(*) AS n FROM zs GROUP BY conv_id),
dmat AS (
  SELECT a.conv_id, a.turn_idx AS i, b.turn_idx AS j,
         (a.v - b.v) * (a.v - b.v) AS dist
  FROM zs a JOIN zs b ON a.conv_id = b.conv_id
),
gam AS (
  SELECT conv_id,
         CASE WHEN med IS NULL OR med = 0.0 THEN 1.0 ELSE 1.0 / med END AS gamma
  FROM (SELECT conv_id, median(dist)::DOUBLE AS med FROM dmat WHERE i < j GROUP BY conv_id)
),
kmat AS (
  SELECT d.conv_id, d.i, d.j,
         CASE WHEN d.dist = 0.0 THEN 1.0
              ELSE exp(-least(greatest(d.dist * g.gamma, 0.01), 100.0)) END AS kv
  FROM dmat d JOIN gam g ON g.conv_id = d.conv_id
),
k1 AS (
  SELECT conv_id, i, j,
         sum(kv) OVER (PARTITION BY conv_id, j ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1
  FROM kmat
),
satm AS (
  SELECT conv_id, i, j,
         sum(c1) OVER (PARTITION BY conv_id, i ORDER BY j
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s2
  FROM k1
),
st AS (
  SELECT s.conv_id, c.n, list(s.s2 ORDER BY s.i, s.j) AS fl
  FROM satm s JOIN zcnt c ON c.conv_id = s.conv_id
  WHERE c.n >= {2 * min_size}
  GROUP BY s.conv_id, c.n
)
"""
    )

    def sat(a: str, b: str) -> str:
        return (
            f"(CASE WHEN ({a}) = 0 OR ({b}) = 0 THEN 0.0"
            f" ELSE fl[(({a}) - 1) * n + ({b})] END)"
        )

    s_expr = (
        f"({sat('t', 't')} - {sat('sp', 't')} - {sat('t', 'sp')} + {sat('sp', 'sp')})"
    )
    cost = f"((t - sp)::DOUBLE - {s_expr} / (t - sp))"
    return pelt_sql(t_sql, sig, cost, penalty, min_size)


def pelt_segment_stats_sql(t_sql: str, r6, penalty: float = 10.0, min_size: int = 3) -> str:
    """DP (L2, z-scored) + the windowed segment aggregation of detect.segment_stats:
    segment_id = count of breakpoints at-or-before each row; aggregates rounded
    like the Spark query (6 dp; seg_var at 4 dp to absorb var_pop ulp)."""
    tail = f"""
, bps AS ({_BPS_TAIL})
, segrows AS (
  SELECT z.conv_id, z.turn_idx, z.v,
         (SELECT count(*) FROM bps b
          WHERE b.conv_id = z.conv_id AND b.breakpoint_idx <= z.turn_idx) AS segment_id
  FROM zs z
)
SELECT conv_id, segment_id, count(*) AS seg_len, min(turn_idx)::BIGINT AS start_idx,
       {r6('avg(v)', 'seg_mean')}, {r6('min(v)', 'seg_min')}, {r6('max(v)', 'seg_max')},
       {r6('var_pop(v)', 'seg_var', 4)}
FROM segrows GROUP BY conv_id, segment_id
"""
    return pelt_l2_sql(t_sql, penalty, min_size, tail=tail)


# --- penalty selection (PELTPenaltySelector) ---------------------------------


def penalty_selection_sql(t_sql: str, r6, method: str = "bic", min_size: int = 3,
                          num_steps: int = 20) -> str:
    """Gaussian-cost automatic penalty selection over the RAW value signal
    (matches detect.select_penalties defaults used by the registered queries).

    Grid (kernels/pelt.py:151-185 / PELTPenaltySelector.cs:560-687): with
    min_p = max(0.1, 2*ln(max(2,n))) > 0 and max_p = max(n*ln n, 20*min_p)
    (the later clamps never bind for n >= 2), penalties are exp-spaced with
    the final step replaced by max_p exactly. One DP per (conv, penalty) —
    the cost table is penalty-independent and shared.

    Scoring (kernels/pelt.py:188-225): per-segment Gaussian likelihood metric
    + parameter counts; BIC = L + P ln n, AICc = L + 2P + 2P(P+1)/(n-P-1);
    selection folds the grid in order with strict '<' improvement and the
    |Δ| <= 1e-9 fewer-breakpoints tie rule.
    """
    m = min_size
    gauss_metric = (
        "((b2 - b1)::DOUBLE * ln(greatest(greatest("
        "(ps2[b2 + 1] - ps2[b1 + 1])"
        " - (ps[b2 + 1] - ps[b1 + 1]) * (ps[b2 + 1] - ps[b1 + 1]) / (b2 - b1)"
        ", 0.0) / (b2 - b1), 1e-10)))"
    )
    if method == "bic":
        score_expr = "metric_total + pp * ln(n::DOUBLE)"
    elif method == "aicc":
        score_expr = (
            "CASE WHEN n::DOUBLE > pp + 1.0"
            " AND isfinite((2.0 * pp * (pp + 1.0)) / (n::DOUBLE - pp - 1.0))"
            " THEN (metric_total + 2.0 * pp) + (2.0 * pp * (pp + 1.0)) / (n::DOUBLE - pp - 1.0)"
            " ELSE 'infinity'::DOUBLE END"
        )
    else:
        raise ValueError(f"unsupported method {method!r}")

    sig = """
zs AS (SELECT conv_id, turn_idx, value AS v FROM t)
"""
    # st here keeps ALL conversations (n >= 1): short series run zero DPs but
    # still get scored on the single unsegmented span (kernels/pelt.py:266-271).
    state = _prefix_state_cte("zs", 0).replace("WHERE len(vs) >= 0", "")
    grid_expr = (
        f"[CASE WHEN gi = {num_steps - 1} THEN maxp"
        f" ELSE exp(ln(minp) + (ln(maxp) - ln(minp)) / {num_steps - 1}.0 * gi) END"
        f" FOR gi IN generate_series(0, {num_steps - 1})]"
    )
    return f"""
WITH {t_sql}, {sig.strip()},
{state.strip().lstrip(',')},
bounds AS (
  SELECT conv_id, n, vs, ps, ps2,
         greatest(0.1, 2.0 * ln(greatest(2.0, n::DOUBLE))) AS minp0
  FROM st
),
bounds2 AS (
  SELECT *, greatest(greatest(greatest(2.0, n::DOUBLE) * ln(greatest(2.0, n::DOUBLE)),
                              minp0 * 20.0),
                     greatest(1.0, minp0 * 1.1 + 1.0)) AS maxp,
         minp0 AS minp
  FROM bounds
),
grid AS (
  SELECT conv_id, n, ps, ps2, gidx, pens[gidx + 1] AS pen
  FROM (SELECT conv_id, n, ps, ps2, {grid_expr} AS pens FROM bounds2),
       unnest(generate_series(0, {num_steps - 1})) AS ug(gidx)
),
pairs AS (
  SELECT conv_id, t, sp, {gaussian_cost_expr()} AS c
  FROM st,
       unnest(generate_series({m}, n)) AS ut(t),
       unnest(generate_series(0, t - {m})) AS us(sp)
  WHERE n >= {2 * m}
),
costt AS (SELECT conv_id, t, list(c ORDER BY sp) AS row_costs FROM pairs GROUP BY conv_id, t),
costl AS (
  SELECT conv_id, list({{'t': t, 'rc': row_costs,
                        'fs': NULL::DOUBLE[], 'cps': NULL::BIGINT[], 'adm': NULL::BIGINT[]}}
                       ORDER BY t) AS steps
  FROM costt GROUP BY conv_id
),
dpg AS (
  SELECT conv_id, gidx, n,
    list_reduce(list_prepend({_dp_init_expr('pen', m)}, steps),
{_dp_state_expr('pen', m)}
    ) AS fin
  FROM (
    SELECT g.conv_id, g.gidx, g.pen, g.n, cl.steps
    FROM grid g JOIN costl cl ON cl.conv_id = g.conv_id
    WHERE g.n >= {2 * m}
  )
),
bplist AS (
  SELECT conv_id, gidx,
    list_sort(list_reduce(
      list_prepend({{'idx': n::BIGINT, 'bps': []::BIGINT[]}},
                   [{{'idx': 0::BIGINT, 'bps': []::BIGINT[]}}
                    FOR gi2 IN generate_series(1, cast(ceil(n / {m}.0) AS int) + 1)]),
      -- list_transform let-binding required: see _dp_fold_cte's bpl comment
      (acc, x) -> list_transform(
        [CASE WHEN acc.idx <= 0 OR fin.cps[acc.idx + 1] <= 0
              THEN 0::BIGINT ELSE fin.cps[acc.idx + 1] END],
        nxt -> {{'idx': nxt,
                 'bps': CASE WHEN nxt <= 0 THEN acc.bps
                             ELSE list_append(acc.bps, nxt) END}})[1]
    ).bps) AS bps
  FROM dpg
),
cand AS (
  SELECT g.conv_id, g.gidx, g.pen, g.n, g.ps, g.ps2,
         coalesce(b.bps, []::BIGINT[]) AS bps
  FROM grid g LEFT JOIN bplist b ON b.conv_id = g.conv_id AND b.gidx = g.gidx
),
scored0 AS (
  SELECT conv_id, gidx, pen, n, len(bps) AS nbps,
         list_concat(list_prepend(0::BIGINT, bps), [n::BIGINT]) AS bounds_l,
         ps, ps2
  FROM cand
),
scored1 AS (
  SELECT conv_id, gidx, pen, n, nbps,
         list_min([(bounds_l[bi + 1] - bounds_l[bi])::DOUBLE
                   FOR bi IN generate_series(1, len(bounds_l) - 1)]) AS min_seg_len,
         list_sum([{gauss_metric.replace('b1', 'bounds_l[bi]').replace('b2', 'bounds_l[bi + 1]')}
                   FOR bi IN generate_series(1, len(bounds_l) - 1)])::DOUBLE AS metric_total,
         (2.0 * (nbps + 1) + nbps)::DOUBLE AS pp
  FROM scored0
),
scored AS (
  SELECT conv_id, gidx, pen, nbps,
         CASE WHEN min_seg_len < {m} OR NOT isfinite(metric_total)
              THEN 'infinity'::DOUBLE ELSE {score_expr} END AS score
  FROM scored1
),
sel AS (
  SELECT conv_id,
         list_reduce(
           list_prepend({{'s': NULL::DOUBLE, 'p': NULL::DOUBLE, 'k': NULL::BIGINT}},
                        list({{'s': score, 'p': pen, 'k': nbps}} ORDER BY gidx)),
           (acc, r) -> CASE
             WHEN r.s IS NULL OR NOT isfinite(r.s) THEN acc
             WHEN acc.s IS NULL OR r.s < acc.s THEN r
             WHEN abs(r.s - acc.s) <= 1e-9 AND r.k < acc.k
               THEN {{'s': acc.s, 'p': r.p, 'k': r.k}}
             ELSE acc END) AS w
  FROM scored GROUP BY conv_id
)
SELECT conv_id, {r6('w.p', 'selected_penalty')}, (w.k)::INT AS n_breakpoints FROM sel
"""


# --- grid-searched Holt ------------------------------------------------------


def holt_opt_sql(t_sql: str, r6, horizon: int = 3, steps: int = 10) -> str:
    """Additive Holt with alpha/beta grid-searched over one-step-ahead SSE
    (kernels/forecast.py:135-159 / HoltMethodExtrapolator.cs:201-299), phi=1.

    The SSE recursion carries (L, T, sse) per (conv, ia, ib) with
    a = ia/(steps-1), b = ib/(steps-1) — the same k/(steps-1) doubles numpy's
    arange/(steps-1) produces. err_t = x[t] - (L + T) BEFORE the t-th update,
    including t = 0 (the reference's fit loop re-consumes x[0]). Selection is
    a strict-'<' fold in (ia, ib) grid order, exactly the kernel's loop
    nesting, then the winning (a, b) re-runs the fit fold and forecasts
    L + h*T. All arithmetic is order-identical to the kernel, so parity holds
    to the 6-dp rounding with margin."""
    g = float(steps - 1)
    fc = " UNION ALL ".join(
        f"SELECT conv_id, {h} AS h, L + {float(h)!r} * T AS raw FROM ffit"
        for h in range(1, horizon + 1)
    )
    # One fold step of the additive Holt fit (kernels/forecast.py:66-79):
    # consumes x[i] with the PRE-update (L, T); expressions are order-identical
    # to the kernel. Folds replace recursive CTEs for speed (see _dp_state_expr).
    holt_step = """
      (acc, x) -> list_transform(
        [a * x.v + (1.0 - a) * (acc.L + acc.T)],
        Ln -> {
          'v': NULL::DOUBLE,
          'L': Ln,
          'T': b * (Ln - acc.L) + (1.0 - b) * acc.T,
          'sse': CASE WHEN NOT isfinite(acc.sse + (x.v - (acc.L + acc.T)) * (x.v - (acc.L + acc.T)))
                      THEN 'infinity'::DOUBLE
                      ELSE acc.sse + (x.v - (acc.L + acc.T)) * (x.v - (acc.L + acc.T)) END
        })[1]"""
    holt_init = (
        "{'v': NULL::DOUBLE, 'L': vs[1]::DOUBLE, 'T': (vs[2] - vs[1])::DOUBLE,"
        " 'sse': 0.0::DOUBLE}"
    )
    holt_elems = (
        "[{'v': v, 'L': NULL::DOUBLE, 'T': NULL::DOUBLE, 'sse': NULL::DOUBLE}"
        " FOR v IN vs]"
    )
    return f"""
WITH {t_sql},
s AS (SELECT conv_id, list(value ORDER BY turn_idx) AS vs FROM t GROUP BY conv_id),
sg AS (
  SELECT conv_id, vs, len(vs) AS n, ia, ib,
         (ia::DOUBLE / {g!r}) AS a, (ib::DOUBLE / {g!r}) AS b
  FROM s,
       unnest(generate_series(0, {steps - 1})) AS ua(ia),
       unnest(generate_series(0, {steps - 1})) AS ub(ib)
  WHERE len(vs) >= 2
),
sfold AS (
  SELECT conv_id, ia, ib, a, b,
         list_reduce(list_prepend({holt_init}, {holt_elems}),
{holt_step}) AS fin
  FROM sg
),
ssef AS (SELECT conv_id, ia, ib, a, b, fin.sse AS sse FROM sfold),
best AS (
  SELECT conv_id,
         list_reduce(
           list_prepend({{'e': NULL::DOUBLE, 'a': NULL::DOUBLE, 'b': NULL::DOUBLE}},
                        list({{'e': sse, 'a': a, 'b': b}} ORDER BY ia, ib)),
           (acc, r) -> CASE WHEN NOT isfinite(r.e) THEN acc
                            WHEN acc.e IS NULL OR r.e < acc.e THEN r
                            ELSE acc END) AS w
  FROM ssef GROUP BY conv_id
),
ffold AS (
  SELECT conv_id,
         list_reduce(list_prepend({holt_init}, {holt_elems}),
{holt_step}) AS fin
  FROM (
    SELECT s.conv_id, s.vs, b.w.a AS a, b.w.b AS b
    FROM s JOIN best b ON b.conv_id = s.conv_id
    WHERE len(s.vs) >= 2 AND b.w.a IS NOT NULL
  )
),
ffit AS (SELECT conv_id, fin.L AS L, fin.T AS T FROM ffold),
fc AS ({fc})
SELECT conv_id, cast(h AS int) AS h, {r6('raw', 'yhat')} FROM fc
"""
