"""Hyperparameter optimizers (SURVEY §2.6): grid search + Nelder-Mead.

Re-expressions of the reference's GridSearchOptimizer
(SignalSharp/Optimization/GridSearch/GridSearchOptimizer.cs) and
NelderMeadOptimizer (NelderMead/NelderMeadOptimizer.cs). Both minimize a
scalar objective over named bounded parameters
(ParameterDefinition(Name, MinValue, MaxValue, InitialGuess) —
ParameterDefinition.cs:14).

Spark posture: these drive objectives that are THEMSELVES Spark jobs (e.g.
pick a PELT penalty that maximizes downstream segment quality), so the
search loop runs on the driver — the parallelism lives inside the objective.
`grid_search_spark` additionally fans an embarrassingly-parallel grid out as
one DataFrame job when the objective is a cheap per-row function of the
parameters (the reference's Parallel.ForEach analogue,
GridSearchOptimizer.cs:286-330).

Defaults mirror the reference: grid 10 steps/param, optional log-scale
params and early stopping, adaptive refinement pass around the best point
(range factor 0.2, 5 steps — GridSearchOptimizerOptions.cs:60-71);
Nelder-Mead reflection/expansion/contraction/shrink = 1.0/2.0/0.5/0.5,
function tolerance 1e-6, parameter tolerance 1e-4, optional multi-start
(max 2 restarts) and stagnation detection (10 iters @ 1e-9 —
NelderMeadOptimizerOptions.cs:11-104).
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Param:
    name: str
    min_value: float
    max_value: float
    initial_guess: float | None = None

    def __post_init__(self):
        if not (self.min_value <= self.max_value):
            raise ValueError(f"{self.name}: min must be <= max")


@dataclass
class OptimizationResult:
    best_params: dict[str, float]
    best_value: float
    evaluations: int
    history: list[tuple[dict[str, float], float]] = field(default_factory=list)


def _axis(p: Param, steps: int, log_scale: bool) -> list[float]:
    if steps == 1 or p.min_value == p.max_value:
        return [p.min_value]
    if log_scale:
        if p.min_value <= 0:
            raise ValueError(f"log scale requires positive bounds for {p.name}")
        lo, hi = math.log(p.min_value), math.log(p.max_value)
        return [math.exp(lo + (hi - lo) * i / (steps - 1)) for i in range(steps)]
    return [p.min_value + (p.max_value - p.min_value) * i / (steps - 1) for i in range(steps)]


def grid_search(
    objective,
    params: list[Param],
    steps: int = 10,
    per_param_steps: dict[str, int] | None = None,
    max_evaluations: int | None = None,
    early_stopping_threshold: float | None = None,
    log_scale_for: set[str] | None = None,
    adaptive_refinement: bool = False,
    refinement_range_factor: float = 0.2,
    refinement_steps: int = 5,
) -> OptimizationResult:
    """Exhaustive grid minimization with optional refinement pass."""
    axes = [
        _axis(p, (per_param_steps or {}).get(p.name, steps), p.name in (log_scale_for or set()))
        for p in params
    ]
    best_v, best_p = math.inf, None
    history: list[tuple[dict[str, float], float]] = []
    evals = 0
    for combo in itertools.product(*axes):
        if max_evaluations is not None and evals >= max_evaluations:
            break
        point = {p.name: v for p, v in zip(params, combo)}
        v = float(objective(point))
        evals += 1
        history.append((point, v))
        if not math.isnan(v) and v < best_v:
            best_v, best_p = v, point
            if early_stopping_threshold is not None and best_v <= early_stopping_threshold:
                break
    if best_p is None:
        raise RuntimeError("grid search found no valid (non-NaN) objective value")

    if adaptive_refinement and (max_evaluations is None or evals < max_evaluations):
        refined = [
            Param(
                p.name,
                max(p.min_value, best_p[p.name] - (p.max_value - p.min_value) * refinement_range_factor / 2),
                min(p.max_value, best_p[p.name] + (p.max_value - p.min_value) * refinement_range_factor / 2),
            )
            for p in params
        ]
        budget = None if max_evaluations is None else max_evaluations - evals
        sub = grid_search(objective, refined, steps=refinement_steps, max_evaluations=budget)
        evals += sub.evaluations
        history.extend(sub.history)
        if sub.best_value < best_v:
            best_v, best_p = sub.best_value, sub.best_params
    return OptimizationResult(best_p, best_v, evals, history)


def grid_search_spark(spark, objective_col, params: list[Param], steps: int = 10):
    """Distributed grid: build the parameter grid as a DataFrame, evaluate a
    Column objective per row, return the argmin row. For objectives that are
    pure column expressions of the parameters (or joins against broadcast
    data) — one job, grid-size parallelism."""
    from pyspark.sql import functions as F

    axes = [_axis(p, steps, False) for p in params]
    rows = [tuple(c) for c in itertools.product(*axes)]
    schema = ", ".join(f"{p.name} double" for p in params)
    grid = spark.createDataFrame(rows, schema)
    scored = grid.withColumn("_objective", objective_col)
    # tiebreak in grid order (param columns ascending = itertools.product
    # order) so ties resolve like the sequential strict-'<' fold — the
    # reference's first-wins selection (GridSearchOptimizer.cs:286-330)
    return scored.orderBy(
        F.asc_nulls_last("_objective"), *[F.asc(p.name) for p in params]
    ).limit(1)


def nelder_mead(
    objective,
    params: list[Param],
    max_iterations: int = 1000,
    max_evaluations: int | None = None,
    f_tol: float = 1e-6,
    x_tol: float = 1e-4,
    reflection: float = 1.0,
    expansion: float = 2.0,
    contraction: float = 0.5,
    shrink: float = 0.5,
    multi_start: bool = False,
    max_restarts: int = 2,
    stagnation_iters: int = 10,
    stagnation_eps: float = 1e-9,
    initial_simplex_range_factor: float = 0.05,
    seed: int = 0,
) -> OptimizationResult:
    """Derivative-free simplex minimization with bounds (clamped)."""
    import numpy as np

    names = [p.name for p in params]
    lo = np.array([p.min_value for p in params])
    hi = np.array([p.max_value for p in params])
    n = len(params)
    evals = 0
    rng = np.random.default_rng(seed)

    def f(x) -> float:
        nonlocal evals
        evals += 1
        return float(objective(dict(zip(names, np.clip(x, lo, hi)))))

    def run_from(x0):
        # initial simplex: x0 + per-dim step (range factor, abs step on zero range)
        steps_ = np.where(hi > lo, (hi - lo) * initial_simplex_range_factor, 0.001)
        simplex = [np.clip(x0, lo, hi)]
        for i in range(n):
            v = simplex[0].copy()
            v[i] = np.clip(v[i] + steps_[i], lo[i], hi[i])
            if v[i] == simplex[0][i]:
                v[i] = np.clip(v[i] - steps_[i], lo[i], hi[i])
            simplex.append(v)
        fv = [f(v) for v in simplex]
        stagnant, prev_best = 0, min(fv)
        for _ in range(max_iterations):
            if max_evaluations is not None and evals >= max_evaluations:
                break
            order = np.argsort(fv)
            simplex = [simplex[i] for i in order]
            fv = [fv[i] for i in order]
            if abs(fv[-1] - fv[0]) <= f_tol and np.max(np.abs(simplex[-1] - simplex[0])) <= x_tol:
                break
            if prev_best - fv[0] < stagnation_eps:
                stagnant += 1
                if stagnant >= stagnation_iters:
                    break
            else:
                stagnant = 0
            prev_best = fv[0]
            centroid = np.mean(simplex[:-1], axis=0)
            xr = np.clip(centroid + reflection * (centroid - simplex[-1]), lo, hi)
            fr = f(xr)
            if fr < fv[0]:
                xe = np.clip(centroid + expansion * (xr - centroid), lo, hi)
                fe = f(xe)
                simplex[-1], fv[-1] = (xe, fe) if fe < fr else (xr, fr)
            elif fr < fv[-2]:
                simplex[-1], fv[-1] = xr, fr
            else:
                xc = np.clip(centroid + contraction * (simplex[-1] - centroid), lo, hi)
                fc = f(xc)
                if fc < fv[-1]:
                    simplex[-1], fv[-1] = xc, fc
                else:  # shrink toward best
                    for i in range(1, n + 1):
                        simplex[i] = np.clip(simplex[0] + shrink * (simplex[i] - simplex[0]), lo, hi)
                        fv[i] = f(simplex[i])
        best_i = int(np.argmin(fv))
        return simplex[best_i], fv[best_i]

    starts = [np.array([p.initial_guess if p.initial_guess is not None else (p.min_value + p.max_value) / 2 for p in params])]
    if multi_start:
        starts += [lo + rng.random(n) * (hi - lo) for _ in range(max_restarts)]
    best_x, best_v = None, math.inf
    for x0 in starts:
        x, v = run_from(x0)
        if v < best_v:
            best_x, best_v = x, v
    return OptimizationResult(dict(zip(names, [float(v) for v in best_x])), best_v, evals)
