"""Statistical-function tests vs exact python reimplementations of the
reference formulas (StatisticalFunctions.cs)."""

from __future__ import annotations

import numpy as np
import pytest

from transcriptts.stats import series_stats, with_normalized


def ref_g1(x):
    n = len(x)
    mu, sd = x.mean(), x.std()  # population
    return n * (((x - mu) / sd) ** 3).sum() / ((n - 1) * (n - 2))


def ref_pop_excess_kurtosis(x):
    mu = x.mean()
    m2 = ((x - mu) ** 2).mean()
    m4 = ((x - mu) ** 4).mean()
    return m4 / m2**2 - 3


def ref_g2(x):
    n = len(x)
    mu, sd = x.mean(), x.std()
    s4 = (((x - mu) / sd) ** 4).sum() * ((n - 1) / n) ** 2
    return n * (n + 1) / ((n - 1) * (n - 2) * (n - 3)) * s4 - 3 * (n - 1) ** 2 / ((n - 2) * (n - 3))


@pytest.fixture(scope="module")
def series(spark):
    rng = np.random.default_rng(13)
    data = {"a": rng.gamma(2, 3, 100), "b": rng.normal(0, 1, 57), "c": np.full(10, 4.2)}
    rows = [(k, i, float(v)) for k, vals in data.items() for i, v in enumerate(vals)]
    return data, spark.createDataFrame(rows, "conv_id string, turn_idx int, value double")


def test_series_stats_match_reference_formulas(series):
    data, df = series
    got = {r["conv_id"]: r for r in series_stats(df).collect()}
    for k in ("a", "b"):
        x = data[k]
        r = got[k]
        assert r["var_pop"] == pytest.approx(x.var(), rel=1e-9)  # population ÷N
        assert r["stddev_pop"] == pytest.approx(x.std(), rel=1e-9)
        assert r["median"] == pytest.approx(np.median(x), abs=1e-9)
        assert r["skewness_g1"] == pytest.approx(ref_g1(x), rel=1e-7)
        assert r["kurtosis_pop_excess"] == pytest.approx(ref_pop_excess_kurtosis(x), rel=1e-7)
        assert r["kurtosis_g2"] == pytest.approx(ref_g2(x), rel=1e-7)


def test_constant_series_edge_cases(series):
    _, df = series
    r = {x["conv_id"]: x for x in series_stats(df).collect()}["c"]
    assert r["var_pop"] == 0.0
    assert r["skewness_g1"] == 0.0  # sigma≈0 → 0, reference behavior


def test_normalize_and_zscore(series):
    data, df = series
    rows = with_normalized(df).where("conv_id = 'a'").orderBy("turn_idx").collect()
    x = data["a"]
    expected_norm = (x - x.min()) / (x.max() - x.min())
    expected_z = (x - x.mean()) / x.std()
    np.testing.assert_allclose([r["normalized"] for r in rows], expected_norm, atol=1e-9)
    np.testing.assert_allclose([r["zscore"] for r in rows], expected_z, atol=1e-9)
    # constant group → all zeros (reference: all-equal → zeros)
    crows = with_normalized(df).where("conv_id = 'c'").collect()
    assert all(r["normalized"] == 0.0 and r["zscore"] == 0.0 for r in crows)


def test_polyfit2_matches_kernel_fit_polynomial(series):
    """polyfit2 (distributed closed-form normal equations) equals the
    reference-parity kernel fit_polynomial (normal equations via
    np.linalg.solve) on the same series — tying SURVEY §2.8 MatrixOps /
    PolynomialFitter to the Spark path."""
    from transcriptts.kernels.smoothing import fit_polynomial
    from transcriptts.stats import polyfit2

    data, df = series
    got = {r["conv_id"]: r for r in polyfit2(df).collect()}
    for k in ("a", "b", "c"):
        x = np.arange(len(data[k]), dtype=float)
        want = fit_polynomial(x, np.asarray(data[k], dtype=float), 2)
        r = got[k]
        assert r["n"] == len(data[k])
        for i, b in enumerate(("b0", "b1", "b2")):
            assert r[b] == pytest.approx(want[i], rel=1e-6, abs=1e-9), (k, b)


def test_polyfit2_quantized_mode_and_guards(spark):
    """quantize=k fits the milli-snapped y exactly (integer Cramer path);
    groups with < 3 points or a singular Gram matrix are dropped."""
    from transcriptts.kernels.smoothing import fit_polynomial
    from transcriptts.stats import polyfit2

    rng = np.random.default_rng(7)
    y = rng.normal(50, 10, 20)
    rows = [("g", i, float(v)) for i, v in enumerate(y)]
    rows += [("tiny", 0, 1.0), ("tiny", 1, 2.0)]  # n < 3 -> dropped
    rows += [("sing", 5, 1.0), ("sing", 5, 2.0), ("sing", 5, 3.0)]  # one x -> singular
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, value double")
    got = {r["conv_id"]: r for r in polyfit2(df, quantize=1000).collect()}
    assert set(got) == {"g"}
    yq = np.floor(y * 1000 + 0.5) / 1000.0
    want = fit_polynomial(np.arange(len(y), dtype=float), yq, 2)
    for i, b in enumerate(("b0", "b1", "b2")):
        assert got["g"][b] == pytest.approx(want[i], rel=1e-9), b


def test_polyfit2_plan_is_pure_jvm_single_agg(spark):
    """Plan shape: one partial+final aggregation, no Python in the plan —
    the closed-form Cramer solve is column arithmetic, not a UDF."""
    from transcriptts.stats import polyfit2

    rows = [("g", i, float(i * i)) for i in range(10)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, value double")
    plan = polyfit2(df, quantize=1000)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning(conv_id") == 1
