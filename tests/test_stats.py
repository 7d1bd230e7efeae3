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
