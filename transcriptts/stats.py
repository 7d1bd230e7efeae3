"""Statistical scalar/aggregate functions as column expressions (SURVEY §2.7).

Semantics follow the reference's StatisticalFunctions.cs:
- Variance/StdDev are POPULATION (÷N, n<=1 → 0): var_pop/stddev_pop, NOT
  Spark's sample-variance `variance` (StatisticalFunctions.cs:91-139);
- Normalize: (x-min)/(max-min), all-equal → 0 (:182-240);
- ZScore: (x-mean)/stddev_pop, sigma≈0 → 0 (:253-309);
- Skewness: SAMPLE G1 = n/((n-1)(n-2)) * sum(((x-mean)/sigma_pop)^3); Spark's
  built-in skewness() is population g1 = m3/m2^1.5, so G1 = g1 *
  sqrt(n(n-1))/(n-2) (:323-341);
- PopulationExcessKurtosis: m4/m2^2 - 3 == Spark kurtosis() (:354-372);
- SampleKurtosisG2: ((n+1)*g2 + 6) * (n-1)/((n-2)(n-3)) (:386-404).

All are plain aggregates/window expressions — partial aggregation and
whole-stage codegen apply; nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _w(group_col: str) -> Window:
    return Window.partitionBy(group_col)


def normalize(value_col: str, group_col: str = "conv_id") -> Column:
    """Min-max normalize to [0,1] within each group; zero range → 0."""
    v = F.col(value_col).cast("double")
    w = _w(group_col)
    rng = F.max(v).over(w) - F.min(v).over(w)
    return F.when(rng > 0, (v - F.min(v).over(w)) / rng).otherwise(F.lit(0.0))


def zscore(value_col: str, group_col: str = "conv_id") -> Column:
    """Population z-score within each group; sigma≈0 → 0."""
    v = F.col(value_col).cast("double")
    w = _w(group_col)
    sigma = F.stddev_pop(v).over(w)
    return F.when(sigma > 1e-9, (v - F.avg(v).over(w)) / sigma).otherwise(F.lit(0.0))


def skewness_g1(value_col: str) -> Column:
    """Reference skewness estimator (StatisticalFunctions.generic.cs:170-203):
    G1 = n * sum(((x-mean)/sigma_pop)^3) / ((n-1)(n-2)) = n^2*g1/((n-1)(n-2))
    where g1 is Spark's population skewness. n<3 → null; sigma≈0 → 0."""
    v = F.col(value_col).cast("double")
    n = F.count(v).cast("double")
    g1 = F.skewness(v)  # population m3 / m2^1.5
    return F.when(
        F.count(v) >= 3,
        F.when(F.stddev_pop(v) <= 1e-9, F.lit(0.0)).otherwise(
            n * n * g1 / ((n - 1) * (n - 2))
        ),
    ).otherwise(F.lit(None))


def population_excess_kurtosis(value_col: str) -> Column:
    """m4/m2^2 - 3 (aggregate) == Spark's kurtosis(). n<4 → null."""
    v = F.col(value_col).cast("double")
    return F.when(F.count(v) >= 4, F.kurtosis(v)).otherwise(F.lit(None))


def sample_kurtosis_g2(value_col: str) -> Column:
    """Unbiased sample excess kurtosis G2 (aggregate). n<4 → null."""
    v = F.col(value_col).cast("double")
    n = F.count(v).cast("double")
    g2 = F.kurtosis(v)
    return F.when(
        F.count(v) >= 4, ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
    ).otherwise(F.lit(None))


def series_stats(df: DataFrame, value_col: str = "value", group_col: str = "conv_id") -> DataFrame:
    """Per-series descriptive statistics — one aggregation pass."""
    v = F.col(value_col).cast("double")
    return df.groupBy(group_col).agg(
        F.count(v).alias("n"),
        F.avg(v).alias("mean"),
        F.percentile(v, F.lit(0.5)).alias("median"),
        F.var_pop(v).alias("var_pop"),
        F.stddev_pop(v).alias("stddev_pop"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        skewness_g1(value_col).alias("skewness_g1"),
        population_excess_kurtosis(value_col).alias("kurtosis_pop_excess"),
        sample_kurtosis_g2(value_col).alias("kurtosis_g2"),
    )


def with_normalized(df: DataFrame, value_col: str = "value", group_col: str = "conv_id") -> DataFrame:
    return df.withColumn("normalized", normalize(value_col, group_col)).withColumn(
        "zscore", zscore(value_col, group_col)
    )


def polyfit2(
    df: DataFrame,
    x_col: str = "turn_idx",
    y_col: str = "value",
    group_col: str = "conv_id",
    quantize: int | None = None,
) -> DataFrame:
    """Per-group degree-2 least-squares fit y = b0 + b1*x + b2*x^2 via the
    normal equations, solved in closed form (Cramer's rule on the 3x3 Gram
    matrix of power sums) — the distributed re-expression of the reference's
    PolynomialFitter.FitPolynomial + MatrixOperations.TrySolveLinearSystem
    (PolynomialFitter.cs:21-98, MatrixOperations.cs:300-318; same normal-
    equations route, a one-shot formula instead of Gaussian elimination).

    One aggregation pass (8 power/cross sums, partial aggregation applies)
    then pure column arithmetic — nothing leaves the JVM, no matrix library
    on the hot path, and at 100 TB the work is one map-side-combinable
    groupBy regardless of series length.

    With ``quantize=k`` the y values are first snapped to 1/k units
    (floor(y*k + 0.5), exact in any engine) so every sum and determinant is
    EXACT int64 arithmetic and each coefficient is one double division —
    bit-reproducible across engines/partitionings (the oracle-parity mode).
    Without it, sums are plain doubles (full precision, last-ulp
    order-dependent like any distributed float sum).

    Intermediates fit int64 when x stays window-sized: the largest term is
    ~max(|y|*k) * max(x)^4 * n_rows_per_group — e.g. x < 25, k = 1000,
    |y| < 1e6 gives ~1.2e17 < 2^63. Callers fit windows (the SavGol regime),
    not unbounded indexes. Groups need >= 3 distinct x (singular Gram
    otherwise); smaller/singular groups are dropped."""
    x = F.col(x_col).cast("long")
    if quantize:
        y = F.floor(F.col(y_col).cast("double") * quantize + F.lit(0.5)).cast("long")
    else:
        y = F.col(y_col).cast("double")
    g = (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("s0"),
            F.sum(x).alias("s1"),
            F.sum(x * x).alias("s2"),
            F.sum(x * x * x).alias("s3"),
            F.sum(x * x * x * x).alias("s4"),
            F.sum(y).alias("t0"),
            F.sum(x * y).alias("t1"),
            F.sum(x * x * y).alias("t2"),
        )
        .where(F.col("s0") >= 3)
    )
    s0, s1, s2, s3, s4 = (F.col(c) for c in ("s0", "s1", "s2", "s3", "s4"))
    t0, t1, t2 = (F.col(c) for c in ("t0", "t1", "t2"))
    det = s0 * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s3 * s2) + s2 * (s1 * s3 - s2 * s2)
    det0 = t0 * (s2 * s4 - s3 * s3) - s1 * (t1 * s4 - s3 * t2) + s2 * (t1 * s3 - s2 * t2)
    det1 = s0 * (t1 * s4 - s3 * t2) - t0 * (s1 * s4 - s3 * s2) + s2 * (s1 * t2 - t1 * s2)
    det2 = s0 * (s2 * t2 - s3 * t1) - s1 * (s1 * t2 - s2 * t1) + t0 * (s1 * s3 - s2 * s2)
    unscale = float(quantize) if quantize else 1.0
    return g.where(det != 0).select(
        group_col,
        F.col("s0").alias("n"),
        (det0.cast("double") / (det.cast("double") * unscale)).alias("b0"),
        (det1.cast("double") / (det.cast("double") * unscale)).alias("b1"),
        (det2.cast("double") / (det.cast("double") * unscale)).alias("b2"),
    )
