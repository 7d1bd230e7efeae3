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
