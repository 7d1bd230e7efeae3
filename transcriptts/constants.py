"""Library-wide numeric tolerance constants.

Mirrors the reference's epsilon system (SignalSharp/Common/Constants.cs:20-101)
because several constants are *observable* in golden outputs — e.g. the Gaussian
cost's variance floor of 1e-10 shows up directly as ``n * ln(1e-10)`` for a
zero-variance segment (GaussianLikelihoodCostFunctionTests.cs:104-126).
"""

# Constants.cs:20 — general-purpose absolute tolerance (also the test epsilon,
# SignalSharp.Tests/AssertionUtils.cs:10-21).
DEFAULT_EPSILON = 1e-9

# Constants.cs:27 — tighter tolerance for high-precision checks.
STRICT_EPSILON = 1e-12

# Constants.cs:48 — variance floor used by Gaussian-likelihood segment cost.
VARIANCE_EPSILON = 1e-10

# Constants.cs — default relative tolerance for approximate-equality checks.
DEFAULT_RELATIVE_EPSILON = 1e-7

# RBF cost exponent clamp bounds (RBFCostFunction.cs:275-277): the squared
# scaled distance is clamped into [1e-2, 1e2] before exp(-d) — observable in
# golden PELT-RBF breakpoints.
RBF_EXPONENT_MIN = 1e-2
RBF_EXPONENT_MAX = 1e2

# WeightedMovingAverage guard: |sum(weights)| < 1e-10 → error
# (MovingAverage.cs:244).
WEIGHT_SUM_EPSILON = 1e-10

# PELT candidate/pruning tie band. The reference breaks exact-equal candidate
# ties via strict '<' on raw doubles (PELTAlgorithm.cs:224-338); for discrete
# costs (Poisson/Bernoulli/Binomial) mathematically-equal decompositions are
# common, and which side of a '<' they land on is libm-ulp noise that differs
# between engines (numpy log vs DuckDB ln), making bit-reproducible oracles
# impossible. Both the kernel DP and the SQL oracle therefore treat candidates
# within this absolute band of the minimum as ties (largest prev wins, the
# reference's own tie direction) and prune with the same band, so the chosen
# breakpoints are engine-portable. Margins between genuinely different optima
# are penalty-sized (>> 1e-9), so this never changes a non-tie decision.
PELT_TIE_EPSILON = 1e-9


def approx_equal(a: float, b: float, eps: float = DEFAULT_EPSILON) -> bool:
    """Absolute-tolerance equality (NumericUtils.AreApproximatelyEqual)."""
    return abs(a - b) <= eps


def effectively_zero(x: float, eps: float = DEFAULT_EPSILON) -> bool:
    """NumericUtils.IsEffectivelyZero."""
    return abs(x) <= eps
