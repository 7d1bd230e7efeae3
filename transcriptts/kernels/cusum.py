"""Two-sided CUSUM mean-shift detector (CUSUMAlgorithm.cs:60-85).

highSum = max(0, highSum + x[i] - mean - slack)
lowSum  = min(0, lowSum  + x[i] - mean + slack)
Alarm (and reset both sums) when either crosses ±threshold, where
threshold = threshold_factor * sigma and slack = slack_factor * sigma
(CUSUMAlgorithm.cs:35-36). Scan starts at i=1; n < 2 → [] (:64-65).
Defaults: mean 0, sigma 1, slack_factor 0, threshold_factor 5
(CUSUMOptions.cs:18-39).
"""

from __future__ import annotations

import numpy as np


def cusum(
    signal,
    expected_mean: float = 0.0,
    expected_std_dev: float = 1.0,
    slack_factor: float = 0.0,
    threshold_factor: float = 5.0,
) -> list[int]:
    if expected_std_dev <= 0:
        raise ValueError("expected_std_dev must be positive")
    if threshold_factor <= 0:
        raise ValueError("threshold_factor must be positive")
    if slack_factor < 0:
        raise ValueError("slack_factor must be non-negative")
    x = np.asarray(signal, dtype=np.float64)
    if len(x) < 2:
        return []
    threshold = threshold_factor * expected_std_dev
    slack = slack_factor * expected_std_dev
    high = 0.0
    low = 0.0
    out: list[int] = []
    for i in range(1, len(x)):
        high = max(0.0, high + x[i] - expected_mean - slack)
        low = min(0.0, low + x[i] - expected_mean + slack)
        if high > threshold or low < -threshold:
            out.append(i)
            high = 0.0
            low = 0.0
    return out
