"""Partitioning helpers for CPU-bound kernel stages.

AQE's post-shuffle partition coalescing sizes partitions by BYTES, which is
right for JVM aggregates but catastrophically wrong for grouped Python
kernels: a 100k-row input is a few MB, so AQE coalesces the pre-UDF
exchange down to one or two partitions and the whole kernel stage runs on
one core (measured: 105s -> 11.5s for penalty selection at local[32] once
the exchange keeps its width). The durable fix is to state the intent in
the plan: kernel stages are CPU-bound, so their exchange is an EXPLICIT
`repartition(n, keys)` — user-specified repartitions are exempt from AQE
coalescing, and the grouped UDF reuses that clustering without a second
shuffle. On a real cluster the same reasoning holds: you want one
partition per task slot (x a small wave factor), not one per 64 MB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

WAVE_FACTOR = 4  # tasks per core: straggler smoothing for uneven groups


def kernel_partitions(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-partition `df` by `keys` at ~parallelism x WAVE_FACTOR width,
    pinned against AQE byte-based coalescing. Place directly before a
    groupBy(*keys).applyInPandas(...) — the UDF inherits the clustering.

    The width is parallelism x WAVE_FACTOR + 1: if it exactly equaled the
    session's shuffle-partition count, Catalyst would judge this exchange
    redundant against an upstream ENSURE_REQUIREMENTS exchange on the same
    keys and drop it — leaving only the coalescible exchange, which AQE
    then shrinks by bytes and serializes the kernel (observed: the whole
    stage on one core). The +1 keeps the user-specified, non-coalescible
    exchange in the plan under any config."""
    sc = df.sparkSession.sparkContext
    n = max(1, sc.defaultParallelism) * WAVE_FACTOR + 1
    return df.repartition(n, *keys)
