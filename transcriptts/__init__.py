"""transcriptts — a PySpark-native time-series rollup / downsample / retention
engine over conversation-transcript tables.

Built from scratch on the public PySpark DataFrame API; re-expresses the
computational surface of emmorts/SignalSharp (segment statistics, sliding
smoothers, PELT/CUSUM changepoints, exponential-smoothing forecasts) as
Catalyst-optimized DataFrame plans plus Arrow-vectorized grouped UDFs, and
adds the tiered-rollup / gap-fill / compression / checkpointed-pipeline layer
the north rule requires.
"""

__version__ = "0.1.0"
