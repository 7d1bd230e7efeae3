"""Schemas: the transcripts input table and the rollup-tier outputs.

Input shape is fixed by the engine contract (BASELINE.json ``input_hint``):
``transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``.
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# One row per (conv_id, bucket, metric); p50/p99 are EXACT percentiles
# (reference median semantics: even n -> mean of the two middle values,
# StatisticalFunctions.helpers.cs:32-45).
ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("bucket_start", T.TimestampType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("cnt", T.LongType(), False),
        T.StructField("sum", T.DoubleType(), True),
        T.StructField("mean", T.DoubleType(), True),
        T.StructField("min", T.DoubleType(), True),
        T.StructField("max", T.DoubleType(), True),
        T.StructField("p50", T.DoubleType(), True),
        T.StructField("p99", T.DoubleType(), True),
    ]
)

TIERS = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}
TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}
