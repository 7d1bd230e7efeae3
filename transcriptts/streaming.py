"""Structured Streaming rollup: the 1m continuous aggregate as a stream.

The reference is batch-only (arrays in/out — SURVEY §2.9: no watermarks or
late data anywhere), and the north rule's pipeline is batch with snapshot
checkpoints. This module is the streaming-ingest complement: the same
tumbling-window aggregate maintained incrementally over a transcript stream,
with event-time watermarking for late turns.

Notes:
- the aggregation is the SAME wide shape as the batch rollup minus exact
  percentiles: exact p50/p99 buffer every value per open window forever, so
  the streaming tier keeps algebraic stats only (cnt/sum/mean/min/max) —
  exact percentiles stay a batch/cold-tier concern (rollup.py), which is
  also how production TSDBs split this;
- latency (ts - previous turn ts) needs per-conversation ordering, which a
  streaming window agg cannot see → computed with
  ``applyInPandasWithState``-free design: we derive latency only within the
  micro-batch via foreachBatch in `stream_rollup_foreach_batch`, or skip it
  in the pure-aggregation path (token_count only);
- `trigger(availableNow=True)` + file source makes the pipeline testable
  hermetically and restart-resumable from the checkpoint dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .rollup import token_count_col
from .schema import TRANSCRIPTS_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    r = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def streaming_rollup_1m(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Event-time 1m token_count rollup with late-data watermark.

    Append-mode compatible: a window finalizes once the watermark passes its
    end, after which late turns are dropped (the batch pipeline's
    incremental recompute path is the corrector of record for stragglers)."""
    return (
        stream.withColumn("token_count", token_count_col().cast("double"))
        .withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count("token_count").alias("cnt"),
            F.sum("token_count").alias("sum"),
            F.avg("token_count").alias("mean"),
            F.min("token_count").alias("min"),
            F.max("token_count").alias("max"),
        )
        .select(
            "conv_id",
            F.col("w.start").alias("bucket_start"),
            F.lit("token_count").alias("metric"),
            "cnt",
            "sum",
            "mean",
            "min",
            "max",
        )
    )


def run_stream_to_memory(
    stream_agg: DataFrame, query_name: str, checkpoint_dir: str, mode: str = "append"
):
    """Drain all available input into an in-memory table (tests / demos)."""
    q = (
        stream_agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_rollup_foreach_batch(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    checkpoint_dir: str,
):
    """Micro-batch bridge into the batch engine: each micro-batch runs the
    FULL batch rollup (both metrics, exact percentiles) via foreachBatch and
    appends per-batch partitions. Gives streaming ingest + batch semantics;
    per-conv latency is exact within a micro-batch (file-grain ingest keeps
    conversations together in practice; the snapshot pipeline remains the
    corrector of record)."""
    from .rollup import rollup, with_derived_metrics

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = rollup(with_derived_metrics(batch_df), "1m").withColumn(
            "batch_id", F.lit(batch_id)
        )
        out.write.mode("append").parquet(f"{output_root}/tier=1m_stream")

    stream = read_transcript_stream(spark, input_path)
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
