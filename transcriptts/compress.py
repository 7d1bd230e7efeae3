"""Cold-tier compression: Gorilla-packed chunks as BinaryType columns.

`compress_series` folds each (conv_id, metric, chunk) group of rollup points
into ONE row holding two binary blobs — XOR-packed values + delta-of-delta-
packed bucket timestamps — plus chunk metadata (row count, ts range, raw and
encoded byte sizes). `decompress_series` explodes blobs back into points;
roundtrip is bit-exact.

Chunking: `chunk` = floor(bucket epoch / chunk_seconds) so one blob covers a
bounded time range (default 1 day of 1m points = <=1440 points/blob). The
groupBy carries only (ts, value) pairs — Arrow-batched, no per-row Python.

At 100 TB this is the storage win for cold data: a metronome-ish series
packs ~60-80x for timestamps and 5-20x for values; blobs stay individually
decodable so point lookups only touch the covering chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMPRESSED_SCHEMA = (
    "conv_id string, metric string, chunk long, n int, "
    "ts_min timestamp, ts_max timestamp, "
    "ts_blob binary, val_blob binary, raw_bytes long, enc_bytes long"
)


def compress_series(
    df: DataFrame,
    value_col: str = "mean",
    ts_col: str = "bucket_start",
    chunk_seconds: int = 86400,
) -> DataFrame:
    """Rollup points → one compressed chunk row per (conv_id, metric, chunk)."""
    import numpy as np
    import pandas as pd

    from .kernels.gorilla import encode_floats, encode_timestamps

    base = df.select(
        "conv_id",
        "metric",
        F.floor(F.unix_seconds(F.col(ts_col).cast("timestamp")) / chunk_seconds).alias("chunk"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(value_col).cast("double").alias("_v"),
    )

    # Grouping happens JVM-side (collect_list + sort_array on a (ts, v)
    # struct — ts is the leading struct field, so sort_array orders by
    # time); Python then sees whole Arrow BATCHES of chunk rows, not one
    # pandas group per chunk. With day-sized chunks the groups are tiny
    # (a handful of points), so a per-group applyInPandas paid ~ms of
    # pandas overhead per chunk — 40k chunks made that the whole runtime.
    from .partitioning import kernel_partitions

    grouped = (
        kernel_partitions(base, "conv_id", "metric", "chunk")
        .groupBy("conv_id", "metric", "chunk")
        .agg(F.sort_array(F.collect_list(F.struct("_ts", "_v"))).alias("pts"))
        .select(
            "conv_id", "metric", "chunk",
            F.col("pts._ts").alias("ts_arr"), F.col("pts._v").alias("v_arr"),
        )
    )

    def pack_batches(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "conv_id", "metric", "chunk", "n", "ts_min", "ts_max",
                "ts_blob", "val_blob", "raw_bytes", "enc_bytes",
            )}
            for conv_id, metric, chunk, ts_arr, v_arr in zip(
                pdf["conv_id"], pdf["metric"], pdf["chunk"], pdf["ts_arr"], pdf["v_arr"]
            ):
                ts = np.asarray(ts_arr).astype("datetime64[us]")
                ts_us = ts.astype(np.int64)
                vals = np.asarray(v_arr, dtype=np.float64)
                ts_blob = encode_timestamps(ts_us)
                val_blob = encode_floats(vals)
                out["conv_id"].append(conv_id)
                out["metric"].append(metric)
                out["chunk"].append(chunk)
                out["n"].append(len(vals))
                out["ts_min"].append(ts[0])
                out["ts_max"].append(ts[-1])
                out["ts_blob"].append(ts_blob)
                out["val_blob"].append(val_blob)
                out["raw_bytes"].append(len(vals) * 16)
                out["enc_bytes"].append(len(ts_blob) + len(val_blob))
            yield pd.DataFrame(out)

    return grouped.mapInPandas(pack_batches, COMPRESSED_SCHEMA)


def decompress_series(df: DataFrame) -> DataFrame:
    """Compressed chunks → (conv_id, metric, bucket_start, value) points."""
    import numpy as np
    import pandas as pd

    from .kernels.gorilla import decode_floats, decode_timestamps

    def unpack(pdf: pd.DataFrame) -> pd.DataFrame:
        # one output frame per Arrow batch (np.repeat for the id columns),
        # not one pandas frame per chunk row
        ts_list = [decode_timestamps(bytes(b)) for b in pdf["ts_blob"]]
        val_list = [decode_floats(bytes(b)) for b in pdf["val_blob"]]
        if not ts_list:
            return pd.DataFrame(
                {"conv_id": pd.Series(dtype=str), "metric": pd.Series(dtype=str),
                 "bucket_start": pd.Series(dtype="datetime64[us]"),
                 "value": pd.Series(dtype=np.float64)}
            )
        ns = np.array([len(t) for t in ts_list])
        return pd.DataFrame(
            {
                "conv_id": np.repeat(pdf["conv_id"].to_numpy(), ns),
                "metric": np.repeat(pdf["metric"].to_numpy(), ns),
                "bucket_start": np.concatenate(ts_list).astype("datetime64[us]"),
                "value": np.concatenate(val_list),
            }
        )

    # mapInPandas: each chunk row explodes independently, no shuffle at all
    return df.mapInPandas(
        lambda it: (unpack(pdf) for pdf in it),
        "conv_id string, metric string, bucket_start timestamp, value double",
    )


def compression_report(compressed: DataFrame) -> DataFrame:
    """Per-metric compression ratio summary (for pipeline metrics)."""
    return compressed.groupBy("metric").agg(
        F.count("*").alias("chunks"),
        F.sum("n").alias("points"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
        (F.sum("raw_bytes") / F.sum("enc_bytes")).alias("ratio"),
    )
