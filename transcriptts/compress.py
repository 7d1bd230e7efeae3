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

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts")
        # Arrow delivers datetime64[ns]; normalize to µs explicitly
        ts_us = pdf["_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = pdf["_v"].to_numpy(dtype=np.float64)
        ts_blob = encode_timestamps(ts_us)
        val_blob = encode_floats(vals)
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "metric": [pdf["metric"].iloc[0]],
                "chunk": [pdf["chunk"].iloc[0]],
                "n": [len(pdf)],
                "ts_min": [pdf["_ts"].iloc[0]],
                "ts_max": [pdf["_ts"].iloc[-1]],
                "ts_blob": [ts_blob],
                "val_blob": [val_blob],
                "raw_bytes": [len(pdf) * 16],
                "enc_bytes": [len(ts_blob) + len(val_blob)],
            }
        )

    return base.groupBy("conv_id", "metric", "chunk").applyInPandas(pack, COMPRESSED_SCHEMA)


def decompress_series(df: DataFrame) -> DataFrame:
    """Compressed chunks → (conv_id, metric, bucket_start, value) points."""
    import numpy as np
    import pandas as pd

    from .kernels.gorilla import decode_floats, decode_timestamps

    def unpack(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for row in pdf.itertuples(index=False):
            ts = decode_timestamps(bytes(row.ts_blob))
            vals = decode_floats(bytes(row.val_blob))
            frames.append(
                pd.DataFrame(
                    {
                        "conv_id": row.conv_id,
                        "metric": row.metric,
                        "bucket_start": ts.astype("datetime64[us]"),
                        "value": vals,
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {"conv_id": pd.Series(dtype=str), "metric": pd.Series(dtype=str),
                 "bucket_start": pd.Series(dtype="datetime64[us]"),
                 "value": pd.Series(dtype=np.float64)}
            )
        return pd.concat(frames, ignore_index=True)

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
