"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; the
Spark-side plumbing (schema, batch shape, partitioning, Arrow UDF
signatures) is real and tested. The actual media decode is STUBBED — this
container ships no image/audio libraries — behind two swappable paths:

- `decode_stub='fake'` (default): deterministic pseudo-decode that derives a
  fixed-size feature vector from the payload bytes (sha-seeded), so the full
  pipeline (schema, batching, downstream joins) runs end-to-end and is
  reproducible;
- `decode_stub='raise'`: NotImplementedError at first batch, marking exactly
  where a real decoder (PIL/librosa/pyav) plugs in.

The UDFs are `mapInPandas` over Arrow batches: payloads never become
per-row Python calls, and `spark.sql.execution.arrow.maxRecordsPerBatch`
bounds decoder memory (large payloads → set it low)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

FEATURE_DIM = 16


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: binary payloads + plausible metadata."""
    import hashlib

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        meta = {
            "width": 640 if kind != "audio" else None,
            "height": 480 if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 1 if kind == "image" else 300 + i,
            "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM):
    """Deterministic stand-in for a real feature extractor."""
    import hashlib

    import numpy as np

    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_features(df: DataFrame, decode_stub: str | None = "fake", decoder=None) -> DataFrame:
    """(media_id, kind, feature array<float>, payload_bytes) via mapInPandas.

    `decoder` is the PUBLIC seam for a real feature extractor: any callable
    `(payload: bytes, kind: str) -> sequence of FEATURE_DIM floats` (it must
    be picklable — module-level function or functools.partial — since it
    ships to executors). When omitted, `decode_stub` selects the sandbox
    behavior: 'fake' (deterministic sha-derived features, keeps the full
    pipeline runnable) or 'raise' (NotImplementedError at first batch,
    marking where PIL/librosa/pyav plugs in). The Spark-side contract
    (schema, Arrow batching, partitioning) is identical on every path."""
    import pandas as pd

    if decoder is None and decode_stub not in ("fake", "raise"):
        raise ValueError("decode_stub must be 'fake' or 'raise' (or pass decoder=...)")

    def run(batches):
        for pdf in batches:
            if decoder is not None:
                feats = [
                    list(map(float, decoder(bytes(p), k)))
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ]
            elif decode_stub == "raise":
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/pyav — not available in this environment"
                )
            else:
                feats = [_fake_features(bytes(p)).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "payload_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(
        run, "media_id long, kind string, feature array<float>, payload_bytes long"
    )


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index (the
    decode itself is the stubbed step). Pure expressions — the explode
    happens JVM-side, so a 10^6-frame video never inflates through Python."""
    frames = F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
    return (
        df.where(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )
