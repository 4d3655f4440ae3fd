"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode libraries (PIL/ffmpeg/torchaudio) are not installed in this
container, so the *decode kernels* are deterministic stubs — but the
Spark-side plumbing is real and tested: schema, Arrow batch shape,
mapInPandas partitioning, and the metadata contract are exactly what a
production decode stage needs; swap ``_decode_image_stub`` for a real
decoder and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta_w", T.IntegerType(), True),
        T.StructField("meta_h", T.IntegerType(), True),
        T.StructField("meta_duration_s", T.DoubleType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
        T.StructField("thumb", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, float, np.ndarray]:
    """Deterministic fake decoder. A real deployment replaces this with
    PIL/libvips; the signature (bytes -> dims + stats + small tensor) is the
    contract the rest of the pipeline depends on."""
    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    w = 16 + digest[8] % 64
    h = 16 + digest[9] % 64
    mean = float(np.frombuffer(payload[:256] or b"\x00", dtype=np.uint8).mean())
    thumb = rng.random(8, dtype=np.float64).astype(np.float32)
    return w, h, mean, thumb


def image_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract image payloads via mapInPandas.

    Arrow streams binary batches into the Python worker; one call per batch
    (never per row). Output is a flat typed frame — ready to join back or
    sink as its own table.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None, None, None, None))
                    continue
                b = bytes(payload)
                w, h, mean, thumb = _decode_image_stub(b)
                rows.append(
                    (
                        mid,
                        len(b),
                        hashlib.sha256(b).hexdigest()[:16],
                        w,
                        h,
                        mean,
                        thumb.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields],
            )

    return df.select("media_id", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_stub(df: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame.

    The decoder is stubbed (deterministic frame count from duration); the
    explode + per-frame schema is the real scale concern: a 2-hour video at
    1 fps is 7200 rows from one input row — mapInPandas handles the fan-out
    without materializing all frames driver-side.
    """
    n_frames = F.greatest(
        F.lit(1), F.floor(F.coalesce(F.col("meta_duration_s"), F.lit(0.0)) / every_s)
    ).cast("int")
    return (
        df.filter(F.col("modality") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_s).alias("frame_ts_s"),
        )
    )


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = rng.bytes(64 + int(rng.integers(0, 256)))
        rows.append(
            (
                i,
                modality,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                int(rng.integers(16, 512)) if modality == "image" else None,
                int(rng.integers(16, 512)) if modality == "image" else None,
                float(rng.integers(1, 600)) if modality != "image" else None,
            )
        )
    pdf = pd.DataFrame(
        rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
    )
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
