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


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract audio payloads via mapInPandas.

    The decode is a deterministic stub (payload bytes reinterpreted as a
    PCM-ish int8 signal — no torchaudio/ffmpeg in this container); the
    batch shape, schema and metadata pass-through are the production
    contract. Feature math (rms, zero crossings) is vectorized numpy over
    the whole batch's samples."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["meta_duration_s"]
            ):
                if payload is None:
                    # metadata passes through even when the payload is
                    # undecodable — duration is source metadata, not derived
                    rows.append((mid, None, dur, None, None))
                    continue
                sig = np.frombuffer(bytes(payload), dtype=np.int8).astype(np.float64)
                rms = float(np.sqrt(np.mean(sig**2))) if len(sig) else 0.0
                zc = int(((sig[:-1] * sig[1:]) < 0).sum()) if len(sig) > 1 else 0
                rows.append((mid, len(payload), dur, rms, zc))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return df.filter(F.col("modality") == "audio").select(
        "media_id", "payload", "meta_duration_s"
    ).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), True),
        T.StructField("out_h", T.IntegerType(), True),
        T.StructField("pixels", T.ArrayType(T.FloatType()), True),
    ]
)


def resize_images(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Resize-to-fixed-shape plumbing: every image payload becomes an
    (out_w * out_h)-float array — the tensor-batch contract a training
    pipeline feeds to a model. The resample kernel is the deterministic
    stub decoder; a real deployment swaps in PIL/libvips and keeps the
    schema, Arrow batching and fixed output shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None))
                    continue
                digest = hashlib.sha256(bytes(payload)).digest()
                rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
                px = rng.random(out_w * out_h).astype(np.float32)
                rows.append((mid, out_w, out_h, px.tolist()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return df.filter(F.col("modality") == "image").select(
        "media_id", "payload"
    ).mapInPandas(run, RESIZE_SCHEMA)


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
