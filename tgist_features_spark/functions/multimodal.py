"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Decode status (container constraint, re-checked every round):

* **REAL decoders**, no external library — PPM (P6) images, PNG images
  (round 4: full chunk walk, stdlib zlib inflate, numpy unfiltering of
  all five scanline filter types; 8-bit gray/RGB/RGBA non-interlaced),
  baseline JPEG (round 5: full marker walk, canonical Huffman entropy
  decode with byte-unstuffing and restart markers, vectorized
  dequantize + IDCT, 4:4:4/4:2:2/4:2:0 chroma, JFIF YCbCr->RGB — see
  functions/jpegcodec.py), GIF87a/89a (round 6: variable-width LZW
  with 12-bit growth and overflow clears, global/local color tables,
  interlace de-passing, extension skipping; first frame — see
  functions/gifcodec.py) and PCM16 mono WAV audio;
  width/height/duration/intensity/rms come from actual pixels/samples,
  and the resize is a true area-average (anti-aliased) downsample.
* **Deterministic stubs** only where a codec library is unavoidable
  (MP4, progressive/arithmetic JPEG — ffmpeg/libvips are not installed
  in this sandbox). The stub keeps the exact kernel signature, so a
  real deployment swaps the codec in and nothing else changes.

The Spark side is production-shaped either way: Arrow binary batches into
``mapInPandas`` (one Python call per batch, never per row — the per-payload
loop inside the batch IS the decode kernel), typed output schemas, metadata
pass-through, and fan-out handled distributed (video frame sampling).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tgist_features_spark.functions.gifcodec import decode_gif
from tgist_features_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

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

# ------------------------------------------------------------- real codecs


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(b: bytes) -> np.ndarray | None:
    """Binary PPM (P6) -> (h, w, 3) uint8, or None if not a valid P6.
    Pure bytes parsing + one zero-copy frombuffer — no codec library."""
    if len(b) < 10 or b[:2] != b"P6":
        return None
    i, vals = 2, []
    limit = min(len(b), 512)
    while len(vals) < 3 and i < limit:
        while i < limit and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":  # comment to end-of-line
            while i < limit and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < limit and not b[j : j + 1].isspace():
            j += 1
        try:
            vals.append(int(b[i:j]))
        except ValueError:
            return None
        i = j
    if len(vals) < 3 or i >= len(b):
        return None
    w, h, maxval = vals
    if not (0 < w and 0 < h and maxval == 255):
        return None
    off = i + 1  # single whitespace after maxval
    need = w * h * 3
    if len(b) < off + need:
        return None
    return np.frombuffer(b, dtype=np.uint8, count=need, offset=off).reshape(h, w, 3)


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG (8-bit RGB, filter 0 per scanline,
    non-interlaced). Real PNG via stdlib zlib — no codec library."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    h, w, _ = img.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    raw = b"".join(
        b"\x00" + img[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(b: bytes) -> np.ndarray | None:
    """PNG -> (h, w, 3) uint8, or None if not decodable here.

    A REAL decode of a real compressed format with zero external
    libraries: chunk walk, stdlib ``zlib`` inflate, then numpy scanline
    unfiltering for all five PNG filter types (rows process sequentially —
    Average/Paeth need the previous row; Up is vectorized across the row
    and Sub reduces to a per-channel-lane prefix sum; Average/Paeth loop
    per byte, acceptable for feature-extraction batches). Supports 8-bit
    gray/RGB/RGBA, non-interlaced (Adam7 returns None — the decode-or-
    fallback contract, same as every other codec gap)."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    if not b.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    pos, w, h = 8, None, None
    depth = color = interlace = None
    idat = []
    while pos + 8 <= len(b):
        ln, typ = struct.unpack(">I4s", b[pos : pos + 8])
        pos += 8
        data = b[pos : pos + ln]
        pos += ln + 4  # skip CRC
        if typ == b"IHDR" and len(data) >= 13:
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or depth != 8 or interlace != 0 or color not in (0, 2, 6):
        return None
    ch = {0: 1, 2: 3, 6: 4}[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    rows = arr[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = int(ftypes[y])
        row = rows[y]
        if f == 0:
            cur = row.copy()
        elif f == 2:  # Up — vectorized
            cur = row + prev
        elif f == 1:  # Sub — per-channel-lane prefix sum, fully vectorized
            cur = (
                np.cumsum(row.reshape(-1, ch), axis=0, dtype=np.int64)
                .reshape(-1) & 255
            ).astype(np.int32)
        elif f == 3:  # Average
            cur = row.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (row[x] + ((left + prev[x]) >> 1)) & 255
        elif f == 4:  # Paeth
            cur = row.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                up = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                cur[x] = (row[x] + pr) & 255
        else:
            return None
        cur &= 255
        out[y] = cur.astype(np.uint8)
        prev = cur.astype(np.int32)
    img = out.reshape(h, w, ch)
    if ch == 1:
        img = np.repeat(img[:, :, None].reshape(h, w, 1), 3, axis=2)
    elif ch == 4:
        img = img[:, :, :3]
    return np.ascontiguousarray(img)


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Mono int16 samples -> minimal RIFF/WAVE PCM16 bytes."""
    data = samples.astype("<i2").tobytes()
    n = len(data)
    hdr = (
        b"RIFF" + (36 + n).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")          # PCM
        + (1).to_bytes(2, "little")          # mono
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")   # byte rate
        + (2).to_bytes(2, "little")          # block align
        + (16).to_bytes(2, "little")         # bits
        + b"data" + n.to_bytes(4, "little")
    )
    return hdr + data


def decode_wav_pcm16(b: bytes) -> tuple[int, np.ndarray] | None:
    """RIFF/WAVE mono PCM16 -> (sample_rate, int16 samples), else None.
    Chunk-walking parser, zero-copy frombuffer on the data chunk."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, rate, data = 12, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        body = b[i + 8 : i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = int.from_bytes(body[0:2], "little")
            ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or ch != 1 or bits != 16:
                return None
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not rate or data is None:
        return None
    return rate, np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")


def _resize_gray(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Fixed-shape resize of a 2-D array: true area-average (anti-aliased)
    when downsampling — box sums via two ``np.add.reduceat`` passes —
    nearest-neighbor when upsampling. Pure numpy."""
    h, w = gray.shape
    if out_h <= h and out_w <= w:
        ye = (np.arange(out_h) * h) // out_h
        xe = (np.arange(out_w) * w) // out_w
        s = np.add.reduceat(
            np.add.reduceat(gray.astype(np.float64), ye, axis=0), xe, axis=1
        )
        yc = np.diff(np.append(ye, h))
        xc = np.diff(np.append(xe, w))
        return s / (yc[:, None] * xc[None, :])
    iy = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    ix = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return gray[iy][:, ix].astype(np.float64)


# ------------------------------------------------------------ stub kernels


def _decode_image_stub(payload: bytes) -> tuple[int, int, float, np.ndarray]:
    """Deterministic fallback for image formats outside the real
    decoders' coverage (progressive/arithmetic JPEG, WebP, ... — no
    PIL/libvips in this sandbox; environment, not design). Same
    signature as the real path; a deployment with codecs deletes it."""
    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    w = 16 + digest[8] % 64
    h = 16 + digest[9] % 64
    mean = float(np.frombuffer(payload[:256] or b"\x00", dtype=np.uint8).mean())
    thumb = rng.random(8, dtype=np.float64).astype(np.float32)
    return w, h, mean, thumb


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


def image_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract image payloads via mapInPandas.

    PPM and PNG payloads decode for REAL (dims, mean intensity and the 8-float
    grayscale thumb all come from actual pixels); codec formats fall back
    to the deterministic stub. Arrow streams binary batches into the
    Python worker; one call per batch, never per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None, None, None, None))
                    continue
                b = bytes(payload)
                img = decode_ppm(b)
                if img is None:
                    img = decode_png(b)
                if img is None:
                    img = decode_jpeg(b)
                if img is None:
                    img = decode_gif(b)
                if img is not None:
                    gray = img.mean(axis=2)
                    w, h = img.shape[1], img.shape[0]
                    mean = float(gray.mean())
                    thumb = (
                        _resize_gray(gray, 2, 4).ravel() / 255.0
                    ).astype(np.float32)
                else:
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

    PCM16 WAV payloads decode for REAL: duration = n_samples/rate from the
    RIFF header (overriding the source metadata), rms and zero-crossings
    over the actual samples (normalized to [-1, 1]). Non-WAV payloads keep
    the stub path (bytes as an int8 signal) with the metadata duration."""

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
                b = bytes(payload)
                wav = decode_wav_pcm16(b)
                if wav is not None:
                    rate, pcm = wav
                    sig = pcm.astype(np.float64) / 32768.0
                    dur = len(sig) / rate
                else:
                    sig = np.frombuffer(b, dtype=np.int8).astype(np.float64)
                rms = float(np.sqrt(np.mean(sig**2))) if len(sig) else 0.0
                zc = int(((sig[:-1] * sig[1:]) < 0).sum()) if len(sig) > 1 else 0
                rows.append((mid, len(b), dur, rms, zc))
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
    """Resize-to-fixed-shape: every image payload becomes an
    (out_w * out_h)-float array — the tensor-batch contract a training
    pipeline feeds to a model. PPM and PNG payloads go through the REAL
    area-average resample of their actual pixels (grayscale, [0, 1]);
    remaining codec formats fall back to the deterministic stub tensor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None))
                    continue
                b = bytes(payload)
                img = decode_ppm(b)
                if img is None:
                    img = decode_png(b)
                if img is None:
                    img = decode_jpeg(b)
                if img is None:
                    img = decode_gif(b)
                if img is not None:
                    px = (
                        _resize_gray(img.mean(axis=2), out_h, out_w).ravel()
                        / 255.0
                    ).astype(np.float32)
                else:
                    digest = hashlib.sha256(b).digest()
                    rng = np.random.default_rng(
                        int.from_bytes(digest[:8], "little")
                    )
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

    The decoder is stubbed (deterministic frame count from duration — MP4
    needs ffmpeg, absent here); the explode + per-frame schema is the real
    scale concern: a 2-hour video at 1 fps is 7200 rows from one input row
    — handled distributed, never materialized driver-side.
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
    """Deterministic media table for tests: REAL binary formats where the
    engine has real decoders — images alternate valid P6 PPMs and valid
    PNGs, audio is valid PCM16 WAV (sine + noise) — and opaque bytes for
    video (codec-stubbed).
    """
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        meta_w = meta_h = None
        duration = None
        if modality == "image":
            meta_w = int(rng.integers(4, 48))
            meta_h = int(rng.integers(4, 48))
            img = rng.integers(0, 256, size=(meta_h, meta_w, 3), dtype=np.uint8)
            # cycle the three REAL image codecs so every decode path stays
            # exercised by every consumer of this fixture
            kind = (i // 3) % 3
            if kind == 0:
                payload = encode_ppm(img)
            elif kind == 1:
                payload = encode_png(img)
            else:
                payload = encode_jpeg(img, quality=95)
        elif modality == "audio":
            rate = 8000
            n_samp = int(rng.integers(80, 2400))
            t = np.arange(n_samp) / rate
            freq = float(rng.integers(100, 1000))
            sig = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n_samp)
            payload = encode_wav_pcm16(
                np.clip(sig * 32767, -32768, 32767).astype(np.int16), rate
            )
            duration = n_samp / rate
        else:
            payload = rng.bytes(64 + int(rng.integers(0, 256)))
            duration = float(rng.integers(1, 600))
        rows.append(
            (
                i,
                modality,
                bytearray(payload),
                {
                    "image": (
                        "image/x-portable-pixmap"
                        if payload[:2] == b"P6"
                        else "image/jpeg"
                        if payload[:2] == b"\xff\xd8"
                        else "image/png"
                    ),
                    "audio": "audio/wav",
                    "video": "video/mp4",
                }[modality],
                meta_w,
                meta_h,
                duration,
            )
        )
    pdf = pd.DataFrame(
        rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
    )
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
