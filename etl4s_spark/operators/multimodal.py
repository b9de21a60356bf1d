"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via mapInPandas.

Uncompressed formats are decoded FOR REAL, pure-Python/numpy, no codec
libs: BMP (24-bit BI_RGB header + pixel parse), PPM (P6), and WAV
(RIFF PCM 8/16-bit → float samples). ``default_decoder`` routes those
mimes through the real pixel/sample paths (luma-histogram / RMS-envelope
features) and falls back to ``_decode_stub`` for codec formats the
container can't handle (JPEG/MP3/H.264 need native libs; a PIL/ffmpeg
decoder plugs into the same seam).

Scale posture: binary payloads dominate row size, so
- ``maxRecordsPerBatch`` keeps Arrow batches bounded (set via
  ``spark.sql.execution.arrow.maxRecordsPerBatch``, e.g. 256 for MB-size
  images);
- repartition by a size-balanced key BEFORE mapInPandas if payload sizes
  are skewed;
- metadata-only predicates (width/height/mime filters) run as ordinary
  pushed-down column filters WITHOUT touching the bytes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# A decoder turns (payload_bytes, mime, feature_dim) into a feature
# vector. Implementations are plain callables — they get pickled into the
# mapInPandas closure and run executor-side, so a real PIL/torchaudio/
# ffmpeg decoder plugs in without touching this module.
Decoder = Callable[[bytes, str, int], "list[float]"]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a deterministic binary payload column from text (test stand-in
    for real media bytes) + plausible metadata."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/fake").alias("mime"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(1920)) + 1).cast("int").alias("meta_width"),
        (F.pmod(F.xxhash64(F.col(id_col), F.lit(1)), F.lit(1080)) + 1).cast("int").alias("meta_height"),
    )


def _decode_stub(payload: bytes, mime: str, feature_dim: int) -> list[float]:
    """STUB decoder: a real implementation would decode image/audio bytes
    (PIL/torchaudio/ffmpeg) and run feature extraction. Here: deterministic
    pseudo-features from the payload hash so tests have stable values.
    Raises for mime types a real pipeline would reject."""
    if mime is None or not mime.startswith(("image/", "audio/", "video/")):
        raise NotImplementedError(f"no decoder for mime {mime!r}")
    digest = hashlib.sha256(payload or b"").digest()
    # cycle the 32 digest bytes into feature_dim floats in [0, 1)
    return [digest[i % 32] / 256.0 for i in range(feature_dim)]


# ---------------------------------------------------------------------------
# Real decoders: uncompressed raster formats need no codec libraries —
# BMP (BITMAPINFOHEADER, 24-bit BI_RGB) and PPM (P6) are header + raw
# pixels, parseable with struct/numpy alone.
# ---------------------------------------------------------------------------

RASTER_MIMES = ("image/bmp", "image/x-ms-bmp", "image/x-portable-pixmap", "image/ppm")
WAV_MIMES = ("audio/wav", "audio/x-wav", "audio/wave")


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse 24-bit uncompressed (BI_RGB) BMP bytes into an (h, w, 3)
    RGB uint8 array. Handles 4-byte row padding, bottom-up (positive
    height) and top-down (negative height) pixel order."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={compression}")
    if width <= 0 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    bottom_up = height > 0
    h = abs(height)
    row_bytes = ((24 * width + 31) // 32) * 4
    if len(payload) < pix_off + row_bytes * h:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(payload, np.uint8, row_bytes * h, pix_off).reshape(h, row_bytes)
    bgr = rows[:, : width * 3].reshape(h, width, 3)
    rgb = bgr[..., ::-1]
    return rgb[::-1] if bottom_up else rgb


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Write an (h, w, 3) RGB uint8 array as 24-bit BI_RGB BMP bytes —
    the inverse of decode_bmp, used to synthesize real image payloads
    (tests) and to re-emit resized images."""
    h, w, _ = pixels.shape
    row_bytes = ((24 * w + 31) // 32) * 4
    padded = np.zeros((h, row_bytes), np.uint8)
    # BMP stores BGR, bottom row first
    padded[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    body = padded.tobytes()
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(body), 0, 0, 54,
        40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return header + body


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse binary PPM (P6, maxval<=255) bytes into an (h, w, 3) RGB
    uint8 array. Honors whitespace/comment header grammar."""
    if payload is None or payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and '#' comments between header tokens
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw pixels
    w, h, maxval = fields
    if maxval > 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM: {w}x{h} maxval={maxval}")
    if len(payload) < pos + w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(payload, np.uint8, w * h * 3, pos).reshape(h, w, 3)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse RIFF/WAVE PCM bytes (8- or 16-bit integer PCM) into
    (samples as float32 in [-1, 1] shaped (n_frames, n_channels),
    sample_rate). Pure struct/numpy — WAV is header + raw samples, no
    codec needed; compressed audio (MP3/AAC) stays on the stub seam."""
    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        (chunk_len,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + chunk_len]
        if chunk_id == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif chunk_id == b"data":
            data = body
        pos += 8 + chunk_len + (chunk_len & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
    if bits == 16:
        raw = np.frombuffer(data, "<i2", len(data) // 2)
        samples = raw.astype(np.float32) / 32768.0
    else:
        raw = np.frombuffer(data, np.uint8, len(data))
        samples = (raw.astype(np.float32) - 128.0) / 128.0
    n_frames = len(samples) // n_channels
    return samples[: n_frames * n_channels].reshape(n_frames, n_channels), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Write (n_frames, n_channels) float32 [-1, 1] samples as 16-bit
    PCM WAV bytes — the inverse of decode_wav, for synthesizing test
    audio and re-emitting transformed clips."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_channels = samples.shape[1]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
        b"data", len(pcm),
    )
    return hdr + pcm


def audio_features(samples: np.ndarray, sample_rate: int, feature_dim: int) -> list[float]:
    """Cheap audio signature: [duration_sec, rms, zero-crossing rate,
    peak] + an RMS-energy envelope over (feature_dim − 4) equal time
    slices — the standard pre-filter features for audio corpus curation
    (silence/clipping detection, length buckets)."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    duration = n / float(sample_rate) if sample_rate else 0.0
    if n == 0:
        return [0.0] * feature_dim
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    peak = float(np.max(np.abs(mono)))
    head = [duration, rms, zcr, peak][: feature_dim]
    n_env = feature_dim - len(head)
    if n_env <= 0:
        return head
    bounds = np.linspace(0, n, n_env + 1).astype(int)
    env = [
        float(np.sqrt(np.mean(mono[a:b] ** 2))) if b > a else 0.0
        for a, b in zip(bounds[:-1], bounds[1:])
    ]
    return head + env


def decode_raster(payload: bytes, mime: str) -> np.ndarray:
    """Dispatch to the real pixel decoder for an uncompressed raster mime."""
    if mime in ("image/bmp", "image/x-ms-bmp"):
        return decode_bmp(payload)
    if mime in ("image/x-portable-pixmap", "image/ppm"):
        return decode_ppm(payload)
    raise NotImplementedError(f"no raster decoder for mime {mime!r}")


def gray_histogram_features(pixels: np.ndarray, feature_dim: int) -> list[float]:
    """Luma (Rec.601) histogram over ``feature_dim`` equal bins in
    [0, 256), normalized to sum 1 — a classic cheap image signature for
    near-dup grouping and quality filters."""
    gray = pixels.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)
    hist, _ = np.histogram(gray, bins=feature_dim, range=(0.0, 256.0))
    return (hist / max(gray.size, 1)).astype(float).tolist()


def default_decoder(payload: bytes, mime: str, feature_dim: int) -> list[float]:
    """The shipped decoder: REAL pixel decode + luma-histogram features
    for uncompressed raster mimes (BMP/PPM — no codec libs needed),
    deterministic pseudo-features (``_decode_stub``) for codec formats
    this container cannot decode. A PIL/ffmpeg-backed callable replaces
    this via the ``decoder=`` seam without touching the module."""
    if mime in RASTER_MIMES:
        return gray_histogram_features(decode_raster(payload, mime), feature_dim)
    if mime in WAV_MIMES:
        return audio_features(*decode_wav(payload), feature_dim)
    return _decode_stub(payload, mime, feature_dim)


def extract_features(
    df: DataFrame, feature_dim: int = 16, decoder: Decoder | None = None
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas batch is processed vectorized-per-row in
    Python; the JVM never copies payloads more than once. Output schema is
    fixed (FEATURE_SCHEMA) so downstream plans are stable regardless of
    decoder.

    ``decoder`` is the pluggable seam: any ``(payload, mime,
    feature_dim) -> list[float]`` callable, shipped to executors inside
    the closure — injecting a real codec requires no edit here
    (tests/test_llm_ops.py injects a custom one). Defaults to
    ``default_decoder``: real pixel decode for BMP/PPM, deterministic
    stub for codec mimes."""
    decode = decoder if decoder is not None else default_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "content_sha": pdf["payload"].map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": [
                        decode(p, m, feature_dim)
                        for p, m in zip(pdf["payload"], pdf["mime"])
                    ],
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: passes payload through, updates metadata — the real
    version transforms bytes in the same mapInPandas shape (see
    ``resize_images`` for the real raster path)."""
    return df.withColumn("meta_width", F.lit(width)).withColumn("meta_height", F.lit(height))


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize over MEDIA_SCHEMA frames: decodes raster
    payloads (BMP/PPM), nearest-neighbor resamples to width×height, and
    re-encodes as BMP — all inside one Arrow-batched mapInPandas, so
    pixel bytes never leave the executor. Non-raster mimes pass through
    unchanged (metadata untouched) rather than failing the batch, which
    is the production posture for mixed-media tables.

    Nearest-neighbor (index-gather) is deliberate: zero-dependency,
    exactly deterministic across platforms; swap the two np.take lines
    for an interpolating kernel when quality matters more than
    reproducibility."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows_y = (np.arange(height) + 0.5)
        cols_x = (np.arange(width) + 0.5)

        def one(payload: bytes, mime: str):
            if mime not in RASTER_MIMES:
                return payload, None, None
            px = decode_raster(payload, mime)
            src_h, src_w, _ = px.shape
            yi = np.minimum((rows_y * src_h / height).astype(int), src_h - 1)
            xi = np.minimum((cols_x * src_w / width).astype(int), src_w - 1)
            return encode_bmp(px[yi][:, xi]), width, height

        for pdf in batches:
            resized = [one(p, m) for p, m in zip(pdf["payload"], pdf["mime"])]
            out = pdf.copy()
            out["payload"] = [r[0] for r in resized]
            out["mime"] = [
                "image/bmp" if r[1] is not None else m
                for r, m in zip(resized, pdf["mime"])
            ]
            out["meta_width"] = [
                r[1] if r[1] is not None else w
                for r, w in zip(resized, pdf["meta_width"])
            ]
            out["meta_height"] = [
                r[2] if r[2] is not None else h
                for r, h in zip(resized, pdf["meta_height"])
            ]
            yield out

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("ahash", T.LongType(), True),
    ]
)


def ahash64(pixels: np.ndarray) -> int:
    """64-bit average hash (aHash) of an RGB pixel array: grayscale
    (ITU-R BT.601 integer weights), nearest-neighbor downsample to 8×8,
    threshold each cell against the 8×8 mean. The classic perceptual
    fingerprint: invariant to resizing and small brightness/noise
    perturbations, so re-encoded/thumbnailed copies of one image
    collide — what byte-level sha can never give you. Integer luma
    weights (299/587/114) keep the hash bit-identical across
    platforms."""
    h, w, _ = pixels.shape
    yi = np.minimum(((np.arange(8) + 0.5) * h / 8).astype(int), h - 1)
    xi = np.minimum(((np.arange(8) + 0.5) * w / 8).astype(int), w - 1)
    small = pixels[yi][:, xi].astype(np.int64)
    gray = (small[:, :, 0] * 299 + small[:, :, 1] * 587 + small[:, :, 2] * 114) // 1000
    bits = (gray > gray.mean()).flatten()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # keep as signed 64-bit for the LongType column
    return out - (1 << 64) if out >= (1 << 63) else out


def image_ahash(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Perceptual aHash per raster payload inside one Arrow-batched
    mapInPandas — the fingerprint stage of image dedup. Downstream is
    ordinary relational work: exact-match groupBy for identical hashes,
    or 4×16-bit band explode + bucket join for hamming-distance
    near-dups (the same banded-LSH shape as simhash over text,
    operators/dedup.py)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "ahash": [
                        ahash64(decode_bmp(bytes(p))) if p is not None else None
                        for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=AHASH_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
        T.StructField("frame_sha", T.StringType(), True),
    ]
)

_FSEQ_MAGIC = b"FSEQ"


def encode_frame_container(frames: list[bytes]) -> bytes:
    """Pack encoded frames into the length-prefixed FSEQ container:
    ``b'FSEQ' + uint32 n_frames + (uint32 len + bytes) per frame``. The
    deterministic stand-in for a video file — a real MP4/H.264 demuxer
    plugs into ``frame_sample``'s parse seam exactly here (the container
    walk is the part ffmpeg does; everything downstream is identical)."""
    out = [_FSEQ_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        out.append(struct.pack("<I", len(fr)))
        out.append(fr)
    return b"".join(out)


def decode_frame_container(payload: bytes) -> list[bytes]:
    """Walk the FSEQ container back into per-frame byte strings."""
    if payload[:4] != _FSEQ_MAGIC:
        raise ValueError("not an FSEQ container")
    (n,) = struct.unpack_from("<I", payload, 4)
    frames, off = [], 8
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4
        frames.append(payload[off : off + ln])
        off += ln
    return frames


def frame_sample(
    df: DataFrame,
    every_n: int = 2,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL video-style frame sampling: each payload is an FSEQ container
    of BMP frames; every ``every_n``-th frame is decoded (real 24-bit BMP
    parse) and emitted as one row with its dimensions, mean luma
    intensity, and content sha — the keyframe-extraction stage of a
    video training pipeline, all inside one Arrow-batched mapInPandas
    (container bytes never leave the executor; the fan-out from one
    video row to many frame rows happens inside the Python worker, so
    the JVM sees only the small FRAME_SCHEMA rows).

    Scale posture: frame rows are tiny (stats, not pixels) — the blow-up
    in row COUNT arrives post-decode where rows are narrow. Sampling
    stride ``every_n`` is the knob production sets from clip FPS."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                for idx, fr in enumerate(decode_frame_container(bytes(payload))):
                    if idx % every_n:
                        continue
                    px = decode_bmp(fr)
                    h, w, _ = px.shape
                    rows.append(
                        (
                            int(mid),
                            idx,
                            w,
                            h,
                            round(float(px.mean()), 4),
                            hashlib.sha256(fr).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB video frame sampler: emits one row per sampled frame index via
    posexplode of a frame-index array — the explode/fan-out plumbing is
    real; a decoder would attach frame bytes."""
    n_frames = (F.length("payload") / every_n).cast("int") + 1
    return df.select(
        "media_id",
        "mime",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_pos", "frame_idx"),
    ).select("media_id", "mime", (F.col("frame_idx") * every_n).alias("byte_offset"))
