"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via mapInPandas.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake or NotImplementedError) — but everything Spark-side
is real and tested: schemas, batch iteration, partition sizing, UDF
signatures. Swapping a real decoder in changes only ``_decode_stub``.

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
from collections.abc import Callable, Iterator

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
    (tests/test_llm_ops.py injects a custom one). Defaults to the
    documented environment stub."""
    decode = decoder if decoder is not None else _decode_stub

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
    version transforms bytes in the same mapInPandas shape."""
    return df.withColumn("meta_width", F.lit(width)).withColumn("meta_height", F.lit(height))


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
