"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched mapInPandas.

The decode/feature-extraction kernels are STUBBED (no image/audio libs
in this container — clearly marked below); everything Spark-side —
schema, batch shape, partitioning, UDF signatures — is real and tested.
Swap `_decode_image_stub` for a PIL/torchvision kernel on a real
cluster without touching the plan.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("content", BinaryType(), False),     # opaque payload
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("digest", StringType(), False),
    StructField("feature", ArrayType(FloatType()), False),
])


try:  # optional real decoder — absent in this container, by design
    from PIL import Image as _PILImage  # type: ignore

    _HAS_PIL = True
except ImportError:
    _PILImage = None
    _HAS_PIL = False


def decode_backend() -> str:
    """Which decode kernel extract_features will use: "pil" when PIL
    imported, else "stub". Recorded so the stub claim is testable — the
    sandbox asserts "stub"; an environment with Pillow flips to the real
    decode without any plan change."""
    return "pil" if _HAS_PIL else "stub"


def _decode_image_stub(payload: bytes, dim: int = 8) -> list:
    """STUB decode → feature. Deterministic fake: fold the payload
    digest into `dim` floats in [-1, 1). The UDF contract
    (bytes in, fixed-dim float list out) matches the real kernel."""
    h = hashlib.sha256(payload).digest()
    vals = struct.unpack(f"<{dim}i", h[: 4 * dim])
    return [((v % 2_000_000) / 1_000_000.0) - 1.0 for v in vals]


def _decode_image_pil(payload: bytes, dim: int = 8) -> list:  # pragma: no cover
    """Real decode (runs only where Pillow is installed): decode →
    grayscale → dim×1 thumbnail → luminance in [-1, 1). Payloads that
    aren't valid images fall back to the stub row-wise, so mixed/corrupt
    media can't fail the batch."""
    import io as _io

    try:
        img = _PILImage.open(_io.BytesIO(payload)).convert("L").resize((dim, 1))
        return [px / 127.5 - 1.0 for px in img.getdata()]
    except Exception:
        return _decode_image_stub(payload, dim)


def _decode_image(payload: bytes, dim: int = 8) -> list:
    if _HAS_PIL:  # pragma: no cover - container has no Pillow
        return _decode_image_pil(payload, dim)
    return _decode_image_stub(payload, dim)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas over binary payloads: model-loading happens once per
    iterator (executor), batches arrive via Arrow — the exact serving
    shape the reference uses for GPU inference (run_genre.py:265-272)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # (a real kernel would initialize its decoder/model HERE, once)
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int32"),
                "digest": pdf["content"].map(
                    lambda b: hashlib.sha256(b).hexdigest()[:16]
                ),
                "feature": pdf["content"].map(
                    lambda b: _decode_image(bytes(b), dim)
                ),
            })
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests (payload = id bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.concat(F.lit("payload-"), F.col("id")), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width").cast("int"),
        F.lit(64).alias("height").cast("int"),
        F.lit(1000).alias("duration_ms").cast("int"),
    )
    return df


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling *plan*: explode timestamps to sample
    (decode stubbed). Shows the fan-out shape: one row per (video,
    frame_ts), partition-preserving."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0),
                       F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                       F.lit(every_ms))
        ).alias("frame_ts"),
    )
