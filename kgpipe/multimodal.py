"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched mapInPandas.

Decode kernels, in preference order: PIL when installed (not in this
container), a REAL dependency-free binary PPM/PGM decoder
(_decode_image_ppm — exercised by the tests here, so a real decode
path is verified in-container), and a deterministic stub for every
other format (clearly marked below). Everything Spark-side — schema,
batch shape, partitioning, UDF signatures — is real and tested; a
PIL/torchvision kernel swaps in on a real cluster without touching
the plan.
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
    """Which decode kernels extract_features will use: images go to PIL
    when importable, else the REAL dependency-free PPM/PGM decoder
    (_decode_image_ppm) for P5/P6 payloads; audio RIFF/WAVE payloads get
    a REAL dependency-free PCM parse (_decode_audio_wav); everything
    else the deterministic stub. Recorded so the claim is testable: the
    sandbox (no Pillow) asserts "ppm+wav+stub" and decodes a generated
    PGM / WAV to hand-computed values; an environment with Pillow flips
    the image kernel without any plan change."""
    return "pil+wav" if _HAS_PIL else "ppm+wav+stub"


def _decode_image_stub(payload: bytes, dim: int = 8) -> list:
    """STUB decode → feature. Deterministic fake: fold the payload
    digest into `dim` floats in [-1, 1). The UDF contract
    (bytes in, fixed-dim float list out) matches the real kernel."""
    h = hashlib.sha256(payload).digest()
    vals = struct.unpack(f"<{dim}i", h[: 4 * dim])
    return [((v % 2_000_000) / 1_000_000.0) - 1.0 for v in vals]


def _decode_image_pil(payload: bytes, dim: int = 8) -> list:
    """Real decode (runs where Pillow is installed): decode → grayscale
    → dim×1 thumbnail → luminance in [-1, 1) via px/128 − 1 (px ≤ 255 →
    max 0.9921875: honors the same half-open range as the stub and the
    PPM kernel). Payloads that aren't valid images fall back to the stub
    row-wise, so mixed/corrupt media can't fail the batch.

    This container has no Pillow (and installs are off-limits), so the
    tests exercise this kernel's glue — the open/convert/resize/getdata
    call sequence, the px/128−1 mapping, the row-wise fallback — through
    a minimal PIL-API fake (tests/test_training_ops.py); numeric
    agreement with REAL Pillow output still needs an environment that
    ships it (the PPM kernel proves the shared contract in-container)."""
    import io as _io

    try:
        img = _PILImage.open(_io.BytesIO(payload)).convert("L").resize((dim, 1))
        return [px / 128.0 - 1.0 for px in img.getdata()]
    except Exception:
        return _decode_image_stub(payload, dim)


def _ppm_tokens(payload: bytes):
    """ASCII header tokens of a binary PPM/PGM: whitespace-separated,
    '#' comments run to end-of-line. Yields (token, next_offset)."""
    i = 0
    n = len(payload)
    while i < n:
        c = payload[i:i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and payload[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        else:
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            yield payload[i:j], j
            i = j


def _decode_image_ppm(payload: bytes, dim: int = 8) -> list:
    """REAL dependency-free decode for binary PGM (P5, grayscale) and
    PPM (P6, RGB) with maxval ≤ 255 — exercisable in this container
    (no Pillow needed), so the real-decode path is tested here, not
    first on a user's cluster. RGB → luminance by the ITU-R 601-2
    integer formula PIL's convert("L") uses ((299R+587G+114B)//1000);
    the image is reduced to `dim` features by box-averaging equal-width
    column bands (deterministic), each mapped to [-1, 1) via mean/128−1.
    Raises on malformed payloads — _decode_image catches and falls back
    to the stub row-wise."""
    toks = _ppm_tokens(payload)
    magic, _ = next(toks)
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM: {magic!r}")
    (w_tok, _), (h_tok, _), (mx_tok, off) = next(toks), next(toks), next(toks)
    w, h, maxval = int(w_tok), int(h_tok), int(mx_tok)
    if w <= 0 or h <= 0 or not (0 < maxval <= 255):
        raise ValueError(f"unsupported PPM geometry {w}x{h} max {maxval}")
    ch = 1 if magic == b"P5" else 3
    raster = payload[off + 1: off + 1 + w * h * ch]  # single ws after maxval
    if len(raster) < w * h * ch:
        raise ValueError("truncated PPM raster")
    # per-pixel luminance, row-major
    if ch == 1:
        lum = list(raster)
    else:
        lum = [
            (299 * raster[3 * k] + 587 * raster[3 * k + 1]
             + 114 * raster[3 * k + 2]) // 1000
            for k in range(w * h)
        ]
    feats = []
    for b in range(dim):
        lo = (b * w) // dim
        hi = max(((b + 1) * w) // dim, lo + 1)
        if lo >= w:
            lo, hi = w - 1, w
        s = cnt = 0
        for y in range(h):
            row = y * w
            for x in range(lo, hi):
                s += lum[row + x]
                cnt += 1
        feats.append((s / cnt) / 128.0 - 1.0)
    return feats


def _decode_audio_wav(payload: bytes, dim: int = 8) -> list:
    """REAL dependency-free decode for RIFF/WAVE PCM (8- or 16-bit, any
    channel count) — the audio analog of _decode_image_ppm, so a second
    media kind has an in-container-verified decode path. Channels are
    mixed to mono per frame; the signal is reduced to `dim` features by
    per-band RMS over equal-width TIME bands (the same deterministic
    banding scheme as the image kernel's column bands), each mapped to
    [-1, 1] via 2·(rms/full_scale) − 1 (rms==0 → −1; only a full-scale
    DC signal reaches +1). Raises on malformed payloads — _decode_media
    catches and falls back to the stub row-wise."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("missing fmt /data chunk")
    audio_format, n_ch = struct.unpack("<HH", fmt[:4])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if audio_format != 1 or n_ch < 1 or bits not in (8, 16):
        raise ValueError(
            f"unsupported WAV: format={audio_format} ch={n_ch} bits={bits}")
    if bits == 16:
        n = len(data) // 2
        samples = struct.unpack(f"<{n}h", data[:2 * n])
        full = 32768.0
    else:  # 8-bit PCM is UNSIGNED, centered at 128
        samples = [b - 128 for b in data]
        full = 128.0
    frames = len(samples) // n_ch
    if frames == 0:
        raise ValueError("empty WAV data chunk")
    mono = [sum(samples[f * n_ch:(f + 1) * n_ch]) / n_ch
            for f in range(frames)]
    feats = []
    for b in range(dim):
        lo = (b * frames) // dim
        hi = max(((b + 1) * frames) // dim, lo + 1)
        if lo >= frames:
            lo, hi = frames - 1, frames
        band = mono[lo:hi]
        rms = (sum(x * x for x in band) / len(band)) ** 0.5
        feats.append(2.0 * (rms / full) - 1.0)
    return feats


def _decode_image(payload: bytes, dim: int = 8) -> list:
    if _HAS_PIL:
        return _decode_image_pil(payload, dim)
    if payload[:2] in (b"P5", b"P6"):
        try:
            return _decode_image_ppm(payload, dim)
        except Exception:
            return _decode_image_stub(payload, dim)
    return _decode_image_stub(payload, dim)


def _decode_media(kind: str, payload: bytes, dim: int = 8) -> list:
    """Per-kind kernel dispatch inside the batch UDF: image → PIL/PPM,
    audio → WAV PCM when the payload is RIFF/WAVE, video and everything
    unrecognized → the deterministic stub. All kernels share the
    fixed-dim [-1, 1) feature contract, so downstream schema/partitioning
    never depends on which kernel ran."""
    if kind == "image":
        return _decode_image(payload, dim)
    if kind == "audio" and payload[:4] == b"RIFF":
        try:
            return _decode_audio_wav(payload, dim)
        except Exception:
            return _decode_image_stub(payload, dim)
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
                "feature": [
                    _decode_media(k, bytes(b), dim)
                    for k, b in zip(pdf["kind"], pdf["content"])
                ],
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
