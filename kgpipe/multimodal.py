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
    a REAL dependency-free PCM parse (_decode_audio_wav); video Y4M /
    uncompressed-AVI payloads a REAL luma parse (_decode_video_y4m /
    _decode_video_avi); everything else the deterministic stub. Recorded
    so the claim is testable: the sandbox (no Pillow) asserts
    "ppm+wav+y4m-avi+stub" and decodes generated PGM / WAV / Y4M / AVI
    payloads to hand-computed values; an environment with Pillow flips
    the image kernel without any plan change."""
    return ("pil+wav+y4m-avi" if _HAS_PIL
            else "ppm+wav+y4m-avi+stub")


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


def _riff_chunks(payload: bytes, pos: int, end: int):
    """Walk RIFF subchunks in payload[pos:end], yielding
    (chunk_id, body_offset, declared_size). Shared by the WAV audio and
    AVI video kernels. A chunk whose DECLARED size exceeds the region is
    corrupt — raise (→ stub fallback downstream) instead of silently
    decoding truncated bytes into real-looking features."""
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        sz = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if pos + 8 + sz > end:
            raise ValueError(
                f"truncated RIFF chunk {cid!r}: declares {sz} bytes, "
                f"{end - pos - 8} available")
        yield cid, pos + 8, sz
        pos += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned


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
    for cid, off, sz in _riff_chunks(payload, 12, len(payload)):
        body = payload[off:off + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
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


def _band_frame_means(frame_means: list, dim: int) -> list:
    """Reduce per-frame mean luminances to `dim` features by averaging
    equal-width TIME bands (the same deterministic banding as the image
    kernel's column bands and the WAV kernel's time bands), each mapped
    to [-1, 1) via mean/128 − 1 — the shared luminance contract."""
    n = len(frame_means)
    feats = []
    for b in range(dim):
        lo = (b * n) // dim
        hi = max(((b + 1) * n) // dim, lo + 1)
        if lo >= n:
            lo, hi = n - 1, n
        band = frame_means[lo:hi]
        feats.append((sum(band) / len(band)) / 128.0 - 1.0)
    return feats


# Y4M chroma subsampling → bytes-per-pixel of the full frame (Y plane is
# always w*h; chroma planes follow). 4:2:0 variants need even dims.
_Y4M_BPP = {"420": 1.5, "420jpeg": 1.5, "420mpeg2": 1.5, "420paldv": 1.5,
            "422": 2.0, "444": 3.0, "mono": 1.0}


def _y4m_frames(payload: bytes):
    """Parse a YUV4MPEG2 stream, yielding (y_plane_offset, w, h) per
    frame — only the luma plane is consumed, so chroma layout never
    matters beyond sizing the skip. Raises on malformed streams."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated Y4M stream header")
    w = h = None
    cs = "420"  # Y4M default when no C tag present
    for tok in payload[9:nl].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            cs = tok[1:].decode("ascii")
    if not w or not h or w <= 0 or h <= 0:
        raise ValueError(f"bad Y4M geometry W={w} H={h}")
    if cs not in _Y4M_BPP:
        raise ValueError(f"unsupported Y4M colourspace C{cs}")
    fsize = int(w * h * _Y4M_BPP[cs])
    if fsize != w * h * _Y4M_BPP[cs]:
        raise ValueError(f"odd {w}x{h} frame with subsampled chroma C{cs}")
    pos = nl + 1
    n_frames = 0
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME" or fnl < 0:
            raise ValueError("malformed Y4M FRAME header")
        pos = fnl + 1
        if pos + fsize > len(payload):
            raise ValueError("truncated Y4M frame data")
        yield pos, w, h
        pos += fsize
        n_frames += 1
    if n_frames == 0:
        raise ValueError("Y4M stream with zero frames")


def _decode_video_y4m(payload: bytes, dim: int = 8) -> list:
    """REAL dependency-free decode for uncompressed YUV4MPEG2 (Y4M)
    video — the third media kind with an in-container-verified kernel,
    completing the set (image PPM/PGM, audio WAV, video Y4M/AVI). Y4M
    stores planar YCbCr; luminance IS the Y plane, so the per-frame mean
    luma is an exact byte average — no colour conversion. Features =
    per-TIME-band mean luma via _band_frame_means. Raises on malformed
    payloads — _decode_media catches and falls back to the stub."""
    means = [sum(payload[off:off + w * h]) / (w * h)
             for off, w, h in _y4m_frames(payload)]
    return _band_frame_means(means, dim)


def _avi_frames(payload: bytes):
    """Parse an uncompressed RIFF/AVI (BI_RGB 24-bit or 8-bit DIB
    frames), yielding (frame_body_offset, frame_size, w, h, bits) per
    '..db'/'..dc' movi chunk. Reuses the WAV kernel's RIFF chunk walker
    (_riff_chunks) recursively through LIST containers. Only the video
    stream's strf (the one following an strh with fccType 'vids') sets
    the geometry, so an interleaved audio stream can't corrupt it."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    geom = {}
    frames = []
    last_strh_type = [None]

    def walk(pos, end):
        for cid, off, sz in _riff_chunks(payload, pos, end):
            if cid == b"LIST":
                walk(off + 4, off + sz)
            elif cid == b"strh":
                last_strh_type[0] = payload[off:off + 4]
            elif cid == b"strf" and last_strh_type[0] == b"vids" and not geom:
                if sz < 20:
                    raise ValueError("strf shorter than BITMAPINFOHEADER")
                geom["w"] = int.from_bytes(
                    payload[off + 4:off + 8], "little", signed=True)
                geom["h"] = abs(int.from_bytes(
                    payload[off + 8:off + 12], "little", signed=True))
                geom["bits"] = int.from_bytes(
                    payload[off + 14:off + 16], "little")
                geom["comp"] = int.from_bytes(
                    payload[off + 16:off + 20], "little")
            elif cid[2:4] in (b"db", b"dc"):
                frames.append((off, sz))

    walk(12, len(payload))
    if not geom:
        raise ValueError("no video stream (strh 'vids' + strf) found")
    if geom["comp"] != 0 or geom["bits"] not in (8, 24):
        raise ValueError(
            f"unsupported AVI: compression={geom['comp']} "
            f"bits={geom['bits']} (only uncompressed BI_RGB 8/24-bit)")
    # biWidth is signed and MUST be positive (only biHeight may be
    # negative, for top-down DIBs — abs()'d above); a corrupt header
    # with w <= 0 would slice empty rows and emit fake all -1.0
    # features instead of raising into the stub fallback
    if geom["w"] <= 0 or geom["h"] <= 0:
        raise ValueError(f"bad AVI geometry {geom['w']}x{geom['h']}")
    if not frames:
        raise ValueError("no movi frame chunks found")
    for off, sz in frames:
        yield off, sz, geom["w"], geom["h"], geom["bits"]


def _decode_video_avi(payload: bytes, dim: int = 8) -> list:
    """REAL dependency-free decode for uncompressed RIFF/AVI video
    (BI_RGB DIB frames, 24-bit BGR or 8-bit grayscale). Per-frame mean
    luminance by the same ITU-R 601-2 integer formula as the PPM kernel
    ((299R+587G+114B)//1000); DIB rows are 4-byte aligned and bottom-up,
    but a full-frame MEAN is row-order invariant, so only the stride
    padding needs handling. Features = per-TIME-band mean luma via
    _band_frame_means. Raises on malformed payloads — _decode_media
    catches and falls back to the stub."""
    means = []
    for off, sz, w, h, bits in _avi_frames(payload):
        bpp = bits // 8
        stride = (w * bpp + 3) & ~3
        if sz < stride * h:
            raise ValueError(
                f"AVI frame chunk {sz} bytes < {stride}x{h} DIB raster")
        total = 0
        for y in range(h):
            row = payload[off + y * stride:off + y * stride + w * bpp]
            if bpp == 1:
                total += sum(row)
            else:  # BGR byte order — vectorized (r7): the r6 per-pixel
                # Python generator was ~6M interpreter ops on one
                # 1920x1080 frame (ADVICE r6). numpy keeps the exact
                # per-pixel floor-division semantics ((299R+587G+114B)
                # //1000 in integers, then sum), so band goldens are
                # unchanged; numpy is already a hard dependency of the
                # Arrow/pandas UDF runtime this kernel runs inside.
                import numpy as np

                px = np.frombuffer(row, dtype=np.uint8).astype(np.int64)
                total += int(np.sum(
                    (299 * px[2::3] + 587 * px[1::3] + 114 * px[0::3])
                    // 1000))
        means.append(total / (w * h))
    return _band_frame_means(means, dim)


def _decode_video(payload: bytes, dim: int = 8) -> list:
    """Video kernel dispatch by magic: YUV4MPEG2 → Y4M parse, RIFF/AVI →
    uncompressed-DIB parse, anything else raises (→ stub fallback)."""
    if payload.startswith(b"YUV4MPEG2"):
        return _decode_video_y4m(payload, dim)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return _decode_video_avi(payload, dim)
    raise ValueError("unrecognized video container")


def video_frame_count(payload: bytes) -> int:
    """REAL frame count for Y4M / uncompressed-AVI payloads (header +
    chunk walk only — the luma bytes are never touched), used by
    frame_sample_plan(use_payload_frames=True). Raises on unrecognized
    or malformed containers."""
    if payload.startswith(b"YUV4MPEG2"):
        return sum(1 for _ in _y4m_frames(payload))
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return sum(1 for _ in _avi_frames(payload))
    raise ValueError("unrecognized video container")


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
    audio → WAV PCM when the payload is RIFF/WAVE, video → Y4M or
    uncompressed-AVI when the magic matches, everything unrecognized or
    malformed → the deterministic stub. All kernels share the fixed-dim
    [-1, 1) feature contract, so downstream schema/partitioning never
    depends on which kernel ran."""
    if kind == "image":
        return _decode_image(payload, dim)
    if kind == "audio" and payload[:4] == b"RIFF":
        try:
            return _decode_audio_wav(payload, dim)
        except Exception:
            return _decode_image_stub(payload, dim)
    if kind == "video":
        try:
            return _decode_video(payload, dim)
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


def frame_sample_plan(media: DataFrame, every_ms: int = 500,
                      use_payload_frames: bool = False,
                      every_n_frames: int = 1) -> DataFrame:
    """Video frame-sampling fan-out: one row per (video, frame index /
    timestamp), partition-preserving.

    Default (metadata path): explode timestamps 0..duration_ms at
    every_ms — pure column expressions, no payload reads.

    use_payload_frames=True: count REAL frames by parsing each payload's
    container headers (Y4M frame walk / AVI chunk walk via
    video_frame_count — luma bytes never touched) inside an
    Arrow-batched pandas UDF, then explode frame indices
    0..n_frames-1 step every_n_frames. Unparseable payloads count 0
    frames and fan out to zero rows (same row-wise tolerance as the
    decode kernels)."""
    vids = media.filter(F.col("kind") == "video")
    if not use_payload_frames:
        return vids.select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0),
                           F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                           F.lit(every_ms))
            ).alias("frame_ts"),
        )

    @F.pandas_udf(IntegerType())
    def n_frames(content: pd.Series) -> pd.Series:
        def count(b):
            try:
                return video_frame_count(bytes(b))
            except Exception:
                return 0
        return content.map(count).astype("int32")

    return (
        vids.select("media_id", n_frames(F.col("content")).alias("nf"))
        .filter(F.col("nf") > 0)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("nf") - 1,
                           F.lit(every_n_frames))
            ).alias("frame_idx"),
        )
    )
