"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The reference has no multimodal surface; this is the training-data
extension (BASELINE north star). The Spark-side architecture is real
and tested — schema, partition sizing, batch iteration, UDF
signatures. The codec is import-gated: Pillow when installed (any
format), a built-in pure-Python uncompressed-BMP parser otherwise —
so ``decodeStatus='decoded'`` is exercised even in codec-less
environments; payloads neither can read fall back to a deterministic
stub feature tagged ``decodeStatus='stubbed'``.

Design points for 100 TB of media:
- binary payloads never pass through Python row-at-a-time: Arrow
  batches via ``mapInPandas`` with ``maxRecordsPerBatch`` sized so a
  batch of payloads fits executor memory.
- metadata (width/height/codec/duration) lives in plain columns so
  filters prune BEFORE payload bytes are read (parquet column
  pruning: scanning metadata never touches the blob pages).
- deterministic fake features keep the pipeline testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "mediaId long, modality string, payload binary, mimeType string, "
    "width int, height int, durationMs int"
)

FEATURE_SCHEMA = (
    "mediaId long, modality string, featureDim int, feature array<float>, "
    "decodeStatus string"
)


try:  # codec gate: any Pillow-supported format decodes when PIL exists
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - environment-dependent
    _PILImage = None

_GRID = 8  # fixed sample grid: features are an 8x8 grayscale thumbnail


def _grid_features(pixels, width: int, height: int) -> list[float]:
    """8×8 nearest-neighbour grayscale thumbnail from an RGB pixel
    accessor — the SAME sampling math for every decode path (PIL or
    the built-in BMP parser), so features don't depend on which codec
    happened to be installed. Grayscale = (299r + 587g + 114b)/1000
    integer arithmetic; values scaled to [0, 1]."""
    feats = []
    for gy in range(_GRID):
        y = gy * height // _GRID
        for gx in range(_GRID):
            x = gx * width // _GRID
            r, g, b = pixels(x, y)
            feats.append(((299 * r + 587 * g + 114 * b) // 1000) / 255.0)
    return feats


def _decode_bmp(payload: bytes) -> list[float]:
    """Pure-Python decoder for uncompressed 24-bit BMP — the one
    raster format simple enough to parse without a codec library, so
    the 'decoded' path is real and testable even in codec-less
    environments. Raises NotImplementedError for any other BMP
    flavour."""
    import struct

    if len(payload) < 54:
        raise NotImplementedError("truncated BMP")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    flipped = height > 0  # positive height = bottom-up row order
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    # a plausible header over truncated/garbage pixel data must fall
    # back to the stub, not crash the task: verify the full raster is
    # actually present before any pixel read
    if pixel_offset < 0 or pixel_offset + height * row_stride > len(payload):
        raise NotImplementedError("BMP pixel data truncated")

    def pixels(x: int, y: int) -> tuple[int, int, int]:
        row = (height - 1 - y) if flipped else y
        off = pixel_offset + row * row_stride + x * 3
        b, g, r = payload[off], payload[off + 1], payload[off + 2]
        return r, g, b

    return _grid_features(pixels, width, height)


def _decode_image(payload: bytes) -> list[float]:
    """Decode an image payload into 64 grid features.

    Codec preference: Pillow when installed (any format it supports),
    else the built-in uncompressed-BMP parser. Raises
    NotImplementedError when neither can decode the payload — callers
    fall back to the deterministic stub with decodeStatus='stubbed'.
    """
    if _PILImage is not None:
        import io

        try:
            img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
        except Exception as exc:
            raise NotImplementedError(f"undecodable payload: {exc}") from exc
        px = img.load()
        return _grid_features(lambda x, y: px[x, y], img.width, img.height)
    return _decode_bmp(payload)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: bytes of md5(payload) scaled to
    [0,1). Keeps the distributed plumbing fully testable."""
    digest = hashlib.md5(payload or b"").digest()
    return [digest[i % 16] / 256.0 for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8, batch_size: int = 64) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Tries the real decoder, falls back to the deterministic fake with
    ``decodeStatus='stubbed'`` — so the same plan runs here and on a
    cluster with codecs installed.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, statuses = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                try:
                    decoded = _decode_image(raw)
                    if len(decoded) < dim:
                        decoded = decoded + [0.0] * (dim - len(decoded))
                    feats.append(decoded[:dim])
                    statuses.append("decoded")
                except Exception:  # noqa: BLE001 — any undecodable
                    # payload (malformed header, truncated raster,
                    # codec bug) degrades to the stub; a poisoned blob
                    # must never kill the job
                    feats.append(_fake_feature(raw, dim))
                    statuses.append("stubbed")
            yield pd.DataFrame(
                {
                    "mediaId": pdf["mediaId"],
                    "modality": pdf["modality"],
                    "featureDim": dim,
                    "feature": feats,
                    "decodeStatus": statuses,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_metadata(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Plan-side resize bookkeeping: target dims from metadata only —
    no payload read (column pruning keeps the blob pages untouched)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return media.select(
        "mediaId",
        "modality",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("targetWidth"),
        F.round(F.col("height") * scale).cast("int").alias("targetHeight"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp, derived from duration metadata (payload untouched)."""
    return (
        media.filter(F.col("modality") == "video")
        .select(
            "mediaId",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("durationMs") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frameTimestampMs"),
        )
    )
