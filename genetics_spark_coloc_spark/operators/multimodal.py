"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The reference has no multimodal surface; this is the training-data
extension (BASELINE north star). The Spark-side architecture is real
and tested — schema, partition sizing, batch iteration, UDF
signatures; the codec calls are stubbed behind ``_decode_image``
because no image/audio libraries exist in this environment.

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


def _decode_image(payload: bytes) -> list[float]:
    """Stub decode: REAL implementations plug a codec here (PIL/ffmpeg
    are not available in this environment).

    Raises NotImplementedError for true decoding; the deterministic
    fallback below (`_fake_feature`) is what tests exercise.
    """
    raise NotImplementedError("image codec not available in this environment")


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
                    feats.append(_decode_image(raw)[:dim])
                    statuses.append("decoded")
                except NotImplementedError:
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
