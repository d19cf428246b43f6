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

from genetics_spark_coloc_spark.functions.guards import guard_hot_buckets

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


def ahash_signature(
    features: DataFrame,
    feature_col: str = "feature",
    id_col: str = "mediaId",
) -> DataFrame:
    """Average-hash (aHash) perceptual signature from a decoded
    feature grid: bit i is set iff feature[i] exceeds the feature
    mean — the classic perceptual-dedup fingerprint (same family as
    pHash/dHash) computed over whatever grid ``extract_features``
    produced. Pure Column array math on the already-extracted
    features: payload bytes are never touched again, and the
    signature packs into ONE bigint so downstream joins ship 8 bytes
    per image instead of the float grid.

    Feature values are k/256 rationals (both the decoded thumbnail
    and the md5 stub emit exact dyadic rationals), so the mean and
    the > comparison are exact in binary floating point — the
    signature is bit-reproducible across engines.
    """
    n = F.size(F.col(feature_col))
    mean = F.aggregate(
        F.col(feature_col),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    ) / n.cast("double")
    # bit i of the signature = (feature[i] > mean); packing folds the
    # REVERSED bit array as (acc << 1) | bit, which assigns weight
    # 2^i to position i without a per-element variable shift. The
    # shift/OR form (not acc*2+b) matters at the production width of
    # 64 features: setting the top bit of a signed long is a plain
    # bit operation here, whereas the multiply form relies on silent
    # two's-complement wraparound and throws under
    # spark.sql.ansi.enabled=true.
    bits = F.transform(
        F.col(feature_col),
        lambda x: F.when(x.cast("double") > mean, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    sig = F.aggregate(
        F.reverse(bits),
        F.lit(0).cast("long"),
        lambda acc, b: F.shiftleft(acc, 1).bitwiseOR(b),
    )
    return features.select(
        F.col(id_col).alias("mediaId"),
        F.size(F.col(feature_col)).alias("nBits"),
        sig.alias("sig"),
    )


def ahash_near_dup_pairs(
    signatures: DataFrame,
    n_bits: int,
    max_hamming: int = 3,
    hot_bucket_ceiling: "int | None" = 10_000,
    on_hot_bucket: str = "raise",
) -> DataFrame:
    """Perceptual near-duplicate image pairs: every unordered pair of
    signatures within ``max_hamming`` bits — the image-side analogue
    of SimHash text near-dup (Manku et al. 2007), with the same
    banded-pigeonhole candidate generation: the ``n_bits`` signature
    splits into ``max_hamming + 1`` contiguous bands, and any pair
    differing in at most ``max_hamming`` bits must agree EXACTLY on
    at least one band, so a bucket self-join on (band, bandValue)
    finds every qualifying pair without the all-pairs product; the
    exact popcount check then runs on candidates only.

    Scale shape: one explode to (band, bandValue) keys, one bucketed
    self-join (never a cross join), distinct pair dedup, JVM-side
    bit_count verify. Returns (mediaIdA < mediaIdB, hamming).

    A degenerate image family (solid-color thumbnails, shared
    letterbox frames) funnels into one (band, bandValue) bucket and
    the self-join goes quadratic; the shared hot-bucket guard
    (functions/guards.py) aborts loudly over ``hot_bucket_ceiling``
    signatures per bucket (``on_hot_bucket="raise"``, bit-identical
    output when no bucket is hot) or excludes hot buckets (``"cap"``).
    """
    n_bands = max_hamming + 1
    band_bits = -(-n_bits // n_bands)  # ceil
    mask = (1 << band_bits) - 1
    # lineage barrier: the self-join reads the signature table twice,
    # and upstream of it sits the Arrow-batched payload decode —
    # without the barrier every payload decodes once PER SIDE
    signatures = signatures.localCheckpoint(eager=False)
    banded = signatures.select(
        F.col("mediaId"),
        F.col("sig"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("sig"), b * band_bits)
                    .bitwiseAND(F.lit(mask))
                    .alias("bandValue"),
                )
                for b in range(n_bands)
            ])
        ).alias("bk"),
    ).select("mediaId", "sig", F.col("bk.band").alias("band"), F.col("bk.bandValue").alias("bandValue"))
    banded = guard_hot_buckets(
        banded,
        ["band", "bandValue"],
        hot_bucket_ceiling,
        on_hot_bucket,
        "ahash_near_dup_pairs",
    )
    left = banded.select(
        F.col("band"), F.col("bandValue"),
        F.col("mediaId").alias("mediaIdA"), F.col("sig").alias("sigA"),
    )
    right = banded.select(
        F.col("band"), F.col("bandValue"),
        F.col("mediaId").alias("mediaIdB"), F.col("sig").alias("sigB"),
    )
    pairs = (
        left.join(right, on=["band", "bandValue"])
        .filter(F.col("mediaIdA") < F.col("mediaIdB"))
        .select("mediaIdA", "mediaIdB", "sigA", "sigB")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sigA").bitwiseXOR(F.col("sigB"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("mediaIdA", "mediaIdB", "hamming")
