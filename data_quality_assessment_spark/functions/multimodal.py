"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data-pipeline extension (no reference analog). The Spark-side
plumbing — schemas, Arrow batch shapes, ``mapInPandas`` signatures,
partition behavior — is real and tested; the actual codec step is
STUBBED (image/audio libraries are not in this container): real formats
raise ``NotImplementedError`` behind the ``_decode_*`` seam, while the
deterministic FAKE format below exercises the full path end-to-end.

FAKE container format (deterministic, self-describing):
  b"FAKEIMG1" + width:uint16be + height:uint16be + payload bytes
  b"FAKEAUD1" + sample_rate:uint32be + n_samples:uint32be + payload

Design for 100 TB: media rows are wide (MBs of binary); everything here
streams through ``mapInPandas`` so a partition is processed batch-by-
batch without materializing all blobs at once, and the output drops the
binary column as early as possible (feature extraction projects blobs
away — the shuffle after this stage moves features, not media).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMG_MAGIC = b"FAKEIMG1"
AUD_MAGIC = b"FAKEAUD1"

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("blob", T.BinaryType()),
    T.StructField("mime", T.StringType()),
])

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("valid", T.BooleanType()),
])

IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])

AUDIO_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_sec", T.DoubleType()),
    T.StructField("valid", T.BooleanType()),
])


def encode_fake_image(width: int, height: int, payload: bytes = b"") -> bytes:
    return IMG_MAGIC + struct.pack(">HH", width, height) + payload

def encode_fake_audio(rate: int, n: int, payload: bytes = b"") -> bytes:
    return AUD_MAGIC + struct.pack(">II", rate, n) + payload


try:  # real codec, used when available — not shipped in this container
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None


def _decode_image(blob: bytes) -> tuple[int, int]:
    """Seam: returns (width, height). The deterministic FAKE container
    always decodes; real formats go through PIL when it is installed
    (optional import), else raise NotImplementedError — both paths are
    unit-tested (tests/test_model_loaders.py)."""
    if blob[:8] == IMG_MAGIC:
        return struct.unpack(">HH", blob[8:12])
    if _PILImage is not None:
        import io

        with _PILImage.open(io.BytesIO(blob)) as im:
            return im.size
    raise NotImplementedError(
        "real image codecs unavailable in this container (PIL/cv2); "
        "only the FAKEIMG1 container decodes here"
    )


def _decode_audio(blob: bytes) -> tuple[int, int]:
    if blob[:8] == AUD_MAGIC:
        return struct.unpack(">II", blob[8:16])
    raise NotImplementedError(
        "real audio codecs unavailable in this container (soundfile); "
        "only the FAKEAUD1 container decodes here"
    )


def image_metadata(df: DataFrame) -> DataFrame:
    """media table -> (media_id, width, height, n_bytes, valid); invalid
    blobs yield valid=false instead of failing the partition."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["blob"]):
                try:
                    w, h = _decode_image(bytes(blob))
                    rows.append((mid, w, h, len(blob), True))
                except Exception:  # noqa: BLE001 — invalid blob => row, not task failure
                    rows.append((mid, None, None,
                                 len(blob) if blob is not None else 0, False))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "valid"]
            )

    return df.select("media_id", "blob").mapInPandas(fn, IMAGE_META_SCHEMA)


def image_features(df: DataFrame, n_features: int = 16) -> DataFrame:
    """Deterministic feature extraction stub: byte-histogram features of
    the payload, L2-normalized — the real CNN/CLIP embedding would slot
    in with the identical signature and batch shape."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, feats = [], []
            for mid, blob in zip(b["media_id"], b["blob"]):
                payload = np.frombuffer(bytes(blob)[12:], dtype=np.uint8)
                hist, _ = np.histogram(
                    payload, bins=n_features, range=(0, 256)
                )
                v = hist.astype(np.float64)
                nrm = np.sqrt((v * v).sum())
                if nrm > 0:
                    v = v / nrm
                ids.append(mid)
                feats.append(v.astype(np.float32))
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return df.select("media_id", "blob").mapInPandas(fn, IMAGE_FEATURE_SCHEMA)


def audio_metadata(df: DataFrame) -> DataFrame:
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["blob"]):
                try:
                    rate, n = _decode_audio(bytes(blob))
                    # full-precision duration: a 6dp round can land on a
                    # half-tie where engines' rounding modes disagree;
                    # one exact double division is cross-engine stable
                    rows.append(
                        (mid, rate, n, n / rate if rate else None, True)
                    )
                except Exception:  # noqa: BLE001 — invalid blob => row, not task failure
                    rows.append((mid, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples",
                         "duration_sec", "valid"],
            )

    return df.select("media_id", "blob").mapInPandas(fn, AUDIO_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame index to
    sample, computed from metadata only (native Columns — no decode).
    The decode of each sampled frame is the stubbed seam above."""
    return (
        df.withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .select("media_id", "frame_idx")
    )
