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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF markers carry the frame dimensions; C4/C8/CC look like SOF but are
# DHT/JPG-extension/DAC tables
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def png_dimensions(blob: bytes) -> tuple[int, int] | None:
    """(width, height) from the IHDR chunk (PNG spec: 8-byte signature,
    then the mandatory first chunk IHDR with big-endian u32 w, h)."""
    if len(blob) < 24 or blob[:8] != _PNG_SIG or blob[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", blob[16:24])
    return (w, h)


def jpeg_dimensions(blob: bytes) -> tuple[int, int] | None:
    """(width, height) from the first SOFn segment: walk the marker
    stream (0xFF marker, u16 length incl. itself), skipping APPn/COM/
    quantization tables, until a start-of-frame; its payload is
    precision u8, height u16be, width u16be (JPEG/JFIF spec)."""
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(blob)
    while i + 3 < n:
        if blob[i] != 0xFF:
            return None  # desynced — not a well-formed marker stream
        while i < n and blob[i] == 0xFF:  # fill bytes are legal padding
            i += 1
        if i >= n:
            return None
        marker = blob[i]
        i += 1
        if 0xD0 <= marker <= 0xD9:  # RSTn/SOI/EOI: no length field
            continue
        if i + 1 >= n:
            return None
        seg_len = struct.unpack(">H", blob[i:i + 2])[0]
        if marker in _JPEG_SOF:
            if i + 7 > n:
                return None
            h, w = struct.unpack(">HH", blob[i + 3:i + 7])
            return (w, h)
        i += seg_len
    return None


def gif_dimensions(blob: bytes) -> tuple[int, int] | None:
    """(width, height) from the logical screen descriptor (little-endian
    u16 pair right after the GIF87a/GIF89a signature)."""
    if len(blob) < 10 or blob[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", blob[6:10])
    return (w, h)


def _decode_image(blob: bytes) -> tuple[int, int]:
    """Seam: returns (width, height). The deterministic FAKE container
    and real JPEG/PNG/GIF headers decode dependency-free (the metadata
    stage of a web crawl never needs pixel data); full pixel decode for
    other formats goes through PIL when installed (optional import),
    else raises NotImplementedError — all paths unit-tested."""
    if blob[:8] == IMG_MAGIC:
        return struct.unpack(">HH", blob[8:12])
    for parse in (png_dimensions, jpeg_dimensions, gif_dimensions):
        wh = parse(blob)
        if wh is not None:
            return wh
    if _PILImage is not None:
        import io

        with _PILImage.open(io.BytesIO(blob)) as im:
            return im.size
    raise NotImplementedError(
        "unrecognized image format and no PIL in this container; "
        "FAKEIMG1, JPEG, PNG and GIF headers decode natively"
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
