"""Multimodal (binary) column operators.

Pattern: media lives as an opaque BinaryType column plus typed
metadata columns; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas iterators over ``mapInPandas`` so each task
processes a column of byte blobs without JVM round-trips per row.

The actual codec work (PIL/librosa/ffmpeg) is NOT available in this
environment, so the decoders below are deterministic STUBS behind
``import``-guards: the Spark-side plumbing (schema, batching,
partitioning, UDF signatures) is real and tested; swap `_decode_*_stub`
for a real codec in production.  (North-star multimodal columns,
SURVEY.md §2.5; the payload BinaryType column D12 is the pcap
instance of the same pattern.)
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("format_guess", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content_sha", T.StringType()),
    ]
)

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"\x00\x00\x00": "mp4?",
}


def sniff_format(data: bytes) -> str:
    for magic, name in _MAGIC.items():
        if data[: len(magic)] == magic:
            return name
    return "unknown"


def _decode_image_stub(data: bytes) -> tuple:
    """Deterministic fake decode: derives (width, height) from a hash
    of the bytes.  Replace with PIL: ``Image.open(BytesIO(data)).size``.
    Raises on empty input like a real decoder would."""
    if not data:
        raise ValueError("empty image buffer")
    try:
        import PIL.Image  # noqa: F401  (not in this environment)

        raise NotImplementedError("real PIL decode path not wired in this env")
    except ImportError:
        h = hashlib.sha256(data).digest()
        w = 16 + (struct.unpack(">H", h[:2])[0] % 2048)
        hgt = 16 + (struct.unpack(">H", h[2:4])[0] % 2048)
        return w, hgt


def image_features(df: DataFrame, id_col: str = "media_id", bytes_col: str = "content") -> DataFrame:
    """binary column → typed feature rows, Arrow-batched.

    Scale: pure map — no shuffle; each task decodes its partition's
    blobs. Pair with ``spark.sql.files.maxPartitionBytes`` to bound
    per-task memory when blobs are large."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                data = bytes(data) if data is not None else b""
                try:
                    w, h = _decode_image_stub(data)
                except ValueError:
                    w, h = None, None
                rows.append(
                    dict(
                        media_id=int(mid),
                        n_bytes=len(data),
                        format_guess=sniff_format(data),
                        width=w,
                        height=h,
                        content_sha=hashlib.sha256(data).hexdigest(),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields])

    return df.select(id_col, bytes_col).mapInPandas(fn, IMAGE_FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024, id_col: str = "media_id", bytes_col: str = "content") -> DataFrame:
    """Frame-sampling shape: one input blob → many frame rows (the
    row-explosion UDTF pattern).  Stub 'frames' are fixed-size byte
    windows; a real implementation feeds ffmpeg and yields one row per
    sampled frame."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                data = bytes(data) if data is not None else b""
                for i in range(0, max(len(data), 1), every_n_bytes):
                    chunk = data[i : i + every_n_bytes]
                    rows.append(
                        dict(
                            media_id=int(mid),
                            frame_no=i // every_n_bytes,
                            frame_sha=hashlib.sha256(chunk).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select(id_col, bytes_col).mapInPandas(fn, FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("format_guess", T.StringType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("content_sha", T.StringType()),
    ]
)

_AUDIO_MAGIC = {b"RIFF": "wav", b"fLaC": "flac", b"ID3": "mp3", b"OggS": "ogg"}


def _decode_audio_stub(data: bytes) -> tuple:
    """Deterministic fake decode: (duration_ms, sample_rate) derived
    from a hash.  Replace with librosa/soundfile in production; raises
    on empty input like a real decoder."""
    if not data:
        raise ValueError("empty audio buffer")
    try:
        import soundfile  # noqa: F401  (not in this environment)

        raise NotImplementedError("real soundfile decode path not wired in this env")
    except ImportError:
        h = hashlib.sha256(data).digest()
        duration = 100 + (struct.unpack(">I", h[:4])[0] % 600000)
        rate = [8000, 16000, 22050, 44100, 48000][h[4] % 5]
        return duration, rate


def audio_features(df: DataFrame, id_col: str = "media_id", bytes_col: str = "content") -> DataFrame:
    """Audio twin of image_features: binary → typed metadata rows,
    Arrow-batched, no shuffle."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                data = bytes(data) if data is not None else b""
                fmt = "unknown"
                for magic, name in _AUDIO_MAGIC.items():
                    if data[: len(magic)] == magic:
                        fmt = name
                        break
                try:
                    dur, rate = _decode_audio_stub(data)
                except ValueError:
                    dur, rate = None, None
                rows.append(
                    dict(
                        media_id=int(mid),
                        n_bytes=len(data),
                        format_guess=fmt,
                        duration_ms=dur,
                        sample_rate=rate,
                        content_sha=hashlib.sha256(data).hexdigest(),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields])

    return df.select(id_col, bytes_col).mapInPandas(fn, AUDIO_FEATURE_SCHEMA)
