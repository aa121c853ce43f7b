"""Multimodal-column queries registered with the driver harness.

The driver's parquet tables carry no binary media column, so these run
on a deterministic synthesized media fixture: ~20 blobs covering every
branch of operators/multimodal.py's decoder-resolution chain — real
pure-Python-parseable container headers (PNG / GIF87a / GIF89a / BMP
incl. top-down / JPEG-SOF0 / RIFF-WAVE incl. odd-chunk alignment),
deliberately corrupt headers that must fall through to the documented
hash-stub, codec-magic-only blobs (FLAC / MP3 / OGG / MP4), and the
empty blob.  Ground truth is SYNTHESIS INTENT, the pcap_queries.py
convention: the generator records the width/height/sample-rate it
wrote into each header (never re-running the operator's parser), and
for stub-path blobs it evaluates the stub's *documented* sha256
formula — the spec, restated independently.  (VERDICT r8 item 1: the
image/audio/resize trio was the last pytest-only family; these queries
give operators/multimodal.py:127,269,326 driver-visible DuckDB
oracles, the same standard as the pcap payload column, D12.)

Environment pinning: the queries pass ``codec="builtin"`` so the
dependency-free header-parse → stub chain runs even on hosts where
PIL / soundfile are installed (a real codec would reject these
synthetic header-only blobs, changing the answer).  Production calls
keep the default ``codec="auto"``.

Reference motif: the payload BinaryType column (PcapReader.java:453-461)
is the pcap instance of the opaque-binary-plus-typed-metadata pattern;
SURVEY.md §2.5 multimodal row.
"""

from __future__ import annotations

import hashlib
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from .pcap_queries import _fixture_subdir, _write_truth_parquet
from ..operators.multimodal import (
    audio_features,
    audio_pcm_stats,
    image_features,
    image_pixel_stats,
    resize_images,
    sample_frames,
)

RESIZE_MAX_DIM = 256
FRAME_BYTES = 64

# ---------------------------------------------------------------------------
# blob synthesis — each case is (media_id, blob, intent); intent columns
# are the parameters the header was BUILT from, plus the expected
# format tags per the operators' documented magic tables
# ---------------------------------------------------------------------------


def _png(w: int, h: int, pad: bytes = b"\x00" * 24) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
        + pad
    )


def _gif(tag: bytes, w: int, h: int) -> bytes:
    return tag + struct.pack("<HH", w, h) + b"\xf7\x00\x00" + b";" * 16


def _bmp(w: int, h: int) -> bytes:
    # BITMAPFILEHEADER (14) + start of BITMAPINFOHEADER: biWidth/biHeight
    # are the int32 pair at offset 18; negative height = top-down DIB
    return (
        b"BM"
        + struct.pack("<IHHI", 62, 0, 0, 54)
        + struct.pack("<I", 40)
        + struct.pack("<ii", w, h)
        + b"\x01\x00\x18\x00" + b"\x00" * 24
    )


def _jpeg_sof0(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _wav(sample_rate: int, channels: int, bits: int, data_len: int,
         fmt_first: bool = True, include_data: bool = True,
         include_fmt: bool = True) -> bytes:
    byte_rate = sample_rate * channels * (bits // 8)
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate,
        channels * (bits // 8), bits,
    )
    body = b"\x5a" * data_len
    data = b"data" + struct.pack("<I", data_len) + body + (b"\x00" if data_len % 2 else b"")
    chunks = b""
    order = (fmt, data) if fmt_first else (data, fmt)
    for c in order:
        if c is fmt and not include_fmt:
            continue
        if c is data and not include_data:
            continue
        chunks += c
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _stub_image(data: bytes) -> tuple:
    """The stub's documented formula (multimodal.py `_decode_image_stub`
    spec): dims derived from sha256 — restated here as the synthesis-
    intent ground truth for blobs built to be header-unparseable."""
    h = hashlib.sha256(data).digest()
    return (
        16 + (struct.unpack(">H", h[:2])[0] % 2048),
        16 + (struct.unpack(">H", h[2:4])[0] % 2048),
    )


def _stub_audio(data: bytes) -> tuple:
    h = hashlib.sha256(data).digest()
    return (
        100 + (struct.unpack(">I", h[:4])[0] % 600000),
        [8000, 16000, 22050, 44100, 48000][h[4] % 5],
    )


def _fit(w, h):
    """The resize policy (aspect-preserving fit into a RESIZE_MAX_DIM
    square, never upscaling) as integer arithmetic — ground truth for
    the resize-dims oracle."""
    if w is None:
        return None, None
    if max(w, h) <= RESIZE_MAX_DIM:
        return w, h
    if w >= h:
        return RESIZE_MAX_DIM, max(1, (h * RESIZE_MAX_DIM) // w)
    return max(1, (w * RESIZE_MAX_DIM) // h), RESIZE_MAX_DIM


def media_blobs() -> list:
    """(media_id, blob, intent) triples.  ``intent`` records what the
    synthesizer put in the header (parse-path cases) or evaluates the
    documented stub formula (stub-path cases); img/aud format tags are
    assigned per the operators' magic tables, by hand, per case."""
    out = []

    def add(mid, blob, img_fmt, w, h, aud_fmt, dur, rate):
        out.append(
            (
                mid,
                blob,
                dict(img_format=img_fmt, width=w, height=h,
                     aud_format=aud_fmt, duration_ms=dur, sample_rate=rate),
            )
        )

    def add_parsed_image(mid, blob, img_fmt, w, h):
        dur, rate = _stub_audio(blob)
        add(mid, blob, img_fmt, w, h, "unknown", dur, rate)

    def add_stub(mid, blob, img_fmt="unknown", aud_fmt="unknown"):
        w, h = _stub_image(blob)
        dur, rate = _stub_audio(blob)
        add(mid, blob, img_fmt, w, h, aud_fmt, dur, rate)

    # --- header-parseable images ---------------------------------------
    add_parsed_image(1, _png(640, 360), "png", 640, 360)
    add_parsed_image(2, _png(4000, 1000), "png", 4000, 1000)   # downsize case
    add_parsed_image(3, _gif(b"GIF87a", 320, 200), "gif", 320, 200)
    add_parsed_image(4, _gif(b"GIF89a", 77, 55), "gif", 77, 55)
    add_parsed_image(5, _bmp(512, 384), "unknown", 512, 384)   # BM not in image magic map
    add_parsed_image(6, _bmp(100, -60), "unknown", 100, 60)    # top-down DIB → abs(height)
    add_parsed_image(7, _jpeg_sof0(1024, 768), "jpeg", 1024, 768)
    add_parsed_image(8, _jpeg_sof0(120, 3000), "jpeg", 120, 3000)  # tall: fit clamps height

    # --- stub-path images (headers built to be unparseable) ------------
    add_stub(9, b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9,
             img_fmt="jpeg")                                    # JPEG, no SOF frame
    add_stub(10, b"\x89PNG\r\n\x1a\nXXXXYYYY\x01\x02\x03\x04", img_fmt="png")  # corrupt IHDR
    add_stub(11, b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 24, img_fmt="mp4?")
    add_stub(12, b"BLOB" + bytes(range(64)))                    # no magic at all

    # --- header-parseable audio ----------------------------------------
    wav1 = _wav(8000, 1, 16, 4000)            # byte_rate 16000 → 250 ms
    w, h = _stub_image(wav1)
    add(13, wav1, "riff", w, h, "wav", 4000 * 1000 // 16000, 8000)
    wav2 = _wav(16000, 1, 8, 333, fmt_first=False)   # odd data chunk, fmt after
    w, h = _stub_image(wav2)
    add(14, wav2, "riff", w, h, "wav", 333 * 1000 // 16000, 16000)
    wav3 = _wav(44100, 2, 16, 1764)           # byte_rate 176400 → 10 ms
    w, h = _stub_image(wav3)
    add(15, wav3, "riff", w, h, "wav", 1764 * 1000 // 176400, 44100)

    # --- stub-path audio ------------------------------------------------
    add_stub(16, b"fLaC\x00\x00\x00\x22" + b"\x10" * 40, aud_fmt="flac")
    add_stub(17, b"ID3\x03\x00\x00\x00\x00\x00\x0a" + b"\x20" * 32, aud_fmt="mp3")
    add_stub(18, b"OggS\x00\x02" + b"\x30" * 48, aud_fmt="ogg")
    # RIFF but not WAVE: audio magic table tags it "wav", parse falls to stub
    riff_avi = b"RIFF" + struct.pack("<I", 32) + b"AVI LIST" + b"\x00" * 24
    add_stub(19, riff_avi, img_fmt="riff", aud_fmt="wav")
    # RIFF/WAVE missing data chunk → stub
    wav_nodata = _wav(22050, 1, 16, 0, include_data=False)
    add_stub(20, wav_nodata, img_fmt="riff", aud_fmt="wav")
    # RIFF/WAVE missing fmt chunk → stub
    wav_nofmt = _wav(22050, 1, 16, 40, include_fmt=False)
    add_stub(21, wav_nofmt, img_fmt="riff", aud_fmt="wav")

    # --- empty blob: every feature NULL, one empty frame ----------------
    add(22, b"", "unknown", None, None, "unknown", None, None)
    return out


# ---------------------------------------------------------------------------
# fixture parquets (input + truths), built lazily at first access
# ---------------------------------------------------------------------------


def media_fixture_path() -> str:
    """Input parquet: (media_id int64, content binary)."""
    d = _fixture_subdir("media_input_v1")
    path = os.path.join(d, "expected.parquet")
    if os.path.exists(path):
        return path
    rows = [dict(media_id=mid, content=blob) for mid, blob, _ in media_blobs()]
    return _write_truth_parquet(
        "media_input_v1", rows, [("media_id", "int64"), ("content", "binary")]
    )


def media_truth_path() -> str:
    """Per-blob ground truth for image/audio/resize features."""
    rows = []
    for mid, blob, it in media_blobs():
        fit_w, fit_h = _fit(it["width"], it["height"])
        rows.append(
            dict(
                media_id=mid,
                n_bytes=len(blob),
                img_format=it["img_format"],
                width=it["width"],
                height=it["height"],
                aud_format=it["aud_format"],
                duration_ms=it["duration_ms"],
                sample_rate=it["sample_rate"],
                fit_w=fit_w,
                fit_h=fit_h,
                sha=hashlib.sha256(blob).hexdigest(),
            )
        )
    return _write_truth_parquet(
        "media_truth_v1",
        rows,
        [
            ("media_id", "int64"),
            ("n_bytes", "int64"),
            ("img_format", "string"),
            ("width", "int64"),
            ("height", "int64"),
            ("aud_format", "string"),
            ("duration_ms", "int64"),
            ("sample_rate", "int64"),
            ("fit_w", "int64"),
            ("fit_h", "int64"),
            ("sha", "string"),
        ],
    )


def frames_truth_path() -> str:
    """Frame-sampling ground truth: frame i of a blob is the byte
    window [i*FRAME_BYTES, (i+1)*FRAME_BYTES); an empty blob yields
    exactly one empty frame (the operator's documented shape)."""
    rows = []
    for mid, blob, _ in media_blobs():
        for i in range(0, max(len(blob), 1), FRAME_BYTES):
            rows.append(
                dict(
                    media_id=mid,
                    frame_no=i // FRAME_BYTES,
                    frame_sha=hashlib.sha256(blob[i : i + FRAME_BYTES]).hexdigest(),
                )
            )
    return _write_truth_parquet(
        "media_frames_truth_v1",
        rows,
        [("media_id", "int64"), ("frame_no", "int64"), ("frame_sha", "string")],
    )


def _media_df(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(media_fixture_path())


# ---------------------------------------------------------------------------
# REAL-codec fixture (r10, VERDICT r9 item 4): genuinely decodable
# PNG / WAV blobs with known pixel / sample content, so the real-codec
# branch of the chain — not just the header parse — gets a driver row.
# The ENCODERS here and the operators' DECODERS are independent code;
# ground truth is computed from the pixel/sample FORMULA (synthesis
# intent), never by running any decoder.  Both formats are lossless,
# so hosts with PIL/soundfile installed decode to the same sums.
# ---------------------------------------------------------------------------


def _px(x: int, y: int, seed: int) -> tuple:
    """Deterministic pixel formula — the single source of truth for
    both the PNG encoder and the expected sums."""
    return (
        (x * 3 + y * 7 + seed) % 256,
        (x * 5 + y * 11 + 2 * seed) % 256,
        (x + y * 13 + 3 * seed) % 256,
    )


def _png_real(w: int, h: int, seed: int, px=None, ftypes=None) -> bytes:
    """A REAL non-interlaced 8-bit RGB PNG of the _px pattern, filter
    type cycling y%5 through the full RFC 2083 set (none/sub/up/
    average/paeth) so the operator's unfilter paths all execute.
    Filtering here is the ENCODE direction — the operator's decoder
    independently inverts it.  ``px(x, y)`` overrides the pixel
    formula and ``ftypes(y)`` the filter schedule — the dhash fixture
    uses both to build byte-DISTINCT encodings of pixel-IDENTICAL
    images."""
    import zlib

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    stride = w * 3
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = bytes(
            v
            for x in range(w)
            for v in (px(x, y) if px is not None else _px(x, y, seed))
        )
        ftype = ftypes(y) if ftypes is not None else y % 5
        filt = bytearray(stride)
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (line[i] - pred) & 0xFF
        raw.append(ftype)
        raw += filt
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _sample(i: int, c: int, seed: int) -> int:
    """Deterministic 16-bit PCM sample formula (frame i, channel c)."""
    return ((i * 7919 + c * 104729 + seed) % 2001) - 1000


def _wav_real(rate: int, channels: int, n_frames: int, seed: int,
              gain: int = 1, sample_fn=None) -> bytes:
    """A REAL 16-bit PCM WAV via the stdlib `wave` writer — the encode
    twin of the operator's `wave` reader.  Default samples follow the
    _sample pattern; ``gain`` scales them exactly (|_sample| ≤ 1000,
    so gains ≤ 32 cannot clip) — the fingerprint fixture's loudness-
    lift case; ``sample_fn(i, c)`` overrides the formula entirely
    (one writer for every fixture, the _png_real px= convention)."""
    import io
    import wave

    fn = sample_fn or (lambda i, c: _sample(i, c, seed) * gain)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(
            b"".join(
                struct.pack("<h", fn(i, c))
                for i in range(n_frames)
                for c in range(channels)
            )
        )
    return buf.getvalue()


def _wav_tagged(raw: bytes) -> bytes:
    """Splice a LIST/INFO metadata chunk before the data chunk of a
    canonical `wave`-written file and fix the RIFF size — byte-
    distinct (different md5), sample-identical: the metadata-tag
    duplicate that byte-level dedup misses and the fingerprint must
    collapse."""
    info = b"INFOIART" + struct.pack("<I", 8) + b"synth\x00\x00\x00"
    chunk = b"LIST" + struct.pack("<I", len(info)) + info
    i = raw.index(b"data", 12)
    out = raw[:i] + chunk + raw[i:]
    return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]


# (media_id, blob, image-intent, audio-intent); intents are dicts of
# the expected operator outputs computed from the FORMULAS (or None
# for the undecodable cases)
def real_media_blobs() -> list:
    out = []

    def img_intent(w, h, seed):
        sums = [0, 0, 0]
        for y in range(h):
            for x in range(w):
                p = _px(x, y, seed)
                for k in range(3):
                    sums[k] += p[k]
        return dict(width=w, height=h, n_px=w * h,
                    sum_r=sums[0], sum_g=sums[1], sum_b=sums[2])

    def aud_intent(rate, channels, n, seed):
        sabs = sum(
            abs(_sample(i, c, seed)) for i in range(n) for c in range(channels)
        )
        return dict(sample_rate=rate, n_channels=channels, n_frames=n,
                    duration_ms=n * 1000 // rate, sum_abs=sabs)

    nulls_img = dict(width=None, height=None, n_px=None,
                     sum_r=None, sum_g=None, sum_b=None)
    nulls_aud = dict(sample_rate=None, n_channels=None, n_frames=None,
                     duration_ms=None, sum_abs=None)

    # real PNGs: square, wide, tall, 1-pixel-wide (exercises the
    # degenerate sub/paeth left-neighbor case), 1-pixel-tall
    for mid, (w, h, seed) in enumerate(
        [(16, 16, 1), (37, 9, 2), (5, 41, 3), (1, 23, 4), (29, 1, 5)], start=1
    ):
        out.append((mid, _png_real(w, h, seed), img_intent(w, h, seed), nulls_aud))
    # real WAVs: mono/stereo, several rates incl. a duration that
    # truncates in integer ms
    for mid, (rate, ch, n, seed) in enumerate(
        [(8000, 1, 1600, 6), (44100, 2, 441, 7), (16000, 1, 333, 8)], start=6
    ):
        out.append((mid, _wav_real(rate, ch, n, seed), nulls_img,
                    aud_intent(rate, ch, n, seed)))
    # undecodable: corrupt IDAT zlib stream, truncated WAV header,
    # non-media bytes, empty
    png_corrupt = bytearray(_png_real(8, 8, 9))
    png_corrupt[40] ^= 0xFF  # flip a byte inside the IDAT stream
    out.append((9, bytes(png_corrupt), nulls_img, nulls_aud))
    out.append((10, _wav_real(8000, 1, 100, 10)[:20], nulls_img, nulls_aud))
    out.append((11, b"not media at all" * 4, nulls_img, nulls_aud))
    out.append((12, b"", nulls_img, nulls_aud))
    return out


def real_media_fixture_path() -> str:
    rows = [dict(media_id=mid, content=blob)
            for mid, blob, _, _ in real_media_blobs()]
    return _write_truth_parquet(
        "media_real_input_v1", rows,
        [("media_id", "int64"), ("content", "binary")],
    )


def real_media_truth_path() -> str:
    rows = [
        dict(media_id=mid, **img, **aud)
        for mid, _, img, aud in real_media_blobs()
    ]
    return _write_truth_parquet(
        "media_real_truth_v1",
        rows,
        [
            ("media_id", "int64"),
            ("width", "int64"), ("height", "int64"), ("n_px", "int64"),
            ("sum_r", "int64"), ("sum_g", "int64"), ("sum_b", "int64"),
            ("sample_rate", "int64"), ("n_channels", "int64"),
            ("n_frames", "int64"), ("duration_ms", "int64"),
            ("sum_abs", "int64"),
        ],
    )


# ---------------------------------------------------------------------------
# driver queries
# ---------------------------------------------------------------------------


@query(
    "media_image_features",
    oracle=lambda: f"""
    SELECT media_id, n_bytes, img_format AS format_guess, width, height,
           sha AS content_sha
    FROM '{media_truth_path()}'
    """,
)
def q_media_image_features(spark: SparkSession, sf: str) -> DataFrame:
    """Image decode-to-features over the binary media column
    (operators/multimodal.py:image_features).  Oracle: the dimensions
    the synthesizer wrote into each PNG/GIF/BMP/JPEG header, the
    documented stub formula for unparseable blobs, NULLs for the empty
    blob."""
    return image_features(_media_df(spark), codec="builtin")


@query(
    "media_audio_features",
    oracle=lambda: f"""
    SELECT media_id, n_bytes, aud_format AS format_guess, duration_ms,
           sample_rate, sha AS content_sha
    FROM '{media_truth_path()}'
    """,
)
def q_media_audio_features(spark: SparkSession, sf: str) -> DataFrame:
    """Audio decode-to-features (operators/multimodal.py:audio_features).
    Oracle: duration = data_len*1000 // byte_rate from the synthesized
    RIFF/WAVE chunk parameters (incl. odd-chunk word alignment and
    fmt-after-data ordering); stub formula for magic-only blobs."""
    return audio_features(_media_df(spark), codec="builtin")


@query(
    "media_resize_dims",
    oracle=lambda: f"""
    SELECT media_id, width AS src_width, height AS src_height,
           fit_w AS width, fit_h AS height,
           CAST(CASE WHEN width IS NULL THEN NULL ELSE false END AS BOOLEAN) AS resized
    FROM '{media_truth_path()}'
    """,
)
def q_media_resize_dims(spark: SparkSession, sf: str) -> DataFrame:
    """Resize planning (operators/multimodal.py:resize_images): target
    dims from the aspect-preserving never-upscale fit policy; with the
    builtin codec chain bytes pass through so ``resized`` is false for
    every decodable blob (NULL-dims rows keep resized=false too — the
    operator emits a passthrough row for them)."""
    out = resize_images(_media_df(spark), max_dim=RESIZE_MAX_DIM, codec="builtin")
    return out.select(
        "media_id", "src_width", "src_height", "width", "height",
        F.when(F.col("src_width").isNull(), None).otherwise(F.col("resized")).alias("resized"),
    )


@query(
    "media_image_pixels",
    oracle=lambda: f"""
    SELECT media_id, width, height, n_px, sum_r, sum_g, sum_b
    FROM '{real_media_truth_path()}'
    """,
)
def q_media_image_pixels(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image decode to pixel statistics
    (operators/multimodal.py:image_pixel_stats): the fixture PNGs are
    genuine zlib-compressed rasters with every RFC 2083 filter type,
    and the operator's decoded per-channel integer sums must equal the
    sums of the pixel FORMULA the encoder wrote — evidence an actual
    codec ran, driver-hash-checked (VERDICT r9 item 4: the real-codec
    branch of the decoder chain was pytest-only).  Lossless format ⇒
    the same oracle holds whether the decode ran through PIL (when
    installed) or the stdlib zlib path.  Corrupt/foreign/empty blobs
    pin the NULL contract."""
    return image_pixel_stats(spark.read.parquet(real_media_fixture_path()))


@query(
    "media_audio_pcm",
    oracle=lambda: f"""
    SELECT media_id, sample_rate, n_channels, n_frames, duration_ms, sum_abs
    FROM '{real_media_truth_path()}'
    """,
)
def q_media_audio_pcm(spark: SparkSession, sf: str) -> DataFrame:
    """REAL audio decode to PCM statistics
    (operators/multimodal.py:audio_pcm_stats): the stdlib `wave` codec
    reads the fixture's genuine 16-bit PCM frames and the integer
    sum-of-absolute-samples must equal the sample FORMULA's sum —
    actual sample decode, not a header walk, driver-hash-checked.
    Truncated/foreign/empty blobs pin the NULL contract."""
    return audio_pcm_stats(spark.read.parquet(real_media_fixture_path()))


@query(
    "media_frame_sample",
    oracle=lambda: f"""
    SELECT media_id, frame_no, frame_sha
    FROM '{frames_truth_path()}'
    """,
)
def q_media_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling: one blob → many fixed-stride frame rows (the
    row-explosion UDTF shape; operators/multimodal.py:sample_frames).
    Oracle: sha256 of each synthesis-intent byte window."""
    return sample_frames(_media_df(spark), every_n_bytes=FRAME_BYTES)


# ---------------------------------------------------------------------------
# perceptual image dedup (dHash) — re-encoded / brightness-shifted
# copies of the same picture must collapse; distinct pictures must not
# ---------------------------------------------------------------------------


def _dhash_families() -> list:
    """(media_id, px_fn or None, w, h, ftypes, brightness) blob specs.

    Family A (ids 1-3): one 24×16 picture three ways — the cycling
    filter-type encode, an all-`up`-filter re-encode (byte-distinct,
    pixel-identical — the re-encoded-copy case md5 dedup misses), and
    a +3-per-channel brightness lift (pixel-distinct, dhash-identical
    by the exact-integer invariance).  The base formula is clamped to
    ≤ 250 so the lift cannot wrap mod 256.
    Family B (ids 4-5): a 19×12 picture and its +2 lift.
    Distinct pictures (ids 6-8), a sub-grid 4×4 (dhash NULL), and a
    corrupt blob (id 10, dhash NULL)."""

    def clamped(seed, delta=0):
        # base channel ∈ [0, 250] (mod 251 keeps texture, unlike a
        # min-clamp which saturates whole cells flat), so a lift of
        # delta ≤ 5 can never wrap mod 256 — the exact-invariance
        # precondition dhash64 documents
        def px(x, y):
            return tuple(v % 251 + delta for v in _px(x, y, seed))

        return px

    cyc = None  # default y%5 schedule
    up = lambda y: 2 if y else 0  # noqa: E731 - first row can't be `up`
    return [
        (1, clamped(21), 24, 16, cyc, 0),
        (2, clamped(21), 24, 16, up, 0),
        (3, clamped(21, 3), 24, 16, cyc, 3),
        (4, clamped(22), 19, 12, cyc, 0),
        (5, clamped(22, 2), 19, 12, up, 2),
        (6, clamped(23), 24, 16, cyc, 0),
        (7, clamped(24), 16, 16, cyc, 0),
        (8, clamped(25), 31, 9, cyc, 0),
        (9, clamped(26), 4, 4, cyc, 0),
    ]


def _dhash_blobs() -> list:
    """(media_id, blob, expected_dhash) — the expected hash comes from
    the shared :func:`dhash64` over the FORMULA raster (synthesis
    intent), never from decoding the blob; the decoder side is
    independently pinned by media_image_pixels."""
    from ..operators.multimodal import dhash64

    out = []
    for mid, px, w, h, ftypes, _delta in _dhash_families():
        blob = _png_real(w, h, 0, px=px, ftypes=ftypes)
        rows = [
            bytes(v for x in range(w) for v in px(x, y)) for y in range(h)
        ]
        out.append((mid, blob, dhash64(w, h, rows)))
    corrupt = bytearray(_png_real(8, 8, 0, px=lambda x, y: (1, 2, 3)))
    corrupt[40] ^= 0xFF
    out.append((10, bytes(corrupt), None))
    return out


def dhash_fixture_path() -> str:
    rows = [dict(media_id=m, content=b) for m, b, _ in _dhash_blobs()]
    return _write_truth_parquet(
        "media_dhash_input_v2", rows,
        [("media_id", "int64"), ("content", "binary")],
    )


def dhash_truth_path() -> str:
    rows = [dict(media_id=m, dhash=d) for m, _, d in _dhash_blobs()]
    return _write_truth_parquet(
        "media_dhash_truth_v2", rows,
        [("media_id", "int64"), ("dhash", "string")],
    )


@query(
    "media_image_dhash_dedup",
    oracle=lambda: f"""
    WITH t AS (SELECT media_id, dhash FROM '{dhash_truth_path()}'),
    g AS (
      SELECT dhash, count(*) AS n, min(media_id) AS keeper
      FROM t WHERE dhash IS NOT NULL GROUP BY dhash)
    SELECT t.media_id, t.dhash,
           g.n AS n_copies,
           CASE WHEN t.dhash IS NULL THEN NULL
                ELSE t.media_id = g.keeper END AS keep
    FROM t LEFT JOIN g ON t.dhash = g.dhash
    """,
)
def q_media_image_dhash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual image dedup (operators/multimodal.py:image_dhash):
    decode each PNG raster, 64-bit difference hash in exact integer
    arithmetic, group by hash, keep the lowest id per group — the
    pHash-family near-dup pass an image training corpus needs, since
    re-encoded copies (identical pixels, different filter schedule →
    different bytes/md5) and global brightness lifts land in the same
    group while distinct pictures do not; undecodable or sub-grid
    blobs yield NULL and join no group.  Oracle replays the dedup
    decision over synthesis-intent hashes (shared dhash64 over the
    FORMULA raster; the decode itself is pinned independently by
    media_image_pixels).
    Scale: Arrow-batched map for the hash, one group-by on a 64-bit
    key, verdicts join back on the hash — the exact-dedup shuffle
    shape at image-corpus scale."""
    from ..operators.cache import register_persisted
    from ..operators.multimodal import image_dhash

    # persist the decode+hash pass: it feeds both the group aggregate
    # and the verdict join, and without the cache the full corpus
    # would decode twice (r10 review finding); released by callers
    # via release_persisted (the bench/cache discipline)
    d = image_dhash(spark.read.parquet(dhash_fixture_path())).persist()
    g = (
        d.filter(F.col("dhash").isNotNull())
        .groupBy("dhash")
        .agg(
            F.count("*").alias("n"),
            F.min("media_id").alias("keeper"),
        )
        .withColumnRenamed("dhash", "ghash")
    )
    out = d.join(g, d.dhash == F.col("ghash"), "left_outer").select(
        "media_id",
        "dhash",
        F.col("n").alias("n_copies"),
        F.when(F.col("dhash").isNull(), F.lit(None).cast("boolean"))
        .otherwise(F.col("media_id") == F.col("keeper"))
        .alias("keep"),
    )
    return register_persisted(out, d)


# ---------------------------------------------------------------------------
# perceptual audio dedup (fingerprint) — re-containered / gain-lifted
# copies of the same recording must collapse; distinct recordings not
# ---------------------------------------------------------------------------


def _afp_blobs() -> list:
    """(media_id, blob, expected_fp): family A (ids 1-3) is one mono
    recording three ways — canonical container, LIST-tagged container
    (byte-distinct, sample-identical), and a ×2 gain lift (sample-
    distinct, fingerprint-identical by the exact cross-product
    invariance); family B (ids 4-5) a stereo recording and its tagged
    copy; ids 6-7 distinct recordings; id 8 sub-65-frame (NULL); id 9
    a truncated header (NULL).  Expected fingerprints come from the
    shared :func:`audio_fingerprint64` over FORMULA samples — the
    decode itself is pinned independently by media_audio_pcm."""
    from ..operators.multimodal import audio_fingerprint64

    def formula_fp(channels, n_frames, seed, gain=1):
        samples = [
            _sample(i, c, seed) * gain
            for i in range(n_frames)
            for c in range(channels)
        ]
        return audio_fingerprint64(channels, samples)

    # a recording whose LOUDNESS ENVELOPE differs structurally (the
    # raw _sample sawtooth has a near-flat envelope, so a different
    # seed only phase-shifts it and fingerprints identically —
    # correct behavior for the hash, wrong fixture for "distinct"):
    # block-wise amplitude modulation gives a genuinely different
    # shape
    def _env_sample(i, c):
        return _sample(i, c, 33) * (1 + (i // 80) % 4) // 2

    env_fp = audio_fingerprint64(
        1, [_env_sample(i, 0) for i in range(1300)]
    )
    a = _wav_real(8000, 1, 1300, 31)
    b = _wav_real(16000, 2, 800, 32)
    out = [
        (1, a, formula_fp(1, 1300, 31)),
        (2, _wav_tagged(a), formula_fp(1, 1300, 31)),
        (3, _wav_real(8000, 1, 1300, 31, gain=2), formula_fp(1, 1300, 31, gain=2)),
        (4, b, formula_fp(2, 800, 32)),
        (5, _wav_tagged(b), formula_fp(2, 800, 32)),
        (6, _wav_real(8000, 1, 1300, 0, sample_fn=_env_sample), env_fp),
        (7, _wav_real(22050, 1, 500, 34), formula_fp(1, 500, 34)),
        (8, _wav_real(8000, 1, 40, 35), None),
        (9, _wav_real(8000, 1, 100, 36)[:20], None),
    ]
    # the gain lift must land in family A's group — assert the
    # invariance at synthesis so a drift fails fast, not in the oracle
    assert out[2][2] == out[0][2] and out[1][2] == out[0][2]
    return out


def afp_fixture_path() -> str:
    rows = [dict(media_id=m, content=b) for m, b, _ in _afp_blobs()]
    return _write_truth_parquet(
        "media_afp_input_v1", rows,
        [("media_id", "int64"), ("content", "binary")],
    )


def afp_truth_path() -> str:
    rows = [dict(media_id=m, afp=f) for m, _, f in _afp_blobs()]
    return _write_truth_parquet(
        "media_afp_truth_v1", rows,
        [("media_id", "int64"), ("afp", "string")],
    )


@query(
    "media_audio_fingerprint_dedup",
    oracle=lambda: f"""
    WITH t AS (SELECT media_id, afp FROM '{afp_truth_path()}'),
    g AS (
      SELECT afp, count(*) AS n, min(media_id) AS keeper
      FROM t WHERE afp IS NOT NULL GROUP BY afp)
    SELECT t.media_id, t.afp,
           g.n AS n_copies,
           CASE WHEN t.afp IS NULL THEN NULL
                ELSE t.media_id = g.keeper END AS keep
    FROM t LEFT JOIN g ON t.afp = g.afp
    """,
)
def q_media_audio_fingerprint_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual audio dedup (operators/multimodal.py:
    audio_fingerprint): decode each WAV's PCM frames, 64-bit loudness-
    envelope fingerprint in exact integer arithmetic, group by hash,
    keep the lowest id — the audio twin of media_image_dhash_dedup.
    Re-containered copies (same samples, LIST-tagged file → different
    bytes/md5) and exact gain lifts collapse; distinct recordings
    split; undecodable or sub-65-frame blobs yield NULL and join no
    group.  Oracle replays the dedup decision over synthesis-intent
    fingerprints (shared audio_fingerprint64 over FORMULA samples;
    the sample decode is pinned independently by media_audio_pcm).
    Scale: Arrow-batched map + one group-by on the 64-bit key."""
    from ..operators.cache import register_persisted
    from ..operators.multimodal import audio_fingerprint

    # persisted for the same two-consumer reason as the dhash twin
    d = audio_fingerprint(spark.read.parquet(afp_fixture_path())).persist()
    g = (
        d.filter(F.col("afp").isNotNull())
        .groupBy("afp")
        .agg(
            F.count("*").alias("n"),
            F.min("media_id").alias("keeper"),
        )
        .withColumnRenamed("afp", "gafp")
    )
    out = d.join(g, d.afp == F.col("gafp"), "left_outer").select(
        "media_id",
        "afp",
        F.col("n").alias("n_copies"),
        F.when(F.col("afp").isNull(), F.lit(None).cast("boolean"))
        .otherwise(F.col("media_id") == F.col("keeper"))
        .alias("keep"),
    )
    return register_persisted(out, d)


# ---------------------------------------------------------------------------
# video scene segmentation — consecutive-frame perceptual distance
# ---------------------------------------------------------------------------

SCENE_CUT_HAMMING = 4


def _hamming_hex(a: str, b: str) -> int:
    return bin(int(a, 16) ^ int(b, 16)).count("1")


def _video_blobs() -> list:
    """(media_id, blob, [(frame_no, dhash)]) — 'videos' as
    concatenated real PNG frames.  Within a scene, frames are
    brightness lifts of one picture (dhash-identical by the exact
    invariance); scenes use structurally different pixel formulas.
    Synthesis asserts every cross-scene hamming ≥ SCENE_CUT_HAMMING
    and within-scene = 0, so the oracle's cut threshold is exercised,
    not assumed.  Video 3 ends in a truncated frame that must be
    dropped by the chunk-walking splitter."""
    from ..operators.multimodal import dhash64

    # a scene is a linear-gradient picture family; DIFFERENT gradient
    # coefficient tuples (not just seed shifts, which only translate
    # the same sawtooth and land within hamming<4) give cross-scene
    # hamming 8-28 on this grid — measured, then asserted below
    P = {
        "base": (3, 7, 5, 11, 1, 13, 21),
        "diag": (11, 11, 13, 13, 7, 7, 5),
        "hifx": (29, 3, 31, 5, 37, 2, 9),
        "stpx": (13, 2, 9, 3, 7, 1, 40),
        "stpy": (2, 17, 3, 19, 1, 23, 77),
    }

    def px_of(coeffs, delta):
        a1, b1, a2, b2, a3, b3, s = coeffs
        return lambda x, y: (
            (x * a1 + y * b1 + s) % 251 + delta,
            (x * a2 + y * b2 + 2 * s) % 251 + delta,
            (x * a3 + y * b3 + 3 * s) % 251 + delta,
        )

    def frame(coeffs, delta):
        return _png_real(16, 16, 0, px=px_of(coeffs, delta))

    def fp(coeffs, delta):
        rows = [
            bytes(v for x in range(16) for v in px_of(coeffs, delta)(x, y))
            for y in range(16)
        ]
        return dhash64(16, 16, rows)

    scenes1 = [(P["base"], 5), (P["diag"], 4), (P["hifx"], 3)]
    h1 = [fp(c, 0) for c, _ in scenes1]
    for i in range(len(h1)):
        for j in range(i + 1, len(h1)):
            assert _hamming_hex(h1[i], h1[j]) >= SCENE_CUT_HAMMING, (
                h1[i], h1[j])
        assert fp(scenes1[i][0], 2) == h1[i]  # lift is invariant

    def video(scenes):
        blob, truth, no = b"", [], 0
        for coeffs, n in scenes:
            for d in range(n):
                no += 1
                blob += frame(coeffs, d)
                truth.append((no, fp(coeffs, d)))
        return blob, truth

    v1, t1 = video(scenes1)
    v2, t2 = video([(P["stpx"], 6)])
    v3, t3 = video([(P["stpy"], 2)])
    v3 = v3 + frame(P["base"], 0)[:40]  # truncated trailing frame: dropped
    return [(1, v1, t1), (2, v2, t2), (3, v3, t3)]


def video_fixture_path() -> str:
    rows = [dict(media_id=m, content=b) for m, b, _ in _video_blobs()]
    return _write_truth_parquet(
        "media_video_input_v1", rows,
        [("media_id", "int64"), ("content", "binary")],
    )


def video_truth_path() -> str:
    rows = [
        dict(media_id=m, frame_no=no, dhash=dh)
        for m, _, frames in _video_blobs()
        for no, dh in frames
    ]
    return _write_truth_parquet(
        "media_video_truth_v1", rows,
        [("media_id", "int64"), ("frame_no", "int64"), ("dhash", "string")],
    )


_HAMMING_SPARK = (
    "bit_count(cast(conv(substring(dhash, 1, 8), 16, 10) as bigint)"
    " ^ cast(conv(substring(_prev, 1, 8), 16, 10) as bigint))"
    " + bit_count(cast(conv(substring(dhash, 9, 8), 16, 10) as bigint)"
    " ^ cast(conv(substring(_prev, 9, 8), 16, 10) as bigint))"
)

_HAMMING_DUCK = (
    "bit_count(xor(('0x' || substr(dhash, 1, 8))::BIGINT,"
    " ('0x' || substr(prev, 1, 8))::BIGINT))"
    " + bit_count(xor(('0x' || substr(dhash, 9, 8))::BIGINT,"
    " ('0x' || substr(prev, 9, 8))::BIGINT))"
)


@query(
    "media_video_scene_cuts",
    oracle=lambda: f"""
    WITH t AS (
      SELECT media_id, frame_no, dhash,
             lag(dhash) OVER (PARTITION BY media_id ORDER BY frame_no)
                 AS prev
      FROM '{video_truth_path()}'),
    h AS (
      SELECT media_id, frame_no,
             CASE WHEN prev IS NULL THEN NULL
                  ELSE CAST({_HAMMING_DUCK} AS BIGINT) END AS hamming
      FROM t),
    c AS (
      SELECT media_id, frame_no, hamming,
             (hamming IS NULL OR hamming >= {SCENE_CUT_HAMMING}) AS is_cut
      FROM h)
    SELECT media_id, frame_no, hamming, is_cut,
           CAST(sum(CASE WHEN is_cut THEN 1 ELSE 0 END)
                OVER (PARTITION BY media_id ORDER BY frame_no)
                AS BIGINT) AS scene_id
    FROM c
    """,
)
def q_media_video_scene_cuts(spark: SparkSession, sf: str) -> DataFrame:
    """Video scene segmentation (operators/multimodal.py:
    video_frame_hashes): hash every frame of a concatenated-PNG
    'video' column, then one lag window per video turns the hamming
    distance between consecutive hashes into cut flags and a
    running-sum scene id — the select-one-frame-per-scene primitive a
    video training pipeline samples with (frame_no 1 of each scene_id
    group).  Hamming is computed JVM-side from the hex hash halves
    (conv/xor/bit_count, whole-stage codegen); the synthesis asserts
    cross-scene distance ≥ the cut threshold and within-scene = 0, so
    the threshold is exercised.  A truncated trailing frame is
    dropped by the chunk-walking splitter (video 3).  Oracle replays
    the window arithmetic over synthesis-intent hashes.
    Scale: one Arrow-batched map over blobs, one lag window keyed by
    video — state is a single hash row per partition stream."""
    from pyspark.sql.window import Window

    from ..operators.multimodal import video_frame_hashes

    d = video_frame_hashes(spark.read.parquet(video_fixture_path()))
    w = Window.partitionBy("media_id").orderBy("frame_no")
    h = d.withColumn("_prev", F.lag("dhash").over(w)).withColumn(
        "hamming",
        F.when(F.col("_prev").isNull(), F.lit(None).cast("long")).otherwise(
            F.expr(_HAMMING_SPARK)
        ),
    )
    c = h.withColumn(
        "is_cut",
        F.col("hamming").isNull() | (F.col("hamming") >= SCENE_CUT_HAMMING),
    )
    return c.select(
        "media_id",
        F.col("frame_no").cast("long").alias("frame_no"),
        "hamming",
        "is_cut",
        F.sum(F.col("is_cut").cast("int"))
        .over(w)
        .cast("long")
        .alias("scene_id"),
    )
