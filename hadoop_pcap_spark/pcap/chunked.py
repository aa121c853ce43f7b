"""Bounded-memory (chunked) capture ingestion.

The reference streams every capture through a ``DataInputStream`` in
O(1) memory (PcapReader.java:67,75-77 loop / 167-181 per-record
reads); round 1-2 of this repo materialized whole files instead —
``binaryFile``'s ``content`` column caps at 2 GiB and a multi-GiB
rotated capture spiked per-task memory.  This module restores the
reference's physical property for Spark tasks:

* :func:`open_decompressed` — file-like reader with *streaming*
  decompression (gz/bz2/xz stdlib; zstd/lz4 behind import guards;
  snappy falls back to whole-buffer, it has no stdlib stream form).
* :func:`iter_capture_chunks` — yields record-aligned byte chunks,
  each a self-contained classic-pcap "file" (24-byte global header +
  whole records), so the existing scalar and columnar kernels decode
  each chunk unchanged.  Peak memory is ``chunk_bytes`` + the largest
  single record, independent of file size.

Record alignment: within a chunk the framing walk
(ts_sec,ts_usec,incl_len,orig_len @ incl_len-sized hops) finds the
last complete record; the remainder is carried into the next read.
Only the *final* chunk can end mid-record, which reproduces the
reference's truncated-tail ts-only row (PcapReader.java:177-180)
exactly once, at the true end of file.

pcapng is block-structured with stateful section headers, so it is
not chunked here — the stream is drained whole and handed to the
kernel (``formats.normalize_capture`` does the rewrite).  Classic
captures in all four magic variants (LE/BE × µs/ns) chunk fine: the
framing endianness follows the magic, and the non-strict
normalization inside the kernels is per-record, hence per-chunk safe.
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import os
import struct
import zlib
from typing import BinaryIO, Iterator

GLOBAL_HEADER_SIZE = 24
RECORD_HEADER_SIZE = 16
DEFAULT_CHUNK_BYTES = 64 << 20  # 64 MiB: ~0.1 s of decode per chunk,
# small enough that 32 concurrent tasks stay ≪ executor memory

# first 4 file bytes read as a little-endian u32
_MAGIC_LE_US = 0xA1B2C3D4
_MAGIC_LE_NS = 0xA1B23C4D
_MAGIC_BE_US = 0xD4C3B2A1
_MAGIC_BE_NS = 0x4D3CB2A1


# URI schemes routed through pyarrow.fs (when importable).  Hadoop-ish
# aliases map onto the pyarrow-native scheme; anything else is treated
# as a local path.  Listing/opening may still fail at runtime for a
# scheme pyarrow recognises but cannot reach (no credentials, no
# libhdfs) — that surfaces as the task error it is.
_PA_SCHEME_ALIASES = {
    "s3a": "s3", "s3n": "s3", "gcs": "gs", "abfss": "abfs", "wasb": "abfs",
    "wasbs": "abfs",
}
_PA_SCHEMES = {"s3", "gs", "hdfs", "abfs", "mock"}


def uri_scheme(path: str) -> str:
    from urllib.parse import urlparse

    return urlparse(path).scheme.lower()


def supports_scheme(scheme: str) -> bool:
    """Can the chunked reader stream this scheme?  Local always; remote
    schemes when pyarrow.fs is importable."""
    scheme = _PA_SCHEME_ALIASES.get(scheme.lower(), scheme.lower())
    if scheme in ("", "file"):
        return True
    if scheme not in _PA_SCHEMES:
        return False
    try:
        import pyarrow.fs  # noqa: F401

        return True
    except ImportError:
        return False


def _filesystem_for(path: str):
    """(pyarrow FileSystem, inner_path) for a remote URI, or None for
    local paths / file: URIs."""
    scheme = uri_scheme(path)
    mapped = _PA_SCHEME_ALIASES.get(scheme, scheme)
    if mapped in ("", "file") or mapped not in _PA_SCHEMES:
        return None
    import pyarrow.fs as pafs

    if mapped != scheme:
        rest = path[len(scheme):]
        if scheme in ("wasb", "wasbs"):
            # wasb(s) addresses the Blob endpoint; pyarrow's Azure
            # filesystem parses abfs[s] authorities against the Data
            # Lake (dfs) endpoint of the same account — translate the
            # endpoint along with the scheme (ADVICE r3)
            rest = rest.replace(
                ".blob.core.windows.net", ".dfs.core.windows.net", 1
            )
        path = mapped + rest
    return pafs.FileSystem.from_uri(path)


def open_raw(path: str) -> BinaryIO:
    """Seekable binary reader for a local path, ``file:`` URI, or a
    pyarrow.fs-reachable remote URI (O(1) memory either way —
    ``open_input_file`` is a random-access stream, not a download)."""
    remote = _filesystem_for(path)
    if remote is None:
        return open(local_path(path), "rb")
    fs, inner = remote
    return fs.open_input_file(inner)


def open_decompressed(path: str) -> BinaryIO:
    """Open ``path`` with streaming decompression (magic-sniffed, same
    codec set as :func:`..decode.decompress_auto`).  The returned
    file-like only ever holds one read-window in memory."""
    raw = open_raw(path)
    try:
        magic = raw.read(6)
        raw.seek(0)
    except OSError:
        raw.close()
        raise
    lowered = path.lower()
    # a recognizable capture magic wins over a misleading extension
    # (a raw pcap named *.gz must not be fed to GzipFile)
    if len(magic) >= 4:
        m = int.from_bytes(magic[:4], "little")
        if m in (_MAGIC_LE_US, _MAGIC_LE_NS, _MAGIC_BE_US, _MAGIC_BE_NS) or magic[
            :4
        ] == b"\x0a\x0d\x0d\x0a":
            return raw
    if lowered.endswith(".gz") or magic[:2] == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=raw)  # type: ignore[return-value]
    if lowered.endswith(".bz2") or magic[:3] == b"BZh":
        return bz2.BZ2File(raw)  # type: ignore[return-value]
    if lowered.endswith(".xz") or magic[:6] == b"\xfd7zXZ\x00":
        return lzma.LZMAFile(raw)  # type: ignore[return-value]
    if lowered.endswith(".zst") or magic[:4] == b"\x28\xb5\x2f\xfd":
        try:
            import zstandard
        except ImportError:
            raw.close()
            raise OSError(f"{path}: zstd-compressed; `zstandard` not installed")
        return zstandard.ZstdDecompressor().stream_reader(raw)  # streams
    if lowered.endswith(".lz4") or magic[:4] == b"\x04\x22\x4d\x18":
        try:
            import lz4.frame
        except ImportError:
            raw.close()
            raise OSError(f"{path}: lz4-compressed; `lz4` not installed")
        return lz4.frame.open(raw, mode="rb")
    if lowered.endswith(".snappy"):
        # no stdlib streaming form — bounded fallback: snappy block
        # format needs the whole buffer anyway
        from .decode import decompress_auto

        data = raw.read()
        raw.close()
        return io.BytesIO(decompress_auto(data, path))
    return raw


def iter_capture_chunks(
    stream: BinaryIO,
    name: str = "",
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
) -> Iterator[bytes]:
    """Yield self-contained, record-aligned classic-pcap byte chunks.

    Each yielded value starts with the file's own 24-byte global
    header, so the per-file decode kernels accept it verbatim; callers
    stitch ``pkt_no`` continuity (consecutive chunks of the same file
    continue the ordinal).  Non-classic input (pcapng, junk, short
    header) is yielded as ONE whole-stream chunk so error/normalize
    semantics stay byte-identical with the whole-file path.
    """
    if chunk_bytes <= 0:
        # "no chunking": the whole stream as one self-contained blob
        # (the documented chunk_bytes=0 escape hatch — previously a
        # read(0) loop here silently yielded only the global header)
        yield stream.read()
        return
    header = stream.read(GLOBAL_HEADER_SIZE)
    if len(header) < GLOBAL_HEADER_SIZE:
        yield header  # kernel decides: empty→0 rows, short→error
        return
    magic = int.from_bytes(header[:4], "little")
    if magic in (_MAGIC_LE_US, _MAGIC_LE_NS):
        fmt = "<I"
    elif magic in (_MAGIC_BE_US, _MAGIC_BE_NS):
        fmt = ">I"
    else:
        # pcapng / unknown: stateful or unframeable — whole stream
        yield header + stream.read()
        return

    unpack_u32 = struct.Struct(fmt).unpack_from
    buf = bytearray()
    yielded = False
    while True:
        chunk = stream.read(chunk_bytes)
        if not chunk:
            break
        buf += chunk
        # last complete-record boundary in buf
        pos = 0
        n = len(buf)
        while pos + RECORD_HEADER_SIZE <= n:
            nxt = pos + RECORD_HEADER_SIZE + unpack_u32(buf, pos + 8)[0]
            if nxt > n:
                break
            pos = nxt
        if pos:
            # single-copy assembly (header + aligned records)
            yield b"".join((header, memoryview(buf)[:pos]))
            yielded = True
            del buf[:pos]
    if buf or not yielded:
        # tail: a trailing partial record (→ ts-only row), or an
        # empty/record-less file that still must reach the kernel once
        yield b"".join((header, buf))


def index_capture_splits(
    path: str, split_bytes: int = DEFAULT_CHUNK_BYTES
) -> "list | None":
    """Record-aligned split index of ONE classic uncompressed capture:
    ``[(offset, n_bytes, first_pkt_no), ...]`` such that each split
    starts on a record boundary and a decoder fed
    ``global_header + file[offset : offset+n_bytes]`` reproduces
    exactly records ``first_pkt_no..`` of the serial decode.

    This is the index pass that breaks the reference's whole-file
    constraint (io/PcapInputFormat.java:72-75 `isSplitable` → false —
    inherited by S2): pcap framing is a byte-chain (each record header
    states its own length, PcapReader.java:167-181), so SPLITTING
    requires one sequential walk — but the walk reads only framing,
    no decode, so it runs at I/O speed; the expensive decode then
    parallelizes across the emitted splits (sources/pcap_source.py
    ``split_single_files``).  Returns None when the input cannot be
    range-split (compressed stream, pcapng, short/foreign header) —
    callers fall back to the serial whole-file path.

    The truncated tail, if any, rides in the LAST split so the
    ts-only-row semantics (PcapReader.java:177-180, D3) land exactly
    once at the true end of file, byte-identical with serial decode."""
    try:
        raw = open_raw(path)
    except OSError:
        return None
    with raw:
        header = raw.read(GLOBAL_HEADER_SIZE)
        if len(header) < GLOBAL_HEADER_SIZE:
            return None
        magic = int.from_bytes(header[:4], "little")
        if magic in (_MAGIC_LE_US, _MAGIC_LE_NS):
            fmt = "<I"
        elif magic in (_MAGIC_BE_US, _MAGIC_BE_NS):
            fmt = ">I"
        else:
            return None  # compressed / pcapng / junk → serial path
        unpack_u32 = struct.Struct(fmt).unpack_from
        # Sanity bound on incl_len: a corrupt record header (e.g.
        # 0xFFFFFFFF) must not make the walk buffer the rest of the
        # file in memory and emit it as one giant split — beyond any
        # plausible snaplen we bail to the serial streamed path, which
        # handles the corrupt tail with bounded memory.
        max_incl = max(split_bytes, 1 << 26)
        splits = []
        buf = bytearray()
        buf_base = GLOBAL_HEADER_SIZE  # file offset of buf[0]
        split_off, first_pkt, pkt = GLOBAL_HEADER_SIZE, 1, 1
        while True:
            chunk = raw.read(DEFAULT_CHUNK_BYTES)
            if not chunk:
                break
            buf += chunk
            pos, n = 0, len(buf)
            while pos + RECORD_HEADER_SIZE <= n:
                incl = unpack_u32(buf, pos + 8)[0]
                if incl > max_incl:
                    return None
                nxt = pos + RECORD_HEADER_SIZE + incl
                if nxt > n:
                    break
                pos = nxt
                pkt += 1
                cur_off = buf_base + pos
                if cur_off - split_off >= split_bytes:
                    splits.append((split_off, cur_off - split_off, first_pkt))
                    split_off, first_pkt = cur_off, pkt
            del buf[:pos]
            buf_base += pos
        # tail: trailing complete records below split_bytes and/or a
        # truncated final record (→ ts-only row in the last split);
        # an empty/record-less file still needs one (possibly 0-byte)
        # split so the kernel sees it exactly once
        rem = (buf_base + len(buf)) - split_off
        if rem > 0 or not splits:
            splits.append((split_off, rem, first_pkt))
        return splits


def index_capture_splits_cached(
    path: str, split_bytes: int = DEFAULT_CHUNK_BYTES
) -> "list | None":
    """:func:`index_capture_splits` behind a sidecar cache keyed by the
    file's identity (path + size + mtime_ns + split_bytes).

    The framing walk is the one inherently SEQUENTIAL part of split-
    parallel decode (the record chain must be followed from byte 24 —
    same property the reference's isSplitable=false encodes); a real
    deployment therefore indexes each capture ONCE at ingest and every
    subsequent query decodes fully parallel — exactly how parquet
    amortizes footer metadata.  The cache lives in the shared staging
    tmp area (guarded idle sweep, atomic publish — staging.py), NOT
    next to the source file, so read-only capture dirs work.  A file
    whose identity cannot be stat'd (remote URI without local stat)
    just pays the walk each time."""
    import json

    lp = local_path(path)
    try:
        st = os.stat(lp)
        ident = f"{lp}|{st.st_size}|{st.st_mtime_ns}|{split_bytes}"
    except OSError:
        return index_capture_splits(path, split_bytes)
    from ..staging import keyed_tmp_dir

    d = keyed_tmp_dir("pcapidx_", ident)
    os.makedirs(d, exist_ok=True)
    cache = os.path.join(d, "splits.json")
    try:
        with open(cache) as f:
            doc = json.load(f)
        if doc.get("ident") == ident:  # hash-collision / stale guard
            return (
                None
                if doc["splits"] is None
                else [tuple(s) for s in doc["splits"]]
            )
    except (OSError, ValueError):
        pass
    splits = index_capture_splits(path, split_bytes)
    import tempfile as _tf

    fd, tmp = _tf.mkstemp(dir=d, suffix=".json")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump({"ident": ident, "splits": splits}, f)
        os.replace(tmp, cache)
    except OSError:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return splits


def local_path(spark_path: str) -> str:
    """``file:/x`` / ``file:///x`` URIs (as emitted by Spark's
    binaryFile source) → a local filesystem path; other strings pass
    through untouched."""
    if spark_path.startswith("file:"):
        from urllib.parse import unquote, urlparse

        return unquote(urlparse(spark_path).path)
    return spark_path


def stream_error_types(stream) -> tuple:
    """Exception types that signal a broken/corrupt compressed stream
    for this specific reader.  gz/bz2/xz corruption surfaces as
    zlib.error / OSError / EOFError / lzma.LZMAError; zstd raises
    zstandard.ZstdError and python-lz4 a bare RuntimeError — both
    scoped to streams those codecs actually opened, so PERMISSIVE mode
    cannot swallow unrelated errors (ADVICE r3)."""
    errs: list = [OSError, EOFError, ValueError, zlib.error, lzma.LZMAError]
    mod = type(stream).__module__ or ""
    if mod.startswith("zstandard"):
        import zstandard

        errs.append(zstandard.ZstdError)
    elif mod.startswith("lz4"):
        errs.append(RuntimeError)
    return tuple(errs)


def stream_file_chunks(
    paths,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    permissive: bool = False,
) -> Iterator[tuple]:
    """(display_path, chunk_bytes) pairs for a sequence of capture
    files — the chunked drop-in for the ``(path, whole_file_bytes)``
    pairs the ``decode_files_to_*`` consumers take.  Consecutive pairs
    sharing a path are pkt_no-continued by those consumers.

    ``permissive=True`` mirrors DecodeOptions PERMISSIVE for the I/O
    layer the whole-file path never exposed: a file that cannot be
    opened or whose decompression stream breaks mid-read is skipped
    (chunks already yielded stand — the same partial-output semantics
    as a truncated raw capture) instead of failing the task."""
    for p in paths:
        try:
            f = open_decompressed(p)
        except (OSError, ValueError):
            if permissive:
                continue
            raise
        try:
            with f:
                for chunk in iter_capture_chunks(f, name=p, chunk_bytes=chunk_bytes):
                    yield p, chunk
        except stream_error_types(f) as exc:
            if permissive:
                continue
            raise OSError(f"{p}: {exc}") from exc


def file_size(path: str) -> int:
    try:
        remote = _filesystem_for(path)
        if remote is not None:
            fs, inner = remote
            size = fs.get_file_info(inner).size
            return -1 if size is None else size
        return os.path.getsize(local_path(path))
    except OSError:
        return -1
