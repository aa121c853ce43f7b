"""HTTP/1.x object extraction from TCP flows — the captures→documents
bridge.

The reference's whole L7 extension story is a per-packet payload
callback (``DnsPcapReader.processPacketPayload``,
DnsPcapReader.java:29-57), which cannot parse a protocol whose
messages span segments.  This module works at flow grain: both
directions of a TCP connection are reassembled (ordered payload
concat, the :mod:`flows` contract), the request stream and the
response stream are parsed as HTTP/1.x message sequences
(RFC 9112 framing: Content-Length, chunked transfer coding, and
close-delimited bodies), requests are paired with responses in
pipeline order, and each pair becomes one ``(url, status,
content_type, body)`` row — the raw material of a
crawl-capture→training-corpus pipeline, feeding the existing text
(functions/text.py) and multimodal (operators/multimodal.py)
operators directly.

Scale notes (100 TB):

* The single shuffle carries only payload-bearing TCP segments that
  pass ``flow_filter`` — push a port predicate down so only candidate
  HTTP flows ever move; wide packet columns are projected away before
  the exchange.
* Per-connection state is the two directional byte streams, capped at
  ``max_flow_bytes`` each (``body_truncated`` rather than an OOM) —
  the same hot-flow guard as the DNS reassembler.
* Parsing is pure-Python over Arrow batches of connections
  (collect_list to connection grain JVM-side, then one mapInPandas —
  flows.connection_segments): bytes move once, Python invocations
  scale with batches, and the connection count — not the packet
  count — bounds task-side work.  ``window=`` adds a tumbling
  event-time bucket to the connection key for endless captures.
* Gzip/deflate content decoding uses the stdlib (deterministic, no
  optional deps); undecodable bodies are kept raw and flagged.

Ordering uses ``pkt_no`` (capture order) per direction — the passive
single-point-capture semantics documented on
:func:`..operators.flows.reassemble_dns_tcp`; TCP retransmits and
reordering are out of scope (documented divergence, not silent).
"""

from __future__ import annotations

import gzip
import zlib
from typing import List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "HTTP_OBJECT_SCHEMA",
    "http_objects",
    "parse_requests",
    "parse_responses",
    "parse_requests_incremental",
    "parse_responses_incremental",
]

HTTP_OBJECT_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), True),
        T.StructField("client", T.StringType(), True),
        T.StructField("server", T.StringType(), True),
        T.StructField("server_port", T.IntegerType(), True),
        T.StructField("obj_no", T.IntegerType(), True),
        T.StructField("method", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_encoding", T.StringType(), True),
        T.StructField("chunked", T.BooleanType(), True),
        T.StructField("body_len", T.IntegerType(), True),
        T.StructField("body_truncated", T.BooleanType(), True),
        T.StructField("body", T.BinaryType(), True),
    ]
)

_METHODS = (
    b"GET ", b"POST ", b"PUT ", b"HEAD ", b"DELETE ", b"OPTIONS ",
    b"PATCH ", b"TRACE ", b"CONNECT ",
)

# statuses that never carry a body (RFC 9112 §6.3)
_NO_BODY_STATUS = frozenset({204, 304})


def _split_head(stream: bytes, pos: int) -> Tuple[Optional[bytes], int]:
    """(header block incl. start line, position after CRLFCRLF) or
    (None, pos) when no complete header block remains."""
    end = stream.find(b"\r\n\r\n", pos)
    if end < 0:
        return None, pos
    return stream[pos:end], end + 4


def _headers(block: bytes) -> Tuple[bytes, dict]:
    """(start line, {lowercased name: value str}) — duplicate names
    keep the LAST value (sufficient for framing headers)."""
    lines = block.split(b"\r\n")
    hdrs: dict = {}
    for ln in lines[1:]:
        c = ln.find(b":")
        if c <= 0:
            continue
        hdrs[ln[:c].strip().lower().decode("latin-1")] = (
            ln[c + 1 :].strip().decode("latin-1")
        )
    return lines[0], hdrs


def _content_length(hdrs: dict) -> Optional[int]:
    v = hdrs.get("content-length")
    if v is None:
        return None
    try:
        n = int(v.split(",")[0].strip())
        return n if n >= 0 else None
    except ValueError:
        return None


def _read_chunked(stream: bytes, pos: int) -> Tuple[bytes, int, bool]:
    """Decode chunked transfer coding from ``pos``; returns (body,
    position after the terminating CRLF, complete?).  An incomplete
    tail (capture cut mid-chunk) returns what decoded so far with
    complete=False."""
    out: List[bytes] = []
    n = len(stream)
    while True:
        eol = stream.find(b"\r\n", pos)
        if eol < 0:
            return b"".join(out), n, False
        size_tok = stream[pos:eol].split(b";")[0].strip()  # drop extensions
        try:
            size = int(size_tok, 16)
        except ValueError:
            return b"".join(out), n, False
        pos = eol + 2
        if size == 0:
            # trailer section: zero or more header lines then CRLF
            end = stream.find(b"\r\n", pos)
            while end >= 0 and end != pos:  # non-empty line = trailer
                pos = end + 2
                end = stream.find(b"\r\n", pos)
            if end < 0:
                return b"".join(out), n, False
            return b"".join(out), end + 2, True
        if pos + size + 2 > n:
            out.append(stream[pos : min(pos + size, n)])
            return b"".join(out), n, False
        out.append(stream[pos : pos + size])
        pos += size + 2  # chunk data + its CRLF
    # unreachable


def parse_requests(stream: bytes) -> List[dict]:
    """The request stream as a list of {method, target, host} in
    pipeline order.  Request bodies (Content-Length / chunked) are
    consumed and discarded — the extraction target is the response
    object; the request contributes the URL."""
    out: List[dict] = []
    pos = 0
    while True:
        block, pos = _split_head(stream, pos)
        if block is None:
            break
        start, hdrs = _headers(block)
        parts = start.split(b" ")
        if len(parts) < 3 or not start.startswith(_METHODS):
            break  # desynchronized: stop rather than emit garbage
        cl = _content_length(hdrs)
        if "chunked" in hdrs.get("transfer-encoding", "").lower():
            _, pos, ok = _read_chunked(stream, pos)
            if not ok:
                pass  # truncated request body: URL already parsed
        elif cl:
            pos = min(pos + cl, len(stream))
        out.append(
            {
                "method": parts[0].decode("latin-1"),
                "target": parts[1].decode("latin-1"),
                "host": hdrs.get("host"),
            }
        )
    return out


def parse_responses(
    stream: bytes, methods: Optional[List[str]] = None, decode_content: bool = True
) -> List[dict]:
    """The response stream as a list of {status, content_type,
    content_encoding, chunked, body, truncated} in pipeline order.

    ``methods`` (the paired requests' methods, pipeline order) decides
    HEAD framing: a HEAD response carries headers but NO body bytes on
    the wire regardless of Content-Length (RFC 9112 §6.3).  A response
    with no Content-Length and no chunked coding is close-delimited —
    the rest of the stream (only valid as the final response).

    ``decode_content=True`` undoes gzip/deflate Content-Encoding with
    the stdlib; failures keep the raw bytes (flagged by leaving
    content_encoding set — a decoded body reports encoding
    ``<enc>;decoded``)."""
    out: List[dict] = []
    pos = 0
    i = 0
    n = len(stream)
    while True:
        block, pos = _split_head(stream, pos)
        if block is None:
            break
        start, hdrs = _headers(block)
        if not start.startswith(b"HTTP/1."):
            break  # desynchronized
        parts = start.split(b" ")
        try:
            status = int(parts[1])
        except (IndexError, ValueError):
            break
        method = methods[i] if methods and i < len(methods) else None
        chunked = "chunked" in hdrs.get("transfer-encoding", "").lower()
        cl = _content_length(hdrs)
        truncated = False
        if method == "HEAD" or status in _NO_BODY_STATUS or 100 <= status < 200:
            body = b""
        elif chunked:
            body, pos, ok = _read_chunked(stream, pos)
            truncated = not ok
        elif cl is not None:
            body = stream[pos : pos + cl]
            truncated = len(body) < cl
            pos = min(pos + cl, n)
        else:
            body = stream[pos:]  # close-delimited: rest of the stream
            pos = n
        enc = hdrs.get("content-encoding", "").lower() or None
        if decode_content and enc in ("gzip", "x-gzip", "deflate") and body:
            try:
                if enc == "deflate":
                    try:
                        body = zlib.decompress(body)
                    except zlib.error:
                        body = zlib.decompress(body, -zlib.MAX_WBITS)
                else:
                    body = gzip.decompress(body)
                enc = enc + ";decoded"
            except (OSError, zlib.error, EOFError):
                pass  # keep raw bytes; enc stays undecoded
        out.append(
            {
                "status": status,
                "content_type": hdrs.get("content-type"),
                "content_encoding": enc,
                "chunked": chunked,
                "body": body,
                "truncated": truncated,
            }
        )
        i += 1
    return out


def parse_requests_incremental(stream: bytes) -> Tuple[List[dict], int]:
    """Streaming twin of :func:`parse_requests`: parse only requests
    that are COMPLETE in ``stream`` (head and body fully present) and
    return ``(requests, consumed)`` where ``consumed`` is the byte
    offset of the first incomplete request — the caller carries
    ``stream[consumed:]`` as state into the next micro-batch, so a
    request split across batches is parsed exactly once, when its
    last byte arrives."""
    out: List[dict] = []
    pos = 0
    n = len(stream)
    while True:
        start_pos = pos
        block, pos = _split_head(stream, pos)
        if block is None:
            return out, start_pos
        start, hdrs = _headers(block)
        parts = start.split(b" ")
        if len(parts) < 3 or not start.startswith(_METHODS):
            return out, start_pos  # desynchronized: stop, don't consume
        cl = _content_length(hdrs)
        if "chunked" in hdrs.get("transfer-encoding", "").lower():
            _, pos, ok = _read_chunked(stream, pos)
            if not ok:
                return out, start_pos  # body incomplete: wait for more
        elif cl:
            if pos + cl > n:
                return out, start_pos
            pos += cl
        out.append(
            {
                "method": parts[0].decode("latin-1"),
                "target": parts[1].decode("latin-1"),
                "host": hdrs.get("host"),
            }
        )


def parse_responses_incremental(
    stream: bytes,
    methods: Optional[List[str]] = None,
    decode_content: bool = True,
) -> Tuple[List[dict], int]:
    """Streaming twin of :func:`parse_responses`: emit only responses
    whose framing COMPLETED in ``stream``; returns ``(responses,
    consumed)``.  A close-delimited response (no Content-Length, not
    chunked) has no knowable end on a live stream — parsing stops at
    its start and it is never emitted (documented streaming
    limitation; the batch operator handles it at flow end)."""
    out: List[dict] = []
    pos = 0
    i = 0
    n = len(stream)
    while True:
        start_pos = pos
        block, pos = _split_head(stream, pos)
        if block is None:
            return out, start_pos
        start, hdrs = _headers(block)
        if not start.startswith(b"HTTP/1."):
            return out, start_pos
        parts = start.split(b" ")
        try:
            status = int(parts[1])
        except (IndexError, ValueError):
            return out, start_pos
        method = methods[i] if methods and i < len(methods) else None
        chunked = "chunked" in hdrs.get("transfer-encoding", "").lower()
        cl = _content_length(hdrs)
        if method == "HEAD" or status in _NO_BODY_STATUS or 100 <= status < 200:
            body = b""
        elif chunked:
            body, pos, ok = _read_chunked(stream, pos)
            if not ok:
                return out, start_pos
        elif cl is not None:
            if pos + cl > n:
                return out, start_pos
            body = stream[pos : pos + cl]
            pos += cl
        else:
            return out, start_pos  # close-delimited: end unknowable live
        enc = hdrs.get("content-encoding", "").lower() or None
        if decode_content and enc in ("gzip", "x-gzip", "deflate") and body:
            try:
                if enc == "deflate":
                    try:
                        body = zlib.decompress(body)
                    except zlib.error:
                        body = zlib.decompress(body, -zlib.MAX_WBITS)
                else:
                    body = gzip.decompress(body)
                enc = enc + ";decoded"
            except (OSError, zlib.error, EOFError):
                pass  # keep raw bytes; enc stays undecoded
        out.append(
            {
                "status": status,
                "content_type": hdrs.get("content-type"),
                "content_encoding": enc,
                "chunked": chunked,
                "body": body,
                "truncated": False,  # incremental form never emits partial
            }
        )
        i += 1


def _classify_streams(streams: List[Tuple[tuple, bytes]]):
    """Split a connection's directional streams into (request_dir,
    response_dir) by CONTENT — the request stream starts with an HTTP
    method token, the response stream with ``HTTP/1.`` — so no port
    convention is assumed.  Returns (req, resp) as (key, bytes) pairs
    or (None, None) when the connection isn't parseable HTTP/1.x."""
    req = resp = None
    for key, stream in streams:
        if stream.startswith(_METHODS):
            req = (key, stream)
        elif stream.startswith(b"HTTP/1."):
            resp = (key, stream)
    return req, resp


def http_objects(
    packets: DataFrame,
    flow_filter=None,
    max_flow_bytes: int = 64 * 1024 * 1024,
    decode_content: bool = True,
    window: "str | None" = None,
    order: str = "capture",
) -> DataFrame:
    """One row per HTTP/1.x request/response pair across all TCP
    connections in a ``read_pcap`` DataFrame (HTTP_OBJECT_SCHEMA).

    ``packets`` needs columns ``file src dst src_port dst_port
    protocol pkt_no payload`` (pass ``columns=[...]`` for a pruned
    decode).  ``flow_filter`` is pushed below the shuffle — give it a
    port predicate (e.g. 80/8080) so non-HTTP flows never move; by
    default every payload-bearing TCP flow is a candidate and
    non-HTTP connections parse to zero rows.

    The connection key is the CANONICAL (unordered) endpoint pair, so
    one shuffle co-locates both directions; request vs response
    direction is decided by stream content, not port numbers.

    Execution shape: JVM-side ``collect_list`` to connection grain
    (:func:`..operators.flows.connection_segments`), then ONE
    ``mapInPandas`` whose each invocation parses a whole Arrow batch
    of connections — per-connection Python overhead amortizes across
    the batch (the per-group ``applyInPandas`` form measured ~5 ms of
    fixed cost per connection, dominating small-object workloads).

    ``order="seq"`` (needs the opt-in ``tcp_seq`` column in
    ``columns=``) heals each direction by TCP sequence number before
    parsing — retransmitted duplicates drop and reordered segments
    re-sort, so damaged crawl captures still yield correct objects;
    the default stays capture order."""
    from .flows import connection_segments, directional_streams

    if order not in ("capture", "seq"):
        raise ValueError(f"order must be 'capture' or 'seq', got {order!r}")
    if order == "seq" and "tcp_seq" not in packets.columns:
        raise ValueError(
            "order='seq' needs the opt-in tcp_seq column — decode with "
            "columns=[..., 'tcp_seq']"
        )
    conns = connection_segments(
        packets, flow_filter, window=window, with_seq=(order == "seq")
    )
    names = [f.name for f in HTTP_OBJECT_SCHEMA.fields]

    def _parse_connection(fname, segs, rows):
        dirs = directional_streams(segs, max_flow_bytes, order=order)
        joined = [(k, stream) for k, stream, _tr in dirs]
        trunc = {k: tr for k, _stream, tr in dirs}
        req, resp = _classify_streams(joined)
        if req is None or resp is None:
            return
        (client, _cport), req_stream = req
        (server, sport), resp_stream = resp
        requests = parse_requests(req_stream)
        responses = parse_responses(
            resp_stream,
            methods=[r["method"] for r in requests],
            decode_content=decode_content,
        )
        if responses and trunc.get((server, sport)):
            # the response stream was CAP-truncated: the last parsed
            # object absorbed the cut (close-delimited bodies read to
            # stream end and would otherwise report truncated=False)
            responses[-1]["truncated"] = True
        for i, (rq, rs) in enumerate(zip(requests, responses), start=1):
            target = rq["target"]
            if target.startswith("http://") or target.startswith("https://"):
                url = target  # absolute-form (proxy) target
            else:
                host = rq["host"] or (
                    server if sport is None else f"{server}:{sport}"
                )
                url = f"http://{host}{target}"
            rows.append(
                {
                    "file": fname,
                    "client": client,
                    "server": server,
                    "server_port": sport,
                    "obj_no": i,
                    "method": rq["method"],
                    "url": url,
                    "status": rs["status"],
                    "content_type": rs["content_type"],
                    "content_encoding": rs["content_encoding"],
                    "chunked": rs["chunked"],
                    "body_len": len(rs["body"]),
                    "body_truncated": rs["truncated"],
                    "body": rs["body"],
                }
            )

    def batch_fn(batches):
        for pdf in batches:
            rows: list = []
            for fname, segs in zip(pdf["file"], pdf["segs"]):
                _parse_connection(fname, segs, rows)
            yield (
                pd.DataFrame(rows, columns=names)
                if rows
                else pd.DataFrame(columns=names)
            )

    # mapInPandas is opaque to column pruning (guide §4): without the
    # explicit select, the canonical endpoint-pair key structs _a/_b
    # (and _w when windowed) — which batch_fn never reads, direction
    # is decided by stream CONTENT — would be Arrow-converted and
    # shipped to every Python worker alongside the segments.  Measured
    # on the 2000-connection fixture: full query min wall 2.78 → 1.85 s
    # (cpu 11.2 → 9.9 s) from this projection alone (r14).
    return conns.select("file", "segs").mapInPandas(
        batch_fn, HTTP_OBJECT_SCHEMA
    )
