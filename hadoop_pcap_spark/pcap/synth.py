"""Synthesize pcap files / packets for tests and golden fixtures.

All construction is from the public libpcap + Ethernet/IP/UDP/TCP/DNS
wire formats.  Used by the test suite (property tests round-trip
synth → bytes → decode) and by the demo/packets-table generator.
"""

from __future__ import annotations

import struct
from typing import Iterable, List, Optional


def global_header(link_type: int = 1, snaplen: int = 65535) -> bytes:
    return struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, snaplen, link_type)


def record(ts_sec: int, data: bytes, ts_usec: int = 0, orig_len: Optional[int] = None) -> bytes:
    if orig_len is None:
        orig_len = len(data)
    return struct.pack("<IIII", ts_sec, ts_usec, len(data), orig_len) + data


def ethernet(payload: bytes, ethertype: int = 0x0800,
             src_mac: bytes = b"\x02\x00\x00\x00\x00\x01",
             dst_mac: bytes = b"\x02\x00\x00\x00\x00\x02",
             vlan: Optional[int] = None) -> bytes:
    if vlan is not None:
        return dst_mac + src_mac + struct.pack(">HH", 0x8100, vlan) + struct.pack(">H", ethertype) + payload
    return dst_mac + src_mac + struct.pack(">H", ethertype) + payload


def sll(payload: bytes, protocol: int = 0x0800, packet_type: int = 0,
        arphrd: int = 1, addr: bytes = b"\x02\x00\x00\x00\x00\x01",
        vlan: Optional[int] = None) -> bytes:
    """Linux cooked capture (SLL v1) 16-byte pseudo-header:
    packet_type(2) ARPHRD(2) addr_len(2) addr(8) protocol(2, network
    order); optional single 802.1Q tag before the protocol field."""
    hdr = (
        struct.pack(">HHH", packet_type, arphrd, len(addr))
        + addr.ljust(8, b"\x00")[:8]
    )
    if vlan is not None:
        return (
            hdr
            + struct.pack(">HH", 0x8100, vlan)
            + struct.pack(">H", protocol)
            + payload
        )
    return hdr + struct.pack(">H", protocol) + payload


def _cksum16(data: bytes) -> int:
    if len(data) % 2:
        data += b"\x00"
    total = 0
    for (w,) in struct.iter_unpack(">H", data):
        total += w
    while total >> 16:
        total = (total & 0xFFFF) + (total >> 16)
    return (~total) & 0xFFFF


def ipv4(payload: bytes, proto: int, src: str, dst: str, ttl: int = 64,
         flags_frag: int = 0, ident: int = 0) -> bytes:
    """flags_frag: the 16-bit flags/fragment-offset word — e.g.
    0x2000 = MF set (first fragment), 0x00B9 = offset 185·8 bytes."""
    src_b = bytes(int(x) for x in src.split("."))
    dst_b = bytes(int(x) for x in dst.split("."))
    total_len = 20 + len(payload)
    hdr = struct.pack(
        ">BBHHHBBH4s4s", 0x45, 0, total_len, ident, flags_frag, ttl, proto, 0,
        src_b, dst_b,
    )
    cksum = _cksum16(hdr)
    hdr = hdr[:10] + struct.pack(">H", cksum) + hdr[12:]
    return hdr + payload


def ipv6(payload: bytes, next_header: int, src: str, dst: str,
         hop_limit: int = 64, ext_headers: Iterable[tuple] = ()) -> bytes:
    """ext_headers: iterable of (ext_type, ext_bytes) inserted in order;
    ext_bytes must already have its next-header byte at offset 0 patched
    by this function."""
    import ipaddress as _ip
    src_b = _ip.IPv6Address(src).packed
    dst_b = _ip.IPv6Address(dst).packed
    exts: List[bytes] = []
    chain: List[int] = [t for t, _ in ext_headers] + [next_header]
    body = b""
    ext_list = list(ext_headers)
    for i, (etype, ebytes) in enumerate(ext_list):
        nxt = chain[i + 1]
        body += bytes([nxt]) + ebytes[1:]
    body += payload
    first_next = chain[0]
    payload_len = len(body)
    hdr = struct.pack(">IHBB", 0x60000000, payload_len, first_next, hop_limit) + src_b + dst_b
    return hdr + body


def fragment_ext(next_header_placeholder: int = 0, offset: int = 0, ident: int = 1) -> bytes:
    """IPv6 Fragment extension header (8 bytes); byte 0 patched by ipv6()."""
    return struct.pack(">BBHI", next_header_placeholder, 0, offset, ident)


def udp(payload: bytes, src_port: int, dst_port: int,
        src_ip: str = "", dst_ip: str = "", checksum: bool = True) -> bytes:
    length = 8 + len(payload)
    hdr = struct.pack(">HHHH", src_port, dst_port, length, 0)
    seg = hdr + payload
    if checksum and src_ip and dst_ip:
        import ipaddress as _ip
        src_b = _ip.ip_address(src_ip).packed
        dst_b = _ip.ip_address(dst_ip).packed
        if len(src_b) == 16:
            pseudo = src_b + dst_b + struct.pack(">I", length) + b"\x00\x00\x00\x11"
        else:
            pseudo = src_b + dst_b + b"\x00\x11" + struct.pack(">H", length)
        ck = _cksum16(pseudo + seg)
        if ck == 0:
            ck = 0xFFFF
        seg = hdr[:6] + struct.pack(">H", ck) + payload
    return seg


def tcp(payload: bytes, src_port: int, dst_port: int, data_offset: int = 5) -> bytes:
    hdr = struct.pack(">HHIIBBHHH", src_port, dst_port, 0, 0,
                      (data_offset << 4), 0x18, 8192, 0, 0)
    hdr += b"\x00" * ((data_offset - 5) * 4)
    return hdr + payload


def _name(qname: str) -> bytes:
    out = b""
    for label in qname.rstrip(".").split("."):
        if label:
            out += bytes([len(label)]) + label.encode()
    return out + b"\x00"


def dns_query(qid: int, qname: str, qtype: int = 1, rd: bool = True) -> bytes:
    flags = 0x0100 if rd else 0
    hdr = struct.pack(">HHHHHH", qid, flags, 1, 0, 0, 0)
    return hdr + _name(qname) + struct.pack(">HH", qtype, 1)


def dns_response(qid: int, qname: str, qtype: int = 1,
                 answers: Iterable[tuple] = (), rcode: int = 0,
                 aa: bool = False) -> bytes:
    """answers: iterable of (name, ttl, rtype, rdata_bytes)."""
    ans = list(answers)
    flags = 0x8180 | (0x0400 if aa else 0) | (rcode & 0xF)
    hdr = struct.pack(">HHHHHH", qid, flags, 1, len(ans), 0, 0)
    body = _name(qname) + struct.pack(">HH", qtype, 1)
    for name, ttl, rtype, rdata in ans:
        body += _name(name) + struct.pack(">HHIH", rtype, 1, ttl, len(rdata)) + rdata
    return hdr + body


def dns_tcp_segments(messages: Iterable[bytes],
                     split_sizes: Iterable[int]) -> list:
    """Frame DNS messages per RFC 1035 §4.2.2 (2-byte BE length prefix
    each) into one byte stream, then split it into TCP-segment payloads
    at the given sizes (remainder, if any, becomes a final segment).
    Segment boundaries need not align with message boundaries — that's
    the point."""
    stream = b"".join(struct.pack(">H", len(m)) + m for m in messages)
    segs, pos = [], 0
    for s in split_sizes:
        if pos >= len(stream):
            break
        segs.append(stream[pos:pos + s])
        pos += s
    if pos < len(stream):
        segs.append(stream[pos:])
    return segs


def _dns_tcp_exchange_parts():
    """Messages, per-message intent, and the segment split plan shared
    by :func:`dns_tcp_exchange_pcap` (capture bytes) and
    :func:`dns_tcp_exchange_truth` (expected reassembly rows) — both
    derive from these SAME synthesis parameters, so the truth never
    comes from running the decoder.

    Intent tuples are (queryid, qname-as-parsed, qr, n_answers); the
    qname is the synthesis qname lowercased + trailing dot, which is
    the RFC 1035 presentation form the parser is contracted to emit.
    """
    q = dns_query(0x4242, "bigzone.example", 252)  # AXFR-ish motif
    r1 = dns_response(
        0x4242, "bigzone.example", 252,
        answers=[(f"h{i}.bigzone.example", 600, 1, a_rdata(f"10.1.{i}.1"))
                 for i in range(20)],
    )
    r2 = dns_response(0x4243, "bigzone.example", 6,
                      answers=[("bigzone.example", 600, 2,
                                ns_rdata("ns1.bigzone.example"))])
    cli, srv = "192.0.2.10", "192.0.2.53"
    q_msgs = [q]
    q_intent = [(0x4242, "bigzone.example.", False, 0)]
    q_splits = [2 + len(q)]  # query in exactly one segment
    r_msgs = [r1, r2]
    r_intent = [(0x4242, "bigzone.example.", True, 20),
                (0x4243, "bigzone.example.", True, 1)]
    # response stream split so segment 1 ends mid-r1 AND segment 2
    # carries both the rest of r1 and all of r2: "message spans
    # segments" and "segment carries >1 message" both occur
    r_splits = [120]
    return cli, srv, q_msgs, q_intent, q_splits, r_msgs, r_intent, r_splits


def dns_tcp_exchange_pcap(ts: int = 1317993942) -> bytes:
    """A DNS-over-TCP capture for flow reassembly: client query in one
    segment; a large response split mid-message across two segments,
    with a second (small) response sharing the tail segment — so both
    "message spans segments" and "segment carries >1 message" occur."""
    (cli, srv, q_msgs, _qi, q_splits,
     r_msgs, _ri, r_splits) = _dns_tcp_exchange_parts()
    q_segs = dns_tcp_segments(q_msgs, q_splits)
    r_segs = dns_tcp_segments(r_msgs, r_splits)
    out = global_header(1)
    t = ts
    for seg in q_segs:
        out += record(t, ethernet(ipv4(tcp(seg, 40000, 53), 6, cli, srv)))
        t += 1
    for seg in r_segs:
        out += record(t, ethernet(ipv4(tcp(seg, 53, 40000), 6, srv, cli)))
        t += 1
    return out


def dns_tcp_exchange_truth() -> list:
    """Expected reassembled-message rows for
    :func:`dns_tcp_exchange_pcap`, computed from the synthesis
    parameters only (message intents + segment split plan — never from
    running the decoder): one dict per DNS message, in per-flow
    capture/msg_no order.  ``n_segments`` is the per-flow segment
    count, which falls out of the same ``dns_tcp_segments`` framing
    arithmetic that sized the capture's packets."""
    (cli, srv, q_msgs, q_intent, q_splits,
     r_msgs, r_intent, r_splits) = _dns_tcp_exchange_parts()
    rows = []
    for src, dst, sp, dp, msgs, intents, splits in (
        (cli, srv, 40000, 53, q_msgs, q_intent, q_splits),
        (srv, cli, 53, 40000, r_msgs, r_intent, r_splits),
    ):
        n_segs = len(dns_tcp_segments(msgs, splits))
        for msg_no, (qid, qname, qr, n_ans) in enumerate(intents, start=1):
            rows.append(
                {
                    "src": src, "dst": dst,
                    "src_port": sp, "dst_port": dp,
                    "msg_no": msg_no,
                    "dns_queryid": qid,
                    "dns_qname": qname,
                    "dns_qr": qr,
                    "n_segments": n_segs,
                    "n_answers": n_ans,
                }
            )
    return rows


def split_stream(stream: bytes, split_sizes: Iterable[int]) -> list:
    """Split a byte stream into TCP-segment payloads at the given
    sizes (remainder, if any, becomes a final segment).  Boundaries
    need not align with message/body boundaries — that's the point."""
    segs, pos = [], 0
    for s in split_sizes:
        if pos >= len(stream):
            break
        segs.append(stream[pos : pos + s])
        pos += s
    if pos < len(stream):
        segs.append(stream[pos:])
    return segs


def _http_objects_spec() -> list:
    """The HTTP-exchange fixture's object list — synthesis parameters
    only, shared by the capture builder and the ground-truth builder
    (the truth never comes from running the extractor).  Each dict
    fully determines one request/response pair; ``framing`` picks the
    RFC 9112 body framing branch it exercises."""
    import gzip as _gz

    html = (
        b"<html><head><title>doc one</title></head><body>"
        + b"<p>paragraph %d of the corpus page.</p>" * 12
        + b"</body></html>"
    )
    png_ish = bytes((i * 7 + 3) % 256 for i in range(600))
    json_body = (
        b'{"records": ['
        + b",".join(b'{"k": %d, "v": "item-%d"}' % (i, i) for i in range(40))
        + b"]}"
    )
    text_big = b"the quick brown fox jumps over the lazy dog. " * 40
    tail_txt = b"close-delimited trailer document body " * 9
    return [
        # flow 1: 198.51.100.7:40101 <-> 192.0.2.80:80
        {"flow": 0, "method": "GET", "target": "/index.html",
         "host": "files.example", "status": 200, "reason": "OK",
         "ctype": "text/html; charset=utf-8", "body": html,
         "framing": "length"},
        {"flow": 0, "method": "GET", "target": "/logo.png",
         "host": "files.example", "status": 200, "reason": "OK",
         "ctype": "image/png", "body": png_ish, "framing": "length"},
        {"flow": 0, "method": "HEAD", "target": "/index.html",
         "host": "files.example", "status": 200, "reason": "OK",
         "ctype": "text/html; charset=utf-8", "body": html,
         "framing": "head"},  # Content-Length advertised, NO body bytes
        # flow 2: 198.51.100.9:40202 <-> 192.0.2.80:8080
        {"flow": 1, "method": "GET", "target": "/api/data.json",
         "host": "api.example", "status": 200, "reason": "OK",
         "ctype": "application/json", "body": json_body,
         "framing": "chunked"},
        {"flow": 1, "method": "POST", "target": "/api/submit",
         "host": "api.example", "status": 404, "reason": "Not Found",
         "ctype": "text/plain", "body": b"no such endpoint",
         "framing": "length", "req_body": b"a=1&b=2&c=33"},
        {"flow": 1, "method": "GET", "target": "/api/big.txt",
         "host": "api.example", "status": 200, "reason": "OK",
         "ctype": "text/plain", "body": text_big,
         "framing": "gzip",
         "wire_body": _gz.compress(text_big, mtime=0)},
        {"flow": 1, "method": "DELETE", "target": "/api/item/7",
         "host": "api.example", "status": 204, "reason": "No Content",
         "ctype": None, "body": b"", "framing": "nobody"},
        {"flow": 1, "method": "GET", "target": "/api/tail",
         "host": "api.example", "status": 200, "reason": "OK",
         "ctype": "text/plain", "body": tail_txt,
         "framing": "close"},  # no CL, body runs to stream end
        # flow 3: a mirror host re-serving big.txt — the cross-URL
        # duplicate body the captures→corpus dedup bridge must catch
        {"flow": 2, "method": "GET", "target": "/mirror/big.txt",
         "host": "mirror.example", "status": 200, "reason": "OK",
         "ctype": "text/plain", "body": text_big,
         "framing": "length"},
    ]


_HTTP_FLOWS = [
    ("198.51.100.7", 40101, "192.0.2.80", 80),
    ("198.51.100.9", 40202, "192.0.2.80", 8080),
    ("198.51.100.11", 40303, "192.0.2.81", 80),
]


def _http_request_bytes(o: dict) -> bytes:
    req_body = o.get("req_body", b"")
    head = f"{o['method']} {o['target']} HTTP/1.1\r\nHost: {o['host']}\r\n"
    if req_body:
        head += f"Content-Length: {len(req_body)}\r\n"
    head += "User-Agent: synth-fixture/1.0\r\n\r\n"
    return head.encode("latin-1") + req_body


def _http_response_bytes(o: dict) -> bytes:
    head = f"HTTP/1.1 {o['status']} {o['reason']}\r\n"
    if o["ctype"] is not None:
        head += f"Content-Type: {o['ctype']}\r\n"
    framing, body = o["framing"], o["body"]
    if framing == "length":
        head += f"Content-Length: {len(body)}\r\n\r\n"
        return head.encode("latin-1") + body
    if framing == "head":
        # HEAD: full headers incl. the length the GET would carry
        head += f"Content-Length: {len(body)}\r\n\r\n"
        return head.encode("latin-1")
    if framing == "chunked":
        head += "Transfer-Encoding: chunked\r\n\r\n"
        out = head.encode("latin-1")
        pos, sizes = 0, [7, 64]
        while pos < len(body):
            n = sizes.pop(0) if sizes else 113
            chunk = body[pos : pos + n]
            out += b"%x\r\n" % len(chunk) + chunk + b"\r\n"
            pos += len(chunk)
        return out + b"0\r\nX-Trailer: done\r\n\r\n"
    if framing == "gzip":
        wire = o["wire_body"]
        head += (
            "Content-Encoding: gzip\r\n"
            f"Content-Length: {len(wire)}\r\n\r\n"
        )
        return head.encode("latin-1") + wire
    if framing == "nobody":
        return (head + "\r\n").encode("latin-1")
    if framing == "close":
        head += "Connection: close\r\n\r\n"
        return head.encode("latin-1") + body
    raise ValueError(framing)


def http_exchange_frames(ts: int = 1470000000) -> list:
    """(frame_bytes, meta) pairs for the HTTP/1.x extraction fixture:
    two pipelined client connections whose request and response
    streams are split into TCP segments at boundaries that make one
    body span several segments AND consecutive responses share a
    segment — plus every RFC 9112 framing branch (Content-Length,
    chunked + trailer, gzip Content-Encoding, HEAD, 204, and a
    close-delimited tail).  All bytes derive from
    :func:`_http_objects_spec` synthesis parameters."""
    frames: list = []
    t = [ts]

    def emit(src, dst, sp, dp, seg):
        f = ethernet(ipv4(tcp(seg, sp, dp), 6, src, dst))
        frames.append(
            (f, {"ts": t[0], "ts_usec": (len(frames) * 149) % 1000000})
        )
        t[0] += 1

    objs = _http_objects_spec()
    for fi, (cli, cport, srv, sport) in enumerate(_HTTP_FLOWS):
        fobjs = [o for o in objs if o["flow"] == fi]
        req_stream = b"".join(_http_request_bytes(o) for o in fobjs)
        resp_stream = b"".join(_http_response_bytes(o) for o in fobjs)
        # odd split sizes: requests pipelined 2-per-segment-ish,
        # responses cut mid-body and mid-header
        req_segs = split_stream(req_stream, [90, 130])
        resp_segs = split_stream(resp_stream, [100, 333, 57, 512])
        for seg in req_segs:
            emit(cli, srv, cport, sport, seg)
        for seg in resp_segs:
            emit(srv, cli, sport, cport, seg)
    return frames


def http_exchange_pcap(ts: int = 1470000000) -> bytes:
    frames = http_exchange_frames(ts)
    return global_header(1) + b"".join(
        record(m["ts"], f, ts_usec=m["ts_usec"]) for f, m in frames
    )


def http_exchange_truth() -> list:
    """Expected HTTP object rows for :func:`http_exchange_pcap`,
    computed from the synthesis spec only (never from the extractor):
    one dict per request/response pair, keyed the way the extractor
    reports them.  ``body_len``/``body_md5`` describe the DECODED
    body the pair transferred — empty for HEAD/204 by RFC 9112 §6.3,
    the gzip object's ORIGINAL text (the extractor decodes wire
    Content-Encoding), and the close-delimited object's full tail."""
    import hashlib

    rows = []
    for fi, (cli, _cport, srv, sport) in enumerate(_HTTP_FLOWS):
        for i, o in enumerate(
            [o for o in _http_objects_spec() if o["flow"] == fi], start=1
        ):
            body = b"" if o["framing"] in ("head", "nobody") else o["body"]
            rows.append(
                {
                    "client": cli,
                    "server": srv,
                    "server_port": sport,
                    "obj_no": i,
                    "method": o["method"],
                    "url": f"http://{o['host']}{o['target']}",
                    "status": o["status"],
                    "content_type": o["ctype"],
                    "body_len": len(body),
                    "body_md5": hashlib.md5(body).hexdigest(),
                }
            )
    return rows


def ns_rdata(target: str) -> bytes:
    return _name(target)


def a_rdata(ip: str) -> bytes:
    return bytes(int(x) for x in ip.split("."))


def dns_exchange_frames(ts: int = 1317993942) -> list:
    """(frame_bytes, intent) pairs behind :func:`dns_exchange_pcap`.

    ``intent`` records the SYNTHESIS parameters — addresses, ports,
    protocol, DNS question/direction — as the expected decode of each
    frame.  This is the independent ground truth the pcap fixture
    oracles compare the Spark decoder against (the values come from
    what the synthesizer was ASKED to build, never from running the
    decoder)."""
    q = dns_query(0x1234, "ripe.net", 1)
    r = dns_response(
        0x1234, "ripe.net", 1,
        answers=[("ripe.net", 3600, 2, ns_rdata(f"{c}.gtld-servers.net"))
                 for c in "abcdefghijklm"],
    )
    qpkt = ethernet(ipv4(udp(q, 52938, 53, "193.0.10.82", "193.0.14.129"),
                         17, "193.0.10.82", "193.0.14.129"))
    rpkt = ethernet(ipv4(udp(r, 53, 52938, "193.0.14.129", "193.0.10.82"),
                         17, "193.0.14.129", "193.0.10.82"))
    return [
        (qpkt, {"ts": ts, "ts_usec": 0, "src": "193.0.10.82",
                "dst": "193.0.14.129", "src_port": 52938, "dst_port": 53,
                "protocol": "UDP", "dns_qname": "ripe.net.",
                "dns_qr": False, "payload": q}),
        (rpkt, {"ts": ts, "ts_usec": 0, "src": "193.0.14.129",
                "dst": "193.0.10.82", "src_port": 53, "dst_port": 52938,
                "protocol": "UDP", "dns_qname": "ripe.net.",
                "dns_qr": True, "payload": r}),
    ]


def dns_exchange_pcap(ts: int = 1317993942) -> bytes:
    """A 2-packet UDP DNS exchange mirroring the *shape* of the
    reference's test fixture (FIXTURES.md §3): query `ripe.net A` from
    193.0.10.82:52938 → 193.0.14.129:53 and a 13-NS-record response.
    Bytes are synthesized here, not copied."""
    frames = dns_exchange_frames(ts)
    return global_header(1) + b"".join(
        record(m["ts"], f, ts_usec=m["ts_usec"]) for f, m in frames
    )


def analytics_frames(ts: int = 1418000000) -> list:
    """(frame_bytes, intent) pairs for the security-analytics fixture:
    a deterministic mixed capture exercising the detection queries a
    reference user runs over decoded packets (scan detection, DNS
    tunnel scoring, subnet rollups).  Traffic mix:

    * one *scanner* (``10.0.9.9``) sweeping 128 distinct TCP dst
      ports on ``10.0.1.1`` — many-ports/one-dst, the port-scan
      signature;
    * twelve *normal clients* across four ``10.0.{0..3}.0/24``
      subnets, each talking TCP to at most two service ports
      (443/80) on two servers;
    * DNS queries over UDP/53: each client asks boring qnames, while
      one *infected host* (``10.0.2.11``) asks 24 tunnel-shaped
      qnames (a 32-char hex exfil label under a fixed parent — long
      first label, deep and wide, the iodine/dnscat signature).

    Intent dicts record the synthesis parameters (addresses, ports,
    protocol, qname/direction, frame size) — the ground truth the
    decode path is hash-compared against, never derived by running
    the decoder.  All values are arithmetic in the loop indices (the
    hex labels come from md5 of the loop counter), so the fixture is
    bit-reproducible."""
    import hashlib

    frames: list = []

    def tcp_pkt(src, dst, sp, dp, t_off):
        f = ethernet(ipv4(tcp(b"", sp, dp), 6, src, dst))
        frames.append(
            (f, {"ts": ts + t_off, "ts_usec": (t_off * 137) % 1000000,
                 "src": src, "dst": dst, "src_port": sp, "dst_port": dp,
                 "protocol": "TCP", "size": len(f),
                 "dns_qname": None, "dns_qr": None})
        )

    def dns_pkt(src, qname, qid, t_off):
        q = dns_query(qid, qname.rstrip("."), 1)
        f = ethernet(ipv4(udp(q, 40000 + (qid % 2048), 53, src, "10.0.0.53"),
                          17, src, "10.0.0.53"))
        frames.append(
            (f, {"ts": ts + t_off, "ts_usec": (t_off * 211) % 1000000,
                 "src": src, "dst": "10.0.0.53",
                 "src_port": 40000 + (qid % 2048), "dst_port": 53,
                 "protocol": "UDP", "size": len(f),
                 "dns_qname": qname, "dns_qr": False})
        )

    # scanner: 128 distinct dst ports, one src port, one target
    for i in range(128):
        tcp_pkt("10.0.9.9", "10.0.1.1", 44321, 1000 + i, i)
    # normal clients: 3 hosts per /24, bounded port fan-out
    servers = ("10.0.1.1", "10.0.3.1")
    for s in range(4):
        for h in range(3):
            src = f"10.0.{s}.{10 + h}"
            for p in range(4 + s + h):
                tcp_pkt(src, servers[p % 2], 50000 + p,
                        443 if p % 3 else 80, 200 + s * 40 + h * 10 + p)
            dns_pkt(src, f"www.site{s}{h}.example.", 100 + s * 16 + h, 400 + s * 8 + h)
            dns_pkt(src, f"cdn.site{s}{h}.example.", 200 + s * 16 + h, 440 + s * 8 + h)
    # tunnel: long hex first label under a fixed parent, 24 queries
    for i in range(24):
        label = hashlib.md5(f"exfil-{i}".encode()).hexdigest()
        dns_pkt("10.0.2.11", f"{label}.t{i % 4}.exfil-c2.example.",
                600 + i, 500 + i)
    return frames


def analytics_pcap(ts: int = 1418000000) -> bytes:
    frames = analytics_frames(ts)
    return global_header(1) + b"".join(
        record(m["ts"], f, ts_usec=m["ts_usec"]) for f, m in frames
    )


def sll_frames(ts: int = 1430000000) -> list:
    """(frame_bytes, intent) pairs for the LINUX_SLL fixture: a
    deterministic cooked (any-interface) capture mixing plain IPv4,
    VLAN-tagged IPv4, IPv6, ARP and a truncated pseudo-header — every
    branch of the SLL L2 decode.  Intent dicts hold the synthesis
    parameters only (never decoder output)."""
    frames: list = []

    def add(f, t_off, **meta):
        base = {"ts": ts + t_off, "ts_usec": (t_off * 173) % 1000000,
                "size": len(f), "ether_type": "", "src": None,
                "dst": None, "src_port": None, "dst_port": None,
                "protocol": None}
        base.update(meta)
        frames.append((f, base))

    hosts = ["10.5.0.1", "10.5.0.2", "10.5.1.7"]
    for i in range(18):
        src = hosts[i % 3]
        dst = "10.5.9.9"
        sp, dp = 40000 + i, 443 if i % 2 else 8080
        seg = tcp(b"", sp, dp) if i % 3 else udp(b"x" * (i + 1), sp, dp,
                                                 src, dst)
        proto = (6, "TCP") if i % 3 else (17, "UDP")
        f = sll(ipv4(seg, proto[0], src, dst),
                vlan=(7 if i % 5 == 0 else None))
        add(f, i, ether_type="IPv4", src=src, dst=dst, src_port=sp,
            dst_port=dp, protocol=proto[1])
    for i in range(6):
        src, dst = "2001:db8::11", "2001:db8::99"
        sp, dp = 52000 + i, 53
        f = sll(ipv6(udp(b"q" * (i + 2), sp, dp), 17, src, dst),
                protocol=0x86DD)
        add(f, 30 + i, ether_type="IPv6", src=src, dst=dst, src_port=sp,
            dst_port=dp, protocol="UDP")
    for i in range(3):  # ARP: L2-only rows
        f = sll(b"\x00\x01\x08\x00\x06\x04\x00\x01" + b"\x00" * 20,
                protocol=0x0806)
        add(f, 40 + i, ether_type="arp")
    add(sll(b"", protocol=0x0800)[:10], 50)  # truncated pseudo-header
    return frames


def sll_pcap(ts: int = 1430000000) -> bytes:
    frames = sll_frames(ts)
    return global_header(113) + b"".join(
        record(m["ts"], f, ts_usec=m["ts_usec"]) for f, m in frames
    )


def v4frag_frames(ts: int = 1450000000) -> list:
    """(frame_bytes, intent) pairs for the IPv4-fragmentation fixture
    (VERDICT r11 item 4): unfragmented UDP datagrams plus datagrams
    split into a first fragment (MF set, offset 0 — L4 header present,
    ports parseable) and a non-first fragment (offset ≠ 0 — NO L4
    header on the wire; non-strict decode must flag it and surface the
    raw fragment bytes instead of garbage ports).  Intent dicts hold
    synthesis parameters only."""
    frames: list = []

    def add(f, t_off, **meta):
        base = {"ts": ts + t_off, "ts_usec": (t_off * 131) % 1000000,
                "size": len(f), "src": None, "dst": None,
                "src_port": None, "dst_port": None, "protocol": None,
                "frag": False, "plen": None}
        base.update(meta)
        frames.append((f, base))

    hosts = _V4FRAG_HOSTS
    dst = _V4FRAG_DST
    for i in range(12):  # unfragmented control traffic from all hosts
        src = hosts[i % 3]
        sp, dp = 20000 + i, 53
        pay = b"u" * (10 + i)
        f = ethernet(ipv4(udp(pay, sp, dp, src, dst), 17, src, dst))
        add(f, i, src=src, dst=dst, src_port=sp, dst_port=dp,
            protocol="UDP", plen=len(pay))
    first_piece = 32  # bytes of UDP payload in the first fragment
    for i, (src, sp, dp, whole, ident) in enumerate(_v4frag_datagrams()):
        seg = udp(whole, sp, dp, src, dst)  # header covers the WHOLE datagram
        head_l4 = seg[: 8 + first_piece]
        tail_l4 = seg[8 + first_piece :]
        # first fragment: MF=1, offset 0 — ports parse normally
        add(ethernet(ipv4(head_l4, 17, src, dst,
                          flags_frag=0x2000, ident=ident)),
            20 + 2 * i, src=src, dst=dst, src_port=sp, dst_port=dp,
            protocol="UDP", frag=True, plen=first_piece)
        # non-first fragment: offset = (8 + first_piece) / 8 units,
        # MF=0 (last) — no L4 header; whole fragment body is payload
        add(ethernet(ipv4(tail_l4, 17, src, dst,
                          flags_frag=(8 + first_piece) // 8,
                          ident=ident)),
            21 + 2 * i, src=src, dst=dst, protocol="UDP", frag=True,
            plen=len(tail_l4))
    return frames


_V4FRAG_HOSTS = ["172.16.0.1", "172.16.0.2", "172.16.0.3"]
_V4FRAG_DST = "172.16.9.9"


def _v4frag_datagrams() -> list:
    """(src, src_port, dst_port, whole_udp_payload, ip_ident) per
    fragmented datagram — the synthesis parameters shared by the
    capture builder (:func:`v4frag_frames`) and the reassembly ground
    truth (:func:`v4frag_reassembled_truth`), so the truth never
    derives from the reassembler."""
    return [
        (
            _V4FRAG_HOSTS[0] if i % 2 == 0 else _V4FRAG_HOSTS[2],
            30000 + i,
            4433,
            b"F" * (64 + i * 8),
            100 + i,
        )
        for i in range(6)
    ]


def v4frag_reassembled_truth() -> list:
    """Expected reassembled-datagram rows for :func:`v4frag_pcap` —
    one per fragmented datagram, straight from the synthesis
    parameters: the recovered UDP payload is the WHOLE datagram body
    the synthesizer split (``_v4frag_datagrams``), ports come from the
    UDP header the first fragment carries, and both fragments arrive
    (complete=True)."""
    import hashlib

    return [
        {
            "src": src,
            "dst": _V4FRAG_DST,
            "protocol": "UDP",
            "ip_ident": ident,
            "src_port": sp,
            "dst_port": dp,
            "n_fragments": 2,
            "complete": True,
            "payload_len": len(whole),
            "payload_md5": hashlib.md5(whole).hexdigest(),
        }
        for src, sp, dp, whole, ident in _v4frag_datagrams()
    ]


def v4frag_pcap(ts: int = 1450000000) -> bytes:
    frames = v4frag_frames(ts)
    return global_header(1) + b"".join(
        record(m["ts"], f, ts_usec=m["ts_usec"]) for f, m in frames
    )


def mixed_link_frames(ts: int = 1440000000) -> list:
    """(if_id, frame_bytes, intent) triples for the mixed-link pcapng
    fixture: interface 0 is EN10MB, interface 1 is LINUX_SLL(113) —
    the ``tcpdump -i any`` merge shape where a single capture carries
    packets of BOTH link types interleaved in time (VERDICT r11
    item 3).  Intent dicts hold the synthesis parameters only."""
    frames: list = []

    def add(if_id, f, t_off, **meta):
        base = {"ts": ts + t_off, "ts_usec": (t_off * 211) % 1000000,
                "size": len(f), "link": 1 if if_id == 0 else 113,
                "ether_type": "", "src": None, "dst": None,
                "src_port": None, "dst_port": None, "protocol": None}
        base.update(meta)
        frames.append((if_id, f, base))

    eth_hosts = ["192.168.7.%d" % (10 + i) for i in range(3)]
    sll_hosts = ["10.44.0.%d" % (1 + i) for i in range(3)]
    for i in range(24):
        t = i * 2
        if i % 2 == 0:  # even slots: ethernet interface
            src, dst = eth_hosts[i % 3], "192.168.7.1"
            sp, dp = 30000 + i, 443 if i % 4 else 53
            seg = (udp(b"e" * (i + 1), sp, dp, src, dst)
                   if i % 4 == 0 else tcp(b"", sp, dp))
            proto = "UDP" if i % 4 == 0 else "TCP"
            f = ethernet(ipv4(seg, 17 if proto == "UDP" else 6, src, dst))
            add(0, f, t, ether_type="IPv4", src=src, dst=dst,
                src_port=sp, dst_port=dp, protocol=proto)
        else:  # odd slots: cooked interface
            src, dst = sll_hosts[i % 3], "10.44.9.9"
            sp, dp = 41000 + i, 8080
            f = sll(ipv4(udp(b"s" * (i + 1), sp, dp, src, dst), 17,
                         src, dst),
                    vlan=(9 if i % 7 == 0 else None))
            add(1, f, t, ether_type="IPv4", src=src, dst=dst,
                src_port=sp, dst_port=dp, protocol="UDP")
    # one IPv6 flow per interface
    f = ethernet(ipv6(udp(b"66", 52001, 53), 17,
                      "2001:db8:1::a", "2001:db8:1::b"), ethertype=0x86DD)
    add(0, f, 60, ether_type="IPv6", src="2001:db8:1::a",
        dst="2001:db8:1::b", src_port=52001, dst_port=53, protocol="UDP")
    f = sll(ipv6(udp(b"67", 52002, 53), 17,
                 "2001:db8:2::a", "2001:db8:2::b"), protocol=0x86DD)
    add(1, f, 62, ether_type="IPv6", src="2001:db8:2::a",
        dst="2001:db8:2::b", src_port=52002, dst_port=53, protocol="UDP")
    # L2-only rows on both interfaces (ARP)
    arp = b"\x00\x01\x08\x00\x06\x04\x00\x01" + b"\x00" * 20
    add(0, ethernet(arp, ethertype=0x0806), 64, ether_type="arp")
    add(1, sll(arp, protocol=0x0806), 66, ether_type="arp")
    return frames


def mixed_link_pcapng(ts: int = 1440000000) -> bytes:
    """pcapng bytes for :func:`mixed_link_frames` — one section, two
    IDBs (EN10MB then SLL), EPBs interleaved in capture order."""
    out = [pcapng_shb(), pcapng_idb(link_type=1), pcapng_idb(link_type=113)]
    for if_id, f, m in mixed_link_frames(ts):
        out.append(pcapng_epb(if_id, m["ts"] * 10**6 + m["ts_usec"], f))
    return b"".join(out)


# --- alternative capture containers (pcapng / ns / BE) -----------------------
# built from the public libpcap & pcapng specs; exercised by the
# non-strict normalization front-end (pcap/formats.py)


def global_header_ns(link_type: int = 1, snaplen: int = 65535) -> bytes:
    """Nanosecond-resolution classic pcap global header (LE)."""
    return struct.pack("<IHHiIII", 0xA1B23C4D, 2, 4, 0, 0, snaplen, link_type)


def record_ns(ts_sec: int, data: bytes, ts_nsec: int = 0,
              orig_len: Optional[int] = None) -> bytes:
    if orig_len is None:
        orig_len = len(data)
    return struct.pack("<IIII", ts_sec, ts_nsec, len(data), orig_len) + data


def global_header_be(link_type: int = 1, snaplen: int = 65535,
                     ns: bool = False) -> bytes:
    """Big-endian classic pcap global header (µs or ns magic)."""
    magic = 0xA1B23C4D if ns else 0xA1B2C3D4
    return struct.pack(">IHHiIII", magic, 2, 4, 0, 0, snaplen, link_type)


def record_be(ts_sec: int, data: bytes, ts_sub: int = 0,
              orig_len: Optional[int] = None) -> bytes:
    if orig_len is None:
        orig_len = len(data)
    return struct.pack(">IIII", ts_sec, ts_sub, len(data), orig_len) + data


def _png_block(btype: int, body: bytes, e: str = "<") -> bytes:
    body = body + b"\x00" * (-len(body) % 4)
    blen = len(body) + 12
    return struct.pack(e + "II", btype, blen) + body + struct.pack(e + "I", blen)


def pcapng_shb(e: str = "<") -> bytes:
    body = struct.pack(e + "IHHq", 0x1A2B3C4D, 1, 0, -1)
    return _png_block(0x0A0D0D0A, body, e)


def pcapng_idb(link_type: int = 1, snaplen: int = 65535,
               tsresol: Optional[int] = None, e: str = "<") -> bytes:
    """Interface Description Block; tsresol = if_tsresol option byte
    (e.g. 9 → 1e-9 s units), None = default µs."""
    body = struct.pack(e + "HHI", link_type, 0, snaplen)
    if tsresol is not None:
        body += struct.pack(e + "HH", 9, 1) + bytes([tsresol]) + b"\x00\x00\x00"
        body += struct.pack(e + "HH", 0, 0)
    return _png_block(0x00000001, body, e)


def pcapng_epb(if_id: int, ts_units: int, data: bytes,
               orig_len: Optional[int] = None, e: str = "<") -> bytes:
    """Enhanced Packet Block; ts_units in the interface's resolution."""
    if orig_len is None:
        orig_len = len(data)
    body = struct.pack(e + "IIIII", if_id, ts_units >> 32,
                       ts_units & 0xFFFFFFFF, len(data), orig_len) + data
    return _png_block(0x00000006, body, e)


def pcapng_spb(data: bytes, orig_len: Optional[int] = None, e: str = "<") -> bytes:
    if orig_len is None:
        orig_len = len(data)
    return _png_block(0x00000003, struct.pack(e + "I", orig_len) + data, e)


# ---- TLS handshake fixture (operators/tls.py) ----------------------
#
# Four connections covering the extractor's branches: a classic
# TLS 1.2 hello/hello pair, a TLS 1.3 pair with RFC 8701 GREASE
# values and the ClientHello record split mid-record across TCP
# segments, a ClientHello-only flow whose handshake message itself
# spans two TLS records, and a non-TLS flow on 443 that must yield
# no row.  All truth rows derive from these spec dicts only.

_TLS_FLOWS = [
    {
        "client": "203.0.113.10", "cport": 50001,
        "server": "198.51.100.44", "sport": 443,
        "ch": {
            "version": 0x0303, "sni": "www.example.org",
            "ciphers": [0xC02F, 0xC030, 0x009E],
            "alpn": ["h2", "http/1.1"],
            "groups": [29, 23, 24], "point_formats": [0],
            # ext order on the wire: sni, groups, pf, alpn, ems
            "ext_order": [0, 10, 11, 16, 23],
            "supported_versions": None,
        },
        "sh": {
            "version": 0x0303, "cipher": 0xC02F,
            "alpn": "h2", "supported_version": None,
            "ext_order": [16],
        },
        "split": None,
    },
    {
        "client": "203.0.113.11", "cport": 50002,
        "server": "198.51.100.44", "sport": 8443,
        "ch": {
            "version": 0x0303, "sni": "data.example.net",
            "ciphers": [0x1A1A, 0x1301, 0x1302, 0x1303],  # GREASE first
            "alpn": ["h2"],
            "groups": [0x3A3A, 29, 23],                   # GREASE first
            "point_formats": [0],
            "ext_order": [0x2A2A, 0, 10, 11, 16, 43],     # GREASE first
            "supported_versions": [0x7A7A, 0x0304],       # GREASE first
        },
        "sh": {
            "version": 0x0303, "cipher": 0x1301,
            "alpn": "h2", "supported_version": 0x0304,
            "ext_order": [43, 16],
        },
        "split": [40, 33],  # TCP-segment the ClientHello mid-record
    },
    {
        "client": "203.0.113.12", "cport": 50003,
        "server": "198.51.100.45", "sport": 443,
        "ch": {
            "version": 0x0303, "sni": "lonely.example.com",
            "ciphers": [0x009C], "alpn": [],
            "groups": [23], "point_formats": [0],
            "ext_order": [0, 10, 11],
            "supported_versions": None,
        },
        "sh": None,            # no server response at all
        "split": "records",    # handshake message spans two TLS records
    },
    {
        "client": "203.0.113.13", "cport": 50004,
        "server": "198.51.100.46", "sport": 443,
        "ch": None,            # not TLS: raw bytes on 443
        "sh": None,
        "split": None,
        "raw": b"\x00NOT A TLS STREAM AT ALL, JUST BYTES\xff\xfe",
    },
]


def _tls_ext(etype: int, data: bytes) -> bytes:
    return struct.pack(">HH", etype, len(data)) + data


def _tls_client_hello_body(ch: dict) -> bytes:
    exts = b""
    for etype in ch["ext_order"]:
        if etype == 0:
            host = ch["sni"].encode("ascii")
            entry = b"\x00" + struct.pack(">H", len(host)) + host
            exts += _tls_ext(0, struct.pack(">H", len(entry)) + entry)
        elif etype == 10:
            lst = b"".join(struct.pack(">H", g) for g in ch["groups"])
            exts += _tls_ext(10, struct.pack(">H", len(lst)) + lst)
        elif etype == 11:
            pf = bytes(ch["point_formats"])
            exts += _tls_ext(11, bytes([len(pf)]) + pf)
        elif etype == 16:
            lst = b"".join(
                bytes([len(p)]) + p.encode("ascii") for p in ch["alpn"]
            )
            exts += _tls_ext(16, struct.pack(">H", len(lst)) + lst)
        elif etype == 43:
            lst = b"".join(struct.pack(">H", v) for v in ch["supported_versions"])
            exts += _tls_ext(43, bytes([len(lst)]) + lst)
        else:  # GREASE / opaque extensions: empty payload
            exts += _tls_ext(etype, b"")
    random = bytes(range(32))
    cs = b"".join(struct.pack(">H", c) for c in ch["ciphers"])
    body = (
        struct.pack(">H", ch["version"]) + random + b"\x00"
        + struct.pack(">H", len(cs)) + cs
        + b"\x01\x00"
        + struct.pack(">H", len(exts)) + exts
    )
    return b"\x01" + len(body).to_bytes(3, "big") + body


def _tls_server_hello_body(sh: dict) -> bytes:
    exts = b""
    for etype in sh["ext_order"]:
        if etype == 16:
            p = sh["alpn"].encode("ascii")
            lst = bytes([len(p)]) + p
            exts += _tls_ext(16, struct.pack(">H", len(lst)) + lst)
        elif etype == 43:
            exts += _tls_ext(43, struct.pack(">H", sh["supported_version"]))
        else:
            exts += _tls_ext(etype, b"")
    random = bytes(range(32, 64))
    body = (
        struct.pack(">H", sh["version"]) + random + b"\x00"
        + struct.pack(">H", sh["cipher"]) + b"\x00"
        + struct.pack(">H", len(exts)) + exts
    )
    return b"\x02" + len(body).to_bytes(3, "big") + body


def _tls_records(msg: bytes, split_records: bool) -> bytes:
    """Wrap one handshake message in the record layer — one record, or
    two records splitting the message mid-body."""
    if not split_records:
        return b"\x16\x03\x01" + struct.pack(">H", len(msg)) + msg
    cut = len(msg) // 2
    return (
        b"\x16\x03\x01" + struct.pack(">H", cut) + msg[:cut]
        + b"\x16\x03\x03" + struct.pack(">H", len(msg) - cut) + msg[cut:]
    )


def tls_exchange_frames(ts: int = 1480000000) -> list:
    """(frame_bytes, meta) pairs for the TLS handshake fixture."""
    frames: list = []
    t = [ts]

    def emit(src, dst, sp, dp, seg):
        f = ethernet(ipv4(tcp(seg, sp, dp), 6, src, dst))
        frames.append((f, {"ts": t[0], "ts_usec": (len(frames) * 211) % 1000000}))
        t[0] += 1

    for fl in _TLS_FLOWS:
        cli, cport, srv, sport = fl["client"], fl["cport"], fl["server"], fl["sport"]
        if fl["ch"] is None:
            emit(cli, srv, cport, sport, fl["raw"])
            continue
        stream = _tls_records(
            _tls_client_hello_body(fl["ch"]), fl["split"] == "records"
        )
        segs = (
            split_stream(stream, fl["split"])
            if isinstance(fl["split"], list)
            else [stream]
        )
        for seg in segs:
            emit(cli, srv, cport, sport, seg)
        if fl["sh"] is not None:
            emit(srv, cli, sport, cport,
                 _tls_records(_tls_server_hello_body(fl["sh"]), False))
    return frames


def tls_exchange_pcap(ts: int = 1480000000) -> bytes:
    frames = tls_exchange_frames(ts)
    return global_header(1) + b"".join(
        record(m["ts"], f, ts_usec=m["ts_usec"]) for f, m in frames
    )


def _ja3_from_spec(ch: dict) -> str:
    """The JA3 string the spec's ClientHello must fingerprint to —
    computed from the spec fields alone (GREASE 0x?A?A dropped, decimal
    dash-joined lists, comma-joined fields)."""
    def keep(vals):
        return "-".join(
            str(v) for v in vals
            if not ((v & 0x0F0F) == 0x0A0A and (v >> 8) == (v & 0xFF))
        )
    return ",".join([
        str(ch["version"]), keep(ch["ciphers"]), keep(ch["ext_order"]),
        keep(ch["groups"]),
        "-".join(str(v) for v in ch["point_formats"]),
    ])


def _ja3s_from_spec(sh: dict) -> str:
    return ",".join([
        str(sh["supported_version"] and sh["version"] or sh["version"]),
        str(sh["cipher"]),
        "-".join(str(t) for t in sh["ext_order"]),
    ])


def tls_exchange_truth() -> list:
    """Expected tls_handshakes rows for :func:`tls_exchange_pcap`,
    from the synthesis spec only."""
    import hashlib as _hl

    names = {0x0303: "TLS 1.2", 0x0304: "TLS 1.3"}
    rows = []
    for fl in _TLS_FLOWS:
        ch, sh = fl["ch"], fl["sh"]
        if ch is None:
            continue  # non-TLS flow: no row
        ja3 = _ja3_from_spec(ch)
        ja3s = _ja3s_from_spec(sh) if sh else None
        negotiated = (
            (sh["supported_version"] or sh["version"]) if sh else None
        )
        rows.append({
            "client": fl["client"],
            "server": fl["server"],
            "server_port": fl["sport"],
            "sni": ch["sni"],
            "alpn": ",".join(ch["alpn"]) if ch["alpn"] else None,
            "alpn_chosen": sh["alpn"] if sh else None,
            "tls_version": names.get(negotiated),
            "cipher_suite": sh["cipher"] if sh else None,
            "ja3": ja3,
            "ja3_md5": _hl.md5(ja3.encode()).hexdigest(),
            "ja3s": ja3s,
            "ja3s_md5": _hl.md5(ja3s.encode()).hexdigest() if ja3s else None,
            "server_hello_seen": sh is not None,
        })
    return rows


def http_corpus_truth() -> list:
    """The captures→corpus bridge's document table for
    :func:`http_exchange_pcap`: one (url, text) row per status-200
    ``text/*`` object that actually transferred a body (HEAD's
    advertised-only body excluded) — from the synthesis spec only."""
    rows = []
    flows = {i: f for i, f in enumerate(_HTTP_FLOWS)}
    for o in _http_objects_spec():
        ct = o["ctype"] or ""
        if o["status"] != 200 or not ct.startswith("text/"):
            continue
        if o["framing"] in ("head", "nobody"):
            continue
        rows.append(
            {
                "url": f"http://{o['host']}{o['target']}",
                "client": flows[o["flow"]][0],
                "text": o["body"].decode("utf-8"),
            }
        )
    return rows


# ---- scaled HTTP fixture (bench + oracle; extraction throughput) ----

def _http_tput_spec(n_conns: int = 2000) -> list:
    """Deterministic per-connection specs for the scaled HTTP
    extraction fixture: one GET per connection, bodies and framing
    varying by connection index — all truth derives from these
    parameters."""
    specs = []
    base = (
        b"the quick brown fox jumps over the lazy dog while the "
        b"corpus collector watches packet %d go by. "
    )
    for c in range(n_conns):
        body = b"".join(base % (c * 31 + i) for i in range(8 + c % 23))
        framing = ("length", "length", "length", "length", "length",
                   "length", "length", "chunked", "chunked", "close")[c % 10]
        specs.append(
            {
                "client": f"10.{(c >> 16) & 255}.{(c >> 8) & 255}.{c & 255}",
                "cport": 40000 + (c % 20000),
                "server": f"192.0.2.{c % 200}",
                "sport": 80 if c % 2 == 0 else 8080,
                "host": f"h{c % 97}.example",
                "target": f"/doc/{c}",
                "body": body,
                "framing": framing,
            }
        )
    return specs


def http_tput_frames(n_conns: int = 2000, ts: int = 1490000000) -> list:
    """(frame_bytes, meta) for the scaled HTTP fixture: request and
    response streams per connection, responses segmented at
    index-varying sizes so bodies span TCP segments."""
    frames: list = []
    t = [ts]

    def emit(src, dst, sp, dp, seg):
        f = ethernet(ipv4(tcp(seg, sp, dp), 6, src, dst))
        frames.append((f, {"ts": t[0], "ts_usec": (len(frames) * 61) % 1000000}))
        t[0] += 1

    for c, sp in enumerate(_http_tput_spec(n_conns)):
        o = {
            "method": "GET", "target": sp["target"], "host": sp["host"],
            "status": 200, "reason": "OK", "ctype": "text/plain",
            "body": sp["body"], "framing": sp["framing"],
        }
        req = _http_request_bytes(o)
        resp = _http_response_bytes(o)
        emit(sp["client"], sp["server"], sp["cport"], sp["sport"], req)
        for seg in split_stream(resp, [200 + (c % 7) * 151]):
            emit(sp["server"], sp["client"], sp["sport"], sp["cport"], seg)
    return frames


def http_tput_pcap(n_conns: int = 2000, ts: int = 1490000000) -> bytes:
    frames = http_tput_frames(n_conns, ts)
    return global_header(1) + b"".join(
        record(m["ts"], f, ts_usec=m["ts_usec"]) for f, m in frames
    )


def http_tput_truth(n_conns: int = 2000) -> list:
    """Expected http_objects rows for :func:`http_tput_pcap` — one per
    connection, from the spec parameters only."""
    import hashlib as _hl

    rows = []
    for sp in _http_tput_spec(n_conns):
        rows.append(
            {
                "client": sp["client"],
                "server": sp["server"],
                "server_port": sp["sport"],
                "url": f"http://{sp['host']}{sp['target']}",
                "status": 200,
                "body_len": len(sp["body"]),
                "body_md5": _hl.md5(sp["body"]).hexdigest(),
            }
        )
    return rows


def http_rotated_pcaps(n_files: int = 3, ts: int = 1470000000) -> list:
    """The HTTP-exchange capture ROTATED into ``n_files`` pcap byte
    blobs, cut at frame boundaries that fall MID-CONNECTION — the
    live-rotation shape: a connection's bytes span capture files, so a
    streaming consumer must carry reassembly state across
    micro-batches.  Frame order (and the global ts sequence) is the
    same as :func:`http_exchange_pcap`."""
    frames = http_exchange_frames(ts)
    n = len(frames)
    cuts = [round(n * (i + 1) / n_files) for i in range(n_files - 1)]
    chunks, prev = [], 0
    for c in cuts + [n]:
        chunks.append(frames[prev:c])
        prev = c
    return [
        global_header(1)
        + b"".join(record(m["ts"], f, ts_usec=m["ts_usec"]) for f, m in ch)
        for ch in chunks
    ]


def http_streaming_truth() -> list:
    """Expected streaming_http_objects rows for the rotated capture:
    :func:`http_exchange_truth` minus close-delimited objects (no
    knowable end on a live stream — documented limitation; framing
    'close' is last on its connection, so obj_no numbering is
    unchanged for the emitted rows)."""
    import hashlib

    rows = []
    for fi, (cli, _cport, srv, sport) in enumerate(_HTTP_FLOWS):
        i = 0
        for o in [o for o in _http_objects_spec() if o["flow"] == fi]:
            if o["framing"] == "close":
                continue
            i += 1
            body = b"" if o["framing"] in ("head", "nobody") else o["body"]
            rows.append(
                {
                    "client": cli,
                    "server": srv,
                    "server_port": sport,
                    "obj_no": i,
                    "method": o["method"],
                    "url": f"http://{o['host']}{o['target']}",
                    "status": o["status"],
                    "content_type": o["ctype"],
                    "body_len": len(body),
                    "body_md5": hashlib.md5(body).hexdigest(),
                }
            )
    return rows


def tls_rotated_pcaps(n_files: int = 2, ts: int = 1480000000) -> list:
    """The TLS fixture rotated into ``n_files`` pcap blobs with the cut
    placed BETWEEN the GREASE'd flow's two ClientHello TCP segments —
    the live-rotation shape: the hello spans capture files, so a
    streaming consumer must carry its bytes across micro-batches."""
    frames = tls_exchange_frames(ts)
    # frame 2 and 3 are the split ClientHello halves (flow 2's
    # split=[40,33]); cut after index 2 so they land in different files
    cut = 3
    chunks = [frames[:cut], frames[cut:]]
    while len(chunks) < n_files:
        chunks.append([])
    return [
        global_header(1)
        + b"".join(record(m["ts"], f, ts_usec=m["ts_usec"]) for f, m in ch)
        for ch in chunks
    ]


def tls_clienthello_truth() -> list:
    """Expected streaming_tls_clienthellos rows for the (rotated or
    whole) TLS fixture — the client-side fields only, from the spec
    dicts; the non-TLS flow yields no row."""
    import hashlib as _hl

    rows = []
    for fl in _TLS_FLOWS:
        ch = fl["ch"]
        if ch is None:
            continue
        ja3 = _ja3_from_spec(ch)
        rows.append(
            {
                "client": fl["client"],
                "server": fl["server"],
                "server_port": fl["sport"],
                "sni": ch["sni"],
                "alpn": ",".join(ch["alpn"]) if ch["alpn"] else None,
                "ja3": ja3,
                "ja3_md5": _hl.md5(ja3.encode()).hexdigest(),
            }
        )
    return rows


# ---- TCP anomaly fixture (retransmission / out-of-order triage) ----

_TCPA_FLOWS = [
    # (client, cport, server, sport, [(seq, payload_len, flags)...])
    # clean in-order flow, FIN at the end
    ("198.18.0.1", 41001, "198.18.9.9", 80,
     [(1000, 3, 0x18), (1003, 3, 0x18), (1006, 2, 0x11)]),
    # one retransmitted segment (same seq twice)
    ("198.18.0.2", 41002, "198.18.9.9", 80,
     [(2000, 3, 0x18), (2003, 4, 0x18), (2003, 4, 0x18), (2007, 2, 0x18)]),
    # one out-of-order segment (a gap filled late)
    ("198.18.0.3", 41003, "198.18.9.9", 443,
     [(3000, 3, 0x18), (3006, 3, 0x18), (3003, 3, 0x18)]),
]


def _tcp_with_seq(payload: bytes, sp: int, dp: int, seq: int, flags: int) -> bytes:
    hdr = struct.pack(">HHIIBBHHH", sp, dp, seq, 0, (5 << 4), flags, 8192, 0, 0)
    return hdr + payload


def tcp_anomaly_pcap(ts: int = 1495000000) -> bytes:
    """Capture with known TCP retransmission / out-of-order patterns —
    drives the tcp_seq/tcp_flags opt-in columns."""
    out = global_header(1)
    t = ts
    for cli, cport, srv, sport, segs in _TCPA_FLOWS:
        for seq, plen, flags in segs:
            body = bytes((seq + i) % 256 for i in range(plen))
            fr = ethernet(ipv4(_tcp_with_seq(body, cport, sport, seq, flags),
                               6, cli, srv))
            out += record(t, fr)
            t += 1
    return out


def tcp_anomaly_truth() -> list:
    """Per-flow expected anomaly counts, from the spec only: a
    RETRANSMISSION is a segment whose seq already appeared in the flow;
    an OUT-OF-ORDER segment is a first-occurrence seq below the flow's
    running maximum; has_fin mirrors the FIN bit (0x01)."""
    rows = []
    for cli, cport, srv, sport, segs in _TCPA_FLOWS:
        seen = set()
        mx = None
        n_retrans = n_ooo = 0
        for seq, _plen, _flags in segs:
            if seq in seen:
                n_retrans += 1
            else:
                if mx is not None and seq < mx:
                    n_ooo += 1
                seen.add(seq)
            mx = seq if mx is None else max(mx, seq)
        rows.append(
            {
                "src": cli, "dst": srv,
                "src_port": cport, "dst_port": sport,
                "n_segments": len(segs),
                "n_retrans": n_retrans,
                "n_ooo": n_ooo,
                "has_fin": any(f & 0x01 for _s, _p, f in segs),
            }
        )
    return rows


def tcp_anomaly_stream_truth() -> list:
    """Expected seq-ordered reassembled stream per anomaly-fixture
    flow: retransmitted duplicates dropped, segments ordered by seq —
    from the spec only."""
    import hashlib as _hl

    rows = []
    for cli, cport, srv, sport, segs in _TCPA_FLOWS:
        dedup = {}
        for seq, plen, fl in segs:
            dedup.setdefault(seq, (seq, plen))
        stream = b"".join(
            bytes((seq + i) % 256 for i in range(plen))
            for seq, plen in sorted(dedup.values())
        )
        rows.append(
            {
                "src": cli,
                "dst": srv,
                "stream_len": len(stream),
                "stream_md5": _hl.md5(stream).hexdigest(),
            }
        )
    return rows


def http_damaged_pcap(ts: int = 1470100000) -> bytes:
    """The HTTP-exchange content carried on seq-numbered TCP segments,
    then DAMAGED the way real networks damage it: one response segment
    retransmitted (flow 0) and two adjacent response segments swapped
    (flow 1).  ``http_objects(order="seq")`` must heal it back to
    :func:`http_exchange_truth`; capture order cannot."""
    frames = []
    t = [ts]

    def emit(src, dst, sp, dp, seg, seq):
        fr = ethernet(ipv4(_tcp_with_seq(seg, sp, dp, seq, 0x18), 6, src, dst))
        frames.append((fr, t[0]))
        t[0] += 1

    objs = _http_objects_spec()
    for fi, (cli, cport, srv, sport) in enumerate(_HTTP_FLOWS):
        fobjs = [o for o in objs if o["flow"] == fi]
        req = b"".join(_http_request_bytes(o) for o in fobjs)
        resp = b"".join(_http_response_bytes(o) for o in fobjs)
        emit(cli, srv, cport, sport, req, 1000)
        segrecs = []
        seq = 5000
        for seg in split_stream(resp, [100, 333, 57, 512]):
            segrecs.append((seg, seq))
            seq += len(seg)
        if fi == 0 and len(segrecs) >= 2:
            segrecs = segrecs[:2] + [segrecs[1]] + segrecs[2:]  # retransmit
        elif fi == 1 and len(segrecs) >= 3:
            segrecs[1], segrecs[2] = segrecs[2], segrecs[1]  # reorder
        for seg, sq in segrecs:
            emit(srv, cli, sport, cport, seg, sq)
    return global_header(1) + b"".join(record(tt, f) for f, tt in frames)
