"""Minimal DNS wire-format (RFC 1035) message parser.

Replaces the reference's dnsjava dependency (DnsPcapReader.java:40-52)
with a small self-contained parser.  Output conventions:

* ``qname``: lower-cased, absolute (trailing dot kept) — parity with
  the reference [DnsPcapReader.java:47,68-74].
* flag / opcode / rcode mnemonics follow standard RFC names (same set
  dnsjava prints).
* resource records render as single-spaced presentation strings
  ``name ttl CLASS TYPE rdata`` — equivalent to dnsjava's tab-separated
  output *after* the reference's whitespace normalization
  [DnsPcapReader.java:98-107]; we emit the normalized form directly.
  Unknown RR types use the RFC 3597 ``\\# len hex`` generic form.
"""

from __future__ import annotations

import base64
import datetime
import ipaddress
import struct
from dataclasses import dataclass, field
from typing import List

MAX_NAME_POINTERS = 64  # compression-pointer loop guard

TYPE_NAMES = {
    1: "A", 2: "NS", 5: "CNAME", 6: "SOA", 12: "PTR", 13: "HINFO",
    15: "MX", 16: "TXT", 17: "RP", 18: "AFSDB", 24: "SIG", 25: "KEY",
    28: "AAAA", 29: "LOC", 33: "SRV", 35: "NAPTR", 36: "KX", 37: "CERT",
    39: "DNAME", 41: "OPT", 43: "DS", 44: "SSHFP", 45: "IPSECKEY",
    46: "RRSIG", 49: "DHCID",
    47: "NSEC", 48: "DNSKEY", 50: "NSEC3", 51: "NSEC3PARAM",
    52: "TLSA", 59: "CDS", 60: "CDNSKEY", 64: "SVCB", 65: "HTTPS",
    99: "SPF", 250: "TSIG",
    251: "IXFR", 252: "AXFR", 255: "ANY", 256: "URI", 257: "CAA",
}

# RFC 9460 SvcParam key registry (presentation names)
SVC_PARAM_KEYS = {
    0: "mandatory", 1: "alpn", 2: "no-default-alpn", 3: "port",
    4: "ipv4hint", 5: "ech", 6: "ipv6hint", 7: "dohpath",
}

CLASS_NAMES = {1: "IN", 3: "CH", 4: "HS", 254: "NONE", 255: "ANY"}

OPCODE_NAMES = {0: "QUERY", 1: "IQUERY", 2: "STATUS", 4: "NOTIFY", 5: "UPDATE"}

RCODE_NAMES = {
    0: "NOERROR", 1: "FORMERR", 2: "SERVFAIL", 3: "NXDOMAIN",
    4: "NOTIMP", 5: "REFUSED", 6: "YXDOMAIN", 7: "YXRRSET",
    8: "NXRRSET", 9: "NOTAUTH", 10: "NOTZONE", 16: "BADVERS",
}

# header flag bits in print order (dnsjava printFlags order: bit order)
FLAG_BITS = [
    (0x8000, "qr"),
    (0x0400, "aa"),
    (0x0200, "tc"),
    (0x0100, "rd"),
    (0x0080, "ra"),
    (0x0020, "ad"),
    (0x0010, "cd"),
]


class DnsParseError(ValueError):
    pass


def type_name(t: int) -> str:
    return TYPE_NAMES.get(t, f"TYPE{t}")


def class_name(c: int) -> str:
    return CLASS_NAMES.get(c, f"CLASS{c}")


# label-escape machinery: plain bytes pass through, '.'/'\' get
# backslash-escaped, non-printables render as \DDD (presentation form)
_PLAIN_LABEL_BYTES = (
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_"
)
_ESCAPE_TABLE = [
    "\\." if b == 0x2E else ("\\\\" if b == 0x5C else
     (chr(b) if 0x20 <= b < 0x7F else "\\%03d" % b))
    for b in range(256)
]


def _read_name(data: bytes, pos: int) -> tuple:
    """Decode a (possibly compressed) domain name.

    Returns (name_text_with_trailing_dot, next_pos).  The name is
    lower-cased; root renders as '.'.
    """
    labels: List[str] = []
    jumps = 0
    next_pos = -1
    while True:
        if pos >= len(data):
            raise DnsParseError("name runs past message end")
        length = data[pos]
        if length & 0xC0 == 0xC0:  # compression pointer
            if pos + 2 > len(data):
                raise DnsParseError("truncated compression pointer")
            target = struct.unpack_from(">H", data, pos)[0] & 0x3FFF
            if next_pos < 0:
                next_pos = pos + 2
            jumps += 1
            if jumps > MAX_NAME_POINTERS:
                raise DnsParseError("compression pointer loop")
            pos = target
            continue
        if length & 0xC0:
            raise DnsParseError(f"bad label length byte 0x{length:02x}")
        pos += 1
        if length == 0:
            break
        if pos + length > len(data):
            raise DnsParseError("label runs past message end")
        raw = data[pos : pos + length]
        # fast path: plain hostname bytes (the overwhelmingly common
        # case) decode directly; anything else goes through the escape
        # table (dots/backslashes/non-printables, presentation format)
        if not raw.translate(None, _PLAIN_LABEL_BYTES):
            labels.append(raw.decode("ascii").lower())
        else:
            labels.append("".join(map(_ESCAPE_TABLE.__getitem__, raw)).lower())
        pos += length
    name = ".".join(labels) + "." if labels else "."
    return name, (next_pos if next_pos >= 0 else pos)


def _render_char_strings(rdata: bytes) -> str:
    """<character-string>* → space-separated quoted strings (TXT/SPF)."""
    out = []
    pos = 0
    while pos < len(rdata):
        ln = rdata[pos]
        pos += 1
        chunk = rdata[pos : pos + ln]
        pos += ln
        esc = "".join(
            ("\\" + chr(b)) if b in (0x22, 0x5C) else
            (chr(b) if 0x20 <= b < 0x7F else f"\\{b:03d}")
            for b in chunk
        )
        out.append(f'"{esc}"')
    return " ".join(out)


def _esc_value(raw: bytes) -> str:
    """RFC 9460 value escaping: printable chars pass through, '\\' ','
    '"' and non-printing bytes as ``\\ddd`` — keeps list separators
    unambiguous without quoting."""
    return "".join(
        chr(b) if 0x21 <= b < 0x7F and b not in (0x2C, 0x5C, 0x22) else f"\\{b:03d}"
        for b in raw
    )


def _render_svcparam(key: int, val: bytes) -> str:
    """One RFC 9460 SvcParam in presentation form."""
    name = SVC_PARAM_KEYS.get(key, f"key{key}")
    if key == 0 and len(val) % 2 == 0:  # mandatory: list of key names
        # Odd-length values fall through to the generic escaped form —
        # iter_unpack would raise struct.error and the caller's broad
        # except would drop every parsed DNS field for the message.
        keys = [
            SVC_PARAM_KEYS.get(k, f"key{k}")
            for (k,) in struct.iter_unpack(">H", val)
        ]
        return f"{name}={','.join(keys)}"
    if key == 1:  # alpn: <character-string> list, comma-joined
        ids, pos = [], 0
        while pos < len(val):
            ln = val[pos]
            ids.append(_esc_value(val[pos + 1 : pos + 1 + ln]))
            pos += 1 + ln
        return f"{name}={','.join(ids)}"
    if key == 2:  # no-default-alpn: no value
        return name
    if key == 3 and len(val) == 2:  # port
        return f"{name}={struct.unpack('>H', val)[0]}"
    if key == 4 and len(val) % 4 == 0 and val:  # ipv4hint
        quads = [
            ".".join(str(b) for b in val[i : i + 4])
            for i in range(0, len(val), 4)
        ]
        return f"{name}={','.join(quads)}"
    if key == 5:  # ech: opaque base64
        return f"{name}={base64.b64encode(val).decode('ascii')}"
    if key == 6 and len(val) % 16 == 0 and val:  # ipv6hint
        addrs = [
            str(ipaddress.IPv6Address(val[i : i + 16]))
            for i in range(0, len(val), 16)
        ]
        return f"{name}={','.join(addrs)}"
    if not val:
        return name
    return f"{name}={_esc_value(val)}"


def _render_rdata(data: bytes, rtype: int, rd_start: int, rd_len: int) -> str:
    """Presentation-format rdata for common RR types; RFC 3597 generic
    form otherwise.  Names inside rdata honor message compression."""
    rdata = data[rd_start : rd_start + rd_len]
    if rtype == 1 and rd_len == 4:  # A
        return ".".join(str(b) for b in rdata)
    if rtype == 28 and rd_len == 16:  # AAAA
        return str(ipaddress.IPv6Address(rdata))
    if rtype in (2, 5, 12, 39):  # NS / CNAME / PTR / DNAME
        return _read_name(data, rd_start)[0]
    if rtype == 15 and rd_len >= 3:  # MX
        pref = struct.unpack_from(">H", data, rd_start)[0]
        target, _ = _read_name(data, rd_start + 2)
        return f"{pref} {target}"
    if rtype == 6:  # SOA
        mname, p = _read_name(data, rd_start)
        rname, p = _read_name(data, p)
        if p + 20 <= rd_start + rd_len:
            serial, refresh, retry, expire, minimum = struct.unpack_from(">IIIII", data, p)
            return f"{mname} {rname} {serial} {refresh} {retry} {expire} {minimum}"
    if rtype == 33 and rd_len >= 7:  # SRV
        prio, weight, port = struct.unpack_from(">HHH", data, rd_start)
        target, _ = _read_name(data, rd_start + 6)
        return f"{prio} {weight} {port} {target}"
    if rtype in (16, 99):  # TXT / SPF
        return _render_char_strings(rdata)
    if rtype == 257 and rd_len >= 2:  # CAA
        flags = rdata[0]
        tag_len = rdata[1]
        tag = rdata[2 : 2 + tag_len].decode("ascii", "replace")
        value = rdata[2 + tag_len :].decode("ascii", "replace")
        return f'{flags} {tag} "{value}"'
    if rtype == 35 and rd_len >= 4:  # NAPTR
        order, pref = struct.unpack_from(">HH", data, rd_start)
        pos = rd_start + 4
        strs = []
        for _ in range(3):  # flags, service, regexp <character-string>s
            if pos >= rd_start + rd_len:
                break
            ln = data[pos]
            strs.append(_render_char_strings(data[pos : pos + 1 + ln]))
            pos += 1 + ln
        repl, _ = _read_name(data, pos)
        return f"{order} {pref} {' '.join(strs)} {repl}"
    if rtype in (36, 18) and rd_len >= 3:  # KX / AFSDB (same shape as MX)
        pref = struct.unpack_from(">H", data, rd_start)[0]
        target, _ = _read_name(data, rd_start + 2)
        return f"{pref} {target}"
    if rtype == 13:  # HINFO: cpu + os <character-string>s
        return _render_char_strings(rdata)
    if rtype == 17:  # RP: mbox-dname txt-dname
        mbox, p = _read_name(data, rd_start)
        txt, _ = _read_name(data, p)
        return f"{mbox} {txt}"
    if rtype in (48, 60, 25) and rd_len >= 4:  # DNSKEY / CDNSKEY / KEY
        flags, proto, alg = struct.unpack_from(">HBB", data, rd_start)
        key = base64.b64encode(rdata[4:]).decode("ascii")
        return f"{flags} {proto} {alg} {key}"
    if rtype in (43, 59) and rd_len >= 4:  # DS / CDS
        keytag, alg, digtype = struct.unpack_from(">HBB", data, rd_start)
        return f"{keytag} {alg} {digtype} {rdata[4:].hex().upper()}"
    if rtype == 44 and rd_len >= 2:  # SSHFP
        return f"{rdata[0]} {rdata[1]} {rdata[2:].hex().upper()}"
    if rtype == 52 and rd_len >= 3:  # TLSA
        return f"{rdata[0]} {rdata[1]} {rdata[2]} {rdata[3:].hex().upper()}"
    if rtype in (46, 24) and rd_len >= 18:  # RRSIG / SIG
        covered, alg, labels_n, origttl, expire, incept, keytag = struct.unpack_from(
            ">HBBIIIH", data, rd_start
        )
        signer, p = _read_name(data, rd_start + 18)
        sig = base64.b64encode(data[p : rd_start + rd_len]).decode("ascii")
        return (
            f"{type_name(covered)} {alg} {labels_n} {origttl} "
            f"{_sig_time(expire)} {_sig_time(incept)} {keytag} {signer} {sig}"
        )
    if rtype == 47 and rd_len >= 1:  # NSEC: next name + type bitmap
        nxt, p = _read_name(data, rd_start)
        types = _render_type_bitmap(data[p : rd_start + rd_len])
        return f"{nxt} {types}" if types else nxt
    if rtype in (50, 51) and rd_len >= 5:  # NSEC3 / NSEC3PARAM
        alg, flags, iters = struct.unpack_from(">BBH", data, rd_start)
        slen = rdata[4]
        salt = rdata[5 : 5 + slen].hex().upper() if slen else "-"
        head = f"{alg} {flags} {iters} {salt}"
        if rtype == 51:
            return head
        pos = 5 + slen
        hlen = rdata[pos] if pos < rd_len else 0
        nxt = _b32hex(rdata[pos + 1 : pos + 1 + hlen])
        types = _render_type_bitmap(rdata[pos + 1 + hlen :])
        return f"{head} {nxt} {types}" if types else f"{head} {nxt}"
    if rtype == 29 and rd_len >= 16 and rdata[0] == 0:  # LOC (RFC 1876 v0)
        size, hp, vp = rdata[1], rdata[2], rdata[3]
        lat, lon, alt = struct.unpack_from(">III", data, rd_start + 4)
        return (
            f"{_loc_coord(lat, 'N', 'S')} {_loc_coord(lon, 'E', 'W')} "
            f"{(alt - 10_000_000) / 100:.2f}m "
            f"{_loc_prec(size)} {_loc_prec(hp)} {_loc_prec(vp)}"
        )
    if rtype == 37 and rd_len >= 5:  # CERT (RFC 4398)
        ctype, keytag = struct.unpack_from(">HH", data, rd_start)
        alg = rdata[4]
        cert = base64.b64encode(rdata[5:]).decode("ascii")
        return f"{ctype} {keytag} {alg} {cert}"
    if rtype == 49 and rd_len >= 1:  # DHCID (RFC 4701): opaque base64
        return base64.b64encode(rdata).decode("ascii")
    if rtype in (64, 65) and rd_len >= 3:  # SVCB / HTTPS (RFC 9460)
        # Beyond the reference: dnsjava 2.x (the pin the reference
        # builds against, 2011) predates RFC 9460 and would emit the
        # \# generic form for these — but type 65 queries dominate
        # modern resolver traffic, so they render properly here.
        # SvcPriority TargetName [key[=value] ...]; target name honors
        # compression like every other embedded name.
        prio = struct.unpack_from(">H", data, rd_start)[0]
        target, p = _read_name(data, rd_start + 2)
        parts = [str(prio), target]
        end = rd_start + rd_len
        while p + 4 <= end:
            key, vlen = struct.unpack_from(">HH", data, p)
            # Clamp the value slice to the rdata boundary: a malformed
            # vlen must not render bytes from subsequent RRs.
            parts.append(
                _render_svcparam(key, data[p + 4 : min(p + 4 + vlen, end)])
            )
            p += 4 + vlen
        return " ".join(parts)
    if rtype == 45 and rd_len >= 3:  # IPSECKEY (RFC 4025)
        prec, gw_type, alg = rdata[0], rdata[1], rdata[2]
        pos = rd_start + 3
        if gw_type == 0:
            gw = "."
        elif gw_type == 1 and rd_len >= 7:
            gw = ".".join(str(b) for b in rdata[3:7])
            pos += 4
        elif gw_type == 2 and rd_len >= 19:
            gw = str(ipaddress.IPv6Address(rdata[3:19]))
            pos += 16
        else:
            gw, pos = _read_name(data, pos)
        key = base64.b64encode(data[pos : rd_start + rd_len]).decode("ascii")
        return f"{prec} {gw_type} {alg} {gw} {key}" if key else f"{prec} {gw_type} {alg} {gw}"
    # generic / unknown (RFC 3597)
    if rd_len == 0:
        return "\\# 0"
    return f"\\# {rd_len} " + rdata.hex().upper()


_B32HEX = "0123456789ABCDEFGHIJKLMNOPQRSTUV"


def _b32hex(b: bytes) -> str:
    """Base32 with the extended-hex alphabet, unpadded (RFC 4648 §7) —
    the NSEC3 next-hashed-owner presentation form."""
    out, acc, bits = [], 0, 0
    for byte in b:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= 5:
            bits -= 5
            out.append(_B32HEX[(acc >> bits) & 0x1F])
    if bits:
        out.append(_B32HEX[(acc << (5 - bits)) & 0x1F])
    return "".join(out)


def _loc_coord(v: int, pos_h: str, neg_h: str) -> str:
    """RFC 1876 lat/lon: thousandths of an arc second, offset 2^31."""
    d = v - (1 << 31)
    hemi = pos_h if d >= 0 else neg_h
    d = abs(d)
    deg, rem = divmod(d, 3_600_000)
    minute, msec = divmod(rem, 60_000)
    return f"{deg} {minute} {msec / 1000:.3f} {hemi}"


def _loc_prec(octet: int) -> str:
    """RFC 1876 size/precision: 4-bit mantissa × 10^(4-bit exp) cm."""
    cm = (octet >> 4) * 10 ** (octet & 0x0F)
    m = cm / 100
    return f"{int(m)}m" if m == int(m) else f"{m:.2f}m"


def _sig_time(epoch: int) -> str:
    """RRSIG timestamps in presentation form (YYYYMMDDHHMMSS, UTC)."""
    return datetime.datetime.fromtimestamp(
        epoch, tz=datetime.timezone.utc
    ).strftime("%Y%m%d%H%M%S")


def _render_type_bitmap(bitmap: bytes) -> str:
    """NSEC window-block type bitmap → space-separated type names."""
    out = []
    pos = 0
    while pos + 2 <= len(bitmap):
        window, blen = bitmap[pos], bitmap[pos + 1]
        pos += 2
        for i, octet in enumerate(bitmap[pos : pos + blen]):
            for bit in range(8):
                if octet & (0x80 >> bit):
                    out.append(type_name(window * 256 + i * 8 + bit))
        pos += blen
    return " ".join(out)


@dataclass
class DnsMessage:
    query_id: int = 0
    flags_text: str = ""
    qr: bool = False
    opcode_text: str = ""
    rcode_text: str = ""
    qname: str = ""
    qtype: int = 0  # 0 when no question [DnsPcapReader.java:76-80]
    qtype_text: str = ""
    answers: List[str] = field(default_factory=list)
    authority: List[str] = field(default_factory=list)
    additional: List[str] = field(default_factory=list)


_FLAGS_TEXT_CACHE: dict = {}


def parse_message(data: bytes) -> DnsMessage:
    """Parse a full DNS message (header + question + 3 RR sections)."""
    if len(data) < 12:
        raise DnsParseError("message shorter than DNS header")
    qid, flags, qd, an, ns, ar = struct.unpack_from(">HHHHHH", data, 0)
    msg = DnsMessage(query_id=qid)
    msg.qr = bool(flags & 0x8000)
    ft = _FLAGS_TEXT_CACHE.get(flags)
    if ft is None:  # bounded: ≤ 2^16 distinct flag words
        ft = " ".join(name for bit, name in FLAG_BITS if flags & bit)
        _FLAGS_TEXT_CACHE[flags] = ft
    msg.flags_text = ft
    opcode = (flags >> 11) & 0xF
    msg.opcode_text = OPCODE_NAMES.get(opcode, f"RESERVED{opcode}")
    rcode = flags & 0xF
    msg.rcode_text = RCODE_NAMES.get(rcode, f"RESERVED{rcode}")

    pos = 12
    if qd > 0:
        qname, pos = _read_name(data, pos)
        if pos + 4 > len(data):
            raise DnsParseError("truncated question")
        qtype, _qclass = struct.unpack_from(">HH", data, pos)
        pos += 4
        msg.qname = qname
        msg.qtype = qtype
        msg.qtype_text = type_name(qtype)
        for _ in range(qd - 1):  # rare multi-question: skip the rest
            _, pos = _read_name(data, pos)
            pos += 4
    # else: qtype stays 0 (reference parity)

    def read_section(count: int) -> List[str]:
        nonlocal pos
        out: List[str] = []
        for _ in range(count):
            name, p = _read_name(data, pos)
            if p + 10 > len(data):
                raise DnsParseError("truncated RR header")
            rtype, rclass, ttl, rd_len = struct.unpack_from(">HHIH", data, p)
            p += 10
            if p + rd_len > len(data):
                raise DnsParseError("truncated RR rdata")
            if rtype == 41:  # OPT pseudo-RR: render dnsjava-style summary
                payload = rclass
                xrcode = (ttl >> 24) & 0xFF
                version = (ttl >> 16) & 0xFF
                zflags = ttl & 0xFFFF
                out.append(
                    f"{name} {ttl} CLASS{payload} OPT ; payload {payload}, "
                    f"xrcode {xrcode}, version {version}, flags {zflags}"
                )
            else:
                rdata_text = _render_rdata(data, rtype, p, rd_len)
                out.append(
                    f"{name} {ttl} {class_name(rclass)} {type_name(rtype)} {rdata_text}"
                )
            pos = p + rd_len
        return out

    msg.answers = read_section(an)
    msg.authority = read_section(ns)
    msg.additional = read_section(ar)
    return msg
