"""DNS RR presentation-format drift tests (VERDICT r3 item 7).

Two layers:

1. **Inverse round-trips (always on)** — every presentation encoding
   the renderer emits (label escaping, <character-string> quoting,
   hex / base64 / base32hex fields, the NSEC type bitmap, RRSIG
   timestamps, LOC coordinates) is decoded BACK by an independent
   inverse parser written here and compared to the original wire
   bytes.  This catches the drift classes a golden can't: escaping
   bugs, alphabet mix-ups, off-by-one field slices.

2. **Differential vs dnspython (import-guarded)** — where the
   dev-only ``dnspython`` package is importable, random RRs of the
   well-specified types are rendered by both engines and compared
   after whitespace/case normalization.  The container this repo is
   developed in does not ship dnspython as a package, but some host
   images carry a vendored copy (e.g. under a cloud SDK's
   ``third_party``); ``_import_dnspython`` probes those read-only
   locations so the differential executes here too (VERDICT r5 item
   7), and only skips when no copy exists at all.  The round-trips
   above are the always-on floor either way.

Wire-format inputs are built directly from the RFCs (1035, 4034,
4255, 6698, 4398, 4701), not from the renderer itself.
"""

from __future__ import annotations

import base64
import random
import struct

import pytest
import os as _os

# soak-run multiplier: SPARK_GRAFT_FUZZ_X=50 turns the fast CI budgets
# into a deep fuzz without editing each @settings
_FX = int(_os.environ.get("SPARK_GRAFT_FUZZ_X", "1"))

# read-only locations where host images vendor a usable dnspython
# (dns/rdata.py + friends); probed only if `import dns.rdata` fails
_VENDORED_DNSPYTHON_DIRS = (
    "/usr/lib/google-cloud-sdk/lib/third_party",
)


def _import_dnspython():
    """dns.rdata via the installed package, else a vendored host copy,
    else skip.  Appending (not prepending) to sys.path keeps a real
    installation authoritative."""
    import sys

    try:
        import dns.rdata  # noqa: F401
    except ImportError:
        for cand in _VENDORED_DNSPYTHON_DIRS:
            if _os.path.isdir(_os.path.join(cand, "dns")) and cand not in sys.path:
                sys.path.append(cand)
    return pytest.importorskip(
        "dns.rdata", reason="dnspython not installed and no vendored copy"
    )

from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_pcap_spark.pcap import dns as D

# ---------------------------------------------------------------------------
# inverse parsers (independent re-implementations for round-trip)
# ---------------------------------------------------------------------------


def unescape_name(text: str) -> list:
    """Presentation name → list of raw label bytes (inverse of
    _read_name's escaping; lower-case folding is part of the renderer
    contract, so inputs here are pre-lowered)."""
    assert text.endswith(".")
    labels, cur, i = [], bytearray(), 0
    body = text[:-1]
    while i < len(body):
        c = body[i]
        if c == "\\":
            nxt = body[i + 1]
            if nxt.isdigit():
                cur.append(int(body[i + 1 : i + 4]))
                i += 4
            else:
                cur.append(ord(nxt))
                i += 2
        elif c == ".":
            labels.append(bytes(cur))
            cur = bytearray()
            i += 1
        else:
            cur.append(ord(c))
            i += 1
    if cur or body:
        labels.append(bytes(cur))
    return labels


def unquote_char_strings(text: str) -> list:
    """'"ab" "c\\"d"' → [b'ab', b'c"d'] (inverse of
    _render_char_strings)."""
    out, i = [], 0
    while i < len(text):
        assert text[i] == '"', text
        i += 1
        cur = bytearray()
        while text[i] != '"':
            if text[i] == "\\":
                if text[i + 1].isdigit():
                    cur.append(int(text[i + 1 : i + 4]))
                    i += 4
                else:
                    cur.append(ord(text[i + 1]))
                    i += 2
            else:
                cur.append(ord(text[i]))
                i += 1
        out.append(bytes(cur))
        i += 2  # closing quote + following space (or end)
    return out


def b32hex_decode(text: str) -> bytes:
    alphabet = "0123456789ABCDEFGHIJKLMNOPQRSTUV"
    acc = bits = 0
    out = bytearray()
    for ch in text:
        acc = (acc << 5) | alphabet.index(ch)
        bits += 5
        if bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    return bytes(out)


def wire_name(labels) -> bytes:
    out = b""
    for lb in labels:
        out += bytes([len(lb)]) + lb
    return out + b"\x00"


def message_with_rr(rtype: int, rdata: bytes, rrname=(b"x", b"example")) -> str:
    """Build a 1-answer response and return the rendered RR string."""
    hdr = struct.pack(">HHHHHH", 7, 0x8180, 1, 1, 0, 0)
    q = wire_name([b"q", b"example"]) + struct.pack(">HH", 1, 1)
    rr = wire_name(list(rrname)) + struct.pack(
        ">HHIH", rtype, 1, 300, len(rdata)
    ) + rdata
    msg = D.parse_message(hdr + q + rr)
    assert len(msg.answers) == 1
    return msg.answers[0]


label_bytes = st.binary(min_size=1, max_size=12)
labels_strategy = st.lists(label_bytes, min_size=1, max_size=4)


# ---------------------------------------------------------------------------
# always-on round-trips
# ---------------------------------------------------------------------------


@settings(max_examples=150 * _FX, deadline=None)
@given(labels_strategy)
def test_name_escaping_roundtrip(labels):
    """render(wire labels) → unescape → original label bytes, case-
    folded.  Exercises \\DDD, \\. and \\\\ escapes on arbitrary
    bytes."""
    data = wire_name(labels)
    text, _ = D._read_name(data, 0)
    lowered = [
        bytes(b + 32 if 0x41 <= b <= 0x5A else b for b in lb) for lb in labels
    ]
    assert unescape_name(text) == lowered


@settings(max_examples=100 * _FX, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=20), min_size=1, max_size=4))
def test_char_string_quoting_roundtrip(chunks):
    """TXT/SPF <character-string> quoting is invertible."""
    rdata = b"".join(bytes([len(c)]) + c for c in chunks)
    rendered = D._render_char_strings(rdata)
    assert unquote_char_strings(rendered) == list(chunks)


@settings(max_examples=100 * _FX, deadline=None)
@given(st.binary(min_size=4, max_size=4), st.binary(min_size=16, max_size=16))
def test_address_rendering_roundtrip(v4, v6):
    import ipaddress

    a = message_with_rr(1, v4)
    assert a.split()[-1] == ".".join(str(b) for b in v4)
    aaaa = message_with_rr(28, v6)
    assert ipaddress.IPv6Address(aaaa.split()[-1]).packed == v6


@settings(max_examples=80 * _FX, deadline=None)
@given(st.binary(min_size=1, max_size=40))
def test_hex_field_roundtrip(digest):
    """DS / SSHFP / TLSA trailing hex decodes back to the wire bytes."""
    ds = message_with_rr(43, struct.pack(">HBB", 12345, 8, 2) + digest)
    assert bytes.fromhex(ds.split()[-1]) == digest
    sshfp = message_with_rr(44, bytes([1, 2]) + digest)
    assert bytes.fromhex(sshfp.split()[-1]) == digest
    tlsa = message_with_rr(52, bytes([3, 1, 1]) + digest)
    assert bytes.fromhex(tlsa.split()[-1]) == digest


@settings(max_examples=80 * _FX, deadline=None)
@given(st.binary(min_size=1, max_size=64))
def test_base64_field_roundtrip(key):
    """DNSKEY / CERT / DHCID base64 decodes back to the wire bytes."""
    dnskey = message_with_rr(48, struct.pack(">HBB", 256, 3, 8) + key)
    assert base64.b64decode(dnskey.split()[-1]) == key
    cert = message_with_rr(37, struct.pack(">HHB", 1, 12345, 8) + key)
    assert base64.b64decode(cert.split()[-1]) == key
    dhcid = message_with_rr(49, key)
    assert base64.b64decode(dhcid.split()[-1]) == key


@settings(max_examples=60 * _FX, deadline=None)
@given(st.sets(st.sampled_from(sorted(D.TYPE_NAMES)), min_size=1, max_size=10))
def test_nsec_type_bitmap_roundtrip(types):
    """NSEC window-block bitmap renders exactly the encoded type set."""
    windows: dict = {}
    for t in types:
        windows.setdefault(t >> 8, []).append(t & 0xFF)
    bitmap = b""
    for w in sorted(windows):
        octets = bytearray(32)
        for low in windows[w]:
            octets[low >> 3] |= 0x80 >> (low & 7)
        blen = max(low >> 3 for low in windows[w]) + 1
        bitmap += bytes([w, blen]) + bytes(octets[:blen])
    rdata = wire_name([b"next", b"example"]) + bitmap
    rendered = message_with_rr(47, rdata)
    shown = set(rendered.split()[5:])  # name ttl IN NSEC next <types...>
    assert shown == {D.type_name(t) for t in types}


@settings(max_examples=80 * _FX, deadline=None)
@given(st.binary(min_size=1, max_size=30))
def test_b32hex_roundtrip(b):
    assert b32hex_decode(D._b32hex(b)) == b


@settings(max_examples=60 * _FX, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_rrsig_timestamp_roundtrip(epoch):
    import datetime

    text = D._sig_time(epoch)
    parsed = datetime.datetime.strptime(text, "%Y%m%d%H%M%S").replace(
        tzinfo=datetime.timezone.utc
    )
    assert int(parsed.timestamp()) == epoch


@settings(max_examples=60 * _FX, deadline=None)
@given(
    st.integers(min_value=-(2**31) + 1, max_value=2**31 - 1),
    st.integers(min_value=-(2**31) + 1, max_value=2**31 - 1),
)
def test_loc_coordinate_roundtrip(lat_off, lon_off):
    """LOC lat/lon invert exactly (thousandths of arc-seconds)."""

    def inverse(text: str, pos_h: str) -> int:
        deg, minute, sec, hemi = text.split()
        ms = round(float(sec) * 1000)
        total = int(deg) * 3_600_000 + int(minute) * 60_000 + ms
        return total if hemi == pos_h else -total

    lat = D._loc_coord(lat_off + (1 << 31), "N", "S")
    lon = D._loc_coord(lon_off + (1 << 31), "E", "W")
    assert inverse(lat, "N") == lat_off
    assert inverse(lon, "E") == lon_off


# ---------------------------------------------------------------------------
# differential vs dnspython (runs only where the dev extra is present)
# ---------------------------------------------------------------------------

# types whose presentation form is fully pinned by RFC and directly
# comparable after whitespace collapse + hex case-fold
_DIFF_TYPES = {
    1: "A", 2: "NS", 5: "CNAME", 6: "SOA", 12: "PTR", 15: "MX",
    16: "TXT", 17: "RP", 18: "AFSDB", 28: "AAAA", 33: "SRV", 36: "KX",
    39: "DNAME", 43: "DS", 44: "SSHFP", 52: "TLSA", 99: "SPF",
}


def _random_rdata(rnd: random.Random, rtype: int) -> bytes:
    name = wire_name([b"t%d" % rnd.randrange(99), b"example", b"com"])
    if rtype == 1:
        return bytes(rnd.randrange(256) for _ in range(4))
    if rtype == 28:
        return bytes(rnd.randrange(256) for _ in range(16))
    if rtype in (2, 5, 12, 39):
        return name
    if rtype in (15, 18, 36):
        return struct.pack(">H", rnd.randrange(65536)) + name
    if rtype == 6:
        return (
            wire_name([b"mname", b"example"])
            + wire_name([b"rname", b"example"])
            + struct.pack(
                ">IIIII", *(rnd.randrange(2**31) for _ in range(5))
            )
        )
    if rtype in (16, 99):
        chunk = bytes(rnd.randrange(32, 127) for _ in range(rnd.randrange(1, 20)))
        return bytes([len(chunk)]) + chunk
    if rtype == 17:
        return wire_name([b"mbox", b"example"]) + wire_name([b"txt", b"example"])
    if rtype == 33:
        return struct.pack(">HHH", *(rnd.randrange(65536) for _ in range(3))) + name
    if rtype == 43:
        return struct.pack(">HBB", rnd.randrange(65536), 8, 2) + bytes(
            rnd.randrange(256) for _ in range(32)
        )
    if rtype == 44:
        return bytes([1, 2]) + bytes(rnd.randrange(256) for _ in range(20))
    if rtype == 52:
        return bytes([3, 1, 1]) + bytes(rnd.randrange(256) for _ in range(32))
    raise AssertionError(rtype)


# unsupported-by-the-renderer type codes exercised through the RFC
# 3597 generic fallback (VERDICT r4 item 7): X25(19), APL(42),
# HIP(55), L32(105), EUI48(108), TYPE62001 (private-use) — none are
# in dns.py's rendered-type set, so all must fall through to
# `\# <len> <hex>`.
_UNSUPPORTED_TYPES = (19, 42, 55, 105, 108, 62001)


@settings(max_examples=60 * _FX, deadline=None)
@given(
    st.sampled_from(_UNSUPPORTED_TYPES),
    st.binary(min_size=0, max_size=48),
)
def test_rfc3597_generic_rendering_roundtrip(rtype, rdata):
    """Every unsupported type renders as the RFC 3597 generic form and
    the hex decodes back to the wire rdata exactly."""
    rendered = message_with_rr(rtype, rdata)
    fields = rendered.split()
    # name ttl IN TYPE<code> \# <len> <hex>
    assert fields[3] == f"TYPE{rtype}" or fields[3] == D.type_name(rtype)
    gi = fields.index("\\#")
    assert int(fields[gi + 1]) == len(rdata)
    hexpart = "".join(fields[gi + 2:])
    assert bytes.fromhex(hexpart) == rdata


def test_differential_vs_dnspython_unknown_types():
    """RFC 3597 fallback vs dnspython's unknown-type presentation.

    dnspython KNOWS some of these types (NAPTR, APL, ...) and renders
    their structured form, so the comparison goes through dnspython's
    GenericRdata path explicitly: dns.rdata.GenericRdata renders
    exactly `\\# <len> <hex>` for any type.  Documented divergence:
    none for the generic form itself — both engines hex-encode the
    raw rdata; our hex is UPPERCASE (dnspython lowercases), folded by
    the case-insensitive compare, and for types dnspython has a
    structured renderer for (e.g. NAPTR) the PRESENTATIONS legitimately
    differ — the reference's dnsjava rrToString has the same property,
    which is why those types are outside the pinned-diff set."""
    _import_dnspython()
    import dns.name
    import dns.rdata
    import dns.rdataclass

    def norm_generic(s: str):
        """(length, hex-bytes) of an RFC 3597 generic rendering.  §5
        allows whitespace WITHIN the hex data (older dnspython chunks
        it into 32-char groups; modern dnspython and this repo emit it
        unchunked), so the hex is joined before comparison."""
        f = s.split()
        assert f[0] == "\\#", s
        return (int(f[1]), "".join(f[2:]).lower())

    rnd = random.Random(20260814)
    divergences = []
    for rtype in _UNSUPPORTED_TYPES:
        for _ in range(25):
            rdata = bytes(rnd.randrange(256) for _ in range(rnd.randrange(48)))
            ours = message_with_rr(rtype, rdata).split(None, 4)[4]
            theirs = dns.rdata.GenericRdata(
                dns.rdataclass.IN, rtype, rdata
            ).to_text(origin=dns.name.root, relativize=False)
            if norm_generic(ours) != norm_generic(theirs):
                divergences.append((rtype, ours, theirs))
    assert not divergences, divergences[:10]


def test_differential_vs_dnspython():
    dns_rdata = _import_dnspython()
    import dns.name
    import dns.rdataclass
    import dns.rdatatype

    rnd = random.Random(20260814)
    divergences = []
    for rtype, tname in sorted(_DIFF_TYPES.items()):
        for _ in range(25):
            rdata = _random_rdata(rnd, rtype)
            ours = message_with_rr(rtype, rdata).split(None, 4)[4]
            theirs = dns_rdata.from_wire(
                dns.rdataclass.IN, rtype, rdata, 0, len(rdata)
            ).to_text(origin=dns.name.root, relativize=False)
            norm_o = " ".join(ours.lower().split())
            norm_t = " ".join(theirs.lower().split())
            if norm_o != norm_t:
                divergences.append((tname, ours, theirs))
    assert not divergences, divergences[:10]


# ---------------------------------------------------------------------------
# SVCB / HTTPS (RFC 9460) — beyond the reference's dnsjava-2 pin, which
# predates the type; vectors built from the RFC's wire format directly
# ---------------------------------------------------------------------------


def _svcparam(key: int, val: bytes) -> bytes:
    return struct.pack(">HH", key, len(val)) + val


def test_svcb_alias_and_port_vectors():
    # AliasMode: SvcPriority 0, no params (RFC 9460 D.1)
    rdata = struct.pack(">H", 0) + wire_name([b"foo", b"example", b"com"])
    out = message_with_rr(64, rdata)
    assert " SVCB " in out
    assert out.endswith("0 foo.example.com.")
    # ServiceMode with a port param (D.2)
    rdata = (
        struct.pack(">H", 16)
        + wire_name([b"foo", b"example", b"com"])
        + _svcparam(3, struct.pack(">H", 53))
    )
    out = message_with_rr(65, rdata)
    assert " HTTPS " in out
    assert out.endswith("16 foo.example.com. port=53")


def test_svcb_alpn_mandatory_hints_ech():
    rdata = (
        struct.pack(">H", 1)
        + wire_name([b"svc", b"example"])
        + _svcparam(0, struct.pack(">HH", 1, 4))          # mandatory=alpn,ipv4hint
        + _svcparam(1, b"\x02h2\x05h3-19")                # alpn=h2,h3-19
        + _svcparam(2, b"")                               # no-default-alpn
        + _svcparam(4, bytes([192, 0, 2, 1, 192, 0, 2, 2]))
        + _svcparam(5, b"\x00\x2dECHCONFIG")
        + _svcparam(6, bytes(15) + b"\x01")
    )
    out = message_with_rr(65, rdata)
    assert "mandatory=alpn,ipv4hint" in out
    assert "alpn=h2,h3-19" in out
    assert "no-default-alpn" in out
    assert "ipv4hint=192.0.2.1,192.0.2.2" in out
    assert "ech=" + base64.b64encode(b"\x00\x2dECHCONFIG").decode() in out
    assert out.endswith("ipv6hint=::1")


def test_svcb_unknown_key_and_escaping():
    # unknown key with a value needing \ddd escapes (RFC 9460 D.2's
    # key667 motif); commas inside values must escape so list params
    # stay unambiguous
    rdata = (
        struct.pack(">H", 1)
        + wire_name([b"x"])
        + _svcparam(667, b"hello\xd2qoo,z")
    )
    assert message_with_rr(64, rdata).endswith("key667=hello\\210qoo\\044z")
    # unknown key, empty value → bare key name
    rdata = struct.pack(">H", 1) + wire_name([b"x"]) + _svcparam(668, b"")
    assert message_with_rr(64, rdata).endswith("key668")


def test_svcb_odd_length_mandatory_falls_back():
    # ADVICE r9: an odd-length 'mandatory' value must not escape
    # iter_unpack as struct.error (the caller's broad except would then
    # null EVERY parsed DNS field for the message); it renders in the
    # generic escaped form instead, like any other malformed value.
    rdata = (
        struct.pack(">H", 1)
        + wire_name([b"x"])
        + _svcparam(0, b"\x00\x01\x02")
    )
    out = message_with_rr(65, rdata)
    assert out.endswith("mandatory=\\000\\001\\002")
    # and a well-formed even-length value still renders as key names
    rdata = struct.pack(">H", 1) + wire_name([b"x"]) + _svcparam(
        0, struct.pack(">H", 3)
    )
    assert message_with_rr(65, rdata).endswith("mandatory=port")


def test_svcb_vlen_clamped_to_rdata_boundary():
    # ADVICE r9: a malformed vlen pointing past the rdata end must not
    # render bytes of SUBSEQUENT message content into the param value.
    inner = struct.pack(">H", 1) + wire_name([b"x"]) + struct.pack(
        ">HH", 667, 64  # vlen 64 but only 2 value bytes inside rdata
    ) + b"ab"
    data = inner + b"FOREIGNBYTES"
    out = D._render_rdata(data, 64, 0, len(inner))
    assert out.endswith("key667=ab")
    assert "FOREIGN" not in out


def test_svcb_truncated_params_stop_cleanly():
    # a trailing half-header (2 bytes) after a valid param must not
    # raise; rendering stops at the last whole param
    rdata = (
        struct.pack(">H", 1)
        + wire_name([b"x"])
        + _svcparam(3, struct.pack(">H", 443))
        + b"\x00"  # garbage tail
    )
    assert message_with_rr(65, rdata).endswith("port=443")
