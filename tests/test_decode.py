"""Unit tests for the pure-Python decode kernel.

Mirrors the reference's PcapReaderTest cases (payload slicing,
link-type mapping, IP-start offsets) plus golden decode of a DNS
exchange and format-error semantics.  See SURVEY.md §5.
"""

import gzip
import os
import struct

import pytest

from hadoop_pcap_spark.pcap import decode as D
from hadoop_pcap_spark.pcap import synth as S
from hadoop_pcap_spark.pcap.decode import DecodeOptions, PcapFormatError, decode_pcap

REF_FIXTURE = "/root/reference/hadoop-pcap-lib/src/test/resources/test.pcap"


def rows(data, **kw):
    return list(decode_pcap(data, opts=DecodeOptions(**kw)))


# --- format-level semantics [PcapReader.java:93-112] -------------------------

def test_empty_file_yields_zero_rows_no_error():
    assert rows(b"") == []


def test_bad_magic_raises():
    with pytest.raises(PcapFormatError):
        rows(b"\x00" * 24)


def test_big_endian_magic_rejected():
    data = struct.pack(">IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1)
    with pytest.raises(PcapFormatError):
        rows(data)


def test_unsupported_link_type_raises():
    data = S.global_header(link_type=42)
    with pytest.raises(PcapFormatError):
        rows(data)


def test_permissive_mode_swallows_errors():
    assert rows(b"\x00" * 24, mode="PERMISSIVE") == []
    assert rows(S.global_header(link_type=42), mode="PERMISSIVE") == []


def test_truncated_last_record_yields_ts_only():
    data = S.global_header(1) + struct.pack("<IIII", 111, 0, 100, 100) + b"\x00" * 10
    out = rows(data)
    assert len(out) == 1
    assert out[0]["ts"] == 111
    assert "size" not in out[0] and "src" not in out[0]


def test_header_only_file_yields_zero_rows():
    assert rows(S.global_header(1)) == []


# --- link-type / IP offset semantics [PcapReaderTest.java:33-108] -------------

def _ipv4_udp_frame():
    return S.ipv4(S.udp(b"hi", 1111, 2222, "10.0.0.1", "10.0.0.2"),
                  17, "10.0.0.1", "10.0.0.2")


def test_linktype_null_ip_at_0():
    data = S.global_header(D.LINKTYPE_NULL) + S.record(5, _ipv4_udp_frame())
    (p,) = rows(data)
    assert p["src"] == "10.0.0.1" and p["ether_type"] == ""


def test_linktype_raw_ip_at_0():
    data = S.global_header(D.LINKTYPE_RAW) + S.record(5, _ipv4_udp_frame())
    (p,) = rows(data)
    assert p["dst"] == "10.0.0.2"


def test_linktype_loop_ip_at_4():
    data = S.global_header(D.LINKTYPE_LOOP) + S.record(5, b"\x00\x00\x00\x02" + _ipv4_udp_frame())
    (p,) = rows(data)
    assert p["src"] == "10.0.0.1"


def test_en10mb_plain_and_vlan():
    plain = S.ethernet(_ipv4_udp_frame())
    tagged = S.ethernet(_ipv4_udp_frame(), vlan=7)
    data = S.global_header(1) + S.record(5, plain) + S.record(6, tagged)
    p1, p2 = rows(data)
    assert p1["ether_type"] == "IPv4" and p1["src_port"] == 1111
    # getEtherType reads only offset 12 → tagged frames render 'vlan',
    # but the tag IS skipped for L3 decode [PcapReader.java:256-303]
    assert p2["ether_type"] == "vlan" and p2["src_port"] == 1111
    # non-strict shows the inner type
    _, p2ns = rows(data, strict_reference=False)
    assert p2ns["ether_type"] == "IPv4" and p2ns["src_port"] == 1111


def test_non_ip_ethertype_keeps_only_l2_fields():
    frame = S.ethernet(b"\x00\x01\x08\x00" + b"\x00" * 24, ethertype=0x0806)
    data = S.global_header(1) + S.record(9, frame)
    (p,) = rows(data)
    assert p["ether_type"] == "arp"
    assert "src" not in p and "src_port" not in p
    assert p["ts"] == 9 and p["size"] == len(frame)


def test_unknown_ethertype_renders_hex():
    frame = S.ethernet(b"\x00" * 30, ethertype=0x88CC)
    (p,) = rows(S.global_header(1) + S.record(1, frame))
    assert p["ether_type"] == "0x88cc"


# --- LINKTYPE_LINUX_SLL(113), non-strict only (VERDICT r10 item 6) -------------


def test_sll_rejected_in_strict_mode():
    """Parity: the reference stops at LOOP (PcapReader.java:238-254),
    so strict mode must keep rejecting cooked captures."""
    data = S.global_header(D.LINKTYPE_LINUX_SLL) + S.record(5, S.sll(_ipv4_udp_frame()))
    with pytest.raises(PcapFormatError, match="unsupported link type 113"):
        rows(data)
    assert rows(data, mode="PERMISSIVE") == []


def test_sll_ipv4_udp_non_strict():
    data = S.global_header(D.LINKTYPE_LINUX_SLL) + S.record(5, S.sll(_ipv4_udp_frame()))
    (p,) = rows(data, strict_reference=False)
    assert p["ether_type"] == "IPv4"
    assert p["src"] == "10.0.0.1" and p["dst"] == "10.0.0.2"
    assert p["src_port"] == 1111 and p["dst_port"] == 2222


def test_sll_vlan_tag_skipped():
    data = S.global_header(D.LINKTYPE_LINUX_SLL) + S.record(
        6, S.sll(_ipv4_udp_frame(), vlan=7)
    )
    (p,) = rows(data, strict_reference=False)
    # SLL is non-strict-only, so no 'vlan' render quirk: inner type shown
    assert p["ether_type"] == "IPv4" and p["src_port"] == 1111


def test_sll_non_ip_and_short_frames():
    arp = S.sll(b"\x00\x01\x08\x00" + b"\x00" * 24, protocol=0x0806)
    short = S.sll(b"", protocol=0x0800)[:10]  # truncated pseudo-header
    data = (
        S.global_header(D.LINKTYPE_LINUX_SLL)
        + S.record(7, arp)
        + S.record(8, short)
    )
    p1, p2 = rows(data, strict_reference=False)
    assert p1["ether_type"] == "arp" and "src" not in p1
    assert p2["ether_type"] == "" and "src" not in p2


# --- L3/L4 field semantics ----------------------------------------------------

def test_ipv4_fields_and_udp_checksum_valid():
    frame = S.ethernet(S.ipv4(S.udp(b"payload9", 4000, 53, "192.168.1.5", "8.8.8.8"),
                              17, "192.168.1.5", "8.8.8.8", ttl=61))
    (p,) = rows(S.global_header(1) + S.record(100, frame))
    assert p["protocol"] == "UDP" and p["ttl"] == 61
    assert p["src"] == "192.168.1.5" and p["dst"] == "8.8.8.8"
    assert p["src_port"] == 4000 and p["dst_port"] == 53
    assert p["len"] == 8
    assert p["udpsum"] == 0  # recomputed checksum of a valid segment
    assert p["payload"] == b"payload9"


def test_udp_zero_checksum_omits_udpsum():
    frame = S.ethernet(S.ipv4(S.udp(b"x", 1, 2, checksum=False), 17, "1.1.1.1", "2.2.2.2"))
    (p,) = rows(S.global_header(1) + S.record(1, frame))
    assert "udpsum" not in p


def test_tcp_ports_and_payload_with_options():
    frame = S.ethernet(S.ipv4(S.tcp(b"GET /", 5555, 80, data_offset=8), 6, "10.1.1.1", "10.2.2.2"))
    (p,) = rows(S.global_header(1) + S.record(1, frame))
    assert p["protocol"] == "TCP"
    assert p["src_port"] == 5555 and p["dst_port"] == 80
    assert p["len"] == 5 and p["payload"] == b"GET /"
    assert "udpsum" not in p


def test_icmp_has_no_ports():
    frame = S.ethernet(S.ipv4(b"\x08\x00\x00\x00", 1, "10.0.0.1", "10.0.0.9"))
    (p,) = rows(S.global_header(1) + S.record(1, frame))
    assert p["protocol"] == "ICMP"
    assert "src_port" not in p and "len" not in p


def test_signed_protocol_quirk():
    # protocol id 253 renders as "-3" in strict mode [PcapReader.java:322]
    frame = S.ethernet(S.ipv4(b"", 253, "1.1.1.1", "2.2.2.2"))
    (p,) = rows(S.global_header(1) + S.record(1, frame))
    assert p["protocol"] == "-3"
    (p2,) = rows(S.global_header(1) + S.record(1, frame), strict_reference=False)
    assert p2["protocol"] == "253"


def test_ipv6_udp_with_fragment_ext():
    inner = S.udp(b"abc", 7, 53, "2001:db8::1", "2001:db8::2")
    frame = S.ethernet(
        S.ipv6(inner, 17, "2001:db8::1", "2001:db8::2",
               ext_headers=[(44, S.fragment_ext())]),
        ethertype=0x86DD)
    (p,) = rows(S.global_header(1) + S.record(1, frame))
    assert p["ether_type"] == "IPv6"
    assert p["protocol"] == "UDP"
    assert p["frag"] is True and p["ext_count"] == 1
    assert p["ext_headers"] == "[Fragment][UDP]"
    assert p["src"] == "2001:db8::1"
    assert p["ttl"] == 64  # hop limit lands in ttl
    assert p["payload_len"] == 8 + 8 + 3  # frag ext + udp hdr + payload
    assert p["src_port"] == 7


def test_ipv6_no_next_header():
    # header-only packet: reference loop never runs → ext_headers ABSENT
    frame = S.ethernet(S.ipv6(b"", 59, "::1", "::2"), ethertype=0x86DD)
    (p,) = rows(S.global_header(1) + S.record(1, frame))
    assert "ext_headers" not in p and p["ext_count"] == 0
    assert "protocol" not in p
    # with payload bytes present the reference appends '[59]' then stops
    frame2 = S.ethernet(S.ipv6(b"\x00\x00", 59, "::1", "::2"), ethertype=0x86DD)
    (p2,) = rows(S.global_header(1) + S.record(1, frame2))
    assert p2["ext_headers"] == "[59]" and "protocol" not in p2
    # non-strict keeps the clean empty-string rendering
    (p3,) = rows(S.global_header(1) + S.record(1, frame2), strict_reference=False)
    assert p3["ext_headers"] == "" and "protocol" not in p3


def test_ipv6_hopbyhop_strict_byte_advance():
    """Non-Fragment ext headers advance 1+len BYTES in the reference
    [PcapReader.java:408-410], not the RFC's (1+len)*8 — so a HopByHop
    header leaves strict decode misaligned (garbage ports), while
    non-strict walks correctly."""
    inner = S.udp(b"xyz", 4242, 53, "2001:db8::1", "2001:db8::2")
    # HopByHop: next(patched) len=0 + 6 pad bytes = 8 bytes total
    hbh = bytes([0, 0, 1, 4, 0, 0, 0, 0])
    frame = S.ethernet(
        S.ipv6(inner, 17, "2001:db8::1", "2001:db8::2",
               ext_headers=[(0, hbh)]),
        ethertype=0x86DD)
    data = S.global_header(1) + S.record(1, frame)
    (p,) = rows(data)
    # strict: advance = 1+0 = 1 byte → l4 read 7 bytes early → port garbage
    assert p["ext_headers"].startswith("[HopByHop]")
    assert p.get("src_port") != 4242
    (p2,) = rows(data, strict_reference=False)
    assert p2["ext_headers"] == "[HopByHop][UDP]"
    assert p2["src_port"] == 4242 and p2["dst_port"] == 53
    assert p2["payload"] == b"xyz"


def test_ipv6_udpsum_strict_uses_ipv4_offsets():
    """The reference builds the UDP pseudo-header from ipStart+12/+16
    even for IPv6 (inside the source address) [PcapReader.java:141-144],
    so a correctly-checksummed v6 segment does NOT verify to 0 in strict
    mode; the RFC path (non-strict) returns 0."""
    inner = S.udp(b"ok", 9, 53, "2001:db8::1", "2001:db8::2")
    frame = S.ethernet(S.ipv6(inner, 17, "2001:db8::1", "2001:db8::2"),
                       ethertype=0x86DD)
    data = S.global_header(1) + S.record(1, frame)
    (p,) = rows(data)
    assert p["udpsum"] != 0
    (p2,) = rows(data, strict_reference=False)
    assert p2["udpsum"] == 0


def test_md5_opt_in_uppercase():
    frame = S.ethernet(_ipv4_udp_frame())
    data = S.global_header(1) + S.record(1, frame) + S.record(2, frame)
    out = rows(data, calculate_md5=True)
    assert out[0]["md5"] == out[1]["md5"]
    assert len(out[0]["md5"]) == 32 and out[0]["md5"].upper() == out[0]["md5"]
    assert "md5" not in rows(data)[0]


def test_gzip_transparent():
    raw = S.dns_exchange_pcap()
    gz = gzip.compress(raw)
    assert len(rows(gz)) == 2
    assert [p["ts"] for p in rows(gz)] == [p["ts"] for p in rows(raw)]


def test_pkt_no_is_one_based_ordinal():
    raw = S.dns_exchange_pcap()
    assert [p["pkt_no"] for p in rows(raw)] == [1, 2]


# --- DNS decode [DnsPcapReader.java] ------------------------------------------

def test_dns_exchange_golden():
    out = rows(S.dns_exchange_pcap(), decoder="dns")
    q, r = out
    assert q["dns_queryid"] == 0x1234 and r["dns_queryid"] == 0x1234
    assert q["dns_qr"] is False and r["dns_qr"] is True
    assert q["dns_qname"] == "ripe.net." and r["dns_qname"] == "ripe.net."
    assert q["dns_qtype"] == 1 and q["dns_qtype_str"] == "A"
    assert q["dns_opcode"] == "QUERY" and r["dns_rcode"] == "NOERROR"
    assert q["dns_flags"] == "rd"
    assert r["dns_flags"] == "qr rd ra"
    assert len(r["dns_answer"]) == 13
    assert r["dns_answer"][0] == "ripe.net. 3600 IN NS a.gtld-servers.net."
    assert r["dns_answer"][12] == "ripe.net. 3600 IN NS m.gtld-servers.net."
    assert r["dns_authority"] == [] and r["dns_additional"] == []


def test_dns_not_parsed_off_port_53():
    q = S.dns_query(1, "example.com")
    frame = S.ethernet(S.ipv4(S.udp(q, 1000, 1001, "1.1.1.1", "2.2.2.2"),
                              17, "1.1.1.1", "2.2.2.2"))
    (p,) = rows(S.global_header(1) + S.record(1, frame), decoder="dns")
    assert "dns_queryid" not in p


def test_dns_garbage_silently_skipped():
    frame = S.ethernet(S.ipv4(S.udp(b"\x01\x02", 53, 999, "1.1.1.1", "2.2.2.2"),
                              17, "1.1.1.1", "2.2.2.2"))
    (p,) = rows(S.global_header(1) + S.record(1, frame), decoder="dns")
    assert "dns_queryid" not in p
    assert p["src_port"] == 53  # lower layers intact


def test_tcp_dns_not_parsed_in_strict_mode():
    # reference never strips the TCP 2-byte length prefix → no dns fields
    msg = S.dns_query(7, "a.example")
    seg = struct.pack(">H", len(msg)) + msg
    frame = S.ethernet(S.ipv4(S.tcp(seg, 5000, 53), 6, "1.1.1.1", "2.2.2.2"))
    data = S.global_header(1) + S.record(1, frame)
    (p,) = rows(data, decoder="dns")
    assert "dns_queryid" not in p
    (p2,) = rows(data, decoder="dns", strict_reference=False)
    assert p2["dns_qname"] == "a.example."


def test_qname_lowercased():
    q = S.dns_query(2, "WwW.ExAmPlE.CoM")
    frame = S.ethernet(S.ipv4(S.udp(q, 5353, 53, "1.1.1.1", "2.2.2.2"),
                              17, "1.1.1.1", "2.2.2.2"))
    (p,) = rows(S.global_header(1) + S.record(1, frame), decoder="dns")
    assert p["dns_qname"] == "www.example.com."


# --- golden parity against the reference's own binary fixture ----------------

@pytest.mark.skipif(not os.path.exists(REF_FIXTURE), reason="reference fixture absent")
def test_reference_fixture_parity():
    """Decode the reference repo's 677-byte test.pcap (read at runtime,
    not copied) and assert the documented golden facts (SURVEY.md §5):
    2 packets, UDP DNS query `ripe.net A` 193.0.10.82:52938 →
    193.0.14.129:53 at ts 1317993942 and a 13-NS-answer response."""
    with open(REF_FIXTURE, "rb") as f:
        data = f.read()
    out = list(decode_pcap(data, opts=DecodeOptions(decoder="dns")))
    assert len(out) == 2
    q, r = out
    assert q["ts"] == 1317993942
    assert q["ether_type"] == "IPv4" and q["protocol"] == "UDP"
    assert q["src"] == "193.0.10.82" and q["dst"] == "193.0.14.129"
    assert q["src_port"] == 52938 and q["dst_port"] == 53
    assert q["dns_qname"] == "ripe.net." and q["dns_qtype_str"] == "A"
    assert q["dns_qr"] is False
    assert r["dns_qr"] is True and r["src_port"] == 53
    # The response is a referral: the 13 NS records a–m.gtld-servers.net
    # sit in the AUTHORITY section (answer section is empty).
    assert r["dns_answer"] == []
    assert len(r["dns_authority"]) == 13
    assert r["dns_authority"][0] == "net. 172800 IN NS a.gtld-servers.net."
    assert r["dns_authority"][12] == "net. 172800 IN NS m.gtld-servers.net."
    # additional section carries the glue A/AAAA records
    assert "a.gtld-servers.net. 172800 IN A 192.5.6.30" in r["dns_additional"]
    assert "a.gtld-servers.net. 172800 IN AAAA 2001:503:a83e::2:30" in r["dns_additional"]
    # both packets carry valid (recomputed-to-zero) UDP checksums
    assert q["udpsum"] == 0 and r["udpsum"] == 0


def test_dns_rr_type_rendering():
    """Presentation-format rendering for the common RR types beyond
    NS/A (TXT, SOA, SRV, MX, CNAME, AAAA, unknown→RFC3597)."""
    import struct as _s

    from hadoop_pcap_spark.pcap import dns as DNS

    def rr(name, rtype, rdata, ttl=300):
        return (name, ttl, rtype, rdata)

    def name_bytes(n):
        out = b""
        for lab in n.rstrip(".").split("."):
            out += bytes([len(lab)]) + lab.encode()
        return out + b"\x00"

    answers = [
        rr("t.example", 16, b"\x05hello\x06world!"),                       # TXT, 2 strings
        rr("m.example", 15, _s.pack(">H", 10) + name_bytes("mx.example")), # MX
        rr("c.example", 5, name_bytes("target.example")),                  # CNAME
        rr("s.example", 33, _s.pack(">HHH", 1, 2, 8080) + name_bytes("srv.example")),  # SRV
        rr("a6.example", 28, bytes.fromhex("20010db8000000000000000000000001")),       # AAAA
        rr("u.example", 999, b"\xde\xad\xbe\xef"),                         # unknown type
        rr("soa.example", 6, name_bytes("ns1.example") + name_bytes("admin.example")
           + _s.pack(">IIIII", 1, 2, 3, 4, 5)),                            # SOA
    ]
    msg = S.dns_response(0x42, "q.example", 1, answers=answers)
    parsed = DNS.parse_message(msg)
    a = parsed.answers
    assert a[0] == 't.example. 300 IN TXT "hello" "world!"'
    assert a[1] == "m.example. 300 IN MX 10 mx.example."
    assert a[2] == "c.example. 300 IN CNAME target.example."
    assert a[3] == "s.example. 300 IN SRV 1 2 8080 srv.example."
    assert a[4] == "a6.example. 300 IN AAAA 2001:db8::1"
    assert a[5] == "u.example. 300 IN TYPE999 \\# 4 DEADBEEF"
    assert a[6] == "soa.example. 300 IN SOA ns1.example. admin.example. 1 2 3 4 5"


def test_dns_opt_record_ttl_rendering():
    """OPT pseudo-RR renders the record's *computed* 32-bit TTL
    (xrcode<<24 | version<<16 | flags), not a fixed value.  Covers the
    reference's golden (flags=0x8000 ⇒ ttl=32768, DnsPcapReaderTest.java:24-29)
    plus the flags=0 EDNS0 probe and a nonzero xrcode/version composite."""
    import struct as _s

    from hadoop_pcap_spark.pcap import dns as DNS

    def opt_msg(payload, xrcode, version, flags):
        ttl = (xrcode << 24) | (version << 16) | flags
        hdr = _s.pack(">HHHHHH", 0x99, 0x0100, 1, 0, 0, 1)
        q = b"\x01q\x07example\x00" + _s.pack(">HH", 1, 1)
        opt = b"\x00" + _s.pack(">HHIH", 41, payload, ttl, 0)
        return hdr + q + opt

    # DO-bit set (the reference's single golden shape): ttl == 32768
    m = DNS.parse_message(opt_msg(4096, 0, 0, 0x8000))
    assert m.additional == [
        ". 32768 CLASS4096 OPT ; payload 4096, xrcode 0, version 0, flags 32768"
    ]
    # plain EDNS0 probe (flags=0): ttl must render 0, not 32768
    m = DNS.parse_message(opt_msg(1232, 0, 0, 0))
    assert m.additional == [
        ". 0 CLASS1232 OPT ; payload 1232, xrcode 0, version 0, flags 0"
    ]
    # nonzero extended-rcode and version
    m = DNS.parse_message(opt_msg(512, 1, 2, 3))
    ttl = (1 << 24) | (2 << 16) | 3
    assert m.additional == [
        f". {ttl} CLASS512 OPT ; payload 512, xrcode 1, version 2, flags 3"
    ]


def test_dns_label_escaping_and_root():
    from hadoop_pcap_spark.pcap import dns as DNS

    # root name question
    msg = S.dns_query(1, "")
    parsed = DNS.parse_message(msg)
    assert parsed.qname == "."
    # label with a byte outside printable ASCII → \DDD escape
    raw = bytes([1, 0x07]) + b"\x02ok\x00" + b"\x00\x01\x00\x01"
    hdr = bytes.fromhex("000101000001000000000000")
    parsed2 = DNS.parse_message(hdr + raw)
    assert parsed2.qname == "\\007.ok."


def test_dns_rr_extended_type_rendering():
    """Second tier of RR renderers: NAPTR, DNSKEY, DS, SSHFP, TLSA,
    HINFO, RP, KX/AFSDB, RRSIG, NSEC (dnsjava emits presentation
    format for all of these via Record.toString; our single-spaced
    equivalent is the documented divergence N4)."""
    import base64 as _b64
    import struct as _s

    from hadoop_pcap_spark.pcap import dns as DNS

    def rr(name, rtype, rdata, ttl=300):
        return (name, ttl, rtype, rdata)

    def name_bytes(n):
        out = b""
        for lab in n.rstrip(".").split("."):
            out += bytes([len(lab)]) + lab.encode()
        return out + b"\x00"

    key = b"\x01\x02\x03\xff"
    sig = b"\xaa\xbb\xcc"
    answers = [
        rr("n.example", 35, _s.pack(">HH", 100, 50) + b"\x01s\x07SIP+D2U\x00"
           + name_bytes("_sip._udp.example")),                              # NAPTR
        rr("k.example", 48, _s.pack(">HBB", 256, 3, 8) + key),              # DNSKEY
        rr("d.example", 43, _s.pack(">HBB", 60485, 5, 1) + b"\x2b\xb1\x83"),# DS
        rr("f.example", 44, bytes([1, 1]) + b"\x12\x34\xab"),               # SSHFP
        rr("t.example", 52, bytes([3, 1, 1]) + b"\xfe\xed"),                # TLSA
        rr("h.example", 13, b"\x05intel\x05linux"),                         # HINFO
        rr("r.example", 17, name_bytes("admin.example") + name_bytes("txt.example")),  # RP
        rr("x.example", 36, _s.pack(">H", 5) + name_bytes("kx.example")),   # KX
        rr("ns.example", 47, name_bytes("next.example")
           + bytes([0, 3, 0b01100000, 0, 0b10000000])),                     # NSEC: A NS (bit16=TXT? no: window0 byte2 bit0 -> type16 TXT)
    ]
    msg = S.dns_response(0x42, "q.example", 1, answers=answers)
    a = DNS.parse_message(msg).answers
    assert a[0] == 'n.example. 300 IN NAPTR 100 50 "s" "SIP+D2U" "" _sip._udp.example.'
    assert a[1] == f"k.example. 300 IN DNSKEY 256 3 8 {_b64.b64encode(key).decode()}"
    assert a[2] == "d.example. 300 IN DS 60485 5 1 2BB183"
    assert a[3] == "f.example. 300 IN SSHFP 1 1 1234AB"
    assert a[4] == "t.example. 300 IN TLSA 3 1 1 FEED"
    assert a[5] == 'h.example. 300 IN HINFO "intel" "linux"'
    assert a[6] == "r.example. 300 IN RP admin.example. txt.example."
    assert a[7] == "x.example. 300 IN KX 5 kx.example."
    assert a[8] == "ns.example. 300 IN NSEC next.example. A NS TXT"


def test_dns_rr_tail_type_rendering():
    """Third tier (dnsjava tail): NSEC3, NSEC3PARAM, LOC, CERT, DHCID,
    IPSECKEY — plus the RFC 3597 fallback for a truly unknown type."""
    import base64 as _b64
    import struct as _s

    from hadoop_pcap_spark.pcap import dns as DNS

    def rr(name, rtype, rdata, ttl=300):
        return (name, ttl, rtype, rdata)

    hashed = b"\x01\x23\x45\x67\x89"
    cert = b"\xde\xad\xbe\xef"
    dhcid = b"\x00\x01\x02"
    ipseckey_key = b"\x11\x22\x33"
    # LOC: 37°46'29.744"N 122°24'44.652"W, alt -25m, size 1m hp 10000m vp 10m
    lat = (1 << 31) + (37 * 3_600_000 + 46 * 60_000 + 29_744)
    lon = (1 << 31) - (122 * 3_600_000 + 24 * 60_000 + 44_652)
    loc = bytes([0, 0x12, 0x16, 0x13]) + _s.pack(
        ">III", lat, lon, 10_000_000 - 2_500
    )
    answers = [
        rr("h3.example", 50, _s.pack(">BBH", 1, 0, 12) + bytes([2]) + b"\xab\xcd"
           + bytes([len(hashed)]) + hashed + bytes([0, 1, 0b01000000])),  # NSEC3 (+A)
        rr("p.example", 51, _s.pack(">BBH", 1, 0, 12) + bytes([0])),      # NSEC3PARAM, empty salt
        rr("l.example", 29, loc),                                          # LOC
        rr("c.example", 37, _s.pack(">HH", 1, 12345) + bytes([8]) + cert), # CERT
        rr("dh.example", 49, dhcid),                                       # DHCID
        rr("ik.example", 45, bytes([10, 1, 2]) + bytes([192, 0, 2, 3]) + ipseckey_key),  # IPSECKEY v4 gw
        rr("u.example", 1234, b"\xca\xfe"),                                # unknown → RFC 3597
    ]
    msg = S.dns_response(0x43, "q.example", 1, answers=answers)
    a = DNS.parse_message(msg).answers
    assert a[0] == "h3.example. 300 IN NSEC3 1 0 12 ABCD 04HKAPS9 A"
    assert a[1] == "p.example. 300 IN NSEC3PARAM 1 0 12 -"
    assert a[2] == ("l.example. 300 IN LOC 37 46 29.744 N 122 24 44.652 W "
                    "-25.00m 1m 10000m 10m")
    assert a[3] == f"c.example. 300 IN CERT 1 12345 8 {_b64.b64encode(cert).decode()}"
    assert a[4] == f"dh.example. 300 IN DHCID {_b64.b64encode(dhcid).decode()}"
    assert a[5] == (f"ik.example. 300 IN IPSECKEY 10 1 2 192.0.2.3 "
                    f"{_b64.b64encode(ipseckey_key).decode()}")
    assert a[6] == "u.example. 300 IN TYPE1234 \\# 2 CAFE"


def test_dns_rrsig_rendering():
    import base64 as _b64
    import struct as _s

    from hadoop_pcap_spark.pcap import dns as DNS

    def name_bytes(n):
        out = b""
        for lab in n.rstrip(".").split("."):
            out += bytes([len(lab)]) + lab.encode()
        return out + b"\x00"

    sig = b"\x01\x02\x03\x04"
    rdata = (_s.pack(">HBBIIIH", 1, 8, 2, 3600, 1700003600, 1700000000, 12345)
             + name_bytes("example.com") + sig)
    msg = S.dns_response(7, "q.example", 1, answers=[("s.example", 300, 46, rdata)])
    (a,) = DNS.parse_message(msg).answers
    # epoch 1700000000 = 20231114 22:13:20 UTC
    assert a == ("s.example. 300 IN RRSIG A 8 2 3600 20231114231320 "
                 f"20231114221320 12345 example.com. {_b64.b64encode(sig).decode()}")


def test_optional_codec_paths():
    """zstd/lz4/snappy inputs: real decompression when the library is
    importable, a clear error (→ 0 rows in PERMISSIVE) otherwise —
    never a confusing bad-magic failure downstream."""
    import pytest as _pt

    data = S.global_header() + S.record(1, S.ethernet(S.ipv4(
        S.udp(b"x", 1, 2), 17, "1.1.1.1", "2.2.2.2")))
    zstd_magic = b"\x28\xb5\x2f\xfd" + b"\x00" * 20
    try:
        import zstandard

        blob = zstandard.ZstdCompressor().compress(data)
        assert list(decode_pcap(blob, "c.pcap.zst"))[0]["ts"] == 1
    except ImportError:
        with _pt.raises(PcapFormatError, match="zstandard"):
            list(decode_pcap(zstd_magic, "c.pcap.zst"))
        assert list(decode_pcap(zstd_magic, "c.pcap.zst",
                                DecodeOptions(mode="PERMISSIVE"))) == []
    try:
        import lz4.frame

        blob = lz4.frame.compress(data)
        assert list(decode_pcap(blob, "c.pcap.lz4"))[0]["ts"] == 1
    except ImportError:
        with _pt.raises(PcapFormatError, match="lz4"):
            list(decode_pcap(b"\x04\x22\x4d\x18" + b"\x00" * 9, "c.pcap.lz4"))


# --- IPv4 fragmentation (SURVEY §1.4; VERDICT r2 item 4) ----------------------


def _frag_capture():
    """A UDP datagram (ports 4000→53) split into two v4 fragments, plus
    one unfragmented control packet."""
    udp_seg = S.udp(bytes(range(24)) + b"tail-data-0123456789abcdef", 4000, 53)
    first = udp_seg[: 8 + 24]          # UDP header + first 24 payload bytes
    rest = udp_seg[8 + 24:]            # continues at offset 32 = 4 × 8
    recs = [
        S.record(100, S.ethernet(S.ipv4(first, 17, "10.0.0.1", "10.0.0.2",
                                        flags_frag=0x2000, ident=7))),
        S.record(101, S.ethernet(S.ipv4(rest, 17, "10.0.0.1", "10.0.0.2",
                                        flags_frag=0x0004, ident=7))),
        S.record(102, S.ethernet(S.ipv4(S.udp(b"solo", 5, 6), 17, "10.9.9.9", "10.8.8.8"))),
    ]
    return S.global_header() + b"".join(recs)


def test_ipv4_fragments_nonstrict_scalar():
    rows = list(decode_pcap(_frag_capture(), opts=DecodeOptions(strict_reference=False)))
    first, nonfirst, solo = rows
    assert first["frag"] is True and first["src_port"] == 4000 and first["dst_port"] == 53
    assert first["protocol"] == "UDP"
    # non-first fragment: no L4 header on the wire → ports/udpsum absent
    assert nonfirst["frag"] is True
    assert "src_port" not in nonfirst and "dst_port" not in nonfirst
    assert "udpsum" not in nonfirst
    # raw fragment bytes surface as payload for reassembly
    assert nonfirst["payload"] == b"tail-data-0123456789abcdef"
    assert nonfirst["len"] == 26
    assert "frag" not in solo and solo["src_port"] == 5


def test_ipv4_fragments_strict_keeps_reference_quirk():
    """Strict = reference parity: no frag flag for v4, and 'ports' are
    parsed out of mid-datagram bytes on non-first fragments
    [PcapReader.java ignores the flags/offset word]."""
    rows = list(decode_pcap(_frag_capture(), opts=DecodeOptions(strict_reference=True)))
    first, nonfirst, _ = rows
    assert "frag" not in first and "frag" not in nonfirst
    # garbage-but-present ports on the non-first fragment
    assert "src_port" in nonfirst and "dst_port" in nonfirst
    import struct as _s
    frag_data = b"tail-data-0123456789abcdef"
    assert nonfirst["src_port"] == _s.unpack_from(">H", frag_data, 0)[0]
    assert nonfirst["dst_port"] == _s.unpack_from(">H", frag_data, 2)[0]


@pytest.mark.parametrize("strict", [True, False])
def test_ipv4_fragments_kernels_agree(strict):
    from hadoop_pcap_spark.pcap.decode_np import decode_pcap_columnar

    opts = DecodeOptions(strict_reference=strict)
    scalar = []
    for pkt in decode_pcap(_frag_capture(), opts=opts):
        pkt.pop("_payload", None)
        scalar.append(pkt)
    columnar = decode_pcap_columnar(_frag_capture(), opts=opts).rows()
    assert columnar == scalar


def test_tcp_seq_flags_opt_in_columns():
    """r13 opt-in TCP metadata: tcp_seq/tcp_flags appear ONLY when
    requested via wanted, render identically in both kernels (incl. a
    truncated header short of the flags byte), and stay absent from
    default decodes."""
    import struct as _struct

    from hadoop_pcap_spark.pcap import synth as S
    from hadoop_pcap_spark.pcap.decode import DecodeOptions, decode_pcap
    from hadoop_pcap_spark.pcap.decode_np import decode_pcap_columnar

    def tcp_with_seq(payload, sp, dp, seq, flags=0x18):
        hdr = _struct.pack(">HHIIBBHHH", sp, dp, seq, 0, (5 << 4),
                           flags, 8192, 0, 0)
        return hdr + payload

    full = S.ethernet(S.ipv4(tcp_with_seq(b"abc", 40000, 80, 0xFFFFFFF0,
                                          flags=0x11), 6, "10.2.0.1", "10.2.0.2"))
    udp = S.ethernet(S.ipv4(S.udp(b"zz", 1111, 2222, "10.2.0.3", "10.2.0.4"),
                            17, "10.2.0.3", "10.2.0.4"))
    # TCP header cut after the seq field: seq present, flags byte absent
    cut = S.ethernet(S.ipv4(tcp_with_seq(b"", 40000, 80, 77)[:13], 6,
                            "10.2.0.5", "10.2.0.6"))
    cap = (S.global_header(1) + S.record(1, full) + S.record(2, udp)
           + S.record(3, cut))

    opts = DecodeOptions(decoder="ip", strict_reference=False,
                         wanted={"pkt_no", "protocol", "tcp_seq", "tcp_flags"})
    scalar = [
        (p.get("tcp_seq"), p.get("tcp_flags")) for p in decode_pcap(cap, opts=opts)
    ]
    assert scalar[0] == (0xFFFFFFF0, 0x11)   # u32 seq survives, FIN flag
    assert scalar[1] == (None, None)         # UDP: absent
    col = decode_pcap_columnar(cap, opts=opts).rows()
    columnar = [(r.get("tcp_seq"), r.get("tcp_flags")) for r in col]
    assert columnar == scalar                # kernel equivalence (incl. cut row)

    # default decode (wanted=None) never carries the opt-in keys
    default = list(decode_pcap(cap, opts=DecodeOptions(
        decoder="ip", strict_reference=False)))
    assert all("tcp_seq" not in p and "tcp_flags" not in p for p in default)
