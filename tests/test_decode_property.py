"""Property-based round-trip tests: synthesize packets → bytes →
decode must recover the fields (hypothesis; a layer the reference's
test suite lacks, SURVEY.md §5)."""

import ipaddress

import os as _os

# soak-run multiplier: SPARK_GRAFT_FUZZ_X=50 turns the fast CI budgets
# into a deep fuzz without editing each @settings
_FX = int(_os.environ.get("SPARK_GRAFT_FUZZ_X", "1"))

from hypothesis import given, settings, strategies as st

from hadoop_pcap_spark.pcap import synth as S
from hadoop_pcap_spark.pcap.decode import DecodeOptions, decode_pcap


def rows(data, **kw):
    return list(decode_pcap(data, opts=DecodeOptions(**kw)))


ipv4s = st.integers(0, 2**32 - 1).map(lambda v: str(ipaddress.IPv4Address(v)))
ports = st.integers(0, 65535)
payloads = st.binary(min_size=0, max_size=200)
ts_vals = st.integers(0, 2**31 - 1)


@settings(max_examples=60 * _FX, deadline=None)
@given(src=ipv4s, dst=ipv4s, sport=ports, dport=ports, payload=payloads, ts=ts_vals)
def test_udp_roundtrip(src, dst, sport, dport, payload, ts):
    frame = S.ethernet(
        S.ipv4(S.udp(payload, sport, dport, src, dst), 17, src, dst)
    )
    (p,) = rows(S.global_header(1) + S.record(ts, frame))
    assert p["ts"] == ts
    assert p["src"] == src and p["dst"] == dst
    assert p["src_port"] == sport and p["dst_port"] == dport
    assert p["protocol"] == "UDP"
    assert p["payload"] == payload
    assert p["len"] == len(payload)
    assert p["udpsum"] == 0  # synthesizer writes a valid checksum


@settings(max_examples=40 * _FX, deadline=None)
@given(
    src=ipv4s, dst=ipv4s, sport=ports, dport=ports,
    payload=payloads, data_offset=st.integers(5, 15),
)
def test_tcp_roundtrip(src, dst, sport, dport, payload, data_offset):
    frame = S.ethernet(
        S.ipv4(S.tcp(payload, sport, dport, data_offset), 6, src, dst)
    )
    (p,) = rows(S.global_header(1) + S.record(1, frame))
    assert p["protocol"] == "TCP"
    assert p["src_port"] == sport and p["dst_port"] == dport
    assert p["payload"] == payload


@settings(max_examples=40 * _FX, deadline=None)
@given(ttl=st.integers(0, 255), proto=st.integers(0, 255))
def test_ipv4_proto_ttl_roundtrip(ttl, proto):
    frame = S.ethernet(S.ipv4(b"\x00" * 8, proto, "10.0.0.1", "10.0.0.2", ttl=ttl))
    (p,) = rows(S.global_header(1) + S.record(1, frame))
    assert p["ttl"] == ttl
    known = {1: "ICMP", 6: "TCP", 17: "UDP", 46: "RSVP", 47: "GRE", 58: "ICMPv6"}
    if proto in known:
        assert p["protocol"] == known[proto]
    elif proto > 127:  # signed-byte quirk preserved
        assert p["protocol"] == str(proto - 256)
    else:
        assert p["protocol"] == str(proto)


@settings(max_examples=30 * _FX, deadline=None)
@given(qname=st.from_regex(r"[a-z]{1,12}(\.[a-z]{1,12}){0,3}", fullmatch=True),
       qid=st.integers(0, 65535), qtype=st.sampled_from([1, 2, 15, 16, 28]))
def test_dns_query_roundtrip(qname, qid, qtype):
    q = S.dns_query(qid, qname, qtype)
    frame = S.ethernet(S.ipv4(S.udp(q, 1234, 53, "1.1.1.1", "2.2.2.2"),
                              17, "1.1.1.1", "2.2.2.2"))
    (p,) = rows(S.global_header(1) + S.record(1, frame), decoder="dns")
    assert p["dns_queryid"] == qid
    assert p["dns_qname"] == qname + "."
    assert p["dns_qtype"] == qtype
    assert p["dns_qr"] is False


@settings(max_examples=30 * _FX, deadline=None)
@given(chunks=st.lists(st.binary(min_size=24, max_size=80), min_size=0, max_size=6))
def test_arbitrary_packet_stream_never_crashes(chunks):
    """Whatever bytes land in records, decode never raises in
    FAILFAST once the global header is valid (bad L2/L3 yields partial
    rows, parity with the reference's per-layer bail-outs)."""
    data = S.global_header(1) + b"".join(S.record(i, c) for i, c in enumerate(chunks))
    out = rows(data)
    assert len(out) == len(chunks)
    for i, p in enumerate(out):
        assert p["ts"] == i and "pkt_no" in p


def test_mutation_fuzz_never_crashes():
    """Random byte mutations of a valid capture: decode either succeeds
    (possibly with partial rows) or raises PcapFormatError for
    header-level damage — never any other exception."""
    import random

    from hadoop_pcap_spark.pcap.decode import PcapFormatError

    base = S.dns_exchange_pcap()
    rng = random.Random(1234)
    for _ in range(400):
        data = bytearray(base)
        for _ in range(rng.randint(1, 8)):
            data[rng.randrange(len(data))] = rng.randrange(256)
        try:
            list(decode_pcap(bytes(data), opts=DecodeOptions(decoder="dns")))
        except PcapFormatError:
            pass


def test_truncation_sweep_never_crashes():
    from hadoop_pcap_spark.pcap.decode import PcapFormatError

    base = S.dns_exchange_pcap()
    for cut in range(0, len(base), 3):
        try:
            list(decode_pcap(base[:cut], opts=DecodeOptions(decoder="dns")))
        except PcapFormatError:
            pass


@settings(max_examples=40 * _FX, deadline=None)
@given(
    recs=st.lists(
        st.tuples(
            ts_vals,
            st.integers(0, 999_999),
            st.binary(min_size=0, max_size=120),
            st.integers(0, 2**16),
        ),
        min_size=0,
        max_size=8,
    )
)
def test_keep_frame_reserializes_byte_identical(recs):
    """keep_frame fidelity (the write_pcap contract): decoding with
    frame/orig_len and re-packing <IIII ts us len(frame) orig_len> +
    frame must reproduce the capture byte-for-byte — for arbitrary
    frame bytes, timestamps and orig_len values."""
    import struct

    data = S.global_header(1) + b"".join(
        S.record(ts, fr, ts_usec=us, orig_len=ol) for ts, us, fr, ol in recs
    )
    out = rows(data, keep_frame=True)
    assert len(out) == len(recs)
    rebuilt = S.global_header(1)
    for p in out:
        fr = p["frame"]
        rebuilt += struct.pack(
            "<IIII", p["ts"], p["ts_usec"], len(fr), p["orig_len"]
        ) + fr
    assert rebuilt == data
