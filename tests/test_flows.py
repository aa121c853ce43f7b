"""DNS-over-TCP flow reassembly (operators/flows.py).

The reference yields no dns_* for TCP DNS (DnsPcapReader.java:53-55);
this operator recovers them at flow grain.  Goldens assert the
reassembled messages parse identically to direct parses of the same
message bytes.
"""

import os
import struct

import pytest

from hadoop_pcap_spark.operators.flows import (
    _frame_messages,
    reassemble_dns_tcp,
)
from hadoop_pcap_spark.pcap import dns as dnsmod
from hadoop_pcap_spark.pcap import synth as S
from hadoop_pcap_spark.sources import read_pcap


# --- pure framing-walk units -------------------------------------------------


def test_frame_messages_walks_multiple():
    m1, m2 = b"\x01" * 5, b"\x02" * 9
    stream = struct.pack(">H", 5) + m1 + struct.pack(">H", 9) + m2
    assert _frame_messages(stream) == [m1, m2]


def test_frame_messages_drops_incomplete_tail():
    m1 = b"\x01" * 5
    stream = struct.pack(">H", 5) + m1 + struct.pack(">H", 100) + b"short"
    assert _frame_messages(stream) == [m1]


def test_frame_messages_zero_length_stops():
    assert _frame_messages(struct.pack(">H", 0) + b"junk") == []
    assert _frame_messages(b"") == []
    assert _frame_messages(b"\x00") == []


def test_dns_tcp_segments_split_mid_message():
    q = S.dns_query(1, "a.example")
    r = S.dns_response(1, "a.example", 1, answers=[("a.example", 60, 1, S.a_rdata("10.0.0.1"))])
    segs = S.dns_tcp_segments([q, r], [10])
    assert len(segs) == 2 and len(segs[0]) == 10
    assert _frame_messages(b"".join(segs)) == [q, r]


# --- end-to-end over the Spark source ----------------------------------------


@pytest.fixture(scope="module")
def tcp_capture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tcpdns")
    (d / "tcpdns.pcap").write_bytes(S.dns_tcp_exchange_pcap())
    return str(d)


def _packets(spark, path):
    return read_pcap(
        spark,
        path,
        columns=["file", "src", "dst", "src_port", "dst_port",
                 "protocol", "pkt_no", "payload"],
        strict_reference=False,
    )


def test_reassembles_split_and_shared_segments(spark, tcp_capture_dir):
    rows = (
        reassemble_dns_tcp(_packets(spark, tcp_capture_dir))
        .orderBy("src", "msg_no")
        .collect()
    )
    # client flow: 1 query; server flow: 2 responses
    assert [(r["src"], r["msg_no"]) for r in rows] == [
        ("192.0.2.10", 1), ("192.0.2.53", 1), ("192.0.2.53", 2),
    ]
    q, r1, r2 = rows
    assert q["dns_qr"] is False and q["dns_queryid"] == 0x4242
    assert q["dns_qname"] == "bigzone.example."
    assert q["n_segments"] == 1
    # r1 spans two segments; r2 shares the second segment with r1's tail
    assert r1["n_segments"] == 2 and r2["n_segments"] == 2
    assert r1["dns_queryid"] == 0x4242 and len(r1["dns_answer"]) == 20
    assert r2["dns_queryid"] == 0x4243 and len(r2["dns_answer"]) == 1

    # golden: reassembled render == direct parse of the source bytes
    want = dnsmod.parse_message(
        S.dns_response(
            0x4242, "bigzone.example", 252,
            answers=[(f"h{i}.bigzone.example", 600, 1, S.a_rdata(f"10.1.{i}.1"))
                     for i in range(20)],
        )
    )
    assert r1["dns_answer"] == want.answers
    assert r1["dns_flags"] == want.flags_text


def test_non_dns_traffic_excluded(spark, tmp_path):
    # UDP DNS + non-53 TCP: nothing to reassemble
    frames = [
        S.ethernet(S.ipv4(S.udp(S.dns_query(9, "x.example"), 5353, 53,
                                "10.0.0.1", "10.0.0.2"),
                          17, "10.0.0.1", "10.0.0.2")),
        S.ethernet(S.ipv4(S.tcp(b"GET / HTTP/1.0\r\n", 40000, 80),
                          6, "10.0.0.3", "10.0.0.4")),
    ]
    raw = S.global_header(1) + b"".join(
        S.record(1700000000 + i, f) for i, f in enumerate(frames))
    p = tmp_path / "mixed.pcap"
    p.write_bytes(raw)
    assert reassemble_dns_tcp(_packets(spark, str(tmp_path))).count() == 0


def test_hot_flow_guard_truncates(spark, tmp_path):
    # 3 messages; cap the flow stream so only the first fits complete
    msgs = [S.dns_query(i, f"q{i}.example") for i in range(3)]
    segs = S.dns_tcp_segments(msgs, [2 + len(msgs[0]), 2 + len(msgs[1])])
    raw = S.global_header(1) + b"".join(
        S.record(1700000000 + i,
                 S.ethernet(S.ipv4(S.tcp(seg, 40000, 53), 6,
                                   "10.9.0.1", "10.9.0.2")))
        for i, seg in enumerate(segs))
    p = tmp_path / "hot.pcap"
    p.write_bytes(raw)
    cap = 2 + len(msgs[0]) + 1  # mid-second-message
    out = reassemble_dns_tcp(_packets(spark, str(tmp_path)),
                             max_flow_bytes=cap).collect()
    assert [r["dns_queryid"] for r in out] == [0]


def test_driver_query_registered(spark):
    from hadoop_pcap_spark.plans import QUERIES, load_all

    load_all()
    df = QUERIES["pcap_dns_tcp_reassembly"](spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    rows = df.collect()
    assert [r["n_answers"] for r in rows] == [0, 20, 1]
