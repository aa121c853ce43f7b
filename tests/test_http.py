"""HTTP/1.x object extraction (operators/http.py) — the
captures→documents bridge (VERDICT r12 item 1).

Golden contract: extractor output over the synthesized capture ==
synthesis intent (synth.http_exchange_truth — computed from the spec
dicts, never from running the extractor).  Framing branches
(Content-Length, chunked+trailer, gzip, HEAD, 204, close-delimited)
are additionally unit-pinned on the pure parsers."""

import gzip
import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_pcap_spark.operators.http import (
    http_objects,
    parse_requests,
    parse_responses,
)
from hadoop_pcap_spark.pcap import synth as S
from hadoop_pcap_spark.sources import read_pcap


# --- pure-parser units --------------------------------------------------------


def test_parse_requests_pipelined_with_post_body():
    stream = (
        b"GET /a HTTP/1.1\r\nHost: h.example\r\n\r\n"
        b"POST /b HTTP/1.1\r\nHost: h.example\r\nContent-Length: 5\r\n\r\nhello"
        b"GET /c HTTP/1.1\r\nHost: h2.example\r\n\r\n"
    )
    reqs = parse_requests(stream)
    assert [(r["method"], r["target"], r["host"]) for r in reqs] == [
        ("GET", "/a", "h.example"),
        ("POST", "/b", "h.example"),
        ("GET", "/c", "h2.example"),
    ]


def test_parse_responses_content_length_and_truncation():
    body = b"x" * 40
    full = b"HTTP/1.1 200 OK\r\nContent-Length: 40\r\n\r\n" + body
    (r,) = parse_responses(full)
    assert (r["status"], r["body"], r["truncated"]) == (200, body, False)
    (r,) = parse_responses(full[:-10])  # capture cut mid-body
    assert r["truncated"] and r["body"] == body[:-10]


def test_parse_responses_chunked_with_trailer():
    wire = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"4\r\nWiki\r\n6\r\npedia \r\nb\r\nin chunks.\n\r\n"
        b"0\r\nX-T: v\r\n\r\n"
        b"HTTP/1.1 204 No Content\r\n\r\n"  # next response must still parse
    )
    rs = parse_responses(wire)
    assert rs[0]["body"] == b"Wikipedia in chunks.\n"
    assert rs[0]["chunked"] and not rs[0]["truncated"]
    assert rs[1]["status"] == 204 and rs[1]["body"] == b""


def test_parse_responses_gzip_decode_and_raw_fallback():
    text = b"compressible " * 30
    wire_ok = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\nContent-Length: "
        + str(len(gzip.compress(text, mtime=0))).encode()
        + b"\r\n\r\n"
        + gzip.compress(text, mtime=0)
    )
    (r,) = parse_responses(wire_ok)
    assert r["body"] == text and r["content_encoding"] == "gzip;decoded"
    wire_bad = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Content-Length: 9\r\n\r\nnot-gzip!"
    )
    (r,) = parse_responses(wire_bad)
    assert r["body"] == b"not-gzip!" and r["content_encoding"] == "gzip"


def test_parse_responses_head_suppresses_body():
    wire = (
        b"HTTP/1.1 200 OK\r\nContent-Length: 10\r\n\r\n"
        b"HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nok"
    )
    rs = parse_responses(wire, methods=["HEAD", "GET"])
    assert rs[0]["body"] == b"" and rs[1]["body"] == b"ok"


def test_parse_desync_stops_cleanly():
    assert parse_requests(b"garbage bytes not http\r\n\r\nmore") == []
    assert parse_responses(b"SMTP 220 hi\r\n\r\n") == []


# --- end-to-end golden over the synthesized capture ---------------------------


@pytest.fixture(scope="module")
def http_capture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("httpcap")
    (d / "web.pcap").write_bytes(S.http_exchange_pcap())
    return str(d)


def test_http_objects_golden(spark, http_capture_dir):
    pkts = read_pcap(
        spark,
        http_capture_dir,
        columns=["file", "src", "dst", "src_port", "dst_port",
                 "protocol", "pkt_no", "payload"],
        strict_reference=False,
    )
    rows = http_objects(pkts).collect()
    got = {
        (r.client, r.server_port, r.obj_no): r for r in rows
    }
    truth = S.http_exchange_truth()
    assert len(rows) == len(truth)
    for t in truth:
        r = got[(t["client"], t["server_port"], t["obj_no"])]
        assert r.method == t["method"], t
        assert r.url == t["url"], t
        assert r.status == t["status"], t
        assert r.content_type == t["content_type"], t
        assert r.body_len == t["body_len"], t
        assert hashlib.md5(bytes(r.body) if r.body is not None else b"").hexdigest() == t["body_md5"], t
        assert not r.body_truncated, t


def test_http_objects_ignores_non_http_tcp(spark, tmp_path):
    # a DNS-over-TCP capture: TCP flows with payload, zero HTTP rows
    p = tmp_path / "tcpdns.pcap"
    p.write_bytes(S.dns_tcp_exchange_pcap())
    pkts = read_pcap(
        spark, str(tmp_path),
        columns=["file", "src", "dst", "src_port", "dst_port",
                 "protocol", "pkt_no", "payload"],
        strict_reference=False,
    )
    assert http_objects(pkts).count() == 0


def test_http_objects_flow_filter_pushes_down(spark, http_capture_dir):
    from pyspark.sql import functions as F

    pkts = read_pcap(
        spark,
        http_capture_dir,
        columns=["file", "src", "dst", "src_port", "dst_port",
                 "protocol", "pkt_no", "payload"],
        strict_reference=False,
    )
    only80 = http_objects(
        pkts, flow_filter=(F.col("dst_port") == 80) | (F.col("src_port") == 80)
    )
    assert {r.server_port for r in only80.collect()} == {80}


def test_dns_messages_udtf_sql(spark, tmp_path):
    """The dns_messages UDTF (SQL payload→rows explosion — SURVEY
    §2.4's @udtf row): LATERAL over reassembled DNS-over-TCP streams
    yields the same per-message rows the flow operator produces."""
    from hadoop_pcap_spark.operators.flows import reassemble_tcp_streams
    from hadoop_pcap_spark.sql import register_pcap_udtfs

    register_pcap_udtfs(spark)
    (tmp_path / "tcpdns.pcap").write_bytes(S.dns_tcp_exchange_pcap())
    pkts = read_pcap(
        spark, str(tmp_path),
        columns=["file", "src", "dst", "src_port", "dst_port",
                 "protocol", "pkt_no", "payload"],
        strict_reference=False,
    )
    reassemble_tcp_streams(pkts).createOrReplaceTempView("_dns_streams")
    rows = spark.sql(
        """
        SELECT s.src, t.msg_no, t.dns_queryid, t.dns_qname, t.dns_qr,
               t.n_answers
        FROM _dns_streams s, LATERAL dns_messages(s.stream) t
        ORDER BY s.src, t.msg_no
        """
    ).collect()
    truth = S.dns_tcp_exchange_truth()
    assert len(rows) == len(truth)
    by_key = {(t["src"], t["msg_no"]): t for t in truth}
    for r in rows:
        t = by_key[(r.src, r.msg_no)]
        assert r.dns_queryid == t["dns_queryid"]
        assert r.dns_qname == t["dns_qname"]
        assert r.dns_qr == t["dns_qr"]
        assert r.n_answers == t["n_answers"]
    spark.catalog.dropTempView("_dns_streams")


def test_http_corpus_bridge_flags_mirror_duplicate(spark, http_capture_dir):
    """The captures→corpus bridge end to end: text/* 200 bodies become
    corpus docs and the mirror host's byte-identical re-serving of
    big.txt — and only it — is flagged as the duplicate."""
    import os

    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    from hadoop_pcap_spark.plans import pcap_queries as PQ

    rows = {r.url: r for r in PQ.q_pcap_http_corpus(spark, "").collect()}
    truth = {t["url"] for t in S.http_corpus_truth()}
    assert set(rows) == truth
    dups = {u for u, r in rows.items() if r.is_dup}
    # first-keeper is lexicographic by url: api.example < mirror.example
    assert dups == {"http://mirror.example/mirror/big.txt"}
    assert rows["http://api.example/api/big.txt"].n_tokens == rows[
        "http://mirror.example/mirror/big.txt"
    ].n_tokens


def test_parse_requests_incremental_carries_partial():
    from hadoop_pcap_spark.operators.http import parse_requests_incremental

    full = (
        b"GET /a HTTP/1.1\r\nHost: h\r\n\r\n"
        b"POST /b HTTP/1.1\r\nHost: h\r\nContent-Length: 5\r\n\r\nhello"
    )
    # cut mid-body of the POST: only GET emits; consumed points at POST
    cut = full[:-3]
    reqs, used = parse_requests_incremental(cut)
    assert [r["target"] for r in reqs] == ["/a"]
    assert cut[used:].startswith(b"POST ")
    # feeding the carried residual + the rest completes the POST
    reqs2, used2 = parse_requests_incremental(cut[used:] + full[-3:])
    assert [r["target"] for r in reqs2] == ["/b"]


def test_parse_responses_incremental_never_truncates_and_blocks_close():
    from hadoop_pcap_spark.operators.http import parse_responses_incremental

    body = b"y" * 30
    r1 = b"HTTP/1.1 200 OK\r\nContent-Length: 30\r\n\r\n" + body
    close = b"HTTP/1.1 200 OK\r\nConnection: close\r\n\r\ntail..."
    # mid-body cut: nothing emits (no truncated ghosts), nothing consumed
    resps, used = parse_responses_incremental(r1[:-10])
    assert resps == [] and used == 0
    # complete + close-delimited: first emits, close never does
    resps, used = parse_responses_incremental(r1 + close)
    assert len(resps) == 1 and resps[0]["body"] == body
    assert (r1 + close)[used:] == close


def test_incremental_parsers_never_crash_and_never_overconsume():
    """Fuzz the incremental parsers: arbitrary bytes must not raise,
    and consumed must never exceed the input length (the residual
    carried into the next micro-batch must be a valid suffix)."""
    import random

    from hadoop_pcap_spark.operators.http import (
        parse_requests_incremental,
        parse_responses_incremental,
    )

    rng = random.Random(0x4774)
    seeds = [
        b"", b"GET ", b"GET / HTTP/1.1\r\n",
        b"HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nab",
        b"POST /x HTTP/1.1\r\nTransfer-Encoding: chunked\r\n\r\n5\r\nab",
    ]
    for trial in range(400):
        if trial < len(seeds):
            blob = seeds[trial]
        else:
            n = rng.randrange(0, 160)
            blob = bytes(rng.randrange(256) for _ in range(n))
            if rng.random() < 0.5:
                blob = rng.choice(
                    [b"GET / HTTP/1.1\r\n", b"HTTP/1.1 200 OK\r\n"]
                ) + blob
        for fn in (parse_requests_incremental, parse_responses_incremental):
            out, used = fn(blob)
            assert 0 <= used <= len(blob), (fn.__name__, blob)


def test_http_objects_window_plumbs_through(spark, http_capture_dir):
    """window= reaches connection_segments: a 1-second window over the
    fixture (whose per-connection frames span several seconds of ts)
    splits connections into per-window chunks — more groups, each
    parsed independently — while a huge window reproduces the
    unwindowed result."""
    pkts = read_pcap(
        spark, http_capture_dir,
        columns=["file", "src", "dst", "src_port", "dst_port",
                 "protocol", "ts", "pkt_no", "payload"],
        strict_reference=False,
    )
    whole = http_objects(pkts, window="1 hour").count()
    assert whole == len(S.http_exchange_truth())
    # 1-second windows cut every multi-second connection mid-stream:
    # fewer (or zero) complete request/response pairs survive per chunk
    chunked = http_objects(pkts, window="1 second").count()
    assert chunked < whole


def test_http_objects_seq_order_heals_damaged_capture(spark, tmp_path):
    """order='seq' (r13): a capture with a retransmitted response
    segment and a swapped pair still parses every object to the
    synthesis truth; capture order (the default) cannot."""
    p = tmp_path / "damaged.pcap"
    p.write_bytes(S.http_damaged_pcap())
    cols = ["file", "src", "dst", "src_port", "dst_port",
            "protocol", "pkt_no", "payload", "tcp_seq"]
    pkts = read_pcap(spark, str(tmp_path), columns=cols,
                     strict_reference=False)
    healed = http_objects(pkts, order="seq").collect()
    truth = S.http_exchange_truth()
    assert len(healed) == len(truth)
    got = {(r.client, r.server_port, r.obj_no): r for r in healed}
    for t in truth:
        r = got[(t["client"], t["server_port"], t["obj_no"])]
        assert r.url == t["url"] and r.status == t["status"], t
        assert hashlib.md5(
            bytes(r.body) if r.body is not None else b""
        ).hexdigest() == t["body_md5"], t
    # capture order mis-parses the damaged flows
    raw = http_objects(pkts).collect()
    raw_md5 = sorted(
        hashlib.md5(bytes(r.body) if r.body is not None else b"").hexdigest()
        for r in raw
    )
    assert raw_md5 != sorted(t["body_md5"] for t in truth)
    # missing the opt-in column fails loudly
    bare = read_pcap(spark, str(tmp_path), columns=cols[:-1],
                     strict_reference=False)
    with pytest.raises(ValueError, match="tcp_seq"):
        http_objects(bare, order="seq")
