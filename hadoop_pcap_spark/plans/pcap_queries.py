"""PCAP-source queries registered with the driver harness.

The driver's parquet tables don't include a packets table, so these
run on a deterministic synthesized capture directory (built once per
process under /tmp) — rows-only checks from the driver's side; the
full golden assertions live in tests/test_pcap_source.py.
"""

from __future__ import annotations

import gzip
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from ..pcap import synth as S
from ..sources import read_pcap

_DIR = None


def fixture_dir() -> str:
    global _DIR
    if _DIR is None or not os.path.isdir(_DIR):
        d = tempfile.mkdtemp(prefix="pcap_fixture_")
        raw = S.dns_exchange_pcap()
        with open(os.path.join(d, "a.pcap"), "wb") as f:
            f.write(raw)
        with open(os.path.join(d, "b.pcap.gz"), "wb") as f:
            f.write(gzip.compress(raw))
        _DIR = d
    return _DIR


@query("pcap_port_count")  # rows-only: no packets table in the oracle DB
def q_pcap_port_count(spark: SparkSession, sf: str) -> DataFrame:
    """The reference README's canonical MapReduce job
    (hadoop-pcap-lib/README.md:20-81): count packets per src_port,
    nulls dropped."""
    return (
        read_pcap(spark, fixture_dir())
        .filter(F.col("src_port").isNotNull())
        .groupBy("src_port")
        .agg(F.count("*").alias("n"))
    )


@query("pcap_dns_qname_topk")  # rows-only
def q_pcap_dns_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top queried DNS names — the serde README's query motif over
    dns_* columns (hadoop-pcap-serde/README.md:49-60)."""
    return (
        read_pcap(spark, fixture_dir(), decoder="dns")
        .filter(F.col("dns_qname").isNotNull() & (F.col("dns_qr") == False))  # noqa: E712
        .groupBy("dns_qname")
        .agg(F.count("*").alias("n_queries"))
        .orderBy(F.desc("n_queries"), F.asc("dns_qname"))
        .limit(10)
    )


@query("pcap_dedup_md5")  # rows-only
def q_pcap_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Packet dedup on the md5 column — the reference's stated MD5
    purpose (PcapReader.java:183: 'finding duplicate packets')."""
    df = read_pcap(spark, fixture_dir(), calculate_md5=True)
    return (
        df.groupBy("md5")
        .agg(F.count("*").alias("n_copies"), F.min("pkt_no").alias("first_pkt"))
        .filter(F.col("n_copies") > 1)
    )


@query("pcap_multimodal_payload")  # rows-only
def q_pcap_multimodal(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal/binary-column plumbing: the payload BinaryType column
    with typed metadata extracted JVM-side (length, hex prefix, md5).
    Decode-to-features for real image/audio payloads is the same shape —
    see operators/multimodal.py for the stubbed decode UDF."""
    return (
        read_pcap(spark, fixture_dir())
        .filter(F.col("payload").isNotNull())
        .select(
            "file",
            "pkt_no",
            F.length("payload").alias("payload_bytes"),
            F.lower(F.hex(F.substring("payload", 1, 4))).alias("magic_hex"),
            F.md5("payload").alias("payload_md5"),
        )
    )


_TCP_DIR = None


def tcp_fixture_dir() -> str:
    """DNS-over-TCP capture (message split across segments + two
    messages sharing a segment), built once per process."""
    global _TCP_DIR
    if _TCP_DIR is None or not os.path.isdir(_TCP_DIR):
        d = tempfile.mkdtemp(prefix="pcap_tcp_fixture_")
        with open(os.path.join(d, "tcpdns.pcap"), "wb") as f:
            f.write(S.dns_tcp_exchange_pcap())
        _TCP_DIR = d
    return _TCP_DIR


@query("pcap_dns_tcp_reassembly")  # rows-only
def q_pcap_dns_tcp_reassembly(spark: SparkSession, sf: str) -> DataFrame:
    """DNS-over-TCP flow reassembly — the flow-grain operator the
    reference lacks (it silently drops TCP DNS, DnsPcapReader.java:
    53-55): port-53 TCP segments shuffle once on the flow 5-tuple,
    per-flow ordered concat + RFC 1035 §4.2.2 length-prefix framing
    walk + re-parse.  Golden assertions in tests/test_flows.py."""
    from ..operators.flows import reassemble_dns_tcp

    pkts = read_pcap(
        spark,
        tcp_fixture_dir(),
        columns=["file", "src", "dst", "src_port", "dst_port",
                 "protocol", "pkt_no", "payload"],
        strict_reference=False,
    )
    return (
        reassemble_dns_tcp(pkts)
        .select("src", "dst", "msg_no", "dns_queryid", "dns_qname",
                "dns_qr", "n_segments",
                F.size("dns_answer").alias("n_answers"))
        .orderBy("src", "msg_no")
    )


_TDIR = None


def throughput_dir(n_files: int = 8, pkts_per_file: int = 12500) -> str:
    """Deterministic 100k-packet capture set (8 files → 8-way decode
    parallelism), built once per process."""
    global _TDIR
    if _TDIR is None or not os.path.isdir(_TDIR):
        d = tempfile.mkdtemp(prefix="pcap_tput_")
        q = S.dns_query(7, "example.com")
        frames = [
            S.ethernet(S.ipv4(S.udp(q, 5353, 53, "10.0.0.1", "10.0.0.2"), 17, "10.0.0.1", "10.0.0.2")),
            S.ethernet(S.ipv4(S.tcp(b"x" * 200, 44000, 443), 6, "10.0.0.3", "10.0.0.4")),
            S.ethernet(S.ipv4(b"\x08\x00" + b"\x00" * 30, 1, "10.0.0.5", "10.0.0.6")),
        ]
        for fi in range(n_files):
            data = S.global_header(1) + b"".join(
                S.record(1700000000 + fi * pkts_per_file + i, frames[(fi + i) % 3])
                for i in range(pkts_per_file)
            )
            with open(os.path.join(d, f"cap{fi}.pcap"), "wb") as f:
                f.write(data)
        _TDIR = d
    return _TDIR


@query("pcap_decode_100k")  # rows-only: decode-throughput benchmark
def q_pcap_decode_100k(spark: SparkSession, sf: str) -> DataFrame:
    """Decode 100k packets across 8 capture files (the engine's core
    job: bytes → typed rows → aggregate).  Single-thread kernel runs
    ~160k pkts/s; 8 files decode in parallel tasks.
    Scale: at 100 TB this is the decode-once→parquet ETL's inner loop;
    throughput scales with file count × executor cores."""
    return (
        read_pcap(spark, throughput_dir())
        .groupBy("protocol")
        .agg(
            F.count("*").alias("n_packets"),
            F.countDistinct("src").alias("n_src"),
            F.sum("len").alias("total_payload_bytes"),
        )
    )
