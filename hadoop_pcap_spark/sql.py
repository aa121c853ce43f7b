"""The SQL front door — the reference's primary interface, re-homed.

hadoop-pcap's documented entry point is Hive QL over a SerDe table
(hadoop-pcap-serde/README.md:21-60: CREATE EXTERNAL TABLE ... ROW
FORMAT SERDE 'net.ripe.hadoop.pcap.serde.PcapDeserializer').  The
Spark twin: register the capture (and the warehouse tables) as temp
views, then every query in this package — and anything a Hive user
wrote — runs via ``spark.sql``.

(`CREATE TABLE ... USING pcap` works via the session-defaults bridge
— ``sources.datasource.set_pcap_ddl_options`` — because PySpark 4.1
drops catalog OPTIONS for Python data sources at reader() time; view
registration remains the preferred SQL path for multiple tables with
different options.  See SCALE.md known limits.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from .plans import WAREHOUSE_TABLES


def register_warehouse_views(
    spark: SparkSession,
    sf_dir: str,
    tables: Sequence[str] = WAREHOUSE_TABLES,
) -> None:
    """One temp view per warehouse parquet table (events normalized to
    epoch-µs BIGINT ts, matching every oracle's convention)."""
    from .plans import table as _table

    for t in tables:
        _table(spark, sf_dir, t).createOrReplaceTempView(t)


def register_packets_view(
    spark: SparkSession,
    path: str,
    name: str = "packets",
    **read_pcap_kwargs,
) -> DataFrame:
    """The serde-table twin: ``packets`` as a SQL view over a capture
    path.  Filters/projections written in SQL reach the same chunked
    decode pipeline as the DataFrame API."""
    from .sources import read_pcap

    df = read_pcap(spark, path, **read_pcap_kwargs)
    df.createOrReplaceTempView(name)
    return df


def register_pcap_udtfs(spark: SparkSession) -> None:
    """SQL-callable table functions for payload→rows explosion —
    SURVEY §2.4's literal ``@udtf`` row (VERDICT r12 item 7): SQL-only
    users get the L7 extractors without the Python API, via LATERAL:

    ``SELECT c.client, t.* FROM conns c, LATERAL http_objects(
    c.req_stream, c.resp_stream) t`` — one row per HTTP
    request/response pair (the operators/http.py parsers, same
    framing/decoding semantics, RFC 9112).

    ``SELECT s.src, t.* FROM streams s, LATERAL dns_messages(
    s.stream) t`` — one row per DNS message in a reassembled
    DNS-over-TCP stream (RFC 1035 §4.2.2 framing + the package's own
    RFC 1035 parser — per-message rows the reference's per-packet
    hook can never produce).

    ``SELECT c.client, t.* FROM conns c, LATERAL tls_session(
    c.stream_a, c.stream_b) t`` — at most one row per connection:
    SNI / ALPN / negotiated version / cipher / JA3(S) from the
    handshake (operators/tls.py parsers; direction classified by
    content, argument order irrelevant).

    Each input row is processed independently (stateless eval), so
    Spark parallelizes the lateral join across partitions exactly
    like the applyInPandas operators; idempotent to re-register."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="obj_no int, method string, url string, status int,"
        " content_type string, content_encoding string, chunked boolean,"
        " body_len int, body_truncated boolean, body binary",
        useArrow=True,  # ArrowEvalPythonUDTF, not row-serde BatchEvalPython
    )
    class HttpObjectsUdtf:
        def eval(self, req_stream, resp_stream, server=None, server_port=None):
            from hadoop_pcap_spark.operators.http import (
                parse_requests,
                parse_responses,
            )

            if req_stream is None or resp_stream is None:
                return
            reqs = parse_requests(bytes(req_stream))
            resps = parse_responses(
                bytes(resp_stream), methods=[r["method"] for r in reqs]
            )
            for i, (rq, rs) in enumerate(zip(reqs, resps), start=1):
                target = rq["target"]
                if target.startswith(("http://", "https://")):
                    url = target
                else:
                    # same Host-less fallback as the batch operator:
                    # the server endpoint (pass server/server_port as
                    # the optional 3rd/4th LATERAL arguments)
                    host = rq["host"] or (
                        server
                        if server_port is None
                        else f"{server}:{server_port}"
                    )
                    url = f"http://{host or ''}{target}"
                yield (
                    i, rq["method"], url, rs["status"], rs["content_type"],
                    rs["content_encoding"], rs["chunked"], len(rs["body"]),
                    rs["truncated"], rs["body"],
                )

    @udtf(
        returnType="msg_no int, dns_queryid int, dns_qr boolean,"
        " dns_qname string, dns_qtype int, dns_rcode string,"
        " n_answers int",
        useArrow=True,
    )
    class DnsMessagesUdtf:
        def eval(self, stream):
            from hadoop_pcap_spark.operators.flows import _frame_messages
            from hadoop_pcap_spark.pcap import dns as _dns

            if stream is None:
                return
            for i, msg_bytes in enumerate(
                _frame_messages(bytes(stream)), start=1
            ):
                try:
                    msg = _dns.parse_message(msg_bytes)
                except Exception:
                    continue  # silent-skip parity with the packet path
                yield (
                    i, msg.query_id, msg.qr, msg.qname, msg.qtype,
                    msg.rcode_text, len(msg.answers),
                )

    @udtf(
        returnType="sni string, alpn string, alpn_chosen string,"
        " tls_version string, cipher_suite int, ja3 string,"
        " ja3_md5 string, ja3s string, ja3s_md5 string,"
        " server_hello_seen boolean",
        useArrow=True,
    )
    class TlsSessionUdtf:
        def eval(self, stream_a, stream_b):
            from hadoop_pcap_spark.operators import tls as _tls

            ch = sh = None
            for s in (stream_a, stream_b):
                if s is None:
                    continue
                for msg_type, body in _tls.handshake_messages(bytes(s)):
                    if msg_type == 1 and ch is None:
                        ch = _tls.parse_client_hello(body)
                    elif msg_type == 2 and sh is None:
                        sh = _tls.parse_server_hello(body)
                    break  # first handshake message classifies a direction
            if ch is None:
                return
            ja3 = _tls.ja3_string(ch)
            negotiated = (
                (sh["supported_version"] or sh["version"]) if sh else None
            )
            ja3s = _tls.ja3s_string(sh) if sh else None
            yield (
                ch["sni"],
                ",".join(ch["alpn"]) if ch["alpn"] else None,
                sh["alpn"] if sh else None,
                _tls._version_name(negotiated),
                sh["cipher"] if sh else None,
                ja3,
                _tls._md5(ja3),
                ja3s,
                _tls._md5(ja3s) if ja3s else None,
                sh is not None,
            )

    spark.udtf.register("http_objects", HttpObjectsUdtf)
    spark.udtf.register("dns_messages", DnsMessagesUdtf)
    spark.udtf.register("tls_session", TlsSessionUdtf)
