"""Spark-level tests of the pcap sources (read_pcap + DataSource V2).

The canonical end-to-end slice is the reference README's group-by-count
job: SELECT src_port, count(*) FROM pcaps GROUP BY src_port with null
ports dropped (hadoop-pcap-lib/README.md:20-81)."""

import gzip
import os

import pytest

from pyspark.sql import functions as F

from hadoop_pcap_spark.pcap import synth as S
from hadoop_pcap_spark.sources import (
    DNS_PACKET_SCHEMA,
    read_pcap,
    register_pcap_datasource,
)

REF_FIXTURE = "/root/reference/hadoop-pcap-lib/src/test/resources/test.pcap"


@pytest.fixture(scope="module")
def pcap_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("caps")
    raw = S.dns_exchange_pcap()
    (d / "a.pcap").write_bytes(raw)
    (d / "b.pcap.gz").write_bytes(gzip.compress(raw))
    return str(d)


def test_read_pcap_schema_and_rows(spark, pcap_dir):
    df = read_pcap(spark, pcap_dir, decoder="dns")
    assert df.schema == DNS_PACKET_SCHEMA
    rows = df.orderBy("file", "pkt_no").collect()
    assert len(rows) == 4  # 2 packets × 2 files (one gzip'd)
    q = rows[0]
    assert q.pkt_no == 1 and q.ts == 1317993942
    assert q.src == "193.0.10.82" and q.dst_port == 53
    assert q.dns_qname == "ripe.net." and q.dns_qr is False
    r = rows[1]
    assert len(r.dns_answer) == 13
    assert r.dns_answer[0] == "ripe.net. 3600 IN NS a.gtld-servers.net."
    assert q.file.endswith("a.pcap") and rows[2].file.endswith("b.pcap.gz")


def test_canonical_groupby_count(spark, pcap_dir):
    """The reference README's MapReduce job, as one DataFrame line."""
    df = read_pcap(spark, pcap_dir)
    out = {
        row.src_port: row.n
        for row in (
            df.filter(F.col("src_port").isNotNull())
            .groupBy("src_port")
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    assert out == {52938: 2, 53: 2}


def test_missing_column_projection_is_null(spark, pcap_dir):
    """Hive SerDe semantics: a declared column absent from the decode →
    NULL (PcapDeserializer.java:50-60). dns_* on non-DNS decode and
    payload_len on IPv4 packets are the natural NULL columns."""
    df = read_pcap(spark, pcap_dir)  # ip decoder: no dns columns decoded
    assert "dns_qname" not in df.columns
    vals = df.select("payload_len", "frag").distinct().collect()
    assert all(v.payload_len is None and v.frag is None for v in vals)


def test_column_pruning_into_decoder(spark, pcap_dir):
    df = read_pcap(spark, pcap_dir, columns=["file", "ts", "src", "dst"])
    assert df.columns == ["file", "ts", "src", "dst"]
    assert df.count() == 4


def test_md5_dedup_motif(spark, pcap_dir):
    """The reference's stated MD5 purpose: find duplicate packets
    (PcapReader.java:183). a.pcap and b.pcap.gz hold identical packets."""
    df = read_pcap(spark, pcap_dir, calculate_md5=True)
    assert df.count() == 4
    assert df.dropDuplicates(["md5"]).count() == 2


def test_datasource_v2_format(spark, pcap_dir):
    register_pcap_datasource(spark)
    df = (
        spark.read.format("pcap")
        .option("decoder", "dns")
        .load(os.path.join(pcap_dir, "a.pcap"))
    )
    rows = df.orderBy("pkt_no").collect()
    assert len(rows) == 2
    assert rows[0].dns_qname == "ripe.net."
    assert rows[1].dns_qr is True


def test_sql_surface_via_view(spark, pcap_dir):
    """SQL over pcaps — the Hive-DDL analog. (Note: CREATE TABLE USING a
    *Python* datasource loses OPTIONS at read time in PySpark 4.1 — the
    reader() instance receives empty options — so the supported SQL
    path is a temp view over read_pcap()/format('pcap').load().)"""
    read_pcap(spark, os.path.join(pcap_dir, "a.pcap"), decoder="dns").createOrReplaceTempView(
        "pcaps_sql"
    )
    out = spark.sql(
        "SELECT src_port, count(*) AS n FROM pcaps_sql "
        "WHERE src_port IS NOT NULL GROUP BY src_port ORDER BY src_port"
    ).collect()
    assert [(r.src_port, r.n) for r in out] == [(53, 1), (52938, 1)]


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE), reason="reference fixture absent")
def test_read_reference_fixture_via_spark(spark):
    df = read_pcap(spark, REF_FIXTURE, decoder="dns", calculate_md5=True)
    rows = df.orderBy("pkt_no").collect()
    assert len(rows) == 2
    assert rows[0].dns_qname == "ripe.net."
    assert len(rows[1].dns_authority) == 13


def test_write_packets_parquet_roundtrip(spark, pcap_dir, tmp_path):
    """decode-once → date-partitioned parquet → read back: the 100 TB
    ETL pattern (write_packets_parquet)."""
    from hadoop_pcap_spark.sources import write_packets_parquet

    out = str(tmp_path / "packets_pq")
    df = read_pcap(spark, pcap_dir, decoder="dns", calculate_md5=True)
    write_packets_parquet(df, out)

    back = spark.read.parquet(out)
    assert back.count() == df.count() == 4
    # partition column derived from ts (2011-10-07 fixture date)
    assert "capture_date" in back.columns
    dates = [str(r.capture_date) for r in back.select("capture_date").distinct().collect()]
    assert dates == ["2011-10-07"]
    # partition pruning: a date predicate must prune, not scan-and-filter
    pruned = back.filter(F.col("capture_date") == "1999-01-01")
    assert pruned.count() == 0
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or pruned.rdd.getNumPartitions() <= 1
    # values survive the round trip, incl. arrays and binary
    a = df.orderBy("file", "pkt_no").collect()
    b = back.drop("capture_date").orderBy("file", "pkt_no").collect()
    assert [r.dns_answer for r in a] == [r.dns_answer for r in b]
    assert [r.payload for r in a] == [r.payload for r in b]
    assert [r.md5 for r in a] == [r.md5 for r in b]


def test_engines_identical(spark, pcap_dir):
    """columnar (default), scalar-arrow and pandas paths must emit
    identical rows for both decoders."""
    for decoder in ("ip", "dns"):
        frames = {
            eng: sorted(
                tuple(r)
                for r in read_pcap(
                    spark, pcap_dir, decoder=decoder,
                    calculate_md5=True, engine=eng,
                ).collect()
            )
            for eng in ("arrow", "arrow-scalar", "pandas")
        }
        assert frames["arrow"] == frames["arrow-scalar"] == frames["pandas"]


def test_datasource_file_filter_pushdown(spark, pcap_dir):
    """file-column predicates prune whole files at the source (the
    pcap partition-pruning analog; double-opt-in: session conf +
    .option('pushdown')) and results stay correct."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, StringContains
    from hadoop_pcap_spark.sources.datasource import (
        PcapDataSourceReader, PcapPushdownReader)
    from hadoop_pcap_spark.sources.pcap_source import packet_schema

    # unit: pushFilters absorbs file predicates, yields the rest back
    rdr = PcapPushdownReader(packet_schema("ip"), {"path": pcap_dir})
    a_path = os.path.join(pcap_dir, "a.pcap")
    leftover = list(rdr.pushFilters([EqualTo(("file",), a_path),
                                     GreaterThan(("ts",), 0)]))
    assert [type(f).__name__ for f in leftover] == ["GreaterThan"]
    assert [p.path for p in rdr.partitions()] == [a_path]
    rdr2 = PcapPushdownReader(packet_schema("ip"), {"path": pcap_dir})
    assert list(rdr2.pushFilters([StringContains(("file",), "b.pcap")])) == []
    assert [os.path.basename(p.path) for p in rdr2.partitions()] == ["b.pcap.gz"]
    # In filter: PySpark names the tuple field .value (regression:
    # .values raised AttributeError after the filter was absorbed)
    from pyspark.sql.datasource import In
    rdr3 = PcapPushdownReader(packet_schema("ip"), {"path": pcap_dir})
    assert list(rdr3.pushFilters([In(("file",), (a_path, "/nope"))])) == []
    assert [p.path for p in rdr3.partitions()] == [a_path]
    # plain reader has no pushFilters of its own -> never triggers
    # Spark's pushdown-disabled error
    assert "pushFilters" not in PcapDataSourceReader.__dict__

    # end-to-end: conf + option -> file pruned at planning time
    from hadoop_pcap_spark.sources import register_pcap_datasource
    register_pcap_datasource(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = spark.read.format("pcap").option("pushdown", "true").load(pcap_dir)
        flt = df.filter(F.col("file") == a_path)
        rows = flt.select("file", "pkt_no").collect()
        assert len(rows) == 2 and all(r.file == a_path for r in rows)
        assert flt.rdd.getNumPartitions() == 1  # other files pruned
        plan = flt._jdf.queryExecution().executedPlan().toString()
        assert ") Filter " not in plan  # no Filter operator: fully absorbed
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")


def test_datasource_columns_option_prunes_schema_and_matches(spark, pcap_dir):
    """`columns` option pushes projection into the decode kernel (the
    DSv2 analog of read_pcap(columns=...); VERDICT r2 item 3)."""
    register_pcap_datasource(spark)
    pruned = (
        spark.read.format("pcap")
        .option("decoder", "dns")
        .option("columns", "file, ts, src, dst, dns_qname")
        .load(pcap_dir)
    )
    assert pruned.columns == ["file", "ts", "src", "dst", "dns_qname"]
    full = (
        spark.read.format("pcap")
        .option("decoder", "dns")
        .load(pcap_dir)
        .select("file", "ts", "src", "dst", "dns_qname")
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))


def test_datasource_user_schema_prunes(spark, pcap_dir):
    from hadoop_pcap_spark.sources.pcap_source import packet_schema

    sub = packet_schema("ip", ["file", "pkt_no", "src_port", "dst_port"])
    df = spark.read.format("pcap").schema(sub).load(pcap_dir)
    assert df.columns == ["file", "pkt_no", "src_port", "dst_port"]
    full = (
        spark.read.format("pcap")
        .load(pcap_dir)
        .select("file", "pkt_no", "src_port", "dst_port")
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, full.collect()))


def test_datasource_pruning_reaches_decoder_opts():
    """Pruned schema must translate to DecodeOptions.wanted so the
    kernels skip md5/DNS/payload work (not compute-then-drop)."""
    from hadoop_pcap_spark.pcap.decode import DecodeOptions
    from hadoop_pcap_spark.pcap.decode_np import decode_pcap_columnar
    from hadoop_pcap_spark.sources.datasource import _decode_opts
    from hadoop_pcap_spark.sources.pcap_source import packet_schema

    assert _decode_opts({"decoder": "dns"}, packet_schema("dns")).wanted is None
    sub = packet_schema("dns", ["file", "ts", "src"])
    opts = _decode_opts({"decoder": "dns", "calculatemd5": "true"}, sub)
    assert opts.wanted == {"file", "ts", "src"}
    # and the kernel observably skips the pruned work
    res = decode_pcap_columnar(
        S.dns_exchange_pcap(), opts=DecodeOptions(
            decoder="dns", calculate_md5=True, wanted={"file", "ts", "src"}
        ),
    )
    assert res.emit_payload is False  # payload never gathered
    assert all(v is None for v in res.objects["md5"])  # md5 never hashed
    assert all(v is None for v in res.objects["dns_qname"])  # DNS not parsed


def test_sql_front_door(spark):
    """The reference's Hive-QL workflow, re-homed: a packets view over
    a capture + warehouse views, queried purely via spark.sql."""
    from hadoop_pcap_spark.plans.pcap_queries import fixture_dir
    from hadoop_pcap_spark.sql import register_packets_view, register_warehouse_views

    register_packets_view(spark, fixture_dir(), decoder="dns")
    got = spark.sql(
        """SELECT dns_qname, count(*) AS n FROM packets
           WHERE dst_port = 53 AND dns_qname IS NOT NULL
           GROUP BY dns_qname"""
    ).collect()
    assert [(r.dns_qname, r.n) for r in got] == [("ripe.net.", 2)]

    register_warehouse_views(spark, "/root/testdata/sf0.001")
    n = spark.sql(
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0].n
    assert n > 0


def test_etl_write_sorts_rows_within_files(spark, tmp_path):
    """The decode→parquet ETL must produce ts-sorted files (tight
    row-group min/max stats).  Regression for the V1Writes trap: a
    bare sortWithinPartitions(ts) before partitionBy is eliminated
    by Spark's own partition-column sort; sorting (partition, ts)
    survives."""
    import glob as _glob

    import pyarrow.parquet as pq

    from hadoop_pcap_spark.sources.pcap_source import write_packets_parquet

    df = spark.range(2000).selectExpr(
        "cast(id % 7 as long) * 86400 + 1700000000 - id as ts", "id as pkt"
    )
    out = str(tmp_path / "pq")
    write_packets_parquet(df.repartition(4), out)
    files = _glob.glob(f"{out}/capture_date=*/*.parquet")
    assert files
    for f in files:
        ts = pq.read_table(f, columns=["ts"]).column("ts").to_pylist()
        assert ts == sorted(ts), f"unsorted ts in {f}"


def test_read_pcap_stream_equals_batch(spark):
    """Streaming capture ingestion (read_pcap_stream) is row-identical
    to the batch reader over the same files — one file per
    micro-batch, so discovery/batching really happens."""
    import uuid

    from hadoop_pcap_spark.plans.pcap_queries import fixture_dir
    from hadoop_pcap_spark.sources import read_pcap, read_pcap_stream

    d = fixture_dir()
    name = "t_pcap_stream_" + uuid.uuid4().hex[:8]
    q = (
        read_pcap_stream(spark, d, calculate_md5=True, max_files_per_trigger=1)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def key(r):
        return (r["file"], r["pkt_no"])

    got = sorted((r.asDict() for r in spark.table(name).collect()), key=key)
    spark.catalog.dropTempView(name)
    exp = sorted(
        (r.asDict() for r in read_pcap(spark, d, calculate_md5=True).collect()),
        key=key,
    )
    assert len(exp) > 0
    assert got == exp


def test_read_pcap_stream_argument_guards(spark, tmp_path):
    from hadoop_pcap_spark.sources import read_pcap_stream

    with pytest.raises(ValueError, match="arrow engine"):
        read_pcap_stream(spark, str(tmp_path), engine="pandas")
    with pytest.raises(ValueError, match="streamed chunked path"):
        read_pcap_stream(spark, str(tmp_path), chunk_bytes=0)


def test_dsv2_mixed_link_pcapng_nonstrict(spark, tmp_path):
    """The format('pcap') front door decodes a mixed-link pcapng
    (EN10MB + SLL interfaces, the tcpdump -i any merge) completely in
    non-strict mode — per-packet link dispatch reaches the DSv2 path,
    not just the read_pcap helper (r12)."""
    from hadoop_pcap_spark.pcap import synth as S
    from hadoop_pcap_spark.sources import register_pcap_datasource

    register_pcap_datasource(spark)
    (tmp_path / "m.pcapng").write_bytes(S.mixed_link_pcapng())
    df = (
        spark.read.format("pcap")
        .option("strictReference", "false")
        .load(str(tmp_path))
    )
    rows = df.select("pkt_no", "src", "ether_type").orderBy("pkt_no").collect()
    intents = [m for _ifid, _f, m in S.mixed_link_frames()]
    assert len(rows) == len(intents)
    assert [r.src for r in rows] == [m["src"] for m in intents]
    assert [r.ether_type for r in rows] == [m["ether_type"] for m in intents]
    # strict mode keeps the reference's reject-pcapng parity:
    # FAILFAST (the default) raises; PERMISSIVE yields zero rows
    from pyspark.errors import PythonException

    with pytest.raises(PythonException, match="PCAP"):
        spark.read.format("pcap").load(str(tmp_path)).count()
    permissive = (
        spark.read.format("pcap")
        .option("mode", "PERMISSIVE")
        .load(str(tmp_path))
    )
    assert permissive.count() == 0


def test_decode_frames_column_matches_file_path(spark, tmp_path):
    """decode_frames (packets as DataFrame rows, no files) renders
    every column identically to read_pcap over the same frames packed
    into a capture file; ts fractional parts become ts_usec; NULL
    frames are skipped; pkt_no is a per-partition running ordinal."""
    from pyspark.sql import functions as F

    from hadoop_pcap_spark.pcap import synth as S
    from hadoop_pcap_spark.sources import decode_frames, read_pcap

    frames = [f for f, _m in S.http_exchange_frames()]
    tss = [1470000000 + i + (i % 4) * 0.25 for i in range(len(frames))]
    p = tmp_path / "ref.pcap"
    p.write_bytes(
        S.global_header(1)
        + b"".join(
            S.record(int(t), f, ts_usec=int(round((t - int(t)) * 1e6)))
            for f, t in zip(frames, tss)
        )
    )
    via_file = read_pcap(spark, str(tmp_path)).drop("file").orderBy("pkt_no")

    rows = [(float(t), bytearray(f)) for t, f in zip(tss, frames)]
    rows.insert(3, (0.0, None))  # a NULL frame: skipped, not an error
    df = spark.createDataFrame(rows, "arrival double, frame binary").coalesce(1)
    via_col = (
        decode_frames(df, "frame", ts_col="arrival")
        .drop("file")
        .orderBy("pkt_no")
    )
    a, b = via_file.collect(), via_col.collect()
    assert len(a) == len(b) == len(frames)
    for ra, rb in zip(a, b):
        assert ra == rb, (ra, rb)


def test_decode_frames_streaming_smoke(spark, tmp_path):
    """decode_frames on a STREAMING DataFrame: frames arriving as
    parquet-file micro-batches decode to the same per-protocol counts
    as the batch path — the live message-bus shape."""
    from pyspark.sql import functions as F

    from hadoop_pcap_spark.pcap import synth as S
    from hadoop_pcap_spark.sources import decode_frames

    q = S.dns_query(7, "example.com")
    frames = [
        S.ethernet(S.ipv4(S.udp(q, 5353, 53, "10.0.0.1", "10.0.0.2"), 17,
                          "10.0.0.1", "10.0.0.2")),
        S.ethernet(S.ipv4(S.tcp(b"x" * 64, 40000, 443), 6,
                          "10.0.0.3", "10.0.0.4")),
    ]
    rows = [(float(1700000000 + i), bytearray(frames[i % 2])) for i in range(40)]
    src_dir = str(tmp_path / "incoming")
    spark.createDataFrame(rows, "arrival double, frame binary").repartition(
        2
    ).write.parquet(src_dir)
    stream = spark.readStream.schema("arrival double, frame binary").option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir)
    agg = (
        decode_frames(stream, "frame", ts_col="arrival")
        .groupBy("protocol")
        .agg(F.count("*").alias("n"))
    )
    name = "decode_frames_stream_smoke"
    qh = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName(name).trigger(availableNow=True).start()
    )
    qh.awaitTermination()
    got = {r.protocol: r.n for r in spark.table(name).collect()}
    spark.catalog.dropTempView(name)
    assert got == {"UDP": 20, "TCP": 20}
