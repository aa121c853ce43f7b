"""Structured Streaming tests: a streaming query over a static
directory must produce exactly the batch result (batch-equivalence,
the strongest oracle available for streaming)."""

import pytest

from pyspark.sql import functions as F

from hadoop_pcap_spark.plans import events_table
from hadoop_pcap_spark.streaming import stream as STRM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events with a real TimestampType ts, written as parquet for the
    file-streaming source."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    df = events_table(spark, SF).withColumn(
        "ts", F.expr("timestamp_micros(ts)")
    )
    df.write.mode("overwrite").parquet(d)
    return d


def _run_stream(spark, df, name):
    q = (
        df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


def test_tumbling_counts_batch_equivalence(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    streamed = _run_stream(
        spark,
        STRM.tumbling_counts(spark.readStream.schema(schema).parquet(events_dir)),
        "tumbling_out",
    )
    batch = STRM.tumbling_counts(spark.read.parquet(events_dir)).collect()
    key = lambda r: (r.win_start, r.event_type)
    assert {key(r): r.n for r in streamed} == {key(r): r.n for r in batch}
    assert len(batch) > 0


def test_session_window_batch_equivalence(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    streamed = _run_stream(
        spark,
        STRM.session_windows(
            spark.readStream.schema(schema).parquet(events_dir), gap="10 minutes"
        ),
        "session_out",
    )
    batch = STRM.session_windows(
        spark.read.parquet(events_dir), gap="10 minutes"
    ).collect()
    key = lambda r: (r.sess_start, r.user_id)
    assert {key(r): r.n_events for r in streamed} == {key(r): r.n_events for r in batch}


def test_dedup_within_watermark_append(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    src = spark.readStream.schema(schema).parquet(events_dir)
    deduped = STRM.dedup_within_watermark(src, keys=["user_id", "event_type"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT count(*) AS n FROM dedup_out").collect()[0].n
    finally:
        q.stop()
    exact = (
        spark.read.parquet(events_dir)
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    # all data arrives in one batch → within-watermark dedup sees every
    # duplicate → must equal the exact distinct count
    assert got == exact


def test_streaming_pcap_source_incremental(spark, tmp_path):
    """spark.readStream.format('pcap'): new capture files arriving in
    the directory appear as new micro-batches."""
    import gzip as _g

    from hadoop_pcap_spark.pcap import synth as S
    from hadoop_pcap_spark.sources import register_pcap_datasource

    register_pcap_datasource(spark)
    d = str(tmp_path / "livecaps")
    import os

    os.makedirs(d)
    (tmp_path / "livecaps" / "a.pcap").write_bytes(S.dns_exchange_pcap())

    stream = (
        spark.readStream.format("pcap")
        .option("decoder", "dns")
        .option("path", d)
        .load()
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("live_pcap")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) AS n FROM live_pcap").collect()[0].n
        assert n1 == 2
        # drop a second capture file in; next batch picks up only the delta
        (tmp_path / "livecaps" / "b.pcap").write_bytes(S.dns_exchange_pcap(ts=1317994000))
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT file, count(*) AS n FROM live_pcap GROUP BY file ORDER BY file"
        ).collect()
        assert [r.n for r in rows] == [2, 2]
        assert rows[0].file.endswith("a.pcap") and rows[1].file.endswith("b.pcap")
        qnames = spark.sql(
            "SELECT DISTINCT dns_qname FROM live_pcap WHERE dns_qname IS NOT NULL"
        ).collect()
        assert [r.dns_qname for r in qnames] == ["ripe.net."]
    finally:
        q.stop()


def test_streaming_dns_tcp_reassembly_across_batches(spark, tmp_path):
    """A DNS message split across MICRO-BATCHES (not just segments) is
    emitted exactly once, when its final segment arrives; per-flow
    msg_no continues across batches."""
    import os

    from hadoop_pcap_spark.pcap import synth as S
    from hadoop_pcap_spark.sources import register_pcap_datasource

    register_pcap_datasource(spark)
    d = str(tmp_path / "tcpcaps")
    os.makedirs(d)

    q_msg = S.dns_query(0x4242, "bigzone.example", 252)
    r1 = S.dns_response(
        0x4242, "bigzone.example", 252,
        answers=[(f"h{i}.bigzone.example", 600, 1, S.a_rdata(f"10.1.{i}.1"))
                 for i in range(20)],
    )
    r2 = S.dns_response(0x4243, "bigzone.example", 6,
                        answers=[("bigzone.example", 600, 2,
                                  S.ns_rdata("ns1.bigzone.example"))])
    cli, srv = "192.0.2.10", "192.0.2.53"
    (q_seg,) = S.dns_tcp_segments([q_msg], [2 + len(q_msg)])
    rs1, rs2 = S.dns_tcp_segments([r1, r2], [120])

    # wave 1: complete query + first half of the response stream
    wave1 = (
        S.global_header(1)
        + S.record(1700000000, S.ethernet(S.ipv4(S.tcp(q_seg, 40000, 53), 6, cli, srv)))
        + S.record(1700000001, S.ethernet(S.ipv4(S.tcp(rs1, 53, 40000), 6, srv, cli)))
    )
    (tmp_path / "tcpcaps" / "w1.pcap").write_bytes(wave1)

    stream = spark.readStream.format("pcap").option("path", d).load()
    out = STRM.streaming_dns_tcp_reassembly(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("tcp_reasm")
        .start()
    )
    try:
        q.processAllAvailable()
        b1 = spark.sql("SELECT * FROM tcp_reasm").collect()
        # only the query completed; the response tail is parked in state
        assert [(r.src, r.msg_no, r.dns_queryid) for r in b1] == [
            (cli, 1, 0x4242)
        ]
        # wave 2: the rest of the response stream (completes r1 AND r2)
        wave2 = S.global_header(1) + S.record(
            1700000002, S.ethernet(S.ipv4(S.tcp(rs2, 53, 40000), 6, srv, cli))
        )
        (tmp_path / "tcpcaps" / "w2.pcap").write_bytes(wave2)
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM tcp_reasm ORDER BY src, msg_no"
        ).collect()
    finally:
        q.stop()

    assert [(r.src, r.msg_no, r.dns_queryid) for r in rows] == [
        (cli, 1, 0x4242), (srv, 1, 0x4242), (srv, 2, 0x4243)
    ]
    srv_rows = [r for r in rows if r.src == srv]
    assert len(srv_rows[0].dns_answer) == 20 and len(srv_rows[1].dns_answer) == 1
    assert srv_rows[0].n_segments == 2  # state carried the batch-1 segment


def test_stateful_flow_counts_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState: state accumulates across micro-batches —
    feed two parquet files arriving separately, totals must carry over."""
    import shutil

    from pyspark.sql import functions as F
    from hadoop_pcap_spark.plans import events_table

    src_dir = str(tmp_path / "ev_stream")
    stage = str(tmp_path / "stage")
    base = (
        events_table(spark, SF)
        .withColumn("ts", F.expr("timestamp_micros(ts)"))
        .filter(F.col("user_id") < 5)
    )
    half1 = base.filter(F.col("event_id") % 2 == 0)
    half2 = base.filter(F.col("event_id") % 2 == 1)
    half1.write.mode("overwrite").parquet(src_dir)
    half2.write.mode("overwrite").parquet(stage)

    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    out = STRM.stateful_flow_counts(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("flow_state")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r.user_id: r.n_events
            for r in spark.sql("SELECT * FROM flow_state").collect()
        }
        # second batch: move half2's files into the watched dir
        import glob, os

        for i, f in enumerate(glob.glob(stage + "/part-*.parquet")):
            shutil.copy(f, os.path.join(src_dir, f"late-{i}.parquet"))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM flow_state").collect()
    finally:
        q.stop()

    # the latest emission per user must equal the full batch counts
    latest = {}
    for r in rows:
        latest[r.user_id] = max(latest.get(r.user_id, 0), r.n_events)
    expected = {
        r.user_id: r.n
        for r in base.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert latest == expected
    # and the first batch alone was a strict subset (state really accumulated)
    assert all(first[u] < expected[u] for u in first)


def test_pcap_stream_offset_compaction(tmp_path):
    """Offset stays bounded (watermark-on-mtime prunes `recent`),
    replay between offsets is exact, legacy offsets upgrade."""
    import os

    from hadoop_pcap_spark.pcap import synth as S
    from hadoop_pcap_spark.sources.datasource import PcapSimpleStreamReader
    from hadoop_pcap_spark.sources.pcap_source import packet_schema

    d = tmp_path / "caps"
    d.mkdir()
    schema = packet_schema("ip")
    rdr = PcapSimpleStreamReader(
        schema, {"path": str(d), "offsetretentionsec": "100"}
    )

    def write(name, age_sec):
        p = d / name
        p.write_bytes(S.dns_exchange_pcap())
        t = 1_700_000_000 - age_sec
        os.utime(p, (t, t))
        return str(p)

    o0 = rdr.initialOffset()
    a = write("a.pcap", 500)
    b = write("b.pcap", 400)
    rows1, o1 = rdr.read(o0)
    rows1 = list(rows1)
    assert len(rows1) == 4  # 2 files x 2 packets
    assert set(o1["recent"]) == {a, b}

    # batch 2: newer file advances the watermark far past a/b, so the
    # offset compacts to just the fresh window
    c = write("c.pcap", 0)
    rows2, o2 = rdr.read(o1)
    assert len(list(rows2)) == 2
    assert set(o2["recent"]) == {c}  # a,b pruned: mtime < wm
    assert o2["wm"] > o1["wm"]

    # batch 3: nothing new; a file appearing older than retention
    # behind the newest is skipped (documented maxFileAge tradeoff)
    write("late.pcap", 900)
    rows3, o3 = rdr.read(o2)
    assert list(rows3) == []
    assert set(o3["recent"]) == {c}

    # restart replay: delta between consecutive offsets is exact
    assert len(list(rdr.readBetweenOffsets(o0, o1))) == 4
    assert len(list(rdr.readBetweenOffsets(o1, o2))) == 2
    assert list(rdr.readBetweenOffsets(o2, o3)) == []

    # legacy {"seen": [...]} offsets: only the unseen file replays,
    # and the offset upgrades to the compacted shape
    legacy = {"seen": [a, b]}
    rows_l, o_l = rdr.read(legacy)
    assert {t[0] for t in rows_l} == {c, str(d / "late.pcap")} - set()
    assert "wm" in o_l and "seen" not in o_l


def test_pcap_stream_live_appended_file_not_redelivered(tmp_path):
    """A file whose mtime keeps advancing (tcpdump -w style) must not
    be re-delivered when its original mtime ages past the watermark —
    its `recent` entry refreshes instead of pruning."""
    import os

    from hadoop_pcap_spark.pcap import synth as S
    from hadoop_pcap_spark.sources.datasource import PcapSimpleStreamReader
    from hadoop_pcap_spark.sources.pcap_source import packet_schema

    d = tmp_path / "caps"
    d.mkdir()
    rdr = PcapSimpleStreamReader(
        packet_schema("ip"), {"path": str(d), "offsetretentionsec": "100"}
    )
    base = 1_700_000_000

    live = d / "current.pcap"
    live.write_bytes(S.dns_exchange_pcap())
    os.utime(live, (base, base))

    rows1, o1 = rdr.read(rdr.initialOffset())
    assert len(list(rows1)) == 2

    # 400s later: live file was appended (mtime advanced), plus a new
    # rotated file arrived — watermark jumps past the ORIGINAL mtime
    os.utime(live, (base + 400, base + 400))
    rot = d / "rotated.pcap"
    rot.write_bytes(S.dns_exchange_pcap())
    os.utime(rot, (base + 400, base + 400))

    rows2, o2 = rdr.read(o1)
    files2 = {t[0] for t in rows2}
    assert files2 == {str(rot)}  # live file NOT re-delivered
    assert str(live) in o2["recent"]  # entry refreshed, not pruned

    # once the live file goes quiet for > retention, it ages out of the
    # offset entirely and stays processed via the watermark
    far = base + 1000
    os.utime(rot, (far, far))
    fresh = d / "fresh.pcap"
    fresh.write_bytes(S.dns_exchange_pcap())
    os.utime(fresh, (far, far))
    rows3, o3 = rdr.read(o2)
    assert {t[0] for t in rows3} == {str(fresh)}
    assert str(live) not in o3["recent"]


def test_streaming_lists_remote_files(tmp_path, monkeypatch):
    """The streaming source's mtime watermark works over a remote
    (pyarrow.fs) root exactly like a local directory."""
    import pyarrow.fs as pafs

    from hadoop_pcap_spark.pcap import chunked as C
    from hadoop_pcap_spark.pcap import synth as S
    from hadoop_pcap_spark.sources import datasource as DS

    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    real = C._filesystem_for

    def fake(path):
        if path.startswith("rmt://"):
            return fs, path[len("rmt://"):]
        return real(path)

    monkeypatch.setattr(C, "_filesystem_for", fake)
    (tmp_path / "a.pcap").write_bytes(S.dns_exchange_pcap())
    (tmp_path / "b.pcap").write_bytes(S.dns_exchange_pcap(ts=1317994000))

    reader = DS.PcapSimpleStreamReader.__new__(DS.PcapSimpleStreamReader)
    reader._path = "rmt://"
    files = reader._list_files()
    assert sorted(p.split("://")[1] for p, _m in files) == ["a.pcap", "b.pcap"]
    assert all(m > 0 for _p, m in files)


def test_reassembly_hot_flow_guard_recovers(spark, tmp_path):
    """A flow whose buffered residual exceeds max_flow_bytes must be
    RESET, not tail-clipped: the old guard re-truncated every batch to
    the same stuck residual, silently discarding all later segments
    (review finding).  After the poisoned batch, a fresh complete
    message on the same flow must still be emitted."""
    import os

    from hadoop_pcap_spark.pcap import synth as S
    from hadoop_pcap_spark.sources import register_pcap_datasource

    register_pcap_datasource(spark)
    d = str(tmp_path / "hotcaps")
    os.makedirs(d)
    cli, srv = "192.0.2.10", "192.0.2.53"

    # wave 1: a poisoned stream — length prefix promises 0xffff bytes
    # that never arrive, and the carried residual (102 B) exceeds the
    # tiny max_flow_bytes
    poison = b"\xff\xff" + b"A" * 100
    wave1 = S.global_header(1) + S.record(
        1700000000, S.ethernet(S.ipv4(S.tcp(poison, 40000, 53), 6, cli, srv))
    )
    (tmp_path / "hotcaps" / "w1.pcap").write_bytes(wave1)

    stream = spark.readStream.format("pcap").option("path", d).load()
    out = STRM.streaming_dns_tcp_reassembly(stream, max_flow_bytes=64)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("tcp_hot")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM tcp_hot").count() == 0
        # wave 2: same flow, a complete well-formed query
        msg = S.dns_query(7, "x.example", 1)
        (seg,) = S.dns_tcp_segments([msg], [2 + len(msg)])
        wave2 = S.global_header(1) + S.record(
            1700000001, S.ethernet(S.ipv4(S.tcp(seg, 40000, 53), 6, cli, srv))
        )
        (tmp_path / "hotcaps" / "w2.pcap").write_bytes(wave2)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM tcp_hot").collect()
    finally:
        q.stop()
    assert [(r.src, r.dns_queryid) for r in rows] == [(cli, 7)]


def test_stateful_flow_counts_crash_recovery_exactly_once(spark, tmp_path):
    """Kill-and-restart proof for the custom stateful operator
    (VERDICT r5 item 6): run batch 1 to completion, delete the SINK
    COMMIT marker for it (the crash window between state-store commit
    and sink commit — the worst case for double counting), add more
    data, and restart from the checkpoint.  Exactly-once state means
    the replayed batch re-emits IDENTICAL rows (same n_events — state
    recovery loads the pre-batch version and reprocesses
    deterministically, it must not apply the batch twice) and the
    final totals equal the one-pass batch counts."""
    import glob
    import os
    import shutil

    from hadoop_pcap_spark.plans import events_table

    src_dir = str(tmp_path / "ev_src")
    stage = str(tmp_path / "ev_stage")
    ckpt = str(tmp_path / "ev_ckpt")
    base = (
        events_table(spark, SF)
        .withColumn("ts", F.expr("timestamp_micros(ts)"))
        .filter(F.col("user_id") < 5)
    )
    half1 = base.filter(F.col("event_id") % 2 == 0)
    half2 = base.filter(F.col("event_id") % 2 == 1)
    half1.write.mode("overwrite").parquet(src_dir)
    half2.write.mode("overwrite").parquet(stage)
    schema = spark.read.parquet(src_dir).schema

    def start(collector):
        # memory sink can't recover from a checkpoint; foreachBatch can,
        # and hands us the batchId the replay assertion needs
        def sink(batch_df, batch_id):
            collector.extend((batch_id, r) for r in batch_df.collect())

        stream = spark.readStream.schema(schema).parquet(src_dir)
        return (
            STRM.stateful_flow_counts(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    got1 = []
    q1 = start(got1)
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    run1 = {r.user_id: (r.n_events, r.batch_events) for _b, r in got1}
    assert run1

    # crash simulation: the sink commit for the last completed batch
    # never made it to the checkpoint — on restart Spark must replay
    # that batch against the PRE-batch state version.  (The local-fs
    # checkpoint manager keeps a Hadoop .crc sidecar per commit file;
    # a real crash loses both, so both go.)
    commits = sorted(
        glob.glob(os.path.join(ckpt, "commits", "[0-9]*")),
        key=lambda p: int(os.path.basename(p)),
    )
    os.remove(commits[-1])
    crc = os.path.join(
        os.path.dirname(commits[-1]), f".{os.path.basename(commits[-1])}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)

    for i, f in enumerate(glob.glob(stage + "/part-*.parquet")):
        shutil.copy(f, os.path.join(src_dir, f"late-{i}.parquet"))

    got2 = []
    q2 = start(got2)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    # run 2 saw the replayed batch (same batchId as the one whose sink
    # commit was deleted) plus the new batch: the replay must be
    # row-identical to the original emission (no double count)
    replay_id = min(b for b, _r in got2)
    replay = {
        r.user_id: (r.n_events, r.batch_events)
        for b, r in got2
        if b == replay_id
    }
    assert replay == run1, "replayed batch differs from original emission"
    # and the latest totals equal the one-pass batch aggregation
    latest = {}
    for _b, r in got2:
        latest[r.user_id] = max(latest.get(r.user_id, 0), r.n_events)
    expected = {
        r.user_id: r.n
        for r in base.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert latest == expected


def test_dedup_within_watermark_survives_restart(spark, tmp_path):
    """Streaming exact-dedup state must survive a stop/restart: keys
    seen before the restart are still duplicates after it (the
    checkpointed state store is the memory), and only genuinely new
    keys append."""
    import glob
    import os
    import shutil

    from pyspark.sql import Row

    src_dir = str(tmp_path / "dd_src")
    stage = str(tmp_path / "dd_stage")
    ckpt = str(tmp_path / "dd_ckpt")

    # controlled event times: everything inside ONE 10-minute watermark
    # window, wave 2 strictly later than wave 1 — so nothing is evicted
    # or late-dropped and the ONLY dedup mechanism in play is the
    # checkpointed state
    def mk(rows_spec, t0):
        rows = [
            Row(user_id=u, event_type=et, ts="2026-01-01 00:%02d:%02d" % divmod(t0 + i, 60))
            for i, (u, et) in enumerate(rows_spec)
        ]
        return spark.createDataFrame(rows).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    w1_keys = [(u, et) for u in range(5) for et in ("signup", "click")]
    wave1 = mk(w1_keys + w1_keys[:3], 0)  # includes in-batch duplicates
    new_keys = [(u, "click") for u in (5, 6, 7)]
    wave2 = mk(w1_keys + new_keys, 120)  # re-sends all of wave 1 + new
    wave1.write.mode("overwrite").parquet(src_dir)
    wave2.write.mode("overwrite").parquet(stage)
    schema = spark.read.parquet(src_dir).schema

    def start(collector):
        def sink(batch_df, batch_id):
            collector.extend(
                (r.user_id, r.event_type)
                for r in batch_df.select("user_id", "event_type").collect()
            )

        stream = spark.readStream.schema(schema).parquet(src_dir)
        return (
            STRM.dedup_within_watermark(stream, keys=["user_id", "event_type"])
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    rows1 = []
    q1 = start(rows1)
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    got1 = set(rows1)
    assert len(rows1) == len(got1), "duplicate emission within run 1"
    exact1 = {
        (r.user_id, r.event_type)
        for r in wave1.select("user_id", "event_type").distinct().collect()
    }
    assert got1 == exact1

    for i, f in enumerate(glob.glob(stage + "/part-*.parquet")):
        shutil.copy(f, os.path.join(src_dir, f"late-{i}.parquet"))

    rows2 = []
    q2 = start(rows2)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got2 = set(rows2)
    assert len(rows2) == len(got2), "duplicate emission within run 2"

    # post-restart emissions: only the NEW keys — every wave-1 key in
    # wave 2 was suppressed by state recovered from the checkpoint
    exact_new = {
        (r.user_id, r.event_type)
        for r in wave2.select("user_id", "event_type").distinct().collect()
    } - exact1
    assert got2 == exact_new
    assert exact_new, "fixture must introduce new keys"


def test_streaming_corpus_filter_matches_batch(spark, tmp_path):
    """rules + scrub + exact dedup: the streaming kept-set equals the
    batch stages on a bounded input (one watermark window)."""
    import os

    from pyspark.sql import Row

    from hadoop_pcap_spark.functions.text import (
        exact_fingerprint,
        gopher_flags,
        scrub_pii,
    )

    base = "the cats sat on the mats and all was fine here today " * 3
    rows = [
        Row(doc_id=i, ts="2026-01-01 00:00:%02d" % (i % 50), text=t)
        for i, t in enumerate(
            [base, base, base + "extra tail words", "word " * 5, " ".join(["quartz"] * 40)]
            * 4
        )
    ]
    src = str(tmp_path / "docs_in")
    spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .parquet(src)
    )
    out = STRM.streaming_corpus_filter(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("corpus_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT fp FROM corpus_stream").collect()
    finally:
        q.stop()

    batch = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    flags = gopher_flags(F.col("text"))
    keep = flags["wc_ok"] & flags["mwl_ok"] & flags["sw_ok"]
    expect = (
        batch.filter(keep)
        .withColumn("text", scrub_pii(F.col("text")))
        .select(exact_fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .collect()
    )
    assert sorted(r.fp for r in got) == sorted(r.fp for r in expect)
    assert len(got) >= 1


# --- stream-stream watermarked interval join ---------------------------------

_T0_US = 1704067200000000  # 2024-01-01 00:00:00 UTC in epoch µs


def _mk_events(spark, rows):
    """rows: (event_id, minutes_after_t0, user_id, event_type, value) →
    DataFrame in the staged-events shape (TimestampType ts), built via
    integer-µs arithmetic so no local-timezone conversion can leak in."""
    df = spark.createDataFrame(
        rows, "event_id long, mins long, user_id long, event_type string, value double"
    )
    return df.select(
        "event_id",
        F.expr(f"timestamp_micros({_T0_US} + mins * 60000000)").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def _join_streams(spark, src_dir, watermark="2 hours"):
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def src():
        return spark.readStream.schema(schema).parquet(src_dir)

    views = src().filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts"), F.col("event_id").alias("view_id")
    )
    purchases = src().filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id")
    )
    return STRM.stream_stream_interval_join(
        views, purchases, key="user_id", left_ts="v_ts", right_ts="p_ts",
        max_gap="1 hour", watermark=watermark,
    )


def test_stream_stream_join_matches_across_batches(spark, tmp_path):
    """A view arriving in batch 1 must still pair with a purchase
    arriving in batch 2 (left state persisted across micro-batches),
    and the multi-batch streaming result must equal the batch interval
    join over the union — the batch-equivalence oracle."""
    import glob
    import os
    import shutil

    src_dir = str(tmp_path / "ssj_src")
    stage = str(tmp_path / "ssj_stage")
    chunk1 = _mk_events(spark, [
        (101, 0, 1, "view", 0.0),
        (102, 5, 2, "view", 0.0),
        (201, 30, 1, "purchase", 10.0),
    ])
    chunk2 = _mk_events(spark, [
        (202, 50, 2, "purchase", 7.5),      # pairs with view 102 from batch 1
        (103, 180, 1, "view", 0.0),
        (203, 210, 1, "purchase", 3.0),     # pairs with view 103 in-batch
        (204, 240, 3, "purchase", 9.0),     # no view for user 3 → no pair
        (104, 400, 1, "view", 0.0),         # purchase 201 is 370 min earlier → no pair
    ])
    chunk1.write.mode("overwrite").parquet(src_dir)
    chunk2.write.mode("overwrite").parquet(stage)

    q = (
        _join_streams(spark, src_dir)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .start()
    )
    try:
        q.processAllAvailable()
        n_first = spark.sql("SELECT count(*) AS n FROM ssj_out").collect()[0].n
        for i, f in enumerate(glob.glob(stage + "/part-*.parquet")):
            shutil.copy(f, os.path.join(src_dir, f"late-{i}.parquet"))
        q.processAllAvailable()
        got = {
            (r.view_id, r.purchase_id)
            for r in spark.sql("SELECT view_id, purchase_id FROM ssj_out").collect()
        }
    finally:
        q.stop()

    assert n_first == 1          # only (101, 201) is joinable inside batch 1
    assert got == {(101, 201), (102, 202), (103, 203)}

    # batch-equivalence: the same interval join over the full union
    allev = chunk1.unionByName(chunk2)
    v = allev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts"), F.col("event_id").alias("view_id")
    )
    p = allev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = {
        (r.view_id, r.purchase_id)
        for r in v.join(
            p,
            (v.user_id == p.p_user)
            & (p.p_ts >= v.v_ts)
            & (p.p_ts <= v.v_ts + F.expr("INTERVAL 1 hour")),
        ).collect()
    }
    assert got == batch


def test_stream_stream_join_drops_late_rows_beyond_watermark(spark, tmp_path):
    """Watermark semantics: once batch 1 advances the watermark far
    past an old view's join horizon, a purchase arriving in batch 2
    with an event time below the watermark is dropped — the streaming
    result legitimately diverges from the batch join there (bounded
    state is the point of the watermark)."""
    import glob
    import os
    import shutil

    src_dir = str(tmp_path / "ssj_late_src")
    stage = str(tmp_path / "ssj_late_stage")
    chunk1 = _mk_events(spark, [
        (101, 0, 1, "view", 0.0),
        (201, 10, 1, "purchase", 1.0),     # in-batch pair
        # both sides must advance: the global watermark is the MIN over
        # every watermarked stream (multipleWatermarkPolicy=min), so a
        # high-ts row on only one side leaves the other holding it back
        (109, 300, 9, "view", 0.0),        # views side → t0+290min
        (209, 290, 9, "purchase", 0.0),    # purchases side → t0+280min (before
                                           # the view → no (109, 209) pair)
    ])
    chunk2 = _mk_events(spark, [
        (202, 20, 1, "purchase", 2.0),     # batch-joinable, but < watermark → dropped
    ])
    chunk1.write.mode("overwrite").parquet(src_dir)
    chunk2.write.mode("overwrite").parquet(stage)

    q = (
        _join_streams(spark, src_dir, watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_late")
        .start()
    )
    try:
        q.processAllAvailable()
        for i, f in enumerate(glob.glob(stage + "/part-*.parquet")):
            shutil.copy(f, os.path.join(src_dir, f"late-{i}.parquet"))
        q.processAllAvailable()
        got = {
            (r.view_id, r.purchase_id)
            for r in spark.sql("SELECT view_id, purchase_id FROM ssj_late").collect()
        }
    finally:
        q.stop()

    assert got == {(101, 201)}


def test_stream_stream_join_left_outer_emits_after_watermark(spark, tmp_path):
    """left_outer: an unmatched left row is held in state and emitted
    NULL-extended only once the watermark passes its join horizon
    (Spark then runs a no-data finalization batch).  Pin both halves:
    the matched pairs emit normally; the unmatched view emits with a
    NULL purchase_id after later data advances both watermarks."""
    import glob
    import os
    import shutil

    src_dir = str(tmp_path / "ssj_lo_src")
    stage = str(tmp_path / "ssj_lo_stage")
    chunk1 = _mk_events(spark, [
        (101, 0, 1, "view", 0.0),
        (201, 5, 1, "purchase", 1.0),      # pair (101, 201)
        (102, 10, 2, "view", 0.0),         # no purchase for user 2 → outer row
    ])
    chunk2 = _mk_events(spark, [
        # advance BOTH sides' watermarks far past 102's horizon
        # (10 min + 1 h gap + 10 min delay): min(300,300) − 10 = 290 min
        (110, 300, 9, "view", 0.0),
        (210, 300, 9, "purchase", 2.0),    # pair (110, 210), gap 0
    ])
    chunk1.write.mode("overwrite").parquet(src_dir)
    chunk2.write.mode("overwrite").parquet(stage)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def src():
        return spark.readStream.schema(schema).parquet(src_dir)

    views = src().filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts"), F.col("event_id").alias("view_id")
    )
    purchases = src().filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id")
    )
    joined = STRM.stream_stream_interval_join(
        views, purchases, key="user_id", left_ts="v_ts", right_ts="p_ts",
        max_gap="1 hour", watermark="10 minutes", how="left_outer",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_outer")
        .start()
    )
    try:
        q.processAllAvailable()
        for i, f in enumerate(glob.glob(stage + "/part-*.parquet")):
            shutil.copy(f, os.path.join(src_dir, f"late-{i}.parquet"))
        q.processAllAvailable()
        got = {
            (r.view_id, r.purchase_id)
            for r in spark.sql("SELECT view_id, purchase_id FROM ssj_outer").collect()
        }
    finally:
        q.stop()

    assert got == {(101, 201), (110, 210), (102, None)}


def test_streaming_ann_screen_verdicts_and_multibatch(spark, tmp_path):
    """The streaming ANN screen (r11): planted ±2% twins must come
    back is_neardup=True with their own original as best match,
    negated vectors is_neardup=False; and processing the same
    incoming set in MULTIPLE micro-batches (maxFilesPerTrigger=1)
    must produce exactly the single-batch result — the per-batch
    search holds no cross-batch state (it lives in the index)."""
    from hadoop_pcap_spark.operators.ann_index import read_ann_index
    from hadoop_pcap_spark.plans import load_all, table
    from hadoop_pcap_spark.plans.pipeline import _ann_index_table
    from hadoop_pcap_spark.plans import ann_oracles as ANN
    from hadoop_pcap_spark.plans.streaming_queries import (
        q_streaming_ann_neardup,
    )

    load_all()
    single = q_streaming_ann_neardup(spark, SF)
    rows = {r.vec_id: r for r in single.collect()}
    assert len(rows) == 32
    twins = [r for k, r in rows.items() if k < 3_000_000]
    novel = [r for k, r in rows.items() if k >= 3_000_000]
    assert len(twins) == 16 and len(novel) == 16
    for r in twins:
        assert r.is_neardup, r
        assert r.best_id == r.vec_id - 2_000_000, r
        assert r.best_cos > 0.999, r
    for r in novel:
        assert not r.is_neardup, r
        assert r.best_cos < 0.5, r

    # multi-batch: one file per trigger — split the staged vectors
    # into several files first (the stage itself is a single parquet)
    d = str(tmp_path / "incoming4")
    spark.read.parquet(ANN.incoming_vectors_path(SF)).repartition(
        4
    ).write.parquet(d)
    idx = read_ann_index(spark, _ann_index_table(spark, SF))
    sink = str(tmp_path / "sink")
    q = (
        STRM.streaming_ann_screen(
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(d),
            idx,
            table(spark, SF, "embeddings"),
            sink,
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(sink)
    # one epoch partition per incoming file, no duplicate verdicts
    assert out.select("epoch").distinct().count() > 1
    multi = {r.vec_id: r for r in out.collect()}
    assert out.count() == len(multi)
    assert multi.keys() == rows.keys()
    for k, r in rows.items():
        m = multi[k]
        assert (m.best_id, m.best_cos, m.is_neardup) == (
            r.best_id, r.best_cos, r.is_neardup), k


def test_streaming_ann_screen_maintenance_epochs(spark, tmp_path):
    """maintain_every wiring (VERDICT r12 item 5): an OOD batch stream
    with a high recall threshold must trigger an in-stream retrain —
    visible as the sidecar's sample_by flipping to 'hash' — while
    verdicts keep flowing for every batch (the screen continues on the
    replaced handle)."""
    import shutil as _sh
    import os as _os
    from urllib.parse import urlparse

    from pyspark.sql import functions as F

    from hadoop_pcap_spark.operators.ann_index import (
        read_ann_index,
        write_ann_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("ann_stream_maint", "ann_stream_maint__model"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        _sh.rmtree(_os.path.join(wh, t), ignore_errors=True)
    try:
        write_ann_index(emb, "ann_stream_maint", n_cells=8, sample_size=256)
        idx = read_ann_index(spark, "ann_stream_maint")
        assert idx.sample_by == "id"
        # two files of OOD vectors => two micro-batches
        ood = emb.filter(F.col("vec_id") < 64).select(
            (F.col("vec_id") + 5_000_000).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> -x * (1.0 + 0.1 * i))"
            ).alias("embedding"),
        )
        d = str(tmp_path / "incoming")
        ood.repartition(2).write.parquet(d)
        sink = str(tmp_path / "sink")
        q = (
            STRM.streaming_ann_screen(
                spark.readStream.schema("vec_id long, embedding array<double>")
                .option("maxFilesPerTrigger", 1)
                .parquet(d),
                idx,
                emb,
                sink,
                maintain_every=1,
                recall_threshold=0.95,
                n_probe=4,
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        out = spark.read.parquet(sink)
        assert out.count() == 64  # every incoming vector got a verdict
        # the in-stream retrain happened: sidecar now carries the
        # maintenance trainer's hash-sample stamp
        after = read_ann_index(spark, "ann_stream_maint")
        assert after.sample_by == "hash"
    finally:
        for t in ("ann_stream_maint", "ann_stream_maint__model"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            _sh.rmtree(_os.path.join(wh, t), ignore_errors=True)


def test_streaming_http_objects_cross_batch_exactly_once(spark, tmp_path):
    """streaming_http_objects: the rotated 3-file capture (one file per
    micro-batch, connections spanning files) yields every non-close-
    delimited object exactly once with batch-identical content; the
    close-delimited tail never emits (documented live limitation)."""
    import hashlib
    import os as _os

    from hadoop_pcap_spark.pcap import synth as S
    from hadoop_pcap_spark.sources import read_pcap_stream
    from hadoop_pcap_spark.streaming.stream import streaming_http_objects

    d = tmp_path / "rot"
    d.mkdir()
    for fi, blob in enumerate(S.http_rotated_pcaps(3)):
        p = d / f"rot{fi}.pcap"
        p.write_bytes(blob)
        t = 1700000000 + fi * 10
        _os.utime(p, (t, t))
    pkts = read_pcap_stream(
        spark, str(d), strict_reference=False, max_files_per_trigger=1,
        columns=["file", "src", "dst", "src_port", "dst_port",
                 "protocol", "ts", "pkt_no", "payload"],
    )
    sink = str(tmp_path / "sink")
    q = (
        streaming_http_objects(pkts)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(sink).collect()
    truth = S.http_streaming_truth()
    assert len(rows) == len(truth)  # exactly once, close-delimited absent
    got = {(r.client, r.server_port, r.obj_no): r for r in rows}
    for t in truth:
        r = got[(t["client"], t["server_port"], t["obj_no"])]
        assert (r.method, r.url, r.status) == (
            t["method"], t["url"], t["status"]), t
        assert r.body_len == t["body_len"], t
        assert hashlib.md5(
            bytes(r.body) if r.body is not None else b""
        ).hexdigest() == t["body_md5"], t


def test_streaming_tls_clienthellos_cross_batch(spark, tmp_path):
    """streaming_tls_clienthellos: the GREASE'd flow's ClientHello
    spans the rotated-file cut and still emits exactly once with the
    spec JA3; the non-TLS flow on 443 never emits."""
    import os as _os

    from hadoop_pcap_spark.pcap import synth as S
    from hadoop_pcap_spark.sources import read_pcap_stream
    from hadoop_pcap_spark.streaming.stream import streaming_tls_clienthellos

    d = tmp_path / "rot"
    d.mkdir()
    for fi, blob in enumerate(S.tls_rotated_pcaps(2)):
        p = d / f"rot{fi}.pcap"
        p.write_bytes(blob)
        t = 1700000000 + fi * 10
        _os.utime(p, (t, t))
    pkts = read_pcap_stream(
        spark, str(d), strict_reference=False, max_files_per_trigger=1,
        columns=["file", "src", "dst", "src_port", "dst_port",
                 "protocol", "ts", "pkt_no", "payload"],
    )
    sink = str(tmp_path / "sink")
    q = (
        streaming_tls_clienthellos(pkts)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.client: r for r in spark.read.parquet(sink).collect()}
    truth = {t["client"]: t for t in S.tls_clienthello_truth()}
    assert set(rows) == set(truth)  # exactly once each; non-TLS absent
    for c, t in truth.items():
        r = rows[c]
        assert (r.sni, r.alpn, r.ja3, r.ja3_md5) == (
            t["sni"], t["alpn"], t["ja3"], t["ja3_md5"]), c
