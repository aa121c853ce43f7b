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
