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
