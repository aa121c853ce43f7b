"""Structured Streaming analogs (SURVEY.md §2.4 'streaming analogs').

The reference has no streaming story — a live capture feed would just
be more pcap files appearing in a directory.  That maps exactly to
Spark's file streaming source: same wide schema, same query shapes,
plus watermarked windows and within-watermark dedup for late/duplicate
packets.

Each builder below takes a streaming DataFrame of the packet/event
shape and returns the transformed streaming DataFrame; tests drive
them with the memory sink and assert batch-equivalence (a streaming
query over a static directory must equal the batch query — exactness
check no oracle can do better)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts per key with a watermark for late data.
    Scale: streaming state is one row per (window, key); watermark
    bounds state size."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n",
        )
    )


def sliding_rates(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window event rate — the top-talker monitor shape."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("win"))
        .agg(F.count("*").alias("n"), F.approx_count_distinct("user_id").alias("users"))
        .select(F.col("win.start").alias("win_start"), "n", "users")
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows per key (gap-based) — flow/sessionization of the
    packet stream (per-flow session = same motif)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            key_col,
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list = ("user_id", "event_type"),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup — dropDuplicatesWithinWatermark, the
    streaming twin of the md5-dedup motif (state bounded by the
    watermark horizon)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


FLOW_STATE_OUTPUT = "user_id LONG, n_events LONG, total_value DOUBLE, batch_events LONG"
FLOW_STATE_SCHEMA = "n LONG, total DOUBLE"


def stateful_flow_counts(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key
    running event count + value total maintained across micro-batches
    (the per-flow packet/byte-counter motif — state the built-in
    windowed aggs can't express when it must accumulate forever and
    emit per-batch deltas).

    Scale: state lives in the state store partitioned by key; each
    micro-batch touches only keys present in the batch."""
    import pandas as pd

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
            vals = pdf["value"].dropna()
            total += float(vals.sum())
        n += batch_n
        state.update((n, float(total)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(float(total), 4)],
                "batch_events": [batch_n],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=FLOW_STATE_OUTPUT,
        stateStructType=FLOW_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
