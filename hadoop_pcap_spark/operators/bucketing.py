"""Bucketed-table storage for shuffle-free big-big joins.

At 100 TB the single most expensive physical event is shuffling two
fact tables onto their join key.  Spark's answer is *bucketing*: both
tables pre-hash-partitioned (and per-bucket sorted) on the key at
write time, so an equi-join plans as a zip of already-co-located
buckets — SortMergeJoin with NO Exchange on either side.  The
reference's Hive integration leans on the same trick
(hadoop-pcap-serde/README.md: CLUSTERED BY in Hive DDL); here it is
a first-class operator with a CI-asserted plan property
(tests/test_plans.py::test_bucketed_join_has_no_exchange).

Usage shape for the corpus pipeline: store `documents` bucketed by
doc_id and every fingerprint/cluster/keep-set join in the dedup chain
runs exchange-free; store packet parquet bucketed by flow key and
reassembly/flow-stats group without a shuffle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | Sequence[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ optionally per-bucket sorted)
    managed parquet table.  ``n_buckets`` sizes the co-location grain:
    pick ≈ (table bytes / 256 MB) rounded to a power of two, and use
    the SAME count on every table that joins on ``key`` — equal
    bucket counts are what lets Catalyst elide both exchanges."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | Sequence[str],
    how: str = "inner",
    merge: bool = False,
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.  With
    bucketing in place Catalyst plans this as SortMergeJoin over the
    pre-partitioned scans — zero Exchange; without it the same code
    would shuffle both sides.  (AQE is the fallback, not the plan:
    bucketing removes the work, AQE only splits it better.)

    ``merge=True`` adds the SMJ hint — for demo/small tables where one
    side would otherwise fit autoBroadcastJoinThreshold and Catalyst
    would pick a broadcast join, hiding the exchange-free property the
    bucketing exists to provide (at production scale neither side
    broadcasts and the hint is a no-op)."""
    on_cols = [on] if isinstance(on, str) else list(on)
    left = spark.table(left_table)
    if merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on_cols, how)
