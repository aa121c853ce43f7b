"""Shared partitioning helper for CPU-heavy map stages.

Several operators (shingling + minhash, simhash, tokenize + feature
hash) front-load an embarrassingly parallel, per-row-expensive map
stage.  On the small-file inputs the validation SFs use, the parquet
scan yields a single partition and that map stage serializes; the
historical fix was an unconditional ``repartition(defaultParallelism,
key)``.  At deployment scale that is the wrong trade: the input is
thousands of files, the scan already fills the cluster, and the
repartition shuffles the ENTIRE raw corpus (text, payloads) over the
network to parallelize a map that was already parallel.

:func:`spread` inserts the shuffle only when it buys parallelism."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread"]


def spread(df: DataFrame, key: str) -> DataFrame:
    """Repartition ``df`` by ``key`` to ``defaultParallelism`` iff its
    scan yields fewer partitions than the cluster has slots; no-op
    (and no shuffle in the plan) otherwise.  Reading the partition
    count forces physical planning of the scan but runs no job."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, key)
