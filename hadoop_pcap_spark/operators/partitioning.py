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

# (analyzed-plan semanticHash, defaultParallelism) → under-parallel?
# Probing the partition count forces physical planning of the scan
# (no job, but catalyst + file listing), and multi-operator
# compositions call spread() on the same source several times per
# query build — memoize the decision so planning cost is paid once
# per distinct plan per session (VERDICT r8 item 7).  Semantically
# equal plans partition identically unless the underlying file layout
# changes mid-session, which also invalidates Spark's own file-index
# caching assumptions; bounded size so a long-lived session can't
# grow it without limit.
_MEMO: dict = {}
_MEMO_CAP = 512


def _n_partitions(df: DataFrame) -> int:
    """Scan-partition probe (separate hook so tests can count calls)."""
    return df.rdd.getNumPartitions()


def spread(df: DataFrame, key: str) -> DataFrame:
    """Repartition ``df`` by ``key`` to ``defaultParallelism`` iff its
    scan yields fewer partitions than the cluster has slots; no-op
    (and no shuffle in the plan) otherwise.

    Conf escape hatch ``spark.hadoop_pcap.spread``:
    ``auto`` (default — probe, memoized), ``never`` (trust the scan's
    parallelism; zero planning cost), ``always`` (unconditional
    repartition, the historical behavior)."""
    sess = df.sparkSession
    mode = sess.conf.get("spark.hadoop_pcap.spread", "auto")
    if mode == "never":
        return df
    par = sess.sparkContext.defaultParallelism
    if mode == "always":
        return df.repartition(par, key)
    try:
        memo_key = (df._jdf.queryExecution().analyzed().semanticHash(), par)
    except Exception:  # pragma: no cover - e.g. Connect: probe uncached
        memo_key = None
    if memo_key is not None and memo_key in _MEMO:
        under = _MEMO[memo_key]
    else:
        under = _n_partitions(df) < par
        if memo_key is not None:
            if len(_MEMO) >= _MEMO_CAP:
                _MEMO.clear()
            _MEMO[memo_key] = under
    return df.repartition(par, key) if under else df
