"""spread() — conditional input spreading (operators/partitioning.py):
no-op path adds zero Exchange, probe decision is memoized per
(plan, parallelism), conf escape hatches work."""

from pyspark.sql import functions as F

from hadoop_pcap_spark.operators import partitioning as P


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_spread_noop_adds_zero_exchange(spark):
    # already at >= defaultParallelism partitions → returned unchanged
    par = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(par + 2).withColumn("k", F.col("id") % 7)
    out = P.spread(df, "k")
    assert out is df  # literally the same frame: no plan node added


def test_spread_underparallel_repartitions(spark):
    df = spark.range(100).coalesce(1).withColumn("k", F.col("id") % 7)
    out = P.spread(df, "k")
    par = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == par
    assert "Exchange hashpartitioning" in _plan(out)


def test_spread_memoizes_probe(spark, monkeypatch):
    P._MEMO.clear()
    calls = []
    orig = P._n_partitions
    monkeypatch.setattr(P, "_n_partitions", lambda df: calls.append(1) or orig(df))
    df = spark.range(50).coalesce(1).withColumn("k", F.col("id") % 3)
    P.spread(df, "k")
    assert len(calls) == 1
    # semantically identical plan, rebuilt from scratch → memo hit
    df2 = spark.range(50).coalesce(1).withColumn("k", F.col("id") % 3)
    P.spread(df2, "k")
    assert len(calls) == 1, "second probe should be served from the memo"
    # a different plan probes again
    df3 = spark.range(51).coalesce(1).withColumn("k", F.col("id") % 3)
    P.spread(df3, "k")
    assert len(calls) == 2


def test_spread_memo_clear_reprobes(spark, monkeypatch):
    # ADVICE r9: clear_spread_memo() is the documented escape hatch for
    # mid-session layout changes — after it, the same plan probes again
    P._MEMO.clear()
    calls = []
    orig = P._n_partitions
    monkeypatch.setattr(P, "_n_partitions", lambda df: calls.append(1) or orig(df))
    df = spark.range(60).coalesce(1).withColumn("k", F.col("id") % 3)
    P.spread(df, "k")
    P.spread(df, "k")
    assert len(calls) == 1
    P.clear_spread_memo()
    P.spread(df, "k")
    assert len(calls) == 2


def test_spread_probe_failure_falls_back_to_repartition(spark, monkeypatch):
    # VERDICT r9 item 6: under Spark Connect df.rdd is unavailable —
    # the probe raising must degrade to the historical unconditional
    # repartition, decided ONCE (memoized), not re-raised per call
    P._MEMO.clear()
    calls = []

    def boom(df):
        calls.append(1)
        raise AttributeError("no rdd under Connect")

    monkeypatch.setattr(P, "_n_partitions", boom)
    par = spark.sparkContext.defaultParallelism
    df = spark.range(80).repartition(par + 2).withColumn("k", F.col("id") % 3)
    out = P.spread(df, "k")
    assert out is not df  # safe fallback: repartitioned
    assert out.rdd.getNumPartitions() == par
    P.spread(df, "k")
    assert len(calls) == 1, "fallback verdict must be memoized"


def test_spread_conf_modes(spark):
    df = spark.range(40).coalesce(1).withColumn("k", F.col("id") % 3)
    spark.conf.set("spark.hadoop_pcap.spread", "never")
    try:
        assert P.spread(df, "k") is df
        spark.conf.set("spark.hadoop_pcap.spread", "always")
        par = spark.sparkContext.defaultParallelism
        big = spark.range(40).repartition(par + 1).withColumn("k", F.col("id") % 3)
        assert P.spread(big, "k").rdd.getNumPartitions() == par
    finally:
        spark.conf.unset("spark.hadoop_pcap.spread")
