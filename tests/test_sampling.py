"""Deterministic-sampling operator tests (operators/sampling.py)."""

import math

import pytest

from pyspark.sql import functions as F

from hadoop_pcap_spark.operators.sampling import (
    hash_sample,
    hash_threshold,
    stratified_sample_exact,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )


def test_hash_threshold_resolution():
    assert hash_threshold(0.0) == "00000000"
    assert hash_threshold(1.0) == "ffffffff"
    assert hash_threshold(0.1) == "19999999"
    with pytest.raises(ValueError):
        hash_threshold(1.5)


def test_hash_sample_deterministic_and_near_fraction(docs):
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2).collect()}
    b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2).collect()}
    assert a == b  # same subset on every run
    n = docs.count()
    # Bernoulli at p=0.2: observed fraction within 5 sigma
    sigma = math.sqrt(0.2 * 0.8 / n)
    assert abs(len(a) / n - 0.2) < 5 * sigma


def test_hash_sample_nested_subsets(docs):
    """Smaller fractions select subsets of larger ones (threshold
    monotonicity) — lets a pipeline grow a sample without churn."""
    s5 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.05).collect()}
    s20 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.20).collect()}
    assert s5 <= s20


def test_hash_sample_is_scan_only(docs, spark):
    plan = (
        hash_sample(docs, "doc_id", 0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure filter, no shuffle


def test_stratified_sample_exact_quotas(docs):
    out = stratified_sample_exact(docs, ["lang"], 0.1, "doc_id")
    got = {r.lang: r.cnt for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    want = {
        r.lang: math.ceil(0.1 * r.cnt)
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want  # exactly ceil(frac·n) per stratum, all strata present


def test_stratified_sample_deterministic(docs):
    a = sorted(r.doc_id for r in stratified_sample_exact(docs, ["lang"], 0.1, "doc_id").collect())
    b = sorted(
        r.doc_id
        for r in stratified_sample_exact(
            docs.repartition(7), ["lang"], 0.1, "doc_id"
        ).collect()
    )
    assert a == b  # partitioning-independent selection


def test_hash_sample_full_fraction_is_identity(spark):
    """fraction=1.0 must keep EVERY row — the clamped threshold used
    to drop rows whose md5 prefix is all f's (review finding)."""
    from hadoop_pcap_spark.operators.sampling import hash_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert hash_sample(docs, "doc_id", 1.0).count() == docs.count()


def test_stratified_quota_exact_decimal(spark):
    """ceil(fraction * n) must use exact-decimal arithmetic: in binary
    float 0.07 * 100 -> 7.000000000000001 -> ceil 8, violating the
    'exactly ceil(fraction x |stratum|)' contract (ADVICE r3)."""
    rows = [(i, "s") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_sample_exact(df, ["lang"], 0.07, "doc_id")
    assert out.count() == 7  # float ceil would give 8

    # a couple more float-hostile fractions over awkward stratum sizes
    df3 = spark.createDataFrame([(i, "t") for i in range(300)], ["doc_id", "lang"])
    assert stratified_sample_exact(df3, ["lang"], 0.29, "doc_id").count() == 87
    assert stratified_sample_exact(df3, ["lang"], 0.1, "doc_id").count() == 30


class TestWeightedSample:
    def _df(self, spark):
        rows = [(i, 100 if i % 2 == 0 else 1) for i in range(200)]
        return spark.createDataFrame(rows, "doc_id long, w long")

    def test_heavier_rows_dominate_the_sample(self, spark):
        from hadoop_pcap_spark.operators.sampling import weighted_sample

        got = weighted_sample(self._df(spark), "doc_id", "w", k=50).collect()
        assert len(got) == 50
        even = sum(1 for r in got if r.doc_id % 2 == 0)
        # 100:1 weights → the 100 heavy rows should crowd out the 100
        # light ones almost completely
        assert even >= 45, f"only {even}/50 heavy rows sampled"

    def test_deterministic_across_partitionings(self, spark):
        from hadoop_pcap_spark.operators.sampling import weighted_sample

        df = self._df(spark)
        a = [r.doc_id for r in
             weighted_sample(df.coalesce(1), "doc_id", "w", 20).collect()]
        b = [r.doc_id for r in
             weighted_sample(df.repartition(8), "doc_id", "w", 20).collect()]
        assert a == b

    def test_nonpositive_and_null_weights_never_win(self, spark):
        from hadoop_pcap_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(1, 5), (2, 0), (3, -7), (4, None), (5, 5)],
            "doc_id long, w long",
        )
        got = {r.doc_id for r in
               weighted_sample(df, "doc_id", "w", k=5).collect()}
        assert got == {1, 5}

    def test_plan_is_take_ordered(self, spark):
        from hadoop_pcap_spark.operators.sampling import weighted_sample

        plan = (
            weighted_sample(self._df(spark), "doc_id", "w", 10)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
