"""Unit tests for the text-analysis column functions."""

import pytest

from pyspark.sql import Row, functions as F

from hadoop_pcap_spark.functions import text as TXT


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        Row(id=1, text="The quick brown fox jumps over the lazy dog."),
        Row(id=2, text="the the the and and of of of to to"),
        Row(id=3, text=""),
        Row(id=4, text="!!! ... ??? ,,,"),
        Row(id=5, text="Der Hund ist nicht die Katze und das ist gut"),
        Row(id=6, text="word"),
    ]
    return spark.createDataFrame(rows)


def _one(df, col, id_):
    return df.filter(F.col("id") == id_).select(col.alias("v")).collect()[0].v


def test_token_count(tdf):
    assert _one(tdf, TXT.token_count(F.col("text")), 1) == 9
    assert _one(tdf, TXT.token_count(F.col("text")), 3) == 0
    assert _one(tdf, TXT.token_count(F.col("text")), 4) == 0
    assert _one(tdf, TXT.token_count(F.col("text")), 6) == 1


def test_distinct_tokens_and_case_folding(tdf):
    # "The ... the" folds to one token
    assert _one(tdf, TXT.distinct_token_count(F.col("text")), 1) == 8
    assert _one(tdf, TXT.distinct_token_count(F.col("text")), 2) == 4


def test_avg_token_len_null_on_empty(tdf):
    assert _one(tdf, TXT.avg_token_len(F.col("text")), 3) is None
    assert _one(tdf, TXT.avg_token_len(F.col("text")), 6) == 4.0


def test_stopword_ratio(tdf):
    assert _one(tdf, TXT.stopword_ratio(F.col("text")), 2) == 1.0
    assert _one(tdf, TXT.stopword_ratio(F.col("text")), 6) == 0.0


def test_punct_ratio_all_punct(tdf):
    v = _one(tdf, TXT.punct_ratio(F.col("text")), 4)
    assert v is not None and v > 0.5


def test_lang_guess(tdf):
    assert _one(tdf, TXT.lang_guess(F.col("text")), 1) == "en"
    assert _one(tdf, TXT.lang_guess(F.col("text")), 5) == "de"
    assert _one(tdf, TXT.lang_guess(F.col("text")), 6) == "und"


def test_fingerprint_order_insensitive(spark):
    rows = [
        Row(id=1, text="alpha beta gamma"),
        Row(id=2, text="gamma   ALPHA beta!"),
        Row(id=3, text="alpha beta delta"),
    ]
    df = spark.createDataFrame(rows)
    fps = {
        r.id: r.fp
        for r in df.select("id", TXT.fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_exact_fingerprint_whitespace_normalized(spark):
    rows = [
        Row(id=1, text="hello   world"),
        Row(id=2, text=" hello world  "),
        Row(id=3, text="hello worlds"),
    ]
    df = spark.createDataFrame(rows)
    fps = {
        r.id: r.fp
        for r in df.select(
            "id", TXT.exact_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    assert fps[1] == fps[2] != fps[3]


def test_quality_score_ranges(spark):
    rows = [
        Row(id=1, text=("the quick brown fox jumps over the lazy dog and runs far " * 8)),
        Row(id=2, text="x y z"),
    ]
    df = spark.createDataFrame(rows)
    scores = {
        r.id: r.q
        for r in df.select("id", TXT.quality_score(F.col("text")).alias("q")).collect()
    }
    assert 0.9 <= scores[1] <= 1.0  # long, readable, stopword-rich
    assert scores[2] < scores[1]
    assert all(0.0 <= v <= 1.0 for v in scores.values())
