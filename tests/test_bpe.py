"""Iterative BPE trainer + apply (operators/bpe.py — VERDICT r12
item 4).  Determinism contract: max-count merge selection with
ascending lexical tie-break; left-to-right non-overlapping fold;
sequential apply == training's own rewrites."""

import os
import sys

from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_pcap_spark.operators.bpe import (
    _encode_word,
    bpe_token_budget,
    encode_words,
    merge_pair_expr,
    train_bpe,
)


def test_merge_fold_left_to_right_non_overlapping(spark):
    rows = [
        Row(syms=["a", "a", "a"]),          # aaa + (a,a) -> [aa, a]
        Row(syms=["a", "a", "a", "a"]),     # -> [aa, aa]
        Row(syms=["b", "a", "a", "b"]),     # -> [b, aa, b]
        Row(syms=["a", "b"]),               # no match
        Row(syms=["a"]),                    # singleton unchanged
    ]
    df = spark.createDataFrame(rows)
    out = [
        r.m for r in df.select(
            merge_pair_expr(F.col("syms"), "a", "a").alias("m")
        ).collect()
    ]
    assert out == [["aa", "a"], ["aa", "aa"], ["b", "aa", "b"], ["a", "b"], ["a"]]


def test_train_bpe_hand_computed(spark):
    # classic Sennrich toy: low/lower/newest/widest with frequencies
    corpus = [
        Row(text=" ".join(["low"] * 5 + ["lower"] * 2
                          + ["newest"] * 6 + ["widest"] * 3)),
    ]
    docs = spark.createDataFrame(corpus)
    merges = train_bpe(docs, n_merges=3)
    # round 1: 'es' (newest 6 + widest 3 = 9); round 2: 'est' (9);
    # round 3: 'lo' (low 5 + lower 2 = 7)
    assert [(l, r, n) for l, r, n in merges] == [
        ("e", "s", 9), ("es", "t", 9), ("l", "o", 7),
    ]


def test_train_tie_break_is_lexical(spark):
    # 'ab' and 'cd' both occur twice: the ascending (l, r) tie-break
    # must pick ('a','b') first
    docs = spark.createDataFrame([Row(text="ab ab cd cd")])
    merges = train_bpe(docs, n_merges=1)
    assert merges[0][:2] == ("a", "b")


def test_encode_matches_training_rewrites(spark):
    """Sequential apply (encode path) must reproduce the trainer's own
    final symbolization — the property that makes the type-grain
    encode a faithful tokenizer for the learned vocab."""
    docs = spark.createDataFrame(
        [Row(text="interoperate international internet "
                  "interim winter printer sprint")]
    )
    merges = train_bpe(docs, n_merges=6)
    words = ["international", "winter", "printer", "zzz", "in"]
    wdf = spark.createDataFrame([Row(word=w) for w in words])
    enc = {r.word: r.bpe_tokens for r in encode_words(wdf, merges).collect()}
    for w in words:
        assert enc[w] == _encode_word(w, merges)
        assert "".join(enc[w]) == w  # lossless


def test_token_budget_counts(spark):
    docs = spark.createDataFrame(
        [
            Row(source="a", text=" ".join(["low"] * 5 + ["lower"] * 2)),
            Row(source="b", text=" ".join(["newest"] * 6 + ["widest"] * 3)),
        ]
    )
    merges = train_bpe(docs, n_merges=2)  # es (9), est (9)
    assert [(l, r) for l, r, _ in merges] == [("e", "s"), ("es", "t")]
    out = {
        r.source: (r.n_words, r.n_bpe_tokens)
        for r in bpe_token_budget(docs, merges, group_cols=["source"]).collect()
    }
    # 'est' merged: newest -> n,e,w,est (4×6), widest -> w,i,d,est (4×3)
    assert out["b"] == (9, 36)
    # no merge applies to low/lower: 3×5 + 5×2 chars as symbols
    assert out["a"] == (7, 25)


def test_min_freq_stops_early(spark):
    docs = spark.createDataFrame([Row(text="xy")])  # every pair freq 1
    assert train_bpe(docs, n_merges=5, min_freq=2) == []
