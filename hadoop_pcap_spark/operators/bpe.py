"""Iterative BPE tokenizer training + apply (VERDICT r12 item 4).

``corpus_bpe_pair_stats`` (plans/pipeline.py) computes ONE
merge-selection round; this module loops it into a learned vocabulary
(Sennrich et al. 2016, the standard subword-induction algorithm) and
applies the learned merges as a tokenizer — so ``text_token_budget``
can price REAL BPE instead of the pretoken proxy.

Scale design (100 TB) — the whole point of doing BPE in Spark:

* **The corpus is touched exactly once.**  :func:`word_frequencies`
  reduces the text stream to the (word type, occurrence count) table
  — one explode + one counted shuffle.  Everything after operates on
  TYPES: natural-language type counts grow ~O(corpus^0.5) (Heaps'
  law), so the iteration state is millions of rows where the corpus
  is trillions.
* **Per-merge work is type-grain and JVM-side.**  Each round is one
  pair-explode + sum aggregate over the type table (map-side
  combine; pair vocabulary bounded by |active vocab|²-ish but only
  pairs that OCCUR exist) and one codegen'd fold
  (``F.aggregate``) that rewrites the symbol arrays — no Python in
  the loop, no corpus re-scan.  The only driver action per round is
  the top-1 pair (TakeOrderedAndProject, one row).
* **Iteration hygiene** mirrors ``connected_components``:
  localCheckpoint per round keeps the plan flat and superseded
  checkpoints are released eagerly.
* **Apply is type-grain too.**  :func:`encode_words` tokenizes each
  DISTINCT word once (Arrow-batched pandas UDF, sequential merge
  replay); per-doc/per-corpus token budgets then join the encoded
  type table back to counts — O(types) Python, O(corpus) stays in
  joins/aggregates.

Determinism contract (what the DuckDB-replay oracle hash-checks):
merge selection is max count with ascending (left, right) lexical
tie-break; the fold merges left-to-right non-overlapping; applying
merges in learned order equals rank-greedy encoding (a later merge
can never make an earlier pair newly adjacent, since earlier pairs
predate the later token's existence).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BPE_WORD_RE",
    "word_frequencies",
    "train_bpe",
    "merge_pair_expr",
    "encode_words",
    "bpe_token_budget",
]

# Pretokenizer: letter runs / digit runs / punctuation runs, split on
# EXPLICIT ASCII whitespace.  \s is deliberately avoided: Java regex
# \s is ASCII-only while Python/DuckDB interpretations differ on
# Unicode whitespace — an explicit class pins identical semantics in
# Spark, the pandas encoder, and the replay oracle.
BPE_WORD_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\r\n]+"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", group_cols: Optional[list] = None
) -> DataFrame:
    """(word, freq) over the corpus — THE one corpus-grain pass of
    BPE training (module docstring).  ``group_cols`` keeps extra
    grouping keys (e.g. ``["source"]``) for per-slice budgets."""
    keys = list(group_cols or [])
    return (
        docs.select(
            *keys,
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_WORD_RE), 0)
            ).alias("word"),
        )
        .groupBy(*keys, "word")
        .agg(F.count("*").alias("freq"))
    )


def _chars_expr(col: str = "word") -> Column:
    return F.expr(
        f"transform(sequence(1, length({col})), i -> substring({col}, i, 1))"
    )


def merge_pair_expr(syms: Column, left: str, right: str) -> Column:
    """Rewrite a symbol array, merging adjacent (left, right) into
    one symbol, left-to-right non-overlapping — the classic BPE merge
    as a codegen'd fold (no UDF): the accumulator carries the last
    unmerged symbol; finishing flushes it."""
    l_, r_ = F.lit(left), F.lit(right)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc, s):
        flushed = F.when(
            acc.carry.isNull(), acc.out
        ).otherwise(F.concat(acc.out, F.array(acc.carry)))
        return F.when(
            acc.carry.isNotNull() & (acc.carry == l_) & (s == r_),
            F.struct(
                F.concat(acc.out, F.array(F.concat(acc.carry, s))).alias("out"),
                F.lit(None).cast("string").alias("carry"),
            ),
        ).otherwise(F.struct(flushed.alias("out"), s.alias("carry")))

    def finish(acc):
        return F.when(acc.carry.isNull(), acc.out).otherwise(
            F.concat(acc.out, F.array(acc.carry))
        )

    return F.aggregate(syms, init, step, finish)


def train_bpe(
    docs: DataFrame,
    n_merges: int = 24,
    text_col: str = "text",
    min_freq: int = 2,
) -> List[Tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over the corpus; returns
    [(left, right, pair_freq), ...] in learned order.  Stops early
    when the best remaining pair's occurrence count drops below
    ``min_freq``.  One corpus shuffle total; each round is a bounded
    job on the word-TYPE table (module docstring)."""
    from .cache import release_checkpoint

    wf = (
        word_frequencies(docs, text_col)
        .select(_chars_expr("word").alias("syms"), "freq")
        .localCheckpoint()
    )
    merges: List[Tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            n = F.size("syms")
            pairs = wf.select(
                F.explode(
                    F.zip_with(
                        F.slice("syms", 1, n - 1),
                        F.slice("syms", 2, n - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
                "freq",
            )
            top = (
                pairs.groupBy("p")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.desc("n"), F.asc("p.l"), F.asc("p.r"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < min_freq:
                break
            left, right, cnt = top[0]["p"]["l"], top[0]["p"]["r"], int(top[0]["n"])
            merges.append((left, right, cnt))
            # a word reduced to one symbol can never contribute a pair
            # again — drop it so the iteration state SHRINKS per round
            new_wf = (
                wf.select(
                    merge_pair_expr(F.col("syms"), left, right).alias("syms"),
                    "freq",
                )
                .filter(F.size("syms") >= 2)
                .localCheckpoint()
            )
            release_checkpoint(wf)
            wf = new_wf
    finally:
        release_checkpoint(wf)
    return merges


def _encode_word(word: str, merges: List[Tuple[str, str, int]]) -> List[str]:
    """Sequential merge replay over one word — equals rank-greedy BPE
    encoding (module docstring); the same interpretation the oracle
    replays in pure Python."""
    syms = list(word)
    for left, right, _ in merges:
        out: List[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_words(
    words: DataFrame, merges: List[Tuple[str, str, int]], word_col: str = "word"
) -> DataFrame:
    """Add ``bpe_tokens`` (array<string>) and ``n_bpe_tokens`` to a
    word-TYPE table — each distinct word encodes once (Arrow-batched;
    O(types) Python, never O(corpus))."""
    frozen = list(merges)

    @F.pandas_udf("array<string>")
    def enc(s: pd.Series) -> pd.Series:
        return s.map(lambda w: _encode_word(w, frozen))

    return words.withColumn("bpe_tokens", enc(F.col(word_col))).withColumn(
        "n_bpe_tokens", F.size("bpe_tokens")
    )


def bpe_token_budget(
    docs: DataFrame,
    merges: List[Tuple[str, str, int]],
    group_cols: Optional[list] = None,
    text_col: str = "text",
) -> DataFrame:
    """Token budget under the LEARNED vocabulary, per ``group_cols``
    slice: Σ over word occurrences of |encode(word)| — the real-BPE
    upgrade of ``text_token_budget``'s pretoken proxy.

    Plan shape: per-slice word counts (one corpus shuffle) ⨝ the
    once-per-type encoded table (broadcast when the vocab is small;
    type-grain shuffle otherwise) → one aggregate.  Output columns:
    group_cols + (n_words, n_bpe_tokens)."""
    keys = list(group_cols or [])
    wf = word_frequencies(docs, text_col, group_cols=keys)
    types = wf.select("word").distinct()
    enc = encode_words(types, merges).select("word", "n_bpe_tokens")
    return (
        wf.join(enc, "word")
        .groupBy(*keys)
        .agg(
            F.sum("freq").alias("n_words"),
            F.sum(F.col("freq") * F.col("n_bpe_tokens")).alias("n_bpe_tokens"),
        )
    )
