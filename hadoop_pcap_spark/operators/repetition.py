"""Within-document repetition signals — the Gopher quality criteria
the per-row rule set (functions/text.py: word-count band, mean word
length, stopword mass) does not cover.

Gopher (Rae et al. 2021, Table A1) additionally filters on
*repetition*: the fraction of a document's characters covered by its
most frequent word n-gram (n = 2..4) and by duplicated longer n-grams
(n = 5..10).  This corpus has no line structure (flat token streams),
so the line/paragraph-grain variants degenerate and the n-gram-grain
family is the operative one.

Definitions (deterministic, shared with the DuckDB oracle):

* ``top{n}_gram_char_frac`` — max over this doc's n-grams ``g`` of
  ``count(g) × chars(g) / total_chars``: the maximal character
  coverage any single n-gram achieves (ties resolve themselves — the
  metric is the max of the product, not an argmax of the gram).
* ``dup{n}_gram_char_frac`` — Σ over n-grams with ``count ≥ 2`` of
  ``(count − 1) × chars(g) / total_chars``: characters spent on
  repeated occurrences beyond each gram's first (overlapping
  occurrences are counted per occurrence — the standard fast
  approximation; an exact union-of-positions needs the span
  machinery in operators/contamination.py).

``chars(g)`` is the length of the single-space-joined gram text and
``total_chars`` the length of the single-space-joined token stream —
both measured in the SAME normalized coordinate system as the rest
of the shingle family (functions.text.tokens).

Scale at 100 TB: ONE shuffle of the RAW documents on doc_id, then a
map-side explode emits (n, gram) pairs for all configured n (≈ Σn
rows per token) already co-partitioned for BOTH downstream aggregates
(grouping keys ⊇ doc_id) — linear, no driver state, no all-pairs.
Shuffling the text first instead of the gram stream moves ~15× fewer
bytes (r13 optimization; the gram stream is Σn≈15 tokens of text per
position and within-doc partial aggregation barely collapses it).
The per-row O(tokens²) expression alternative was rejected: a
100k-token document would cost 10¹⁰ comparisons in interpreted
fallback.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["repetition_signals"]


def repetition_signals(
    docs: DataFrame,
    top_ns: Sequence[int] = (2, 3, 4),
    dup_n: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repetition fractions: one ``top{n}_gram_char_frac``
    column per ``n`` in ``top_ns`` plus ``dup{dup_n}_gram_char_frac``
    (see module docstring for definitions).  A doc shorter than a
    given ``n`` (but long enough for another) scores 0.0 for the
    missing n; a doc too short for EVERY configured n (e.g. a
    single-token doc) emits NO row at all — left-join these signals
    back onto the corpus if every doc must appear.  The DuckDB oracle
    shares both behaviors."""
    from ..functions import explode_tokens

    # UNCONDITIONAL repartition by doc_id BEFORE the gram explode
    # (r13 optimization): every aggregate below groups by keys ⊇
    # doc_id, so pre-clustering the RAW documents lets both of them
    # reuse one partitioning — the executed plan drops from two
    # exchanges of the exploded (2+3+4+6)-gram stream (~15× the text
    # bytes; within-doc partial agg barely collapses it) to ONE
    # exchange of the raw text.  That byte argument holds at every
    # scale, which is why this is a plain repartition and not the
    # spread() small-input guard (measured at sf0.1: 1.64 s → 0.64 s
    # wall, interleaved min-of-8; plan 2 Exchange → 1).  Column-only
    # repartition keeps the partition count on
    # spark.sql.shuffle.partitions / AQE.
    base = docs.repartition(F.col(id_col)).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    ).filter(F.size("_toks") >= 1)
    base = base.withColumn(
        "total_chars", F.length(F.concat_ws(" ", F.col("_toks")))
    )
    # ONE parsed SQL string per n instead of per-element Column calls
    # (r14 plan-construction economy; tree node-identical — pinned by
    # tests/test_expr_twins.py sameSemantics)
    def grams_for(n: int):
        parts = ", ".join(
            f"element_at(_toks, i + {j} + 1)" for j in range(n)
        )
        return F.expr(
            f"CASE WHEN size(_toks) >= {n} THEN "
            f"transform(sequence(0, size(_toks) - {n}), "
            f"i -> named_struct('n', {n}, 'g', concat_ws(' ', {parts}))) "
            f"ELSE CAST(array() AS array<struct<n:int,g:string>>) END"
        )

    all_ns = list(dict.fromkeys(list(top_ns) + [dup_n]))
    all_grams = F.concat(*[grams_for(n) for n in all_ns])
    pairs = explode_tokens(
        base, all_grams, "s", "doc_id", "total_chars"
    ).select(
        "doc_id",
        "total_chars",
        F.col("s.n").alias("n"),
        F.col("s.g").alias("g"),
    )
    counts = pairs.groupBy("doc_id", "total_chars", "n", "g").agg(
        F.count("*").alias("c")
    )
    aggs = [
        F.max(
            F.when(F.col("n") == n, F.col("c") * F.length("g"))
        ).alias(f"_top{n}")
        for n in top_ns
    ] + [
        F.sum(
            F.when(
                (F.col("n") == dup_n) & (F.col("c") >= 2),
                (F.col("c") - 1) * F.length("g"),
            )
        ).alias("_dup")
    ]
    per = counts.groupBy("doc_id", "total_chars").agg(*aggs)
    out_cols = [
        F.round(
            F.coalesce(F.col(f"_top{n}"), F.lit(0))
            / F.nullif(F.col("total_chars"), F.lit(0)),
            6,
        ).alias(f"top{n}_gram_char_frac")
        for n in top_ns
    ] + [
        F.round(
            F.coalesce(F.col("_dup"), F.lit(0))
            / F.nullif(F.col("total_chars"), F.lit(0)),
            6,
        ).alias(f"dup{dup_n}_gram_char_frac")
    ]
    return per.select("doc_id", *out_cols)
