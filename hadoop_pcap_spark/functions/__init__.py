"""Column-function libraries (text analysis, net helpers) and shared
plan-shape utilities."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def explode_computed(arr: Column | str, never_empty: bool = True):
    """``explode`` for a COMPUTED array expression without the
    inferred-filter double evaluation.

    Catalyst's InferFiltersFromGenerate adds ``size(arr) > 0 AND
    isnotnull(arr)`` under every inner ``explode``; predicate pushdown
    then substitutes the array's full defining expression into that
    filter and pushes it through the projection — down to the parquet
    scan's DataFilters, where it is evaluated INTERPRETED, row at a
    time.  For an expensive array construction (regex tokenize,
    k-shingling, md5 transforms) the expression then runs 2-3× per
    row, once outside whole-stage codegen — measured 29× end-to-end
    on the decontamination query at the 20× SF (402 s → 13.7 s,
    identical rows).  Array LITERALS (``F.array(lit...)``) are safe —
    ``size(CreateArray(...))`` constant-folds and no filter survives
    — so ``lsh_bands``-style explodes don't need this.

    ``explode_outer`` infers nothing.  Its only semantic difference:
    a NULL/empty array emits one all-NULL row instead of no row, so:

    * ``never_empty=True`` (the only accepted value) — caller
      guarantees the array is non-empty (e.g. shingle arrays always
      hold at least the whole-text shingle): pure drop-in, zero extra
      operators.
    * possibly-empty arrays — use :func:`explode_tokens`, which owns
      the required ``isNotNull()`` re-filter ON THE EXPLODED OUTPUT (a
      filter referencing the generator output cannot be pushed below
      the Generate, so the construction still evaluates once).  This
      function REFUSES ``never_empty=False`` rather than silently
      returning the unfiltered explode_outer (one all-NULL row per
      empty/NULL array) — ADVICE r5.
    """
    if not never_empty:
        raise ValueError(
            "explode_computed requires never_empty=True; for "
            "possibly-empty arrays use explode_tokens, which applies "
            "the isNotNull() re-filter on the exploded output"
        )
    return F.explode_outer(arr)


def explode_tokens(df, arr: Column, alias: str, *keep: str):
    """``df.select(*keep, explode(arr).alias(alias))`` for a computed,
    possibly-empty array — explode_outer + NULL re-filter on the
    exploded output (same rows as inner explode, one evaluation of
    the array expression; see :func:`explode_computed`).  Caveat: the
    re-filter also drops NULL *elements*, which inner explode keeps —
    only use for arrays whose elements are provably non-null (token /
    shingle / struct builders here never emit null elements)."""
    out = df.select(*keep, F.explode_outer(arr).alias(alias))
    return out.filter(F.col(alias).isNotNull())
