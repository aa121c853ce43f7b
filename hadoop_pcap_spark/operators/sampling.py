"""Deterministic sampling operators for corpus curation.

LLM data pipelines need *reproducible* samples — the same subset on
every run, resumable across clusters, auditable against an oracle.
``df.sample()`` can't provide that (seed semantics are partition-
dependent), so both operators here key the decision on a content
hash of a stable unique key:

* :func:`hash_sample` — Bernoulli-by-hash: keep a row iff the hex
  prefix of ``md5(key)`` falls under the fraction threshold.  A pure
  scan filter: no shuffle, no state, embarrassingly parallel — the
  100 TB default.
* :func:`stratified_sample_exact` — exact per-stratum fractions via
  one window pass: rank rows inside each stratum by hash order and
  keep the first ``ceil(fraction × stratum_size)``.  Costs one
  shuffle on the strata key; use when per-group quotas must be hit
  exactly (e.g. language-balance requirements), not just in
  expectation.

Both are JVM-side expressions (md5 / window built-ins) with exact
DuckDB SQL twins registered in plans/pipeline.py.
"""

from __future__ import annotations

from collections.abc import Sequence
from decimal import ROUND_HALF_EVEN, Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _hash_key(key) -> Column:
    col = F.col(key) if isinstance(key, str) else key
    return F.md5(col.cast("string"))


def hash_threshold(fraction: float, prefix_len: int = 8) -> str:
    """Hex threshold t such that P[md5-prefix < t] == fraction (to
    16**-prefix_len resolution)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    cap = min(int(fraction * (16**prefix_len)), 16**prefix_len - 1)
    return format(cap, f"0{prefix_len}x")


def hash_sample(df: DataFrame, key, fraction: float, prefix_len: int = 8) -> DataFrame:
    """Deterministic Bernoulli sample: rows whose ``md5(key)`` hex
    prefix sorts under the fraction threshold.  Scan-only (the
    filter pushes to the source when the key is a stored column);
    reproducible across runs, partitionings and engines.
    ``fraction=1.0`` short-circuits to the identity — the clamped
    threshold would otherwise drop rows whose prefix is all f's."""
    if fraction >= 1.0:
        return df
    return df.filter(
        F.substring(_hash_key(key), 1, prefix_len)
        < F.lit(hash_threshold(fraction, prefix_len))
    )


def stratified_sample_exact(
    df: DataFrame,
    strata: Sequence[str],
    fraction: float,
    key: str,
    rank_col: str = "rn",
    size_col: str = "n_stratum",
) -> DataFrame:
    """Exactly ``ceil(fraction × |stratum|)`` rows per stratum,
    chosen by hash order (deterministic, content-keyed, engine-
    independent).  One shuffle on the strata columns; the unique
    ``key`` tie-breaks hash collisions so the selection is total-
    order stable."""
    order = [_hash_key(key), F.col(key)]
    w_rank = W.partitionBy(*strata).orderBy(*order)
    w_all = W.partitionBy(*strata)
    # Exact-decimal quota: binary-float ceil(fraction * n) can inflate the
    # quota by one (0.07 * 100 -> 7.000000000000001 -> ceil 8).  Quantize the
    # fraction to 8 decimal places and multiply in decimal space — matches the
    # DuckDB oracle, whose numeric literals are decimal-typed natively.
    frac_dec = Decimal(repr(float(fraction))).quantize(
        Decimal("1E-8"), rounding=ROUND_HALF_EVEN
    )
    quota = F.ceil(F.lit(frac_dec) * F.col(size_col)).cast("long")
    return (
        df.withColumn(rank_col, F.row_number().over(w_rank))
        .withColumn(size_col, F.count("*").over(w_all))
        .filter(F.col(rank_col) <= quota)
    )


def weighted_sample(
    df: DataFrame,
    key,
    weight,
    k: int,
    priority_name: str = "wpriority",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis exponential sort): draw ``k`` rows with
    inclusion probability proportional to ``weight`` — the mixture /
    token-budget-proportional draw of a corpus build — reproducibly.

    Each row gets u ∈ (0,1) from the first 8 hex chars of
    ``md5(key)`` (deterministic, engine-replayable — the same
    no-RNG contract as :func:`hash_sample`) and ES key
    ``ln(u)/(weight/max_weight)``; the k largest keys are the sample,
    which is distributionally identical to sequential weighted draws
    without replacement (Efraimidis & Spirakis 2006).  NULL or
    non-positive weights never win (priority −∞ via weight → NULL
    guard).  Weights are normalized by their max (a monotonic
    rescaling of every priority by the positive constant
    ``max_weight``, so PRE-ROUNDING the selected set and its order are
    the unnormalized ES draw exactly; after the 10-decimal rounding
    below, priorities that differ by < 1e-10 can tie — and break by
    key order — differently than the unnormalized draw would, so the
    equivalence is exact only above that resolution): priorities are
    rounded to 10
    decimals for cross-engine replay, and without normalization
    weights ≳1e9 would push ``ln(u)/w`` below that resolution,
    collapsing ties to key order instead of a weighted draw
    (ADVICE r8).  Normalized, ``w/wmax ≤ 1`` bounds every priority's
    magnitude at ≥ |ln u| ≥ 2e-10, above the rounding floor.

    Scale: one scan computes priorities (md5 + ln, whole-stage
    codegen) against a broadcast 1-row max; the top-k is
    TakeOrderedAndProject — per-partition heaps, no global sort, no
    shuffle beyond the k winners."""
    w = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    wmax = df.agg(F.max(F.when(w > 0, w)).alias("_wmax"))
    u = (
        F.conv(F.substring(_hash_key(key), 1, 8), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**8 + 1))
    prio = F.log(u) / F.nullif(F.when(w > 0, w / F.col("_wmax")), F.lit(0.0))
    out = (
        df.join(F.broadcast(wmax), how="cross")
        .withColumn(priority_name, F.round(prio, 10))
        .drop("_wmax")
    )
    kc = F.col(priority_name)
    keyc = F.col(key) if isinstance(key, str) else key
    return out.filter(kc.isNotNull()).orderBy(kc.desc(), keyc.asc()).limit(k)
