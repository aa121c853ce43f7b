"""Skew-mitigation operators.

Hot keys (the reference domain's 'top talker' IPs: one host can emit a
large share of all packets) overload single reducers in joins and
aggregations.  Two standard remedies, expressed as reusable plan
builders:

* ``salted_join`` — explode the *small* side K ways, salt the big
  side's key with hash%K: each hot key spreads over K reducers.
  Result is row-identical to the plain join.
* ``two_phase_agg`` — pre-aggregate on (key, salt) then finish on key:
  the classic partial-aggregation rescue for hot-key groupBy when the
  aggregate is algebraic.

(AQE's skewJoin handles sort-merge spills automatically at runtime —
``spark.sql.adaptive.skewJoin.enabled`` — these builders are for the
cases you plan for explicitly, e.g. known hot talkers.)
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s hot keys are spread over ``n_salts``
    reducers.  ``small`` is replicated n_salts× (keep it dimension-
    sized); output columns = big's ∪ small's minus the duplicate key.
    Scale: shuffle keys become (key, salt) — a key carrying 30% of all
    rows now lands on n_salts reducers instead of one.

    Only ``inner`` and ``left`` joins are supported: under right/full,
    every unmatched small-side row would surface once per salt replica
    (n_salts duplicates), silently breaking row-identity."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "right/full would duplicate unmatched small-side rows per salt"
        )
    salted_big = big.withColumn(
        "_salt", F.monotonically_increasing_id() % n_salts
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """count/sum per key via (key, salt) partials then a final combine.
    Returns (key, n, total).

    The salt must be independent of the row's *values*: salting by
    hash(agg_col) silently no-ops on the classic skew case (one hot key
    whose values are constant — every row hashes to the same salt).
    Row position (monotonically_increasing_id) spreads any hot key
    ≥n_salts ways regardless of its values; the final combine is
    algebraic, so the result is unchanged."""
    partial = (
        df.withColumn("_salt", F.monotonically_increasing_id() % n_salts)
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_n"), F.sum(agg_col).alias("_s"))
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"), F.sum("_s").alias("total")
    )
