"""Incremental-maintenance operators: CDC merge (upsert/delete apply)
and SCD2 (type-2 slowly-changing-dimension) history construction.

The reference pipeline is append-only (pcap files in, Hive external
tables over them — SURVEY.md §2.1), but any warehouse built FROM that
feed needs mutation semantics the moment a dimension changes or a
correction lands: apply a change batch to a snapshot (MERGE), and
keep attribute history with validity intervals (SCD2).  Both are
pure DataFrame compositions — no UDFs, no collects.

Driver-verified as ``merge_cdc_apply`` / ``scd2_history`` in
plans/incremental.py (DuckDB QUALIFY-CTE and gaps-and-islands
oracles); unit semantics in tests/test_merge.py.

100 TB design notes:

* ``merge_cdc`` is join-shaped on purpose: the change batch is
  deduplicated to its per-key winner (one shuffle of the — much
  smaller — batch; the window's hash partitioning is then REUSED by
  the join, so the batch does not shuffle again) and full-outer
  joined against the snapshot.  The snapshot shuffles at most once,
  and ZERO times when it is stored bucketed on the merge key
  (operators/bucketing.py) — asserted in
  tests/test_plans.py::test_merge_cdc_bucketed_snapshot_side_never_shuffles
  and measured in SCALING.md.  That is exactly the reduce phase of a
  Delta/Iceberg MERGE after file-level pruning.
* ``scd2_history`` is the gaps-and-islands pattern: the change flag,
  the island numbering and the final ``lead`` all share one
  ``(key, ts, tie)`` ordering, so Catalyst plans the whole history
  build as a SINGLE hash exchange on the key (PLANS.md row
  ``scd2_history``; plan invariant in
  tests/test_plans.py::test_scd2_history_single_exchange).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_cdc", "scd2_history"]


def _checked(col: str, ok, msg: str):
    """Pass ``col`` through iff ``ok``; otherwise fail the job loudly.
    Malformed CDC input must never be silently dropped (ADVICE r7:
    ``op != 'D'`` on a NULL op deletes data without error)."""
    return F.when(ok, F.col(col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(msg),
                F.coalesce(F.col(col).cast("string"), F.lit("NULL")),
            )
        )
    )


def merge_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str = "_seq",
    op_col: str = "_op",
) -> DataFrame:
    """Apply a CDC change batch to a snapshot: per key, the
    highest-``seq_col`` change row wins; a winning ``op_col == 'D'``
    deletes the key, ``'U'`` upserts the full row (so a delete
    followed by a later upsert resurrects the key).  ``changes`` must
    carry the snapshot's columns plus ``seq_col`` (non-NULL, > 0 —
    the snapshot is implicitly seq 0) and ``op_col`` ('U'/'D').

    Contracts, enforced loudly: a NULL ``seq_col`` or an ``op_col``
    outside {'U','D'} (including NULL) raises at execution instead of
    silently dropping or deleting rows.  Contracts, documented: the
    snapshot must be unique per key (a keyed snapshot is what MERGE
    is defined over), and ``seq_col`` must be a total order per key —
    same-seq ties would make the winner nondeterministic.

    Semantics match SQL MERGE driven by a totally-ordered changelog —
    the standard exactly-once sink pattern for a CDC stream (Debezium
    /binlog-shaped input).  Shuffle budget: the change batch once
    (winner window; its partitioning is reused by the join), the
    snapshot at most once — zero when bucketed on ``keys``."""
    keys = list(keys)
    val_cols = [c for c in snapshot.columns if c not in keys]
    ch = changes.withColumn(
        seq_col,
        _checked(
            seq_col, F.col(seq_col).isNotNull(), "merge_cdc: NULL seq in "
        ).cast("long"),
    ).withColumn(
        op_col,
        _checked(
            op_col,
            F.col(op_col).isin("U", "D"),
            "merge_cdc: op must be 'U'/'D', got ",
        ),
    )
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    winner = (
        ch.withColumn("_mrn", F.row_number().over(w))
        .filter(F.col("_mrn") == 1)
        .withColumn("_present", F.lit(True))
    )
    joined = snapshot.alias("s").join(winner.alias("c"), keys, "full_outer")
    take = F.col("_present").isNotNull()  # NULL ⇒ no change row for the key
    return (
        joined.select(
            *keys,
            *[
                F.when(take, F.col(f"c.{v}"))
                .otherwise(F.col(f"s.{v}"))
                .alias(v)
                for v in val_cols
            ],
            F.col(f"c.{op_col}").alias("_w_op"),
        )
        .filter(~F.col("_w_op").eqNullSafe("D"))
        .drop("_w_op")
    )


def scd2_history(
    df: DataFrame,
    key: str,
    attr: str,
    ts_col: str,
    tie_break: str,
) -> DataFrame:
    """Collapse an observation stream (key, attr, ts) into type-2
    dimension history: one row per run of consecutive NULL-safely
    equal ``attr`` values per key, with ``valid_from`` / ``valid_to``
    (NULL = still current) and a 1-based ``version``.

    Gaps-and-islands with NULL-safe change detection (ADVICE r7): a
    run of NULL attrs is ONE island, and a value→NULL transition
    starts a new island — both via ``eqNullSafe`` against the lagged
    value, with the true first row per key flagged by
    ``row_number() == 1`` (the lag-is-NULL probe can't distinguish
    "first row" from "previous attr was NULL").  Each island is
    attr-constant by construction, so ``max(attr)`` recovers its
    value deterministically (all-NULL island → NULL).  The final
    ``lead`` orders by ``version`` — unique per key — not by
    ``valid_from``, which can tie across islands at coarse ``ts``
    grains.

    ``tie_break`` must make (ts_col, tie_break) a total order per key
    — same-timestamp observations otherwise make the island
    assignment nondeterministic."""
    order = [F.col(ts_col).asc(), F.col(tie_break).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    flagged = df.withColumn(
        "_chg",
        F.when(F.row_number().over(w) == 1, F.lit(1))
        .when(~F.lag(attr).over(w).eqNullSafe(F.col(attr)), F.lit(1))
        .otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "version",
        F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_ver = islands.groupBy(key, "version").agg(
        F.max(attr).alias(attr),  # attr-constant island → deterministic
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_obs"),
    )
    w2 = Window.partitionBy(key).orderBy(F.col("version").asc())
    return per_ver.withColumn("valid_to", F.lead("valid_from").over(w2))
