"""Incremental-maintenance operators: CDC merge (upsert/delete apply)
and SCD2 (type-2 slowly-changing-dimension) history construction.

The reference pipeline is append-only (pcap files in, Hive external
tables over them — SURVEY.md §2.1), but any warehouse built FROM that
feed needs mutation semantics the moment a dimension changes or a
correction lands: apply a change batch to a snapshot (MERGE), and
keep attribute history with validity intervals (SCD2).  Both are
pure DataFrame compositions — one shuffle each, no UDFs.

100 TB design notes:

* ``merge_cdc`` is ONE shuffle on the merge key (the row_number
  window); co-locate it for free by storing the snapshot bucketed on
  the key (operators/bucketing.py) so only the — much smaller —
  change batch moves.  Change batches are typically ≪ snapshot, so
  at scale the win is rewriting only matched partitions (what Delta/
  Iceberg's merge does with file-level pruning); the logical plan
  here is exactly the reduce phase of that rewrite.
* ``scd2_history`` is the gaps-and-islands pattern: two window
  functions over the same (key, time) ordering — Catalyst collapses
  them into a single sort+shuffle, verified in PLANS.md.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_cdc", "scd2_history"]


def merge_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str = "_seq",
    op_col: str = "_op",
) -> DataFrame:
    """Apply a CDC change batch to a snapshot: per key, the
    highest-``seq_col`` row wins; a winning ``op_col == 'D'`` deletes
    the key, anything else upserts the row (so a delete followed by a
    later insert resurrects the key).  ``changes`` must carry the
    snapshot's columns plus ``seq_col`` (> 0) and ``op_col``
    ('U'/'D'); the snapshot is treated as seq 0 upserts.

    Semantics match SQL MERGE driven by a totally-ordered changelog —
    the standard exactly-once sink pattern for a CDC stream (Debezium
    /binlog-shaped input).  One shuffle on ``keys``."""
    base = snapshot.withColumn(op_col, F.lit("U")).withColumn(
        seq_col, F.lit(0).cast("long")
    )
    unioned = base.unionByName(
        changes.withColumn(seq_col, F.col(seq_col).cast("long"))
    )
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        unioned.withColumn("_mrn", F.row_number().over(w))
        .filter(F.col("_mrn") == 1)
        .filter(F.col(op_col) != "D")
        .drop("_mrn", seq_col, op_col)
    )


def scd2_history(
    df: DataFrame,
    key: str,
    attr: str,
    ts_col: str,
    tie_break: str,
) -> DataFrame:
    """Collapse an observation stream (key, attr, ts) into type-2
    dimension history: one row per run of consecutive equal ``attr``
    values per key, with ``valid_from`` / ``valid_to`` (NULL = still
    current) and a 1-based ``version``.

    Gaps-and-islands: a change flag via ``lag``, a running sum of
    flags to number islands, then per-island min(ts) and ``lead`` for
    the interval end.  ``tie_break`` must make (ts_col, tie_break)
    a total order per key — same-timestamp observations otherwise
    make the island assignment nondeterministic."""
    order = [F.col(ts_col).asc(), F.col(tie_break).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    flagged = df.withColumn(
        "_chg",
        F.when(
            F.lag(attr).over(w).isNull()
            | (F.lag(attr).over(w) != F.col(attr)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "_ver",
        F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_ver = islands.groupBy(key, "_ver").agg(
        F.first(attr).alias(attr),  # constant within an island
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_obs"),
    )
    w2 = Window.partitionBy(key).orderBy(F.col("valid_from").asc())
    return per_ver.withColumn(
        "valid_to", F.lead("valid_from").over(w2)
    ).withColumnRenamed("_ver", "version")
