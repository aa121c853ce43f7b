"""Data-layout operators: Z-order clustering for multi-dimensional
row-group pruning.

At 100 TB the cheapest scan is the one that never happens: parquet
readers skip a row group when its column min/max statistics cannot
satisfy the predicate.  Sorting on ONE column makes that column's
stats tight but leaves every other column's range ~full-width per row
group, so a second-dimension predicate prunes nothing.  Z-ordering
(Morton-curve clustering) interleaves the bits of several columns
into one sort key, so rows close in EVERY dimension land in the same
row groups — a box predicate on any subset of the z-columns then
skips most of the file.  This is the same layout lever Delta Lake's
``OPTIMIZE ZORDER BY`` and Iceberg's sort-order rewrite pull; here it
is a plain-parquet, plain-DataFrame operator.

Design for Spark's execution model:

* The z-key is pure whole-stage-codegen arithmetic —
  ``width_bucket`` per dimension (bounds come from a broadcast 1-row
  min/max aggregate, no driver collect) and an unrolled
  shift/AND/OR bit interleave.  No UDF, no Python boundary.
* The write is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``:
  the range partitioner's reservoir sample balances output files even
  when z-key density is skewed, and within-file ordering is what
  tightens per-row-group stats.  One shuffle total — the same cost as
  any other layout rewrite.
* Equi-width bucketing keeps the key computation collect-free; under
  heavy value skew quantile edges would balance *bucket occupancy*
  better, but file sizes are already balanced by the range partitioner
  and pruning only needs monotone binning, so equi-width is the right
  default at scale.

``rowgroup_prune_stats`` reads parquet footers (driver-side, metadata
only — O(row groups), not O(rows)) and reports how many row groups a
box predicate could skip; tests/test_operators.py uses it to assert
the z-ordered copy of lineitem beats a 1-D sorted copy on a 2-D box.
"""

from __future__ import annotations

import operator
from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_key",
    "write_zordered",
    "rowgroup_prune_stats",
    "compact_files",
]


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    key_name: str = "_zkey",
) -> DataFrame:
    """Append a Morton z-key column interleaving ``bits`` bits from
    each of ``cols`` (numeric).  2 cols × 8 bits → a 16-bit key with
    256 buckets per dimension — ample resolution for file-level
    clustering (a 100 TB table at 1 GiB files is ~10⁵ files; 2¹⁶ key
    values over-resolve that by ~an order of magnitude, and deeper
    bits only add codegen terms, never another pass).

    The per-dimension bucket is ``width_bucket`` against the global
    min/max, delivered to every row via a broadcast 1-row cross join
    (the repo-wide scalar pattern — no ``collect``).  Total cost: one
    extra reduce-to-1-row aggregate scan; the interleave itself is
    ``bits × len(cols)`` shift/or terms inside whole-stage codegen.
    """
    if len(cols) < 2:
        raise ValueError("zorder_key needs ≥2 columns — use a plain sort for 1")
    from pyspark.sql import types as T

    numeric = (T.NumericType, T.TimestampType)
    dtypes = {c: df.schema[c].dataType for c in cols}
    for c in cols:
        dt = dtypes[c]
        # a non-numeric column would cast to all-NULL doubles and
        # silently produce a constant key — fail loudly instead
        # (hash or dictionary-encode strings upstream if needed;
        # timestamps cast cleanly to epoch-second doubles)
        if not isinstance(dt, numeric):
            raise TypeError(f"zorder_key column {c!r} is {dt}; need numeric")
    n = 1 << bits
    # NaN sorts ABOVE +inf in Spark's ordering, so a single NaN row
    # would make max() — and hence the bucket bounds — NaN, skewing
    # every real row's bucket.  nanvl(x, NULL) drops NaN from the
    # bounds the same way NULL values already are (ADVICE r6).
    clean = {
        c: F.nanvl(F.col(c).cast("double"), F.lit(None).cast("double"))
        for c in cols
    }
    stats = df.agg(
        *[F.min(clean[c]).alias(f"_mn_{c}") for c in cols],
        *[F.max(clean[c]).alias(f"_mx_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    bucket_cols: list[Column] = []
    for c in cols:
        mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
        # width_bucket → 1..n over [mn, mx), n+1 for v == mx; the
        # clamp folds that overflow bucket into n-1.  A constant
        # column (mn == mx) gets a widened upper bound so the bounds
        # stay valid — every row then lands in bucket 0.
        mx_eff = F.when(mx > mn, mx).otherwise(mn + F.lit(1.0))
        b = F.width_bucket(F.col(c).cast("double"), mn, mx_eff, F.lit(n))
        # greatest/least IGNORE nulls (a NULL value would silently
        # clamp into the top bucket) — propagate NULL explicitly so
        # null-keyed rows cluster together instead of polluting a
        # data bucket's stats.  NaN needs the same treatment (ADVICE
        # r6): width_bucket(NaN) is NULL, which the clamp would fold
        # into bucket n-1; only float/double can hold NaN, and isnan
        # on other types would just burn a codegen term
        clamped = F.greatest(F.lit(0), F.least(F.lit(n - 1), (b - 1)))
        not_bucketable = F.col(c).isNull()
        if isinstance(dtypes[c], (T.FloatType, T.DoubleType)):
            not_bucketable = not_bucketable | F.isnan(F.col(c))
        bucket_cols.append(
            F.when(not_bucketable, F.lit(None)).otherwise(clamped).cast("long")
        )
    nd = len(cols)
    terms = [
        F.shiftleft(F.shiftright(bc, i).bitwiseAND(F.lit(1)), i * nd + j)
        for i in range(bits)
        for j, bc in enumerate(bucket_cols)
    ]
    z = reduce(operator.add, terms)  # disjoint bit positions: + == OR
    return out.withColumn(key_name, z).drop(
        *[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    n_files: Optional[int] = None,
    key_name: str = "_zkey",
) -> None:
    """Rewrite ``df`` to ``path`` clustered along the z-curve of
    ``cols``: range-partition on the z-key (reservoir-sampled ranges →
    balanced files even under key skew), sort within each file, drop
    the key, write parquet.  ``n_files`` sizes the output grain —
    at scale pick ≈ table bytes / 1 GiB; default is the session's
    shuffle parallelism."""
    keyed = zorder_key(df, cols, bits=bits, key_name=key_name)
    parts = [F.col(key_name)]
    ranged = (
        keyed.repartitionByRange(n_files, *parts)
        if n_files
        else keyed.repartitionByRange(*parts)
    )
    (
        ranged.sortWithinPartitions(key_name)
        .drop(key_name)
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_prune_stats(
    path: str, predicates: dict[str, tuple[float, float]]
) -> dict[str, int]:
    """Footer-only pruning audit: for every parquet row group under
    ``path``, check whether its min/max stats overlap the box
    ``predicates`` (col → inclusive [lo, hi]).  Returns total /
    overlapping / skippable row-group counts — the denominator of the
    scan a stats-aware reader actually performs.  Driver-side but
    O(metadata): at 100 TB this is the planner's job (file-level
    stats in the catalog), not a data pass."""
    import glob
    import os

    import pyarrow.parquet as pq

    total = overlap = 0
    # recursive, like compact_files: a Hive-partitioned dataset nests
    # part files under key=value dirs — a top-level-only listing would
    # report {row_groups: 0, skippable: 0}, an audit that reads as
    # "nothing to prune" instead of an error (ADVICE r6)
    files = sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    if not files:
        raise ValueError(f"rowgroup_prune_stats: no parquet files under {path!r}")
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            g = md.row_group(rg)
            hit = True
            for col, (lo, hi) in predicates.items():
                st = g.column(names[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats → reader must scan: counts as overlap
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            overlap += int(hit)
    return {"row_groups": total, "overlapping": overlap, "skippable": total - overlap}


def compact_files(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 << 20,
    order_by: Optional[Sequence[str]] = None,
) -> dict[str, int]:
    """Rewrite a fragmented parquet dataset into ~``target_bytes``
    files.  Small files are the silent scan killer at 100 TB: every
    file costs a task launch, a footer read, and a catalog entry, so
    a million 1 MB files can cost more scheduler time than the scan
    itself (streaming sinks and per-partition writers produce exactly
    this shape).  Sizing comes from the file listing — metadata only,
    the catalog's job at scale, never a data pass.

    Without ``order_by`` the rewrite is round-robin ``repartition``
    (balanced output regardless of input skew); with it the rewrite
    range-partitions + sorts so compaction ALSO (re)establishes
    clustering — compose with :func:`write_zordered` by passing the
    z-key.  Either way: one shuffle, the floor for any rewrite.
    Returns {files_in, files_out, bytes} for callers that log
    compaction ratios."""
    import glob
    import math
    import os

    # recursive: a Hive-partitioned source nests part files under
    # key=value dirs — a top-level-only listing would size total=0
    # and coalesce the whole dataset into ONE file (the opposite of
    # the operator's purpose).  Note the rewrite is FLAT parquet;
    # partition columns survive as ordinary columns via partition
    # discovery on the read.
    files = glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)
    total = sum(os.path.getsize(f) for f in files)
    if not files:
        raise ValueError(f"compact_files: no parquet files under {src!r}")
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src)
    if order_by:
        out = df.repartitionByRange(n_out, *order_by).sortWithinPartitions(
            *order_by
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst)
    n_written = len(glob.glob(os.path.join(dst, "*.parquet")))
    return {"files_in": len(files), "files_out": n_written, "bytes": total}
