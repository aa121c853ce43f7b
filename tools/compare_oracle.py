"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and an order-insensitive value
rendering.  Usage:

    python tools/compare_oracle.py [--sf /root/testdata/sf0.01] [--only name[,name]]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_pcap_spark.plans import WAREHOUSE_TABLES as TABLES  # noqa: E402


def norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out, [cols[i] for i in order]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--cpus", default="8")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("compare_oracle")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        # pyspark's 1g default heap is fine at sf0.01 but genuinely
        # undersized for sf1-scale runs (broadcast build + 6M-row
        # shuffles on 8 local threads OOM'd the JVM mid-suite)
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qmap = entrymod.queries()
    omap = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name, fn in sorted(qmap.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc(limit=3)
            n_fail += 1
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in omap:
            print(f"rows-only  {name}: {len(s_rows)} rows  ({t_spark:.1f}s)")
            n_rowsonly += 1
            continue
        t1 = time.time()
        try:
            cur = con.execute(omap[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb raised: {e}")
            n_fail += 1
            failures.append(name)
            continue

        ok = True
        msgs = []
        if len(s_rows) != len(d_rows):
            ok = False
            msgs.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            msgs.append(f"columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if ok:
            s_norm, _ = normalize(s_rows, s_cols)
            d_norm, _ = normalize(d_rows, d_cols)
            if s_norm != d_norm:
                ok = False
                diffs = [
                    (a, b) for a, b in zip(s_norm, d_norm) if a != b
                ][:3]
                msgs.append(f"values differ; first diffs: {diffs}")
        if ok:
            print(
                f"MATCH {name}: {len(s_rows)} rows  "
                f"(spark {t_spark:.1f}s / duckdb {time.time()-t1:.1f}s)"
            )
            n_pass += 1
        else:
            print(f"FAIL  {name}: " + "; ".join(msgs))
            n_fail += 1
            failures.append(name)

    print(
        f"\n== {n_pass} match, {n_rowsonly} rows-only, {n_fail} fail"
        + (f"  FAILURES: {failures}" if failures else "")
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
