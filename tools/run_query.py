#!/usr/bin/env python
"""Run any registered query by name against a testdata directory.

    python tools/run_query.py --list
    python tools/run_query.py tpch_q1 --sf /root/testdata/sf0.01
    python tools/run_query.py dedup_minhash_lsh --explain
    python tools/run_query.py tpch_q5_local_supplier_volume --oracle

--explain prints the formatted physical plan instead of rows;
--oracle prints the DuckDB oracle SQL (when the query has one).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="registered query name")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--list", action="store_true", help="list registered queries")
    ap.add_argument("--explain", action="store_true", help="print the physical plan")
    ap.add_argument("--oracle", action="store_true", help="print the DuckDB oracle SQL")
    ap.add_argument("--rows", type=int, default=20, help="rows to show")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()

    # generated oracles that train model artifacts from the corpus
    # (plans/ann_oracles.py) read this to stay in sync with --sf
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", args.sf)

    from hadoop_pcap_spark.plans import ORACLES, QUERIES, load_all

    load_all()
    if args.list or not args.name:
        for name in QUERIES:
            print(f"{name}  [{'oracle' if name in ORACLES else 'rows-only'}]")
        return 0
    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; --list shows all", file=sys.stderr)
        return 2
    if args.oracle:
        sql = ORACLES.get(args.name)
        if callable(sql):
            sql = sql()
        print(sql.strip() if sql else f"-- {args.name} has no oracle (rows-only)")
        return 0

    from hadoop_pcap_spark.session import get_spark

    spark = get_spark(cpus=int(args.cpus))
    df = QUERIES[args.name](spark, args.sf)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
