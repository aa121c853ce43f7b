"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as a
named (spark, sf_dir) → DataFrame callable.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted for
non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def _registry():
    from hadoop_pcap_spark import plans

    plans.load_all()
    return plans.QUERIES, plans.ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 (the
    scan-heavy aggregate; driver checks rows > 0)."""
    queries_map, _ = _registry()
    return queries_map["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracle-bearing queries first (relational → pipeline → pcap, in
    registration order), rows-only checks last — if the driver caps or
    time-boxes its run, the hard hash-compared queries are never the
    ones dropped."""
    queries_map, oracles_map = _registry()
    ordered = {k: v for k, v in queries_map.items() if k in oracles_map}
    ordered.update({k: v for k, v in queries_map.items() if k not in oracles_map})
    return ordered


def oracle_sql() -> dict[str, str]:
    _, oracles_map = _registry()
    return dict(oracles_map)
