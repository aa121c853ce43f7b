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
    """(QUERIES, UNRESOLVED oracles): ordering and membership only
    need oracle NAMES — resolving a callable oracle builds pcap truth
    fixtures (tempdir parquet writes, pyarrow), a side effect that
    belongs in oracle_sql() alone (ADVICE r5: listing queries must
    stay cheap and side-effect-free)."""
    from hadoop_pcap_spark import plans

    plans.load_all()
    return plans.QUERIES, plans.ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the end-to-end
    corpus build (Gopher rules → PII scrub → exact dedup → near-dup
    keep set → sequence packing) with per-source stage counts — the
    whole pipeline in one dataflow, hash-checked against a composed
    DuckDB oracle at sf0.01."""
    queries_map, _ = _registry()
    return queries_map["corpus_build_stats"](spark, "/root/testdata/sf0.001")


def _green_row(row) -> bool:
    """THE green-row predicate: a CORRECTNESS row counts as
    driver-verified iff rows AND hash matched and no error was
    recorded.  One definition, shared with the meta-test
    (tests/test_driver_contract.py) — ADVICE r6: the test deriving
    'verified' from hash_match alone could disagree with the ordering
    below on a hash_match=true row that also carries an err."""
    return bool(
        isinstance(row, dict)
        and row.get("rows_match")
        and row.get("hash_match")
        and not row.get("err")
    )


def _staleness_order(queries_map, oracles_map) -> list[str]:
    """Oracle-bearing queries ordered least-recently-driver-verified
    first (VERDICT r5 item 5) — computed from the committed
    ``CORRECTNESS_r*.json`` artifacts, so the rotation maintains
    itself every round instead of needing a hand-reordered list:

    * queries with no green driver row in ANY round head the list
      (new oracles enter the window immediately);
    * then ascending by the round of their most recent green row, so
      the driver's capped (~50-row) window always re-verifies the
      stalest entries and lifetime staleness stays bounded;
    * name as the tie-break keeps the order deterministic.

    Every name this returns carries an oracle — rows-only queries
    never burn a slot inside the driver's cap (VERDICT r2 item 2)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last_green: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if _green_row(row):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return sorted(
        (k for k in queries_map if k in oracles_map),
        key=lambda k: (last_green.get(k, 0), k),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracle-bearing queries in staleness order (least recently
    driver-verified first), rows-only checks last — if the driver caps
    or time-boxes its run, the slots go to the hash-compared queries
    that need re-verification most, and rows-only probes are never the
    reason a hash row is dropped."""
    queries_map, oracles_map = _registry()
    ordered = {
        k: queries_map[k] for k in _staleness_order(queries_map, oracles_map)
    }
    ordered.update({k: v for k, v in queries_map.items() if k not in oracles_map})
    return ordered


def oracle_sql() -> dict[str, str]:
    from hadoop_pcap_spark import plans

    plans.load_all()
    return plans.resolved_oracles()
