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
    """Flagship query on /root/testdata/sf0.001: the end-to-end
    corpus build (Gopher rules → PII scrub → exact dedup → near-dup
    keep set → sequence packing) with per-source stage counts — the
    whole pipeline in one dataflow, hash-checked against a composed
    DuckDB oracle at sf0.01."""
    queries_map, _ = _registry()
    return queries_map["corpus_build_stats"](spark, "/root/testdata/sf0.001")


# Run first, in this order: the oracle-bearing queries the driver's
# capped (~50-row) correctness window has NOT yet hash-verified in any
# round, then a core of family representatives for continuity.  The
# window ROTATES each round (VERDICT r3 item 4): r4 promoted 37 of the
# 49 previously uncovered queries; round 5 front-loads the remaining
# 13 (CORRECTNESS_r04 ended at tpch_q7_volume_shipping) so that, once
# green, all 100 oracle queries have a driver-verified row lifetime.
# Every entry here MUST carry an oracle — rows-only queries never burn
# a slot inside the driver's cap (VERDICT r2 item 2).
_PRIORITY = [
    # r5 rotation head: the 13 oracle queries never driver-verified in
    # r1-r4 (VERDICT r4 item 1) — family-diverse ordering not needed;
    # all 13 fit comfortably inside the cap.
    "dedup_simhash_wide",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_parts",
    "tpch_q12_late_lines_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive",
    "tpch_q20_excess_shipments",
    "tpch_q22_idle_customers",
    # new in r5: the five fixture pcap queries gained synthesizer
    # ground-truth oracles — first driver hash verification
    "pcap_port_count",
    "pcap_dns_qname_topk",
    "pcap_dedup_md5",
    "pcap_flow_stats",
    "pcap_multimodal_payload",
    # core family representatives (driver-green in r3/r4)
    "tpch_q1",
    "projection_filter",
    "join_broadcast_dim",
    "window_topn_per_group",
    "dedup_exact_fingerprint",
    "dedup_minhash_lsh",
    "similarity_cosine_topk",
    "text_quality_scores",
    "rollup_region_nation",
    "join_asof_nearest",
    "time_bucket_tumbling",
    "topk_global",
    "corpus_build_stats",
    # remainder of the r4 window (all driver-green in r4), kept in the
    # same family-diverse order so a wider cap re-verifies breadth
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "datetime_functions",
    "json_map_functions",
    "case_when_bucketing",
    "pivot_wide",
    "scalar_subquery",
    "having_filter",
    "stats_functions",
    "percentiles_exact",
    "sessionize_batch",
    "argmax_per_group",
    "explode_unnest",
    "union_by_name",
    "window_first_last",
    "net_ipv4_prefix_agg",
    "window_ranks",
    "join_full_outer",
    "cross_join_small",
    "null_functions",
    "bool_aggregates",
    "map_functions",
    "embedding_array_stats",
    "text_fingerprint",
    "text_tfidf_top_terms",
    "dedup_cluster_components",
    "dedup_corpus_keep_set",
    "text_token_budget",
    "text_pii_scrub",
    "docs_hash_sample",
    "docs_stratified_sample",
    "decontaminate_ngram_overlap",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Family representatives first, then the remaining oracle-bearing
    queries (relational → pipeline → pcap, in registration order),
    rows-only checks last — if the driver caps or time-boxes its run,
    the hard hash-compared queries are never the ones dropped, and
    every operator family keeps at least one hash-compared row."""
    queries_map, oracles_map = _registry()
    ordered = {k: queries_map[k] for k in _PRIORITY if k in queries_map}
    ordered.update({k: v for k, v in queries_map.items() if k in oracles_map})
    ordered.update({k: v for k, v in queries_map.items() if k not in oracles_map})
    return ordered


def oracle_sql() -> dict[str, str]:
    _, oracles_map = _registry()
    return dict(oracles_map)
