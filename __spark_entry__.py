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


# Run first, in this order: one representative per operator family so
# that a capped/time-boxed driver run still covers every family with a
# hash-compared result (the remaining oracle queries follow, then
# rows-only checks last).  Every entry here MUST carry an oracle —
# rows-only queries never burn a slot inside the driver's row cap
# (VERDICT r2 item 2: pcap_dns_qname_topk used to).
_PRIORITY = [
    "tpch_q1",
    "projection_filter",
    "join_broadcast_dim",
    "window_topn_per_group",
    "dedup_exact_fingerprint",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "similarity_cosine_topk",
    "text_quality_scores",
    "text_langid",
    "text_token_stats",
    "rollup_region_nation",
    "join_asof_nearest",
    "time_bucket_tumbling",
    # round-3 family representatives (all oracle-bearing)
    "corpus_build_stats",
    "tpch_q2_min_cost_supplier",
    "tpch_q21_suppliers_kept_waiting",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "docs_gopher_quality_filter",
    "text_repetition_topgram",
    "docs_pack_sequences",
    "docs_mixture_weights",
    "dedup_incremental",
    "time_bucket_gapfill",
    "window_range_frame_trailing",
    "unpivot_long",
    "histogram_fixed_buckets",
    "corpus_shard_manifest",
    "text_char_ngram_dup_rate",
    "docs_leakage_safe_split",
    "text_unigram_logprob",
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
