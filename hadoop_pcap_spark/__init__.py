"""hadoop_pcap_spark — a PySpark-native packet-analytics engine.

A from-scratch reimplementation of the capabilities of
gconklin/hadoop-pcap (a fork of RIPE-NCC/hadoop-pcap): a libpcap
binary decoder exposed as a typed Spark DataFrame source, plus the
full relational query surface the reference delegated to Hive,
re-expressed natively on Spark SQL / DataFrame / Catalyst, and the
large-scale data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) a 100 TB deployment needs.

Layout:
  pcap/       pure-Python decode kernel (no Spark dependency)
  sources/    Spark sources: read_pcap() on binaryFile, DataSource V2
  operators/  dedup, similarity, as-of join, top-k
  functions/  column-function libraries (text analysis, net helpers)
  plans/      the relational parity query suite + DuckDB oracles
  streaming/  Structured Streaming analogs
"""

__version__ = "0.1.0"

# The one-import user surface: session, ingest, SQL front door, ETL.
from .session import get_spark  # noqa: E402,F401
from .sources import read_pcap  # noqa: E402,F401
from .sources.pcap_source import write_packets_parquet, write_pcap  # noqa: E402,F401
from .sql import register_packets_view, register_warehouse_views  # noqa: E402,F401

__all__ = [
    "get_spark",
    "read_pcap",
    "write_packets_parquet",
    "write_pcap",
    "register_packets_view",
    "register_warehouse_views",
    "__version__",
]
