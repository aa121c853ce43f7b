"""The SQL front door — the reference's primary interface, re-homed.

hadoop-pcap's documented entry point is Hive QL over a SerDe table
(hadoop-pcap-serde/README.md:21-60: CREATE EXTERNAL TABLE ... ROW
FORMAT SERDE 'net.ripe.hadoop.pcap.serde.PcapDeserializer').  The
Spark twin: register the capture (and the warehouse tables) as temp
views, then every query in this package — and anything a Hive user
wrote — runs via ``spark.sql``.

(`CREATE TABLE ... USING pcap` itself is blocked by a PySpark 4.1
limitation — OPTIONS are dropped for Python data sources at reader()
time — so view registration is the supported SQL path; see SCALE.md
known limits.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from .plans import WAREHOUSE_TABLES


def register_warehouse_views(
    spark: SparkSession,
    sf_dir: str,
    tables: Sequence[str] = WAREHOUSE_TABLES,
) -> None:
    """One temp view per warehouse parquet table (events normalized to
    epoch-µs BIGINT ts, matching every oracle's convention)."""
    from .plans import table as _table

    for t in tables:
        _table(spark, sf_dir, t).createOrReplaceTempView(t)


def register_packets_view(
    spark: SparkSession,
    path: str,
    name: str = "packets",
    **read_pcap_kwargs,
) -> DataFrame:
    """The serde-table twin: ``packets`` as a SQL view over a capture
    path.  Filters/projections written in SQL reach the same chunked
    decode pipeline as the DataFrame API."""
    from .sources import read_pcap

    df = read_pcap(spark, path, **read_pcap_kwargs)
    df.createOrReplaceTempView(name)
    return df
