"""Spark sources: pcap scans and helpers."""

from .pcap_source import (  # noqa: F401
    DNS_PACKET_SCHEMA,
    PACKET_SCHEMA,
    packet_schema,
    read_pcap,
    write_packets_parquet,
)
from .datasource import PcapDataSource, register_pcap_datasource  # noqa: F401
