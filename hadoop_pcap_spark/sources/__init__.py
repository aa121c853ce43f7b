"""Spark sources: pcap scans and helpers."""

from .pcap_source import (  # noqa: F401
    DNS_PACKET_SCHEMA,
    FRAME_FIELDS,
    PACKET_SCHEMA,
    decode_frames,
    packet_schema,
    read_pcap,
    read_pcap_stream,
    write_packets_parquet,
    write_pcap,
)
from .datasource import PcapDataSource, register_pcap_datasource  # noqa: F401
