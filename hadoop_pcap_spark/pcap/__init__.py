"""Pure-Python pcap decode kernel (no Spark dependency)."""

from .decode import (  # noqa: F401
    DecodeOptions,
    PcapFormatError,
    decode_pcap,
    decompress_auto,
)
