"""Debug CLI: stream-decode pcap files and print one k=v line per
packet — parity with the reference's PcapReaderRunner
(run/PcapReaderRunner.java:13-63, which dumps Packet.toString()).
No Spark session required; uses the decode kernel directly.

    python -m hadoop_pcap_spark.dump [--decoder dns] [--md5] file.pcap[.gz] ...
"""

from __future__ import annotations

import argparse
import sys

from .pcap.decode import DecodeOptions, decode_pcap


def fmt(packet: dict) -> str:
    parts = []
    for k, v in packet.items():
        if k == "payload":
            v = v.hex() if len(v) <= 32 else f"<{len(v)} bytes>"
        parts.append(f"{k}={v}")
    return "[" + ", ".join(parts) + "]"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="hadoop_pcap_spark.dump", description=__doc__)
    ap.add_argument("files", nargs="+")
    ap.add_argument("--decoder", choices=["ip", "dns"], default="ip")
    ap.add_argument("--md5", action="store_true", help="compute per-packet MD5")
    ap.add_argument("--permissive", action="store_true", help="skip bad files")
    ap.add_argument(
        "--no-strict", action="store_true",
        help="accept pcapng/nanosecond/big-endian captures and use "
             "RFC-correct (rather than reference-parity) decode quirks",
    )
    ap.add_argument("--limit", type=int, default=0, help="stop after N packets/file")
    args = ap.parse_args(argv)

    opts = DecodeOptions(
        decoder=args.decoder,
        calculate_md5=args.md5,
        strict_reference=not args.no_strict,
        mode="PERMISSIVE" if args.permissive else "FAILFAST",
    )
    status = 0
    for path in args.files:
        try:
            with open(path, "rb") as f:
                data = f.read()
            for i, pkt in enumerate(decode_pcap(data, name=path, opts=opts)):
                print(fmt(pkt))
                if args.limit and i + 1 >= args.limit:
                    break
        except Exception as exc:  # noqa: BLE001 — CLI surface
            print(f"{path}: {exc}", file=sys.stderr)
            status = 1
    return status


if __name__ == "__main__":
    sys.exit(main())
