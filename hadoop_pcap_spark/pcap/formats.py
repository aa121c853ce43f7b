"""Capture-format normalization front-end (non-strict mode only).

The reference accepts exactly one on-disk format: classic little-endian
microsecond pcap (PcapReader.java:107-108 throws on every other magic).
``strict_reference=True`` (the default) keeps that parity.  But every
modern ``tcpdump`` / ``wireshark`` writes pcapng by default, and
nanosecond / big-endian classic captures are common — so in non-strict
mode the decode kernels route bytes through :func:`normalize_capture`,
which rewrites

* big-endian classic pcap         (magic ``0xD4C3B2A1`` LE-read)
* nanosecond classic pcap         (magic ``0xA1B23C4D`` / BE twin)
* pcapng                          (block type ``0x0A0D0D0A``)

into classic LE-µs pcap bytes that the (shared, heavily tested) kernels
consume unchanged.  LE-classic input passes through untouched (no copy).

Documented precision divergence: nanosecond timestamps (classic-ns and
pcapng with ``if_tsresol`` finer than 1e-6) are truncated to
microseconds — the row schema carries ``ts``/``ts_usec`` only.

pcapng notes (format per the IETF pcapng draft / wireshark docs):

* per-section byte order from the SHB byte-order magic ``0x1A2B3C4D``;
* interface timestamp resolution from the ``if_tsresol`` option
  (code 9; default 1e-6);
* EPB / SPB / obsolete PB blocks become records; everything else
  (NRB, ISB, custom) is skipped;
* classic pcap carries exactly one link type, so the emitted global
  header uses the link type of the FIRST packet's interface.  Mixed
  link types (the ``tcpdump -i any`` merge case — VERDICT r11 item 3)
  are handled by :func:`normalize_capture_ex`, which keeps EVERY
  packet in capture order and returns a per-packet link-type
  side-channel that both decode kernels dispatch on; the legacy
  :func:`normalize_capture` (bytes-only) keeps the old documented
  lossy behavior of dropping other-link packets, since a caller
  without the side-channel would mis-decode them.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

MAGIC_LE = 0xA1B2C3D4
MAGIC_BE = 0xD4C3B2A1  # LE-read value of a big-endian classic file
MAGIC_NS_LE = 0xA1B23C4D
MAGIC_NS_BE = 0x4D3CB2A1
PCAPNG_SHB = 0x0A0D0D0A
PCAPNG_BYTE_ORDER = 0x1A2B3C4D

_BLK_IDB = 0x00000001
_BLK_PB = 0x00000002  # obsolete packet block
_BLK_SPB = 0x00000003
_BLK_EPB = 0x00000006


class _Trunc(Exception):
    """Internal: clean stop on a truncated trailing structure."""


def normalize_capture(data: bytes, name: str = "") -> bytes:
    """Rewrite any supported capture container to classic LE-µs pcap.

    LE-classic input is returned as-is (zero copy).  Unrecognized magic
    is also returned as-is — the kernel's own validator produces the
    canonical error/PERMISSIVE behavior.  Raises ``ValueError``
    subclasses only for *recognized-but-unusable* pcapng input (the
    callers map it through their FAILFAST/PERMISSIVE switch).

    Mixed-link pcapng: packets on interfaces whose link type differs
    from the first packet's are DROPPED (a bytes-only caller has no
    way to decode them correctly).  Use :func:`normalize_capture_ex`
    to keep them — the in-repo kernels do.
    """
    out, links = normalize_capture_ex(data, name)
    if links is None:
        return out
    # rebuild keeping only first-link packets: `links` is per emitted
    # record, and the rewrite emits only complete records, so the
    # re-framing below cannot run off the end
    header = out[:24]
    keep_link = int.from_bytes(header[20:24], "little")
    pieces, pos = [header], 24
    for lt in links:
        caplen = int.from_bytes(out[pos + 8 : pos + 12], "little")
        rec = out[pos : pos + 16 + caplen]
        pos += 16 + caplen
        if lt == keep_link:
            pieces.append(rec)
    return b"".join(pieces)


def normalize_capture_ex(
    data: bytes, name: str = ""
) -> Tuple[bytes, Optional[List[int]]]:
    """Like :func:`normalize_capture`, plus a per-packet link-type
    side-channel: ``(classic_le_us_bytes, per_pkt_links)``.

    ``per_pkt_links`` is ``None`` for every uniform capture (all
    classic containers; pcapng whose packets share one link type) —
    the global header's link type governs, as before.  For a MIXED
    pcapng (``tcpdump -i any`` merges and the like) it is a list with
    one link-type int per emitted record, in capture order, and NO
    packet is dropped; the global header carries the first packet's
    link type for bytes-only readers."""
    if len(data) < 4:
        return data, None
    magic = int.from_bytes(data[:4], "little")
    if magic == MAGIC_LE:
        return data, None
    if magic == MAGIC_BE:
        return _rewrite_classic(data, ">", ns=False), None
    if magic == MAGIC_NS_LE:
        return _rewrite_classic(data, "<", ns=True), None
    if magic == MAGIC_NS_BE:
        return _rewrite_classic(data, ">", ns=True), None
    if magic == PCAPNG_SHB:
        return _rewrite_pcapng(data, name)
    return data, None


def _rewrite_classic(data: bytes, e: str, ns: bool) -> bytes:
    """BE and/or nanosecond classic pcap → LE-µs classic pcap."""
    if len(data) < 24:
        return data  # kernel emits its own truncated-header behavior
    _, vmaj, vmin, zone, sigfigs, snaplen, network = struct.unpack_from(
        e + "IHHiIII", data, 0
    )
    out = [struct.pack("<IHHiIII", MAGIC_LE, vmaj, vmin, zone, sigfigs, snaplen, network)]
    pos, n = 24, len(data)
    while pos + 16 <= n:
        ts_sec, ts_sub, caplen, origlen = struct.unpack_from(e + "IIII", data, pos)
        if ns:
            ts_sub //= 1000
        body = data[pos + 16 : pos + 16 + caplen]
        out.append(struct.pack("<IIII", ts_sec, ts_sub, caplen, origlen))
        out.append(body)
        pos += 16 + caplen
        if len(body) < caplen:
            break  # truncated tail: emitted header + short body → ts-only row
    if pos < n and pos + 16 > n:
        out.append(data[pos:])  # partial trailing record header, verbatim
    return b"".join(out)


def _tsresol_units(opt_val: bytes) -> int:
    """if_tsresol option byte → timestamp units per second."""
    if not opt_val:
        return 1_000_000
    v = opt_val[0]
    return 2 ** (v & 0x7F) if v & 0x80 else 10 ** (v & 0x7F)


def _parse_idb_tsresol(body: bytes, e: str) -> int:
    """Scan IDB options for if_tsresol (code 9)."""
    pos = 8  # linktype u16 + reserved u16 + snaplen u32
    n = len(body)
    while pos + 4 <= n:
        code, olen = struct.unpack_from(e + "HH", body, pos)
        pos += 4
        if code == 0:  # opt_endofopt
            break
        val = body[pos : pos + olen]
        if code == 9:
            return _tsresol_units(val)
        pos += (olen + 3) & ~3  # 32-bit padded
    return 1_000_000


def _rewrite_pcapng(
    data: bytes, name: str
) -> Tuple[bytes, Optional[List[int]]]:
    """pcapng → (classic LE-µs pcap, per-packet links or None) — see
    module header for the rules.  Every packet is kept, in capture
    order; the side-channel is non-None only when link types are
    actually mixed."""
    n = len(data)
    pos = 0
    endian: Optional[str] = None
    # interfaces of the CURRENT section: (linktype, units_per_sec, snaplen)
    section_ifaces: List[Tuple[int, int, int]] = []
    out_link: Optional[int] = None
    snaplen_out = 65535
    records: List[bytes] = []
    links: List[int] = []

    def read_block(pos: int) -> Tuple[int, bytes, int]:
        # SHB type bytes are endian-invariant; its length needs the
        # byte-order magic that lives inside the block itself
        raw_type = int.from_bytes(data[pos : pos + 4], "little")
        if raw_type == PCAPNG_SHB:
            bom = int.from_bytes(data[pos + 8 : pos + 12], "little")
            e = "<" if bom == PCAPNG_BYTE_ORDER else ">"
            blen = struct.unpack_from(e + "I", data, pos + 4)[0]
            if blen < 28 or pos + blen > n:
                raise _Trunc()
            return PCAPNG_SHB, b"", pos + blen
        btype, blen = struct.unpack_from(endian + "II", data, pos)
        if blen < 12 or blen % 4 or pos + blen > n:
            raise _Trunc()
        return btype, data[pos + 8 : pos + blen - 4], pos + blen

    def emit(link: int, units: int, ts64: int, cap: bytes, origlen: int):
        nonlocal out_link
        if out_link is None:
            out_link = link  # global header carries the FIRST link
        sec, rem = divmod(ts64, units)
        usec = rem * 1_000_000 // units
        records.append(
            struct.pack("<IIII", sec & 0xFFFFFFFF, usec, len(cap), origlen) + cap
        )
        links.append(link)

    try:
        while pos + 12 <= n:
            # peek: SHB starts a section and (re)sets endianness
            raw_type = int.from_bytes(data[pos : pos + 4], "little")
            if raw_type == PCAPNG_SHB:
                bom = int.from_bytes(data[pos + 8 : pos + 12], "little")
                endian = "<" if bom == PCAPNG_BYTE_ORDER else ">"
                section_ifaces = []
            elif endian is None:
                raise ValueError(f"{name}: pcapng data does not start with an SHB")
            btype, body, pos = read_block(pos)
            if btype == PCAPNG_SHB:
                continue
            if btype == _BLK_IDB:
                if len(body) < 8:
                    raise _Trunc()
                link = struct.unpack_from(endian + "H", body, 0)[0]
                snap = struct.unpack_from(endian + "I", body, 4)[0]
                if snap:
                    snaplen_out = max(snaplen_out, snap)
                section_ifaces.append((link, _parse_idb_tsresol(body, endian), snap))
            elif btype == _BLK_EPB:
                if len(body) < 20:
                    raise _Trunc()
                if_id, ts_hi, ts_lo, caplen, origlen = struct.unpack_from(
                    endian + "IIIII", body, 0
                )
                if if_id >= len(section_ifaces):
                    raise ValueError(f"{name}: pcapng EPB references unknown interface {if_id}")
                link, units, _snap = section_ifaces[if_id]
                emit(link, units, (ts_hi << 32) | ts_lo, body[20 : 20 + caplen], origlen)
            elif btype == _BLK_SPB:
                if len(body) < 4:
                    raise _Trunc()
                if not section_ifaces:
                    raise ValueError(f"{name}: pcapng SPB before any IDB")
                origlen = struct.unpack_from(endian + "I", body, 0)[0]
                link, units, snap = section_ifaces[0]
                # SPB stores no caplen: captured = min(origlen, snaplen),
                # clamped to the (4-byte padded) block body — without the
                # snaplen clamp a truncated packet would absorb padding
                caplen = min(origlen, len(body) - 4)
                if snap:
                    caplen = min(caplen, snap)
                emit(link, units, 0, body[4 : 4 + caplen], origlen)
            elif btype == _BLK_PB:
                if len(body) < 20:
                    raise _Trunc()
                if_id, _drops, ts_hi, ts_lo, caplen, origlen = struct.unpack_from(
                    endian + "HHIIII", body, 0
                )
                if if_id >= len(section_ifaces):
                    raise ValueError(f"{name}: pcapng PB references unknown interface {if_id}")
                link, units, _snap = section_ifaces[if_id]
                emit(link, units, (ts_hi << 32) | ts_lo, body[20 : 20 + caplen], origlen)
            # all other block types skipped
    except _Trunc:
        pass  # truncated trailing block: keep what we have

    if out_link is None:
        out_link = section_ifaces[0][0] if section_ifaces else 1
    header = struct.pack("<IHHiIII", MAGIC_LE, 2, 4, 0, 0, snaplen_out, out_link)
    mixed = any(lt != out_link for lt in links)
    return header + b"".join(records), (links if mixed else None)
