"""Network-address column functions (JVM-side, codegen-friendly).

Extends the decode kernel's address handling (SURVEY.md D15) with the
query-side helpers an analyst needs over the ``src``/``dst`` string
columns: numeric form, private-range tests, prefix aggregation.
All are pure built-in expressions with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ipv4_to_long(col) -> Column:
    """dotted-quad string → numeric (NULL for non-IPv4 text)."""
    oct_ = lambda i: F.split(col, r"\.").getItem(i).cast("long")
    valid = col.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    val = (
        oct_(0) * 16777216 + oct_(1) * 65536 + oct_(2) * 256 + oct_(3)
    )
    return F.when(valid, val)


def long_to_ipv4(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(
        ".",
        (c / 16777216).cast("long") % 256,
        (c / 65536).cast("long") % 256,
        (c / 256).cast("long") % 256,
        c % 256,
    )


def is_private_ipv4(col) -> Column:
    """RFC 1918 membership (10/8, 172.16/12, 192.168/16)."""
    v = ipv4_to_long(col)
    return (
        ((v >= 167772160) & (v <= 184549375))
        | ((v >= 2886729728) & (v <= 2887778303))
        | ((v >= 3232235520) & (v <= 3232301055))
    )


def ipv4_prefix(col, bits: int = 24) -> Column:
    """Network prefix as text, e.g. /24 of '10.1.2.3' → '10.1.2.0/24'."""
    v = ipv4_to_long(col)
    mask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF
    net = v.bitwiseAND(F.lit(mask))
    return F.concat(long_to_ipv4(net), F.lit(f"/{bits}"))
