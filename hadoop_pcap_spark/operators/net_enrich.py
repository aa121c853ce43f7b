"""Longest-prefix-match (LPM) enrichment join — router-grade CIDR
lookup over decoded address columns.

Spark has no native LPM join; the naive theta-join (``ip BETWEEN
net_lo AND net_hi`` per route) degenerates to BroadcastNestedLoop and
dies at route-table scale.  This operator uses the classic trick from
network flow pipelines: a route table only contains a handful of
DISTINCT prefix lengths, so LPM decomposes into one equi-join per
present length — explode each address into (plen, truncated-prefix)
candidate keys for exactly those lengths, broadcast-hash-join against
the routes keyed the same way, and keep the longest match per
address.  All arithmetic (truncation is ``ip - ip % 2^(32-plen)``)
stays in whole-stage codegen; no UDF, no range join.

Scale: candidates are |addresses| × |distinct plens| (a real routing
table has ≤ ~25 distinct lengths, a curated enrichment table far
fewer), the join side is the broadcast route table, and the winner
pick is one WindowGroupLimit per address.  Enrich DISTINCT addresses
(bounded by the 2^32 v4 space, typically ≪ row count), then hash- or
broadcast-join the verdicts back to the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.net import ipv4_to_long


def parse_routes(routes: DataFrame, cidr_col: str = "cidr") -> DataFrame:
    """Normalize a route table: ``cidr`` 'a.b.c.d/len' → (plen,
    net_key) with net_key the prefix-truncated numeric network (so a
    non-canonical route like 10.0.1.7/24 still keys correctly)."""
    parts = F.split(F.col(cidr_col), "/")
    return (
        routes.withColumn("plen", parts.getItem(1).cast("int"))
        .withColumn("_net", ipv4_to_long(parts.getItem(0)))
        # 2^(32-plen) needs a row-dependent shift, so SQL shiftleft
        # (the python F.shiftleft only takes a literal bit count)
        .withColumn(
            "net_key",
            F.expr("_net - _net % shiftleft(cast(1 as bigint), 32 - plen)"),
        )
        .drop("_net")
    )


def lpm_lookup(
    ips: DataFrame,
    routes: DataFrame,
    ip_col: str = "ip",
    cidr_col: str = "cidr",
) -> DataFrame:
    """Longest-prefix-match each address in ``ips[ip_col]`` against
    ``routes`` (small by contract — it is broadcast): returns the
    input columns plus the winning route's attribute columns and its
    ``plen``.  Ties on plen (two identical prefixes) break on the
    lexically first attribute row for determinism.  Unmatched
    addresses are dropped — register a 0.0.0.0/0 catch-all to keep
    them."""
    r = parse_routes(routes, cidr_col)
    plens = sorted(
        row[0] for row in r.select("plen").distinct().collect()
    )
    ip_long = ipv4_to_long(F.col(ip_col))
    # per-row id so the winner window cannot collapse duplicate input
    # rows (same address twice must yield two output rows); the id is
    # transient — partition-local, never ordered on across rows, and
    # dropped before return — so its nondeterminism across runs is
    # invisible in the result
    ips = ips.withColumn("_rid", F.monotonically_increasing_id())
    cand = ips.withColumn("_ip_long", ip_long).select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("_plen"),
                        F.lit(1 << (32 - p)).alias("_pdiv"),
                    )
                    for p in plens
                ]
            )
        ).alias("_c"),
    )
    cand = cand.select(
        *ips.columns,
        F.col("_c._plen").alias("_cplen"),
        (F.col("_ip_long") - F.col("_ip_long") % F.col("_c._pdiv")).alias(
            "_ckey"
        ),
    )
    attr_cols = [c for c in routes.columns if c != cidr_col]
    joined = cand.join(
        F.broadcast(
            r.select(
                F.col("plen").alias("_rplen"),
                F.col("net_key").alias("_rkey"),
                *attr_cols,
            )
        ),
        on=[
            F.col("_cplen") == F.col("_rplen"),
            F.col("_ckey") == F.col("_rkey"),
        ],
    )
    w = Window.partitionBy("_rid").orderBy(
        F.desc("_cplen"), *[F.asc(c) for c in attr_cols]
    )
    out_cols = [c for c in ips.columns if c != "_rid"]
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*out_cols, *attr_cols, F.col("_cplen").alias("plen"))
    )


def lpm_sql(
    facts_rel: str,
    routes_values: str,
    ip_expr: str = "src",
    attr: str = "label",
) -> str:
    """DuckDB twin of :func:`lpm_lookup` composed over ``facts_rel``
    (a relation string), as CTE text ending in a ``best`` CTE of
    (addr, {attr}, plen) — the sequential reference interpretation
    (theta join) of the same route semantics the distributed
    candidate-explode implements."""
    def as_long(e: str) -> str:
        return (
            f"(CAST(string_split({e}, '.')[1] AS BIGINT) * 16777216"
            f" + CAST(string_split({e}, '.')[2] AS BIGINT) * 65536"
            f" + CAST(string_split({e}, '.')[3] AS BIGINT) * 256"
            f" + CAST(string_split({e}, '.')[4] AS BIGINT))"
        )

    ip_long = as_long("addr")
    return f"""
    routes(cidr, {attr}) AS (VALUES {routes_values}),
    r AS (
      SELECT {attr},
             CAST(string_split(cidr, '/')[2] AS INT) AS plen,
             {as_long("string_split(cidr, '/')[1]")} AS net_raw
      FROM routes),
    rk AS (
      SELECT {attr}, plen,
             net_raw - net_raw % (1::BIGINT << (32 - plen)) AS net_key
      FROM r),
    addrs AS (
      SELECT DISTINCT {ip_expr} AS addr FROM {facts_rel}),
    cand AS (
      SELECT a.addr, rk.{attr}, rk.plen
      FROM addrs a JOIN rk
        ON ({ip_long}) - ({ip_long}) % (1::BIGINT << (32 - rk.plen))
           = rk.net_key),
    best AS (
      SELECT addr, {attr}, plen FROM (
        SELECT addr, {attr}, plen,
               row_number() OVER (PARTITION BY addr
                                  ORDER BY plen DESC, {attr}) AS rn
        FROM cand)
      WHERE rn = 1)"""
