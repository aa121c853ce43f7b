"""Core relational operator suite (SURVEY.md §2.4).

The reference delegated all of this to Hive QL over the SerDe table
(hadoop-pcap-serde/README.md:21-60) or hand-written MapReduce
(hadoop-pcap-lib/README.md:20-81).  Here each category is a native
Spark DataFrame/SQL plan with a DuckDB oracle.

Scale notes are attached per query: what the plan does at 100 TB /
1000 executors, which joins broadcast, where the shuffles are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from . import query, table


def _dec_sum(col, alias, scale=4):
    """Order-independent sum of a column whose values are exact at
    ``scale`` decimals: cast to DECIMAL (deterministic round-to-nearest
    of the same IEEE double in both engines — no ties possible at a
    scale finer than the data), exact decimal sum, result as DOUBLE."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


# Exact-decimal money expressions, shared verbatim with the oracles.
# Factors (2-decimal data) cast exactly; products stay exact decimals,
# so no engine-specific double→decimal tie-rounding can creep in.
# Oracle-side decimal→double casts go through VARCHAR
# (CAST(CAST(sum AS VARCHAR) AS DOUBLE)): DuckDB converts a decimal to
# double as scaled-int→double ÷ 10^scale — two roundings, which lands
# 1 ulp off the correctly-rounded value once the scaled integer
# exceeds 2^53 (first seen at the sf1 gate: tpch_q1's scale-6
# sum_charge ≈ 4.36e10 → 4.36e16 scaled).  The decimal's exact digit
# string through strtod is correctly rounded, matching Spark's
# BigDecimal.doubleValue() bit-for-bit at any magnitude.
DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)
CHARGE_SQL = DISC_PRICE_SQL + " * (1 + CAST(l_tax AS DECIMAL(4,2)))"


# --- projection / filter ------------------------------------------------------


@query(
    "projection_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05
    """,
)
def q_projection_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Declared-column projection + predicate — the SerDe semantics (S9).
    Scale: both the projection and both predicates push into the
    parquet scan (ReadSchema + PushedFilters); no shuffle at all."""
    return (
        table(spark, sf, "lineitem")
        .filter((F.col("l_shipdate") < "1996-01-01") & (F.col("l_discount") > 0.05))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "filter_null_safe",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE value IS NOT NULL AND event_type IN ('click','purchase') AND user_id % 10 = 3
    """,
)
def q_filter_null_safe(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe predicate — the README mapper's null check
    (hadoop-pcap-lib/README.md:62-68). Scan-only, no shuffle."""
    return (
        table(spark, sf, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("click", "purchase")
            & (F.col("user_id") % 10 == 3)
        )
        .select("event_id", "user_id", "event_type")
    )


# --- aggregation ---------------------------------------------------------------


@query(
    "agg_count_by_key",
    oracle="""
    SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_agg_count_by_key(spark: SparkSession, sf: str) -> DataFrame:
    """The canonical reference job: group-by-count
    (hadoop-pcap-lib/README.md:20-81 emits (src_port,1) / reduce-sums).
    Scale: partial hash-agg map-side, one shuffle on the 5-value key;
    count(distinct) expands to a two-phase agg."""
    return (
        table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1, the flagship scan-heavy aggregate.
    Scale: 6-column pruned scan, shipdate pushed down, partial agg on
    ~6 groups then a tiny shuffle — the plan is scan-bound, exactly
    what you want at 100 TB."""
    li = table(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "2000-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dec_sum(F.col("l_quantity"), "sum_qty"),
        _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
        F.sum(F.expr(DISC_PRICE_SQL)).cast("double").alias("sum_disc_price"),
        F.sum(F.expr(CHARGE_SQL)).cast("double").alias("sum_charge"),
        F.count("*").alias("count_order"),
    )


@query(
    "agg_minmax_avg",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
           ROUND(CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*), 4) AS avg_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_agg_minmax_avg(spark: SparkSession, sf: str) -> DataFrame:
    """min/max/avg — avg computed as exact decimal sum / count for
    order-independence."""
    return (
        table(spark, sf, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*"),
                4,
            ).alias("avg_bal"),
        )
    )


@query(
    "count_distinct_exact",
    oracle="""
    SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Exact distinct — expands to two-phase agg in Spark.
    Scale: the first phase dedups (o_orderstatus, o_custkey) with a
    shuffle on the pair — no single hot reducer."""
    return (
        table(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_cust"), F.count("*").alias("n"))
    )


@query(
    "approx_count_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_exact, TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
)
def q_approx_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """approx_count_distinct (HLL++) as a BOUND CONTRACT (VERDICT r9
    item 2): the sketch ESTIMATE is engine-specific, so the query emits
    the deterministic verdict ``|approx − exact| ≤ 5% · exact`` per
    group instead (2.5× the configured 2% rsd — same margin the pytest
    error-bound test has asserted since r1).  HLL++ register merges
    are commutative max-merges, so the estimate — and hence the
    boolean — is partitioning-independent; oracle = the exact groups,
    all true.  Hash-checkable, retiring the rows-only residue.
    Scale: the approx side is THE distinct at 100 TB — constant
    memory, one pass, mergeable sketches; the exact side here exists
    only to state the contract."""
    return (
        table(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("_approx"),
            F.countDistinct("user_id").alias("n_exact"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("_approx") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("within_bound"),
        )
    )


# --- grouping sets / rollup / cube --------------------------------------------


@query(
    "rollup_region_nation",
    oracle="""
    SELECT COALESCE(r_name,'ALL') AS region, COALESCE(n_name,'ALL') AS nation,
           count(*) AS n_cust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP over the dim hierarchy.
    Scale: both dims broadcast (25 / 5 rows); rollup is one shuffle."""
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_cust",
            "total_bal",
        )
    )


@query(
    "cube_flag_status",
    oracle="""
    SELECT COALESCE(l_returnflag,'ALL') AS returnflag,
           COALESCE(l_linestatus,'ALL') AS linestatus,
           count(*) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), _dec_sum(F.col("l_quantity"), "qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "qty",
        )
    )


@query(
    "grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus,'ALL') AS status,
           COALESCE(o_orderpriority,'ALL') AS priority,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus,'ALL') AS status,
               COALESCE(o_orderpriority,'ALL') AS priority,
               count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --- joins ---------------------------------------------------------------------


@query(
    "join_broadcast_dim",
    oracle="""
    SELECT p_brand,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 20
    GROUP BY p_brand
    """,
)
def q_join_broadcast(spark: SparkSession, sf: str) -> DataFrame:
    """Fact ⋈ small dim — explicitly broadcast.
    Scale: part at SF100k is still ~dimension-sized per brand filter;
    broadcast avoids shuffling the 100 TB fact side entirely."""
    li = table(spark, sf, "lineitem")
    p = table(spark, sf, "part").filter(F.col("p_size") <= 20)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.expr(DISC_PRICE_SQL)).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "join_multiway",
    oracle="""
    SELECT n_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, selective dims pushed FIRST.

    Join order (r5 rework after the SCALING.md α_big=1.21 diagnosis):
    region(ASIA)⋈nation is 5 rows; a broadcast LEFT SEMI of its keys
    into customer cuts the fact stream 5× at its first dimension
    contact — one cheap pre-filter stage, with the n_name broadcast
    join deferred to the end where it runs on 1/5 the rows.  A/B at
    sf0.1/sf1/sf3 (noop-materialized, min-of-3 cpu-s): 1.53/5.48/34.5
    vs 3.89/6.59/52.4 for the eager customer⋈nation + supplier-semi
    variant and 2.98/20.4/73.0 for the join-order-as-written plan —
    identical results everywhere.

    Scale: orders⋈lineitem is the one big shuffle (both sides huge,
    sort-merge on orderkey at 100 TB); customer/supplier joins are
    left to AQE — broadcast at validation SFs, shuffle at 100 TB.
    The α_big>1 fit across sf1→sf3 is a one-time AQE strategy
    transition (filtered orders fit the broadcast threshold below the
    flip, SMJ above — two new fact shuffles appear at the flip
    point); pinning SMJ at both SFs fits α=0.45–0.91, sublinear.
    Diagnosis + within-strategy fits recorded in SCALING.md."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(F.col("o_orderdate") >= "1996-01-01")
    li = table(spark, sf, "lineitem")
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n_asia = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    c_f = c.join(
        F.broadcast(n_asia.select("n_nationkey")),
        c.c_nationkey == n_asia.n_nationkey,
        "left_semi",
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c_f, o.o_custkey == c_f.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c_f.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n_asia), c_f.c_nationkey == n_asia.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(F.expr(DISC_PRICE_SQL)).cast("double").alias("revenue"))
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_buyers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    GROUP BY c_mktsegment
    """,
)
def q_join_semi(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT SEMI = EXISTS. Scale: semi-join shuffles only the key
    column of the probe side; no row multiplication."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_buyers"))
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT ANTI = NOT EXISTS — 'hosts that never answered' motif."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_range_interval",
    oracle="""
    SELECT e.event_id, count(c.event_id) AS n_clicks_before
    FROM events e
    LEFT JOIN events c
      ON c.user_id = e.user_id AND c.event_type = 'click'
     AND epoch_us(c.ts) >= epoch_us(e.ts) - 600000000 AND epoch_us(c.ts) < epoch_us(e.ts)
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def q_join_range(spark: SparkSession, sf: str) -> DataFrame:
    """Range/interval join: clicks within 10 min before each error.
    The equi-key (user_id) carries the shuffle; the range predicate is
    evaluated inside the joined partition — at 100 TB this stays a
    hash join on user_id, NOT a cartesian.  (ts is second-granular in
    the reference — same motif as query↔response pairing, SURVEY §2.4.)"""
    e = table(spark, sf, "events").alias("e")
    c = table(spark, sf, "events").filter(F.col("event_type") == "click").alias("c")
    cond = (
        (F.col("c.user_id") == F.col("e.user_id"))
        & (F.col("c.ts") >= F.col("e.ts") - 600000000)  # ts is epoch-µs long
        & (F.col("c.ts") < F.col("e.ts"))
    )
    return (
        e.filter(F.col("e.event_type") == "error")
        .join(c, cond, "left")
        .groupBy("e.event_id")
        .agg(F.count("c.event_id").alias("n_clicks_before"))
        .select(F.col("event_id"), F.col("n_clicks_before"))
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH err AS (SELECT * FROM events WHERE event_type = 'error'),
         sig AS (SELECT * FROM events WHERE event_type = 'signup')
    SELECT e.event_id,
           MAX(epoch_us(s.ts)) AS last_signup_us
    FROM err e LEFT JOIN sig s
      ON s.user_id = e.user_id AND epoch_us(s.ts) <= epoch_us(e.ts)
    GROUP BY e.event_id
    """,
)
def q_join_asof(spark: SparkSession, sf: str) -> DataFrame:
    """AS-OF join (most recent signup at or before each error), built
    as equi-join on user + max() refine — Spark lacks a native as-of.
    Scale: shuffle on user_id once; the max() folds into the same
    aggregation; no sort of the full stream needed."""
    e = table(spark, sf, "events").filter(F.col("event_type") == "error").alias("e")
    s = table(spark, sf, "events").filter(F.col("event_type") == "signup").alias("s")
    return (
        e.join(
            s,
            (F.col("s.user_id") == F.col("e.user_id")) & (F.col("s.ts") <= F.col("e.ts")),
            "left",
        )
        .groupBy("e.event_id")
        .agg(F.max("s.ts").alias("last_signup_us"))
        .select(F.col("event_id"), F.col("last_signup_us"))
    )


# --- windows -------------------------------------------------------------------


@query(
    "window_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_window_topn(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 orders per customer — the per-group top-k motif.
    Scale: one shuffle on the partition key; Spark inserts a
    WindowGroupLimit (partial top-k before the shuffle) for rank<=k."""
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        table(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
             PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
    FROM lineitem WHERE l_suppkey <= 3
    """,
)
def q_window_running(spark: SparkSession, sf: str) -> DataFrame:
    """Running sum with an explicit ROWS frame and a unique tie-break
    ordering (shipdate alone has ties → nondeterministic otherwise)."""
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        table(spark, sf, "lineitem")
        .filter(F.col("l_suppkey") <= 3)
        .withColumn(
            "running_qty",
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).over(w).cast("double"),
        )
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
    )


@query(
    "window_lag_gap",
    oracle="""
    SELECT user_id,
           count(*) AS n_gaps,
           CAST(SUM(gap_us) AS DOUBLE) / 1000000 AS total_gap_sec
    FROM (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ) WHERE gap_us IS NOT NULL
    GROUP BY user_id HAVING count(*) >= 5
    """,
)
def q_window_lag(spark: SparkSession, sf: str) -> DataFrame:
    """Inter-event gap via lag() — the reference's inter-packet-gap
    motif (SURVEY §2.4 windows row). Microsecond integer arithmetic
    keeps the comparison exact."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")  # ts = epoch-µs long
    gaps = (
        table(spark, sf, "events")
        .withColumn("gap_us", F.col("ts") - F.lag("ts").over(w))
        .filter(F.col("gap_us").isNotNull())
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            (F.sum("gap_us").cast("double") / 1000000).alias("total_gap_sec"),
        )
        .filter(F.col("n_gaps") >= 5)
    )


# --- sort / limit / top-k ------------------------------------------------------


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_topk_global(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (per-partition heap + merge
    of k·P rows on the driver; never a full sort at scale)."""
    return (
        table(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- set operations ------------------------------------------------------------


@query(
    "set_ops",
    oracle="""
    WITH big_spenders AS (
      SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 250000
    ), auto_seg AS (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    )
    SELECT 'union' AS op, count(*) AS n FROM (SELECT k FROM big_spenders UNION SELECT k FROM auto_seg)
    UNION ALL
    SELECT 'intersect', count(*) FROM (SELECT k FROM big_spenders INTERSECT SELECT k FROM auto_seg)
    UNION ALL
    SELECT 'except', count(*) FROM (SELECT k FROM big_spenders EXCEPT SELECT k FROM auto_seg)
    """,
)
def q_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT in one result."""
    big = (
        table(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    auto = (
        table(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_custkey").alias("k"))
    )
    mk = lambda op, df: df.agg(F.count("*").alias("n")).select(
        F.lit(op).alias("op"), "n"
    )
    return (
        mk("union", big.union(auto).distinct())
        .unionAll(mk("intersect", big.intersect(auto)))
        .unionAll(mk("except", big.exceptAll(auto).distinct()))
    )


@query(
    "distinct_dedup_exact",
    oracle="""
    SELECT user_id, event_type, MIN(epoch_us(ts)) AS first_ts_us, count(*) AS n_dupes
    FROM events GROUP BY user_id, event_type HAVING count(*) > 1
    """,
)
def q_distinct_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup as keyed aggregation — the scale-out form of
    dropDuplicates (keep-earliest semantics made explicit; the
    reference's md5-dedup motif, PcapReader.java:183)."""
    return (
        table(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("first_ts_us"), F.count("*").alias("n_dupes"))
        .filter(F.col("n_dupes") > 1)
    )


# --- scalar function families ---------------------------------------------------


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lname,
           upper(p_brand) AS ubrand,
           regexp_replace(p_type, ' +', '_', 'g') AS type_slug,
           substring(p_name, 1, 8) AS name8,
           length(p_name) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type,
           replace(p_name, ' ', '-') AS dashed
    FROM part WHERE p_partkey <= 100
    """,
)
def q_string_functions(spark: SparkSession, sf: str) -> DataFrame:
    """String function family incl. the reference's lower() (N3) and
    regexp whitespace collapse (N5) motifs."""
    return (
        table(spark, sf, "part")
        .filter(F.col("p_partkey") <= 100)
        .select(
            "p_partkey",
            F.lower("p_name").alias("lname"),
            F.upper("p_brand").alias("ubrand"),
            F.regexp_replace("p_type", " +", "_").alias("type_slug"),
            F.substring("p_name", 1, 8).alias("name8"),
            F.length("p_name").alias("name_len"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("-")).alias("dashed"),
        )
    )


@query(
    "datetime_functions",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           count(*) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders
    WHERE year(o_orderdate) BETWEEN 1996 AND 1998
    GROUP BY 1
    """,
)
def q_datetime_functions(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .filter(F.year("o_orderdate").between(1996, 1998))
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


@query(
    "time_bucket_tumbling",
    oracle="""
    SELECT epoch_us(ts) // 300000000 * 300 AS bucket_start,
           event_type, count(*) AS n
    FROM events
    GROUP BY 1, 2 HAVING count(*) >= 3
    """,
)
def q_time_bucket(spark: SparkSession, sf: str) -> DataFrame:
    """5-minute tumbling window as epoch arithmetic (engine-neutral
    twin of F.window / streaming tumbling aggregation)."""
    return (
        table(spark, sf, "events")
        .groupBy(
            (F.expr("ts div 300000000") * 300).alias("bucket_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 3)
    )


@query(
    "json_map_functions",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def q_json_map(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured access: JSON props → typed values (the map-typed
    'extras' column motif, SURVEY §1.5)."""
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        table(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
    )


@query(
    "case_when_bucketing",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END AS bal_bucket,
           count(*) AS n
    FROM customer GROUP BY 1
    """,
)
def q_case_when(spark: SparkSession, sf: str) -> DataFrame:
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        table(spark, sf, "customer")
        .groupBy(bucket.alias("bal_bucket"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "pivot_wide",
    oracle="""
    SELECT user_id % 7 AS user_mod,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'view') AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'signup') AS signup
    FROM events GROUP BY 1
    """,
)
def q_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot with an explicit value list (explicit list = single pass,
    no extra distinct-values job — the form that scales)."""
    return (
        table(spark, sf, "events")
        .withColumn("user_mod", F.col("user_id") % 7)
        .groupBy("user_mod")
        .pivot("event_type", ["click", "view", "purchase", "error", "signup"])
        .count()
        .na.fill(0)
    )


@query(
    "scalar_subquery",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderstatus
    """,
)
def q_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar subquery — average computed once, broadcast into the
    filter. (avg used in a predicate, not projected, so double fp noise
    can't flip the comparison except exactly at the mean.)"""
    o = table(spark, sf, "orders")
    o.createOrReplaceTempView("orders_ss")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n_above_avg
        FROM orders_ss
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders_ss)
        GROUP BY o_orderstatus
        """
    )


@query(
    "having_filter",
    oracle="""
    SELECT l_suppkey, count(*) AS n_items,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) > 100
    """,
)
def q_having(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_items"), _dec_sum(F.col("l_quantity"), "total_qty"))
        .filter(F.col("total_qty") > 100)
    )


@query(
    "stats_functions",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregates; rounded well above fp accumulation noise."""
    return (
        table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
        )
    )


@query(
    "percentiles_exact",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont, both linear interpolation)."""
    return (
        table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        )
    )


# --- sessionization (batch) ----------------------------------------------------


@query(
    "sessionize_batch",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    sessions AS (
      SELECT user_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    )
    SELECT user_id, count(DISTINCT sess_id) AS n_sessions, count(*) AS n_events
    FROM sessions GROUP BY user_id HAVING count(*) >= 8
    """,
)
def q_sessionize_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization: lag-gap > 30 min starts a new session;
    cumulative sum assigns session ids (the session_window() batch
    twin).  Scale: one shuffle on user_id serves both windows."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    flagged = table(spark, sf, "events").withColumn(
        "new_sess",
        F.when(
            (F.col("ts") - F.lag("ts").over(w) > 1800000000)
            | F.lag("ts").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn("sess_id", F.sum("new_sess").over(wsum))
    return (
        sessions.groupBy("user_id")
        .agg(
            F.countDistinct("sess_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .filter(F.col("n_events") >= 8)
    )


@query(
    "argmax_per_group",
    oracle="""
    SELECT n_name,
           arg_max(c_name, c_acctbal || '#' || c_name) AS top_customer,
           CAST(MAX(c_acctbal) AS DOUBLE) AS top_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_argmax(spark: SparkSession, sf: str) -> DataFrame:
    """arg-max per group (max_by) with a deterministic composite key
    for ties."""
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    tie_key = F.concat_ws("#", F.col("c_acctbal").cast("string"), F.col("c_name"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.expr(
                "max_by(c_name, concat(cast(c_acctbal as string), '#', c_name))"
            ).alias("top_customer"),
            F.max("c_acctbal").alias("top_bal"),
        )
    )


@query(
    "explode_unnest",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
    WHERE word <> ''
    GROUP BY word HAVING count(*) >= 5
    """,
)
def q_explode_unnest(spark: SparkSession, sf: str) -> DataFrame:
    """explode/unnest — the dns_answer-array explosion motif
    (SURVEY §2.4 array fns)."""
    return (
        table(spark, sf, "part")
        .select(F.explode(F.split("p_type", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
    )


@query(
    "union_by_name",
    oracle="""
    SELECT k, src, count(*) AS n FROM (
      SELECT c_custkey AS k, 'customer' AS src FROM customer WHERE c_acctbal > 5000
      UNION ALL
      SELECT s_suppkey AS k, 'supplier' AS src FROM supplier WHERE s_acctbal > 5000
    ) GROUP BY k, src HAVING count(*) = 1
    """,
)
def q_union_by_name(spark: SparkSession, sf: str) -> DataFrame:
    """unionByName across differently-shaped inputs (multi-day capture
    dirs motif)."""
    c = (
        table(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"), F.lit("customer").alias("src"))
    )
    s = (
        table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.lit("supplier").alias("src"), F.col("s_suppkey").alias("k"))
    )
    return (
        c.unionByName(s)
        .groupBy("k", "src")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") == 1)
    )


@query(
    "window_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_event,
           last_value(event_type) OVER w AS last_event,
           count(*) OVER w AS n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_first_last(spark: SparkSession, sf: str) -> DataFrame:
    """first/last over an unbounded frame — user journey endpoints."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        table(spark, sf, "events")
        .select(
            "user_id",
            F.first("event_type").over(w).alias("first_event"),
            F.last("event_type").over(w).alias("last_event"),
            F.count("*").over(w).alias("n"),
        )
        .distinct()
    )


@query(
    "net_ipv4_prefix_agg",
    oracle="""
    WITH hosts AS (
      SELECT c_custkey,
             '10.' || CAST(c_custkey % 16 AS VARCHAR) || '.'
                   || CAST((c_custkey // 16) % 16 AS VARCHAR) || '.'
                   || CAST(c_custkey % 251 AS VARCHAR) AS ip
      FROM customer
    ),
    parsed AS (
      SELECT c_custkey, ip,
             CAST(string_split(ip,'.')[1] AS BIGINT) * 16777216
           + CAST(string_split(ip,'.')[2] AS BIGINT) * 65536
           + CAST(string_split(ip,'.')[3] AS BIGINT) * 256
           + CAST(string_split(ip,'.')[4] AS BIGINT) AS ip_num
      FROM hosts
    )
    SELECT (ip_num // 256) * 256 AS net24_num, count(*) AS n_hosts,
           MIN(ip_num) AS min_ip, MAX(ip_num) AS max_ip
    FROM parsed GROUP BY 1 HAVING count(*) > 1
    """,
)
def q_net_prefix(spark: SparkSession, sf: str) -> DataFrame:
    """IPv4 parse + /24 prefix aggregation (top-talker-subnet motif)
    over IPs synthesized deterministically from customer keys — the
    functions under test are functions/net.py's string→numeric forms."""
    from ..functions.net import ipv4_to_long

    hosts = table(spark, sf, "customer").select(
        "c_custkey",
        F.concat_ws(
            ".",
            F.lit("10"),
            (F.col("c_custkey") % 16).cast("string"),
            ((F.col("c_custkey") / 16).cast("long") % 16).cast("string"),
            (F.col("c_custkey") % 251).cast("string"),
        ).alias("ip"),
    )
    parsed = hosts.withColumn("ip_num", ipv4_to_long(F.col("ip")))
    return (
        parsed.groupBy(((F.col("ip_num") / 256).cast("long") * 256).alias("net24_num"))
        .agg(
            F.count("*").alias("n_hosts"),
            F.min("ip_num").alias("min_ip"),
            F.max("ip_num").alias("max_ip"),
        )
        .filter(F.col("n_hosts") > 1)
    )


@query(
    "window_ranks",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           ntile(4)       OVER w AS quartile,
           CAST(ROUND(percent_rank() OVER w, 6) AS DOUBLE) AS prank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_ranks(spark: SparkSession, sf: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank family."""
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return table(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).cast("double").alias("prank"),
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(c.k, o.k) AS k, c.n_cust, o.n_ord
    FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer WHERE c_acctbal > 9000 GROUP BY 1) c
    FULL OUTER JOIN (SELECT o_custkey % 30 AS k, count(*) AS n_ord FROM orders WHERE o_totalprice > 300000 GROUP BY 1) o
    ON c.k = o.k
    """,
)
def q_join_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER join with mismatched key domains (nulls both sides)."""
    c = (
        table(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    o = (
        table(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .groupBy((F.col("o_custkey") % 30).alias("k"))
        .agg(F.count("*").alias("n_ord"))
    )
    return c.join(o, c.k == o.k, "full_outer").select(
        F.coalesce(c.k, o.k).alias("k"), "n_cust", "n_ord"
    )


@query(
    "cross_join_small",
    oracle="""
    SELECT r.r_name, s.s_suppkey, s.s_acctbal
    FROM region r CROSS JOIN supplier s
    WHERE s.s_acctbal > 5000
    """,
)
def q_cross_join(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit cross join (bounded dims only — a cartesian at fact
    scale is a plan bug, not an operator)."""
    r = table(spark, sf, "region")
    s = table(spark, sf, "supplier").filter(F.col("s_acctbal") > 5000)
    return r.crossJoin(s).select("r_name", "s_suppkey", "s_acctbal")


@query(
    "null_functions",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           count(nullif(o_orderpriority, '1-URGENT')) AS n_not_urgent,
           CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           COALESCE(MIN(CASE WHEN o_totalprice > 400000 THEN o_orderkey END), -1) AS first_huge
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_null_functions(spark: SparkSession, sf: str) -> DataFrame:
    """nullif / coalesce / conditional-count null semantics."""
    return (
        table(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.count(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))).alias(
                "n_not_urgent"
            ),
            F.sum(
                F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)
            ).alias("n_big"),
            F.coalesce(
                F.min(F.when(F.col("o_totalprice") > 400000, F.col("o_orderkey"))),
                F.lit(-1),
            ).alias("first_huge"),
        )
    )


@query(
    "bool_aggregates",
    oracle="""
    SELECT user_id % 10 AS user_mod,
           bool_and(value IS NOT NULL) AS all_valued,
           bool_or(event_type = 'error') AS any_error,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_bool_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    """every()/any() boolean aggregates."""
    return (
        table(spark, sf, "events")
        .groupBy((F.col("user_id") % 10).alias("user_mod"))
        .agg(
            F.every(F.col("value").isNotNull()).alias("all_valued"),
            F.some(F.col("event_type") == "error").alias("any_error"),
            F.count("*").alias("n"),
        )
    )


@query(
    "map_functions",
    oracle="""
    SELECT event_type,
           count(*) AS n_with_k,
           CAST(SUM(CAST(json_extract_string(props,'$.k') AS INT) * 2) AS BIGINT) AS sum_k2
    FROM events
    WHERE json_extract_string(props,'$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def q_map_functions(spark: SparkSession, sf: str) -> DataFrame:
    """MapType surface: JSON → map<string,int> → map_keys/element_at
    (the 'extras map' column motif, SURVEY §1.5)."""
    m = F.from_json("props", "map<string,int>")
    return (
        table(spark, sf, "events")
        .withColumn("m", m)
        .filter(F.element_at(F.col("m"), "k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_with_k"),
            F.sum(F.element_at(F.col("m"), "k") * 2).alias("sum_k2"),
        )
    )


# --- classic TPC-H shapes (Q3/Q6/Q18 analogs) ---------------------------------


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(CAST(SUM({DISC_PRICE_SQL}) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + global top-10.
    Scale: the customer join is AQE-decided (customer scales with
    SF); orders⋈lineitem is the shuffle;
    top-10 via TakeOrderedAndProject."""
    c = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = table(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(F.expr(DISC_PRICE_SQL)).cast("double").alias("revenue"))
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(CAST(SUM({DISC_PRICE_SQL}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with the local-supplier equality
    (c_nationkey = s_nationkey) and a region filter.
    Scale: region/nation broadcast (fixed dims); supplier/part joins
    AQE-decided (SF-scaling); the
    orders⋈lineitem shuffle is the only big-big exchange; the
    nation-match predicate rides the supplier join, never a
    post-cartesian filter."""
    r = table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    su = table(spark, sf, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            su,
            (li.l_suppkey == su.s_suppkey) & (c.c_nationkey == su.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(F.expr(DISC_PRICE_SQL)).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(CAST(SUM({DISC_PRICE_SQL}) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.
    Scale: nation broadcast; returnflag + date filters pushed to the
    scans; top-20 via TakeOrderedAndProject (unique c_custkey
    tie-break keeps the hash order-stable)."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(F.expr(DISC_PRICE_SQL)).cast("double").alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue",
            F.col("c_acctbal").cast("double").alias("acctbal"), "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6: pure scan + filter + single aggregate — the pushdown
    benchmark (all four predicates reach the parquet scan)."""
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.expr(
        "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))"
    )
    return li.agg(
        F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n")
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
    """,
)
def q_tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over an aggregate (large-quantity
    orders) → semi-join in the plan."""
    li = table(spark, sf, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    return (
        li.join(big_orders, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
        .agg(_dec_sum(F.col("l_quantity"), "sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "sum_qty",
        )
    )


# --- correlated subqueries (EXISTS / NOT EXISTS / scalar) ---------------------
# TPC-H shapes adapted to the driver tables (lineitem has no
# commitdate/receiptdate/shipmode; nations are NATION_0..24, brands
# Brand#1..; predicates use observed values so results are non-empty).


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS (orders with at least one
    line shipped after the order date) counted by priority.
    Scale: the EXISTS decorrelates to a LeftSemi hash join on
    l_orderkey with the date comparison as a residual condition —
    never a per-row subquery; the date filter pushes into the
    orders scan, and lineitem is pruned to two columns."""
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(SUM(vol) AS VARCHAR) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year, {DISC_PRICE_SQL} AS vol
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between a nation pair by year —
    a disjunctive join predicate over two roles of the same dim.
    Scale: both nation lookups broadcast (two aliases of a 25-row
    dim); the supplier join is AQE-decided (SF-scaling) and the nation-pair
    filter prunes lineitem rows *before* the only big-big shuffle
    (lineitem⋈orders); the pair disjunction is a residual on the
    already-joined dims, never a cartesian."""
    n1 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    su = table(spark, sf, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    ).filter(F.col("supp_nation").isin("NATION_3", "NATION_7"))
    c = table(spark, sf, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    ).filter(F.col("cust_nation").isin("NATION_3", "NATION_7"))
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    pair_ok = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(pair_ok)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(F.expr(DISC_PRICE_SQL)).cast("double").alias("revenue"))
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE_SQL}
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE) AS promo_revenue,
           CAST(CAST(SUM({DISC_PRICE_SQL}) AS VARCHAR) AS DOUBLE) AS total_revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share — conditional
    aggregation over a fact⋈dim join.  (The ratio is left to the
    caller: two exact-decimal sums are order-independent, a
    division of them is one deterministic double op client-side.)
    Scale: the part join is AQE-decided (part scales with SF); the
    month filter pushes into the
    lineitem scan; single partial-agg, no wide shuffle."""
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = table(spark, sf, "part").select("p_partkey", "p_type")
    promo = F.when(
        F.col("p_type") == "PROMO", F.expr(DISC_PRICE_SQL)
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(F.expr(DISC_PRICE_SQL)).cast("double").alias("total_revenue"),
            F.count("*").alias("n"),
        )
    )


@query(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand NOT IN ('Brand#2', 'Brand#4')
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p_brand, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    with a NOT IN exclusion list (static → plain scan filter, no
    anti join needed).  Scale: part filters push to its scan, the
    part⋈lineitem join is AQE-decided (part scales with SF),
    count(distinct) expands to Spark's
    two-phase exact distinct aggregation."""
    p = table(spark, sf, "part").filter(
        ~F.col("p_brand").isin("Brand#2", "Brand#4")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    li = table(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q_tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: lines below 20% of their part's average
    quantity — a correlated scalar subquery per part.
    Scale: decorrelated by hand the way Catalyst would: one
    per-part aggregate over lineitem (single shuffle on l_partkey,
    exact because integer quantities sum exactly in double), then an
    AQE-decided join of the filtered-brand thresholds back onto the
    fact (per-part thresholds scale with SF even after the brand
    filter).  Never a per-row subquery."""
    p = table(spark, sf, "part").filter(F.col("p_brand") == "Brand#13").select(
        "p_partkey"
    )
    li = table(spark, sf, "lineitem")
    # thresholds only for the brand's parts: semi-filter before the agg
    thresholds = (
        li.join(p, li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_cap"))
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey, "left_semi")
        .join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
            F.count("*").alias("n"),
        )
    )


@query(
    "tpch_q19_disjunctive",
    oracle=f"""
    SELECT CAST(CAST(SUM({DISC_PRICE_SQL}) AS VARCHAR) AS DOUBLE) AS revenue, count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def q_tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of brand/size/quantity conjuncts
    across the join.  Scale: the part-only disjuncts (brand+size)
    collapse to one scan filter on part, so only
    candidate parts join; the mixed part×lineitem disjunction stays
    a residual filter on the joined row — Catalyst's constraint
    propagation also derives a lineitem-only quantity range
    (1..50 here) that pushes to the fact scan."""
    p = table(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    li = table(spark, sf, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 30)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(F.expr(DISC_PRICE_SQL)).cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@query(
    "tpch_q22_idle_customers",
    oracle="""
    SELECT c_mktsegment AS segment, count(*) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               / count(*)
        FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q_tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no
    urgent order — an uncorrelated scalar subquery (global
    threshold) plus a NOT EXISTS (anti join).  (Every customer in
    the driver data has *some* order, so the exclusion is on urgent
    orders to keep the anti join's survivor set non-empty.)
    Scale: the threshold is a 1-row aggregate broadcast onto
    customer (the exact-decimal sum / count division is one
    deterministic double op, identical on both engines); the NOT
    EXISTS decorrelates to a LeftAnti hash join on o_custkey —
    orders is projected to the single join key before shuffling."""
    c = table(spark, sf, "customer")
    threshold = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
    )
    o = (
        table(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


# --- TPC-H completion: the 9 remaining query shapes ---------------------------
#
# The driver's testdata has no ``partsupp`` table and lineitem lacks
# shipmode/commitdate/receiptdate, so Q2/Q9/Q11/Q12/Q20/Q21 are *shape
# adaptations*: the relational structure (correlated min, market-share
# division, profit expression, value-share threshold, conditional
# counts, nested IN + correlated threshold, double-EXISTS lateness) is
# preserved over the columns that exist.  Q8/Q13/Q15 run essentially
# verbatim.  Lateness, where the spec uses commit/receipt dates, is
# re-expressed as ``l_shipdate > o_orderdate + INTERVAL N DAYS``.


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH eu_supp AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
    cost AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
        FROM lineitem JOIN eu_supp ON l_suppkey = s_suppkey
        GROUP BY l_partkey, l_suppkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, s_suppkey,
           CAST(supply_cost AS DOUBLE) AS supply_cost
    FROM cost
    JOIN part ON p_partkey = l_partkey
    JOIN eu_supp ON l_suppkey = s_suppkey
    WHERE p_type = 'STANDARD' AND p_size <= 10
      AND supply_cost = (SELECT MIN(c2.supply_cost) FROM cost c2
                         WHERE c2.l_partkey = cost.l_partkey)
    ORDER BY s_acctbal DESC, p_partkey, s_suppkey
    LIMIT 20
    """,
)
def q_tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp table, so the part↔supplier
    relation is derived from lineitem and supply cost is the minimum
    extended price a EUROPE supplier ever charged for the part — a
    correlated MIN subquery per part, exactly Q2's structure).
    Scale: the EUROPE supplier side is region-filtered but still
    SF-scaling, so its semi-join is AQE-decided; the
    per-(part, supplier) MIN is one shuffle on the compound key; the
    correlated min decorrelates to a window MIN over l_partkey
    (second, narrower shuffle) instead of a per-row subquery; part is
    filter-pushed, its join AQE-decided; final top-20 is
    TakeOrderedAndProject.  Exact DECIMAL(18,2) comparisons — no
    float-equality hazard in the min-match."""
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        table(spark, sf, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    cost = (
        li.join(eu_supp, li.l_suppkey == eu_supp.s_suppkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("supply_cost")
        )
    )
    part_min = W.partitionBy("l_partkey")
    best = cost.withColumn("min_cost", F.min("supply_cost").over(part_min)).filter(
        F.col("supply_cost") == F.col("min_cost")
    )
    p = table(spark, sf, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(eu_supp, best.l_suppkey == eu_supp.s_suppkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "s_suppkey",
            F.col("supply_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_suppkey")
        .limit(20)
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
               {DISC_PRICE_SQL} AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01')
    SELECT o_year,
           CAST(COALESCE(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                       THEN volume END) AS DOUBLE), 0)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 (national market share) — runs structurally verbatim:
    8-table join, per-year division of one nation's volume by total
    volume.  Scale: every dimension chain (part, customer→nation→
    region, supplier→nation) broadcasts the fixed dims, with the
    SF-scaling customer/supplier/part joins AQE-decided; the
    biggest exchange is
    orders⋈lineitem; the division happens on two exact decimal sums
    cast to double (one IEEE op, identical in both engines)."""
    p = table(spark, sf, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    n1 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey")
    )
    r = table(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    cust = (
        table(spark, sf, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    n2 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    supp = (
        table(spark, sf, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select("s_suppkey", "supp_nation")
    )
    li = table(spark, sf, "lineitem")
    vol = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.expr(DISC_PRICE_SQL).alias("volume"),
            "supp_nation",
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            (
                F.coalesce(
                    F.sum(
                        F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                    ).cast("double"),
                    F.lit(0.0),
                )
                / F.sum("volume").cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(CAST(SUM({DISC_PRICE_SQL}
                    - CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(0.2 AS DECIMAL(3,2))
                      * CAST(l_quantity AS DECIMAL(9,0))) AS VARCHAR) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit; adapted: no partsupp, so
    supply cost is modeled as 20% of the part's retail price — the
    profit expression keeps Q9's revenue-minus-cost-times-quantity
    structure).  Scale: nation broadcasts; the part and supplier
    joins are AQE-decided (both scale with SF); orders⋈lineitem is
    the big shuffle; the
    profit expression is exact decimal arithmetic summed exactly."""
    p = table(spark, sf, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    n = table(spark, sf, "nation")
    supp = (
        table(spark, sf, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    o = table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf, "lineitem")
    profit = (
        F.expr(DISC_PRICE_SQL)
        - F.col("p_retailprice").cast("decimal(18,2)")
        * F.lit(0.2).cast("decimal(3,2)")
        * F.col("l_quantity").cast("decimal(9,0)")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q11_important_parts",
    oracle="""
    WITH val AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey)
    SELECT partkey, CAST(value AS DOUBLE) AS value
    FROM val
    WHERE value > (SELECT SUM(value) * CAST(0.001 AS DECIMAL(6,4)) FROM val)
    ORDER BY value DESC, partkey
    """,
)
def q_tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape (important stock; adapted: no partsupp, so a
    part's "value" for one nation's suppliers is the total extended
    price its lineitems shipped — keeping Q11's structure: per-key
    aggregate filtered by an uncorrelated fraction-of-global-total
    scalar subquery).  Scale: the nation-filtered supplier
    semi-join is AQE-decided (one nation's suppliers still scale
    with SF); one shuffle for the per-part agg; the global total is
    a 1-row broadcast; threshold comparison is exact decimal."""
    n = table(spark, sf, "nation").filter(F.col("n_name") == "NATION_7")
    supp = (
        table(spark, sf, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey")
    )
    li = table(spark, sf, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    val = (
        li.join(supp, li.l_suppkey == supp.s_suppkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("value"))
    )
    threshold = val.agg(
        (F.sum("value") * F.lit(0.001).cast("decimal(6,4)")).alias("cap")
    )
    return (
        val.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("cap"))
        .select("partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.desc("value"), "partkey")
    )


@query(
    "tpch_q12_late_lines_priority",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY l_returnflag ORDER BY flag
    """,
)
def q_tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / late lines; adapted: no
    l_shipmode or commit/receipt dates, so the group key is
    l_returnflag and "late" is shipping >90 days after the order
    date — the high/low-priority conditional counts are verbatim).
    Scale: orders⋈lineitem is the one shuffle; the lateness predicate
    is a post-join residual (it references both sides); the
    conditional counts are map-side partial aggregates."""
    o = table(spark, sf, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") < "1999-01-01"
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("flag")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey)
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution) — verbatim shape;
    the order exclusion predicate (spec: comment NOT LIKE) is the
    priority filter, applied *inside* the outer join so zero-order
    customers survive.  Scale: the exclusion pushes to the orders
    scan; customer⋈orders shuffles on custkey; the per-customer count
    then re-aggregates on the (tiny-cardinality) count value — the
    second shuffle moves one row per customer."""
    c = table(spark, sf, "customer").select("c_custkey")
    o = table(spark, sf, "orders").filter(F.col("o_orderpriority") != "5-LOW").select(
        "o_custkey", "o_orderkey"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM({DISC_PRICE_SQL}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 (top supplier) — verbatim shape: the revenue "view"
    is a quarter's per-supplier aggregate, and the MAX scalar
    subquery picks the top supplier(s).  Scale: one shuffle for the
    per-supplier agg; the MAX is a 1-row broadcast back onto it (no
    second full pass); the supplier join is AQE-decided (supplier
    scales with SF).  The revenue
    equality is exact-decimal, so ties are exact, as the spec
    requires."""
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.expr(DISC_PRICE_SQL)).alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("max_rev"))
    s = table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q20_excess_shipments",
    oracle="""
    WITH blue_parts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'),
    early AS (
        SELECT l_partkey, SUM(l_quantity) AS early_qty
        FROM lineitem JOIN blue_parts ON l_partkey = p_partkey
        WHERE l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_partkey),
    late AS (
        SELECT l_suppkey, l_partkey, SUM(l_quantity) AS late_qty
        FROM lineitem JOIN blue_parts ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey)
    SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM late JOIN early USING (l_partkey)
        WHERE late_qty > 0.5 * early_qty)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape (excess inventory; adapted: no partsupp
    availqty, so the test is "shipped more of a blue part after 1997
    than half of what everyone shipped before" — keeping Q20's
    nested-IN + correlated-threshold structure).  Scale: the blue-part
    semi-joins into both lineitem passes are AQE-decided (part
    scales with SF); each per-key
    agg is one shuffle; the early-quantity thresholds join
    AQE-decided (one row per blue part — still SF-scaling); the
    final IN
    decorrelates to a LeftSemi on s_suppkey."""
    bp = table(spark, sf, "part").filter(F.col("p_name").like("blue%")).select(
        "p_partkey"
    )
    li = table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    blue_li = li.join(bp, li.l_partkey == bp.p_partkey, "left_semi")
    early = (
        blue_li.filter(F.col("l_shipdate") < "1997-01-01")
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("early_qty"))
        .withColumnRenamed("l_partkey", "e_partkey")
    )
    late = (
        blue_li.filter(F.col("l_shipdate") >= "1997-01-01")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("late_qty"))
    )
    excess = (
        late.join(early, F.col("l_partkey") == F.col("e_partkey"))
        .filter(F.col("late_qty") > 0.5 * F.col("early_qty"))
        .select("l_suppkey")
    )
    s = table(spark, sf, "supplier")
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", F.col("s_acctbal").cast("double").alias("acctbal"))
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q21_suppliers_kept_waiting",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def q_tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting; adapted:
    lateness is shipping >60 days after the order date instead of
    receipt-after-commit).  The EXISTS / NOT EXISTS pair over other
    suppliers' lines decorrelates to one per-order aggregate —
    distinct suppliers and distinct *late* suppliers — joined back to
    the late lines: "multi-supplier order whose only late supplier is
    this one" ⇔ n_supp > 1 AND n_late_supp = 1.  Scale: this turns
    two correlated subqueries into ONE extra shuffle (the per-order
    agg) instead of two self-joins of the fact; nation broadcasts and
    the supplier join is AQE-decided; numwait counts late lines
    exactly like the
    nested-EXISTS form."""
    o = table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    n = table(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    supp = (
        table(spark, sf, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name")
    )
    waiting = (
        lo.filter(F.col("is_late"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            per_order.withColumnRenamed("l_orderkey", "po_orderkey"),
            F.col("l_orderkey") == F.col("po_orderkey"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --- event-analytics shapes: funnel + retention -------------------------------
# Classic product-analytics staples over the events table; both stay
# in exact integer microsecond/day arithmetic so the oracles compare
# bit-for-bit.  (``events.ts`` is epoch-µs BIGINT on both engines —
# see plans/__init__.py::events_table.)


@query(
    "events_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
      GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v) AS step_view,
           (SELECT count(*) FROM c) AS step_click,
           (SELECT count(*) FROM p) AS step_purchase,
           ROUND((SELECT count(*) FROM p) * 1.0
                 / NULLIF((SELECT count(*) FROM v), 0), 6) AS conversion
    """,
)
def q_events_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel (view → click-after-view → purchase-after-click):
    per step, the earliest qualifying event strictly after the user's
    previous-step time.  Scale: each step is one shuffle on user_id
    over a type-filtered scan (the filter pushes down); the per-step
    user tables shrink monotonically but still scale with the user
    dimension, so the predecessor joins are AQE-decided (broadcast
    only when runtime-small).  Day-one product analytics, the same
    plan at 100 TB with
    user-bucketed storage making every step co-partitioned."""
    ev = table(spark, sf, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        v.agg(F.count("*").alias("step_view"))
        .crossJoin(c.agg(F.count("*").alias("step_click")))
        .crossJoin(p.agg(F.count("*").alias("step_purchase")))
    )
    return counts.select(
        "step_view",
        "step_click",
        "step_purchase",
        F.round(
            F.col("step_purchase") * 1.0 / F.nullif(F.col("step_view"), F.lit(0)), 6
        ).alias("conversion"),
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH days AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
    cohorts AS (
      SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id)
    SELECT CAST(c.cohort_day // 7 AS BIGINT) AS cohort_week,
           CAST((d.day - c.cohort_day) // 7 AS BIGINT) AS week_offset,
           count(DISTINCT d.user_id) AS n_users
    FROM days d JOIN cohorts c ON d.user_id = c.user_id
    GROUP BY 1, 2
    ORDER BY cohort_week, week_offset
    """,
)
def q_events_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-activity week,
    counted distinct in each subsequent week offset.  Exact integer
    day/week arithmetic end-to-end.  Scale: one shuffle on user_id
    for the cohort assignment (joined back AQE-decided — the cohort
    table is per-user and scales), one for the distinct
    count on (cohort_week, offset) — the matrix itself is tiny."""
    ev = table(spark, sf, "events")
    days = ev.select("user_id", F.expr("ts div 86400000000").alias("day"))
    cohorts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(cohorts, "user_id")
        .groupBy(
            F.expr("cohort_day div 7").cast("bigint").alias("cohort_week"),
            F.expr("(day - cohort_day) div 7").cast("bigint").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "unpivot_long",
    oracle="""
    SELECT measure,
           CAST(CAST(SUM(CAST(val AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total,
           count(*) AS n
    FROM (
      SELECT 'quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'tax', l_tax FROM lineitem
    ) GROUP BY measure ORDER BY measure
    """,
)
def q_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt — the inverse of pivot_wide)
    with a per-measure rollup.  Scale: unpivot is a map-side
    row-expansion (no shuffle, no scan duplication — ONE pass emits
    all measures, unlike the UNION-of-scans the oracle spells); the
    agg exchange carries 3 rows per partition."""
    li = table(spark, sf, "lineitem").select(
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_tax").cast("double").alias("tax"),
    )
    long = li.unpivot([], ["quantity", "extendedprice", "tax"], "measure", "val")
    return (
        long.groupBy("measure")
        .agg(
            F.sum(F.col("val").cast("decimal(18,2)")).cast("double").alias("total"),
            F.count("*").alias("n"),
        )
        .orderBy("measure")
    )


@query(
    "histogram_fixed_buckets",
    oracle="""
    -- DuckDB has no width_bucket; this spells out the same edge
    -- semantics: bucket i covers [lo + (i-1)*w, lo + i*w), clamped
    -- to 0 / n+1 outside [lo, hi)
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 600000 THEN 13
                ELSE CAST(FLOOR(o_totalprice / 50000) AS BIGINT) + 1 END AS bucket,
           count(*) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders GROUP BY bucket ORDER BY bucket
    """,
)
def q_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram via width_bucket — the single-pass
    distribution profile (identical bucket-edge semantics in Spark
    and DuckDB: bucket i covers [lo + (i-1)·w, lo + i·w)).
    Scale: map-side bucket assignment, partial→final agg on ≤14
    bucket keys; contrast percentiles_exact, which needs a sort —
    at 100 TB the histogram is the cheap first look."""
    return (
        table(spark, sf, "orders")
        .groupBy(
            F.width_bucket(F.col("o_totalprice"), F.lit(0), F.lit(600000), F.lit(12)).alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy("bucket")
    )


@query(
    "window_range_frame_trailing",
    oracle="""
    WITH daily AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS day_value
      FROM events GROUP BY 1, 2)
    SELECT user_id, CAST(day AS BIGINT) AS day,
           CAST(SUM(CAST(day_value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS trailing_7d
    FROM daily ORDER BY user_id, day
    """,
)
def q_window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing 7-day sum per user via a RANGE window frame — value-
    based framing over (possibly gappy) day offsets, vs the ROWS
    frames elsewhere in the suite.  Scale: one shuffle to daily
    grain, the window rides the same hash partitioning (user_id) —
    Spark plans the pair as a single exchange."""
    ev = table(spark, sf, "events")
    daily = (
        ev.select(
            "user_id",
            F.expr("ts div 86400000000").alias("day"),
            F.col("value").cast("decimal(18,4)").alias("v"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("v").cast("double").alias("day_value"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rangeBetween(-6, W.currentRow)
    )
    return (
        daily.select(
            "user_id",
            F.col("day").cast("bigint").alias("day"),
            F.sum(F.col("day_value").cast("decimal(18,4)"))
            .over(w)
            .cast("double")
            .alias("trailing_7d"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "time_bucket_gapfill",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             count(*) AS n
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT MIN(day) AS lo, MAX(day) AS hi
      FROM (SELECT epoch_us(ts) // 86400000000 AS day FROM events)),
    grid AS (
      SELECT t.event_type, g.day
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS day FROM bounds) g)
    SELECT grid.event_type AS event_type, CAST(grid.day AS BIGINT) AS day,
           CAST(COALESCE(daily.n, 0) AS BIGINT) AS n
    FROM grid LEFT JOIN daily
      ON grid.event_type = daily.event_type AND grid.day = daily.day
    ORDER BY grid.event_type, grid.day
    """,
)
def q_time_bucket_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-filled daily counts per event type (the hypertable /
    timeseries-rollup motif): a dense day grid generated from the
    observed bounds, zero-filled where no events landed.  Scale: the
    grid is dims × days (tiny — it broadcasts); the one real shuffle
    is the daily aggregate; sequence() generates the grid without a
    driver-side loop."""
    ev = table(spark, sf, "events")
    days = ev.select(F.expr("ts div 86400000000").alias("day"))
    daily = (
        ev.select("event_type", F.expr("ts div 86400000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    bounds = days.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    return (
        grid.join(daily, ["event_type", "day"], "left_outer")
        .select(
            "event_type",
            F.col("day").cast("bigint").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "approx_percentiles_sketch",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           TRUE AS qty_in_bound, TRUE AS price_in_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_approx_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate percentiles (percentile_approx, Greenwald–Khanna
    sketch: bounded memory, mergeable across partitions — the 100 TB
    default where the exact form needs a per-group sort) as a BOUND
    CONTRACT (VERDICT r9 item 2): the sketch VALUE can jitter with
    partitioning, so the query emits the deterministic rank-error
    verdict instead — the returned value v must satisfy
    ``#(x ≤ v) ≥ (p − ε)·n`` and ``#(x < v) ≤ (p + ε)·n`` with
    ε = 0.005, 5× the accuracy=1000 guarantee of 0.001, so ANY valid
    sketch (however the merges happened) lands true.  Oracle = the
    exact groups, all true.
    Scale: one grouped sketch pass, the 4-row sketch result broadcast
    back onto the fact scan, one counting agg — no extra shuffle."""
    eps = 0.005
    li = table(spark, sf, "lineitem")
    sk = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 1000).alias("_q50"),
        F.percentile_approx("l_extendedprice", 0.9, 1000).alias("_p90"),
    )
    j = li.join(F.broadcast(sk), "l_returnflag")
    agg = j.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum((F.col("l_quantity") <= F.col("_q50")).cast("long")).alias("_le_q"),
        F.sum((F.col("l_quantity") < F.col("_q50")).cast("long")).alias("_lt_q"),
        F.sum(
            (F.col("l_extendedprice") <= F.col("_p90")).cast("long")
        ).alias("_le_p"),
        F.sum(
            (F.col("l_extendedprice") < F.col("_p90")).cast("long")
        ).alias("_lt_p"),
    )
    return agg.select(
        "l_returnflag",
        "n",
        (
            (F.col("_le_q") >= (0.5 - eps) * F.col("n"))
            & (F.col("_lt_q") <= (0.5 + eps) * F.col("n"))
        ).alias("qty_in_bound"),
        (
            (F.col("_le_p") >= (0.9 - eps) * F.col("n"))
            & (F.col("_lt_p") <= (0.9 + eps) * F.col("n"))
        ).alias("price_in_bound"),
    )


@query(
    "frequent_items_sketch",
    oracle="""
    WITH tot AS (SELECT count(*) AS n FROM events)
    SELECT col, item, TRUE AS present FROM (
      SELECT 'event_type' AS col, event_type AS item, count(*) AS c
      FROM events GROUP BY event_type
      UNION ALL
      SELECT 'user_id' AS col, CAST(user_id AS VARCHAR) AS item, count(*) AS c
      FROM events GROUP BY user_id
    ) h, tot WHERE h.c > 0.05 * tot.n
    """,
)
def q_frequent_items(spark: SparkSession, sf: str) -> DataFrame:
    """Heavy hitters over (event_type, user_id) via the space-saving
    style freqItems sketch — single pass, bounded memory, no exact
    groupBy of the full key space — as a BOUND CONTRACT (VERDICT r9
    item 2): the sketch's false-positive SET varies with partitioning,
    but its one-sided guarantee (every key with true frequency
    > support·n is present) is deterministic, so the query emits one
    row per TRUE heavy hitter with its sketch-membership verdict.
    Oracle = the exact heavy hitters, all present.
    Scale: the sketch is one pass; the exact side (two small groupBys
    against a broadcast 1-row total and the broadcast 1-row sketch)
    exists only to state the contract — 'which keys would skew my
    shuffle' stays answerable without an exact full-key-space agg."""
    ev = table(spark, sf, "events")
    sk = ev.stat.freqItems(["event_type", "user_id"], support=0.05)
    tot = ev.agg(F.count("*").alias("_n"))
    et = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("_c"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("_c") > 0.05 * F.col("_n"))
        .crossJoin(F.broadcast(sk))
        .select(
            F.lit("event_type").alias("col"),
            F.col("event_type").alias("item"),
            F.array_contains(
                F.col("event_type_freqItems"), F.col("event_type")
            ).alias("present"),
        )
    )
    uid = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("_c"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("_c") > 0.05 * F.col("_n"))
        .crossJoin(F.broadcast(sk))
        .select(
            F.lit("user_id").alias("col"),
            F.col("user_id").cast("string").alias("item"),
            F.array_contains(
                F.col("user_id_freqItems"), F.col("user_id")
            ).alias("present"),
        )
    )
    return et.unionByName(uid)
