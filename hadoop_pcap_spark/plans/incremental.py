"""Incremental-maintenance operators as driver-verifiable queries
(VERDICT r7 item 1): operators/merge.py shipped in r7 with no tests
and no registry presence — the only driver-invisible code in the
tree.  These registrations give merge_cdc and scd2_history the same
hash-compared correctness rows every other operator earns.

Both oracles are the textbook SQL formulation of the same semantics:

* MERGE over a totally-ordered changelog ≡ the QUALIFY
  row_number() CTE over snapshot ∪ changes (the union-window form —
  deliberately a DIFFERENT plan shape than the engine's join-based
  implementation, so the oracle cross-checks the algorithm, not the
  plan);
* SCD2 ≡ the standard gaps-and-islands CTE with a NULL-safe
  (IS DISTINCT FROM) change flag.

The CDC fixture is derived deterministically from the warehouse
tables: customer is the snapshot, each order is a change to its
customer (seq = o_orderkey, globally unique ⇒ a total order per
key), and every 7th order is a DELETE — so the batch exercises
update-wins-by-seq, delete, and delete-then-resurrect paths on real
data.  The SCD2 fixture nullifies status 'P' so NULL→value,
value→NULL and NULL→NULL runs (the ADVICE-r7 bug classes) are all
present in the oracle-checked data, not just in unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table


@query(
    "merge_cdc_apply",
    oracle="""
    WITH snap AS (
      SELECT c_custkey AS cust_id, c_name AS name,
             CAST(c_acctbal AS DOUBLE) AS bal,
             CAST(0 AS BIGINT) AS _seq, 'U' AS _op
      FROM customer),
    chg AS (
      SELECT o_custkey AS cust_id,
             'cust#' || CAST(o_custkey AS VARCHAR) AS name,
             CAST(o_totalprice AS DOUBLE) AS bal,
             CAST(o_orderkey AS BIGINT) AS _seq,
             CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS _op
      FROM orders),
    u AS (SELECT * FROM snap UNION ALL SELECT * FROM chg),
    r AS (SELECT *, row_number()
            OVER (PARTITION BY cust_id ORDER BY _seq DESC) AS rn
          FROM u)
    SELECT cust_id, name, bal FROM r WHERE rn = 1 AND _op <> 'D'
    """,
)
def q_merge_cdc_apply(spark: SparkSession, sf: str) -> DataFrame:
    """CDC MERGE via :func:`..operators.merge.merge_cdc`: customer is
    the keyed snapshot; every order is a change row for its customer
    (seq = o_orderkey — globally unique, so the per-key changelog is
    totally ordered) and every 7th order is a delete.  A customer
    whose latest order is a delete vanishes; one whose delete is
    followed by a later-seq upsert is resurrected — both paths land
    in the result and the hash.  The engine's join-based plan must be
    row-identical to the oracle's union+QUALIFY formulation; that
    identity is the correctness contract.
    Scale: the batch shuffles once (winner window, reused by the
    join); the snapshot at most once — zero when bucketed
    (tests/test_plans.py, SCALING.md)."""
    from ..operators.merge import merge_cdc

    snap = table(spark, sf, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    chg = table(spark, sf, "orders").select(
        F.col("o_custkey").alias("cust_id"),
        F.concat(F.lit("cust#"), F.col("o_custkey").cast("string")).alias(
            "name"
        ),
        F.col("o_totalprice").cast("double").alias("bal"),
        F.col("o_orderkey").cast("long").alias("_seq"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("_op"),
    )
    return merge_cdc(snap, chg, ["cust_id"])


@query(
    "scd2_history",
    oracle="""
    WITH obs AS (
      SELECT o_custkey AS cust_id,
             nullif(o_orderstatus, 'P') AS status,
             CAST(o_orderdate AS DATE) AS ts,
             o_orderkey AS tb
      FROM orders),
    flagged AS (
      SELECT *, CASE WHEN row_number() OVER w = 1 THEN 1
                     WHEN lag(status) OVER w IS DISTINCT FROM status THEN 1
                     ELSE 0 END AS chg
      FROM obs
      WINDOW w AS (PARTITION BY cust_id ORDER BY ts, tb)),
    isl AS (
      SELECT *, CAST(SUM(chg) OVER (PARTITION BY cust_id ORDER BY ts, tb
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      FROM flagged),
    ver AS (
      SELECT cust_id, version, max(status) AS status,
             min(ts) AS valid_from, count(*) AS n_obs
      FROM isl GROUP BY cust_id, version)
    SELECT cust_id, version, status, valid_from, n_obs,
           lead(valid_from)
             OVER (PARTITION BY cust_id ORDER BY version) AS valid_to
    FROM ver
    """,
)
def q_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """Type-2 history via :func:`..operators.merge.scd2_history` over
    the per-customer order-status stream, with status 'P' nullified
    so the NULL-run semantics (value→NULL opens a new island,
    NULL→NULL continues one, NULL→value closes it — the ADVICE-r7 bug
    classes) are exercised by the driver's hash, not just unit tests.
    ts is the DATE grain (registry convention: never raw TIMESTAMP),
    which also makes same-day ties real — broken totally by
    o_orderkey, and the final ``lead`` ordered by the unique
    ``version``, not the tie-prone ``valid_from``.
    Scale: ONE hash exchange on cust_id plans the whole history build
    (flag, island numbering, per-island agg and lead all reuse the
    same clustering — tests/test_plans.py asserts the single-Exchange
    shape)."""
    from ..operators.merge import scd2_history

    obs = table(spark, sf, "orders").select(
        F.col("o_custkey").alias("cust_id"),
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status"),
        F.col("o_orderdate").cast("date").alias("ts"),
        F.col("o_orderkey").alias("tb"),
    )
    return scd2_history(obs, "cust_id", "status", "ts", "tb")
