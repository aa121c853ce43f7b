"""Scale a driver testdata SF directory K-fold for scale-proofing.

The shipped testdata tops out at sf0.1 (600k lineitem).  The 100 TB
claims in SCALE.md rest on plan reasoning unless correctness and
bench are also exercised *above* the scale every plan was tuned at —
in particular past the point where AQE starts flipping broadcast
joins to shuffle joins.  This tool builds an sf1-equivalent (default
K=10) dataset from sf0.1 by replicating every scalable table K times
with key offsets, preserving referential integrity so every join,
agg and dedup query remains semantically meaningful:

* ``region`` / ``nation`` — fixed dimensions, copied verbatim
  (TPC-H keeps them constant across SFs too);
* ``customer supplier part orders lineitem events`` — copy ``i``
  adds ``i * <base row count>`` to the table's own dense 0-based key
  AND to every foreign key that references a scaled table, so each
  copy is a self-contained star and per-key join fanout / group
  cardinality match the base SF exactly (cardinality scales K-fold,
  per-key density stays constant — the TPC-H scaling model);
* ``documents`` — ``doc_id`` offset; for copies > 0 the text gets a
  deterministic ``' c<i>'`` suffix (and ``n_chars`` grows by its
  length, preserving the n_chars == length(text) invariant) so exact
  dedup still sees K distinct fingerprints per source doc while the
  near-dup operators see K-clusters of planted near-duplicates — a
  deliberately adversarial load for the LSH candidate generators;
* ``embeddings`` — ``vec_id`` offset; copies > 0 get a constant
  ``0.001 * i`` added to every coordinate: breaks exact ties (a
  replicated corpus would make top-k order engine-dependent) while
  keeping copies inside the same cosine neighborhood.

Everything is derived in DuckDB (vectorized, single pass per table)
and written as one parquet file per table, the same layout the driver
uses, so both ``spark.read.parquet`` and the DuckDB oracle read the
output unchanged.  The correctness gate stays valid because the
oracle runs over the *same* scaled parquet — no golden numbers are
assumed.

Usage:
    python tools/make_scaled_sf.py [--src /root/testdata/sf0.1] \
        [--out /tmp/spark_graft_sf1] [--k 10]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_sf1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--dup-family", type=int, default=0,
        help="if >0, hold near-dup FAMILY SIZE constant at this value "
        "while doc count scales: copy i joins group g=i//f, and a "
        "group marker token is interleaved between every word, so "
        "copies in different groups share (almost) no k-word shingles "
        "— across-group Jaccard ~0, within-group near-dup as before. "
        "This isolates the minhash operator's own scaling from the "
        "default corpus's families-grow-with-K construction (whose "
        "verified-pair count grows quadratically in K; VERDICT r5 "
        "item 2).  Affects only the documents table.",
    )
    ap.add_argument(
        "--row-group-size", type=int, default=0,
        help="parquet row-group rows (0 = DuckDB default ~123k).  A row "
        "group is the smallest unit maxPartitionBytes can assign to a "
        "task, so its decoded size bounds MINIMUM per-task memory; on "
        "tight heaps (the 1 GiB local[8] memory-safety runs) bound it "
        "to ~16k rows for the text-heavy tables",
    )
    args = ap.parse_args()

    out = os.path.abspath(args.out)
    for forbidden in ("/root/testdata", "/root/reference"):
        if out.startswith(forbidden):
            sys.exit(f"refusing to write under {forbidden}")
    os.makedirs(out, exist_ok=True)

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    src = args.src

    def base(t: str) -> int:
        return con.execute(
            f"SELECT count(*) FROM '{src}/{t}.parquet'"
        ).fetchone()[0]

    n_cust = base("customer")
    n_supp = base("supplier")
    n_part = base("part")
    n_ord = base("orders")
    n_evt = base("events")
    n_doc = base("documents")
    n_vec = base("embeddings")
    n_user = con.execute(
        f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()[0]
    k = args.k

    copies = f"(SELECT unnest(range({k})) AS i) c"

    jobs = {
        "region": f"SELECT * FROM '{src}/region.parquet'",
        "nation": f"SELECT * FROM '{src}/nation.parquet'",
        "customer": f"""
            SELECT c_custkey + c.i * {n_cust} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM '{src}/customer.parquet', {copies}""",
        "supplier": f"""
            SELECT s_suppkey + c.i * {n_supp} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM '{src}/supplier.parquet', {copies}""",
        "part": f"""
            SELECT p_partkey + c.i * {n_part} AS p_partkey, p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM '{src}/part.parquet', {copies}""",
        "orders": f"""
            SELECT o_orderkey + c.i * {n_ord} AS o_orderkey,
                   o_custkey + c.i * {n_cust} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM '{src}/orders.parquet', {copies}""",
        "lineitem": f"""
            SELECT l_orderkey + c.i * {n_ord} AS l_orderkey,
                   l_partkey + c.i * {n_part} AS l_partkey,
                   l_suppkey + c.i * {n_supp} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate
            FROM '{src}/lineitem.parquet', {copies}""",
        "events": f"""
            SELECT event_id + c.i * {n_evt} AS event_id, ts,
                   user_id + c.i * {n_user} AS user_id,
                   event_type, value, props
            FROM '{src}/events.parquet', {copies}""",
        "documents": f"""
            SELECT doc_id + c.i * {n_doc} AS doc_id,
                   CASE WHEN c.i = 0 THEN text
                        ELSE text || ' c' || c.i END AS text,
                   lang, source,
                   CASE WHEN c.i = 0 THEN n_chars
                        ELSE n_chars + length(' c' || c.i) END
                       AS n_chars
            FROM '{src}/documents.parquet', {copies}""",
        # constant-family variant: per-GROUP token renaming — every
        # word gets a 'g<g>' suffix glued on (no separator: the
        # tokenizer is [a-z0-9]+, so the suffix must stay inside the
        # token), a bijective rename of the token vocabulary per
        # group.  Within a group every pairwise shingle relationship
        # (planted family AND natural cross-doc near-dups) is
        # isomorphic to the source corpus; across groups no k-word
        # shingle survives the rename, so groups are Jaccard-disjoint.
        # (An earlier interleaved-marker transform was rejected: the
        # marker token itself appeared in every shingle, homogenizing
        # docs within a group and melting the LSH buckets.)  The tiny
        # ' c<j>' suffix keeps within-group copies near-duplicates
        # with distinct fingerprints.  n_chars == length(text)
        # invariant preserved by recomputing.
        "documents_const_family": f"""
            SELECT doc_id, text, lang, source, length(text) AS n_chars
            FROM (
                -- text || ' ' before the replace: the suffix rename
                -- must also tag the LAST word (a trailing space gives
                -- it a separator to rewrite; rtrim removes the
                -- leftover), else every group's copy-0 of a one-word
                -- doc would be byte-identical across groups and break
                -- the cross-group-Jaccard-0 property this corpus
                -- exists to provide (min doc length in the shipped
                -- testdata is 10 words, so the recorded fits were
                -- unaffected — this hardens the tool, not the data)
                SELECT doc_id + c.i * {n_doc} AS doc_id,
                       CASE WHEN c.i % {args.dup_family or 1} = 0
                            THEN rtrim(replace(text || ' ', ' ',
                                 'g' || (c.i // {args.dup_family or 1}) || ' '))
                            ELSE rtrim(replace(text || ' ', ' ',
                                 'g' || (c.i // {args.dup_family or 1}) || ' '))
                                 || ' c' || (c.i % {args.dup_family or 1})
                       END AS text,
                       lang, source
                FROM '{src}/documents.parquet', {copies}
            )""",
        "embeddings": f"""
            SELECT vec_id + c.i * {n_vec} AS vec_id,
                   CASE WHEN c.i = 0 THEN embedding
                        ELSE CAST(list_transform(embedding,
                                 x -> x + CAST(0.001 * c.i AS FLOAT))
                             AS FLOAT[]) END AS embedding,
                   label
            FROM '{src}/embeddings.parquet', {copies}""",
    }

    if args.dup_family:
        jobs["documents"] = jobs.pop("documents_const_family")
    else:
        del jobs["documents_const_family"]

    rg = f", ROW_GROUP_SIZE {args.row_group_size}" if args.row_group_size else ""
    for t, q in jobs.items():
        dst = os.path.join(out, f"{t}.parquet")
        con.execute(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET{rg})")
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}", flush=True)


if __name__ == "__main__":
    main()
