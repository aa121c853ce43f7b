"""Corpus retrieval / selection operators: BM25 ranked search,
per-group quota capping, and DSIR-style hashed importance weighting.

The reference feeds packet records to Hive and lets SQL do the rest
(SURVEY.md §2.4); a training-data pipeline built on the same engine
additionally needs *document selection* primitives — score documents
against a query (retrieval for eval-set construction / hard-negative
mining), cap how much any one source contributes (domain quotas, the
crawl-curation knob), and reweight a raw crawl toward a curated
target distribution (importance resampling, Xie et al. 2023 "DSIR").
All three are pure DataFrame compositions — no UDFs, no collects —
registered as driver queries with DuckDB oracles in plans/pipeline.py.

100 TB design notes:

* ``bm25_score`` tokenizes the corpus ONCE into a persisted per-doc
  projection of (length, query-term hits) — bounded by |query| per
  doc, a sliver of the text it replaces — that feeds tf, df and
  avgdl; the filter to query terms happens BEFORE any shuffle, so the
  per-doc aggregate moves only the query terms' postings, never the
  corpus token stream; df and avgdl are broadcasts.  Per-term
  contributions are summed in DECIMAL so the score is
  order-independent under any partitioning.
* ``group_quota`` is one hash exchange on the group key and a
  rank-filter window Spark executes as WindowGroupLimit: each map
  task keeps only its local top-k per group before the shuffle, so a
  pathologically hot source (the 100 TB failure mode — one domain is
  half the crawl) ships at most ``k × n_partitions`` rows, not its
  full mass.
* ``dsir_log_weights`` tokenizes + feature-hashes the corpus ONCE
  into a persisted (doc, bucket) stream that feeds both the
  ``n_buckets``-row statistics aggregate (map-side combine →
  broadcast) and the per-doc weight sum, which reuses the
  repartition's doc-key clustering — nothing O(vocabulary) on a
  single node, and the corpus text is never scanned twice.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_score", "group_quota", "dsir_log_weights"]

# Tokenization contract shared with functions/text.py and the DuckDB
# oracles (plans/pipeline.py SQL_TOKENS).
from ..functions.text import tokens as _tokens
from .partitioning import spread as _spread


def bm25_score(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 (Lucene idf variant) of every document that matches
    at least one query term → ``(id_col, score)``.

    idf(t)   = ln(1 + (N − df + 0.5) / (df + 0.5))
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))

    |d| is the document token count and avgdl the corpus mean token
    count (over ALL documents, matching or not).  Per-term
    contributions are rounded into DECIMAL(18,6) before the per-doc
    sum so the total is independent of partitioning/summation order —
    the registry's standard float-determinism contract.

    Scale: the only corpus-sized shuffle is the per-doc contribution
    sum at document grain; the token explode is filtered to
    ``query_terms`` map-side, df and avgdl arrive as broadcasts."""
    from pyspark import StorageLevel

    from .cache import register_persisted

    # Deduplicate query terms at entry: tf groups per DISTINCT term, so
    # a repeated term would contribute once anyway — multiset query
    # scoring is deliberately not modeled (document the divergence
    # rather than hide it), and dedup also bounds the O(|query|)
    # map-side containment filter (ADVICE r8).
    query_terms = sorted(set(query_terms))
    qterms = F.array(*[F.lit(t) for t in query_terms])
    toks = _tokens(F.col(text_col))
    # One scan feeds tf, df and the corpus stats: the per-doc
    # projection keeps only the doc length and the query-term hits
    # (bounded by |query| per doc), so the persisted frame is tiny
    # regardless of corpus text size.
    base = (
        _spread(docs, id_col)
        .select(
            F.col(id_col),
            # NULL-text guard: size(NULL) is -1 under Spark's default
            # legacy.sizeOfNull, which would poison avgdl corpus-wide
            # (DuckDB's len(NULL) is NULL and drops out of avg); keep
            # the NULL so both engines exclude the row from avgdl
            F.when(
                F.col(text_col).isNotNull(), F.size(toks)
            ).alias("_dl"),
            F.filter(toks, lambda t: F.array_contains(qterms, t)).alias(
                "_hits"
            ),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tf = (
        base.select(id_col, "_dl", F.explode("_hits").alias("_term"))
        .groupBy(id_col, "_term")
        .agg(F.count("*").alias("_tf"), F.max("_dl").alias("_dl"))
    )
    # df per query term and the corpus stats are tiny → broadcast.
    dfreq = (
        base.select(F.explode(F.array_distinct("_hits")).alias("_term"))
        .groupBy("_term")
        .agg(F.count("*").alias("_df"))
    )
    corpus = base.agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "_term")
        .crossJoin(F.broadcast(corpus))
        .select(
            F.col(id_col),
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("_df") + 0.5)
                    / (F.col("_df") + 0.5)
                )
                * (F.col("_tf") * (k1 + 1))
                / (
                    F.col("_tf")
                    + k1
                    * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("_c"),
        )
    )
    result = contrib.groupBy(id_col).agg(
        F.sum("_c").cast("double").alias("score")
    )
    # caller releases via operators.release_persisted(result) after
    # materializing (cache-hygiene contract shared with dedup.py)
    return register_persisted(result, base)


def group_quota(
    df: DataFrame,
    group_col: str,
    k: int,
    *,
    priority_col: str | None = None,
    tie_col: str | None = None,
    rank_name: str = "qrank",
) -> DataFrame:
    """Cap every group at its ``k`` highest-priority rows (ascending
    ``priority_col``; ties broken by ``tie_col``), keeping the 1-based
    rank as ``rank_name`` — the per-domain quota pass of a crawl
    pipeline.  With ``priority_col=None`` the priority is a
    deterministic md5 of ``tie_col`` (an unbiased per-group sample
    that is stable across runs and engines — no RNG).

    Scale: one exchange on ``group_col``; the ``row_number() <= k``
    filter is executed as WindowGroupLimit, so each map task emits at
    most k rows per group before the shuffle — a hot group costs
    k × n_partitions shuffled rows, not its full mass."""
    if tie_col is None:
        raise ValueError("group_quota: tie_col is required (total order)")
    prio = (
        F.col(priority_col)
        if priority_col is not None
        else F.md5(F.col(tie_col).cast("string").cast("binary"))
    )
    w = Window.partitionBy(group_col).orderBy(
        prio.asc(), F.col(tie_col).asc()
    )
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )


def _hex_bucket(col, n_buckets: int, hash_fn: str = "md5"):
    """Deterministic feature hash → bucket in [0, n_buckets).

    ``hash_fn="md5"`` folds the first four md5 hex characters' ASCII
    codes (base-131 polynomial) mod ``n_buckets`` — expressible
    identically in Spark and DuckDB (``ascii``/``substring``/``md5``
    exist in both with identical semantics), which is what the
    registry's DuckDB oracle pins.  ``hash_fn="xxhash64"`` is the
    production path: Spark-native, measured 3× cheaper than the md5
    fold (1.72 vs 5.22 cpu-s over the sf1 corpus's ~10M tokens) —
    and at 100 TB the per-token hash IS the dominant DSIR term.  Both
    are deterministic across runs; only md5 is cross-engine."""
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(col), F.lit(n_buckets)).alias("_bucket")
    if hash_fn != "md5":
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64': {hash_fn!r}")
    m = F.md5(col.cast("string").cast("binary"))
    h = F.lit(0)
    for i in range(1, 5):
        h = h * 131 + F.ascii(F.substring(m, i, 1))
    return (h % n_buckets).alias("_bucket")


def dsir_log_weights(
    docs: DataFrame,
    target_pred,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    hash_fn: str = "md5",
) -> DataFrame:
    """DSIR-style importance weights: per document, the log-likelihood
    ratio of a hashed-unigram bag model fit on the *target* slice
    (rows where ``target_pred`` holds) vs the full *raw* corpus →
    ``(id_col, log_weight)``, higher = more target-like.  Sampling
    ∝ exp(log_weight) reweights raw data toward the target
    distribution (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling").

    Both models are Laplace-smoothed over ``n_buckets`` hashed token
    features: p(bucket) = (count + 1) / (total + n_buckets).  Per-token
    log-ratios are rounded into DECIMAL(18,8) before the per-doc sum
    (order-independence contract).

    Scale: bucket statistics are one token-explode aggregate with
    map-side combine into ``n_buckets`` rows per side — broadcast;
    the per-doc sum is the only corpus-grain shuffle.  At deployment
    scale pass ``hash_fn="xxhash64"`` (3× cheaper per token, see
    :func:`_hex_bucket`); the default md5 fold exists so the DuckDB
    oracle can replay the exact bucketing."""
    from pyspark import StorageLevel

    from .cache import register_persisted

    # One tokenize+hash pass feeds both the bucket statistics and the
    # per-doc weight sum: the bucketed token stream is persisted (one
    # int bucket + a bool per occurrence — a sliver of the text it
    # replaces) instead of re-scanning and re-hashing the corpus.
    tok = (
        _spread(docs, id_col)
        .select(
            F.col(id_col),
            target_pred.alias("_is_t"),
            F.explode(_tokens(F.col(text_col))).alias("_tok"),
        )
        .select(
            id_col, "_is_t", _hex_bucket(F.col("_tok"), n_buckets, hash_fn)
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats = tok.groupBy("_bucket").agg(
        F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("_ct"),
        F.count("*").alias("_cr"),
    )
    # corpus totals as an UNPARTITIONED window over the n_buckets-row
    # stats frame (r14): the former `stats.agg(...)` + crossJoin-
    # broadcast form planned `stats` twice, so the persisted token
    # stream was re-read and re-aggregated once per branch; the window
    # computes the same exact integer sums in the single stats pass
    # (one partition of n_buckets rows — trivially bounded).
    _w = Window.partitionBy()
    totals = stats.select(
        "_bucket", "_ct", "_cr",
        F.sum("_ct").over(_w).alias("_tt"),
        F.sum("_cr").over(_w).alias("_tr"),
    )
    ratio = (
        totals
        .select(
            "_bucket",
            F.round(
                F.log(
                    (F.col("_ct") + 1)
                    / (F.col("_tt") + n_buckets).cast("double")
                )
                - F.log(
                    (F.col("_cr") + 1)
                    / (F.col("_tr") + n_buckets).cast("double")
                ),
                8,
            )
            .cast("decimal(18,8)")
            .alias("_lr"),
        )
    )
    result = (
        tok.join(F.broadcast(ratio), "_bucket")
        .groupBy(id_col)
        .agg(F.sum("_lr").cast("double").alias("log_weight"))
    )
    # caller releases via operators.release_persisted(result) after
    # materializing (cache-hygiene contract shared with dedup.py)
    return register_persisted(result, tok)
