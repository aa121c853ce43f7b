"""Benchmark-contamination detection for training corpora.

The standard decontamination step in LLM data prep: flag corpus
documents that share word n-grams with a benchmark/eval set, so
test data can be excised from the training corpus before training.

Shape at 100 TB: the benchmark side is small (eval suites are MBs
against a corpus of TBs), so its distinct shingle set broadcasts;
the corpus side is a map-only shingle explode over the scan followed
by a broadcast hash join and ONE shuffle for the per-document
aggregate.  Never an all-pairs comparison — the n-gram join is the
industrial decontamination algorithm (exact-substring variant of
the shingle overlap used by dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .partitioning import spread

from .dedup import doc_shingle_arrays, doc_shingles


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus documents sharing ≥1 distinct k-word shingle with any
    benchmark document.

    Returns one row per contaminated corpus doc:
      ``doc_id`` — corpus document id
      ``n_hit_shingles`` — distinct shingles shared with the benchmark
      ``n_bench_docs`` — distinct benchmark docs it overlaps
      ``contamination`` — n_hit_shingles / its distinct-shingle count

    Plan: benchmark shingles broadcast; corpus shingles are a map-only
    explode carrying the per-doc shingle count ``sz`` alongside (sz is
    functionally dependent on doc_id, so grouping by both keeps ONE
    corpus tokenize/shingle pass and removes the post-aggregate sizes
    join — the previous two-pass shape ran the shingle construction,
    the single most expensive expression in the query, twice over the
    corpus).
    """
    # Both explodes are over COMPUTED shingle arrays: inner explode's
    # inferred size-filter would re-evaluate the whole k-shingle
    # construction interpreted in the scan (measured 29× end-to-end
    # at the 20× SF: 402 s → 13.7 s) — explode_outer infers nothing,
    # and shingle arrays are never empty by construction, so it's a
    # pure drop-in (functions.explode_computed).
    from ..functions import explode_computed

    # CPU-heavy map stage over few file splits: spread it like the
    # minhash pipeline does (no-op at real scale, where the many-file
    # scan already fills the cluster; operators/partitioning.py).
    bench = (
        doc_shingles(benchmark, k=k, id_col=id_col, text_col=text_col)
        .select(F.col("token").alias("shingle"), F.col("doc_id").alias("bench_id"))
        .distinct()
    )
    corp = doc_shingle_arrays(
        spread(corpus, id_col), k=k, id_col=id_col, text_col=text_col
    ).select("doc_id", "sz", explode_computed("arr", never_empty=True).alias("shingle"))
    hits = (
        corp.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "sz")
        .agg(
            F.countDistinct("shingle").alias("n_hit_shingles"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )
    return hits.select(
        "doc_id",
        "n_hit_shingles",
        "n_bench_docs",
        F.round(F.col("n_hit_shingles") / F.col("sz"), 6).alias("contamination"),
    )


def corpus_boilerplate(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-internal boilerplate detection at sub-document
    granularity (the CCNet/RefinedWeb line-dedup motif, generalized
    to k-word shingles since this corpus has no line structure):
    a distinct k-shingle appearing in ``>= min_docs`` documents is
    boilerplate (headers, footers, license blocks, navigation);
    each doc gets its boilerplate-shingle count and fraction —
    the removal decision is then a cheap filter on ``boiler_frac``.

    Returns (doc_id, n_shingles, n_boiler, boiler_frac).

    Scale at 100 TB: the document-frequency aggregate shuffles
    md5(shingle) (16-byte keys, not raw phrase strings) with map-side
    partial aggregation; the hit-count join is shingle-hash →
    boilerplate-set semi-equality on the same key, so both stages
    reuse one hash partitioning.  No all-pairs anywhere; the
    boilerplate set itself is df-bounded (a shingle needs min_docs
    distinct docs), typically dimension-sized → AQE broadcasts it.
    The shingle sets are distinct-per-doc (doc_shingle_arrays), so
    count(*) over pairs IS document frequency."""
    arrs = doc_shingle_arrays(docs, k, id_col, text_col)
    from ..functions import explode_computed

    pairs = arrs.select(
        "doc_id", explode_computed("arr", never_empty=True).alias("g")
    ).select("doc_id", F.md5("g").alias("h"))
    boiler = (
        pairs.groupBy("h")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h", F.lit(1).alias("is_b"))
    )
    # n_shingles comes from the SAME left join + aggregate as
    # n_boiler (every pair survives a left join; arr is never empty,
    # so no doc drops out) — the tokenize/shingle projection runs
    # exactly twice (document-frequency branch + probe branch), not
    # three times; the third 'sizes' branch would re-shingle the
    # whole corpus just to count.  At 100 TB the remaining 2× is
    # folded away by persisting `pairs` or fusing this flag pass into
    # the corpus build's shared tokenize stage.
    return (
        pairs.join(boiler, "h", "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("is_b"), F.lit(0)).cast("bigint").alias("n_boiler"),
        )
        .withColumn(
            "boiler_frac",
            F.round(F.col("n_boiler") / F.col("n_shingles"), 6),
        )
    )
