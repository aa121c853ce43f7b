"""Training-corpus shard writer: size-bounded shards + manifest.

The output side of the data pipeline: training jobs read fixed-size
shards (WebDataset/Mosaic-style), not one giant table, and reproducible
builds need a manifest stating exactly which documents landed where.

Shard assignment is deterministic (md5(doc_id) % n_shards — stable
across runs, partitionings and engines; no zipWithIndex, no driver
loop), the write is one hash-partitioned exchange, and the manifest is
an order-insensitive per-shard digest (bit-XOR of doc fingerprint
words) so two builds of the same corpus compare equal manifest-to-
manifest without reading the data back.

Scale: n_shards partitions the write exchange; each shard is one (or
a few) parquet files via partitionBy("shard"); the manifest aggregate
rides the same exchange grain (one row per shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add a deterministic ``shard`` column: md5(id) % n_shards."""
    return df.withColumn(
        "shard",
        (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
            .cast("bigint")
            % n_shards
        ).cast("int"),
    )


def shard_manifest(sharded: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per shard: doc count, token-ish size, and an
    order-insensitive content digest (XOR of per-doc fingerprint
    words) — equal corpora ⇒ equal manifests, any diff pinpoints the
    shard that changed."""
    fp_word = F.conv(
        F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10
    ).cast("bigint")
    xor_agg = F.aggregate(
        F.collect_list(fp_word),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc.bitwiseXOR(v),
    )
    return (
        sharded.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length(text_col)).cast("bigint").alias("n_chars"),
            xor_agg.alias("content_digest"),
        )
        .orderBy("shard")
    )


def write_corpus_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Write ``df`` as ``path/shard=NN/*.parquet`` plus
    ``path/_manifest`` (parquet, one row per shard) and return the
    manifest DataFrame.  Deterministic end to end: same corpus in ⇒
    byte-equal shard membership and manifest out."""
    sharded = assign_shards(df, n_shards, id_col)
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    manifest = shard_manifest(sharded, text_col)
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return manifest
