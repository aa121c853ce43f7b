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
    return (
        sharded.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length(text_col)).cast("bigint").alias("n_chars"),
            # bit_xor is map-side combinable and constant-memory — a
            # collect_list fold would buffer every per-doc word of a
            # shard in one aggregation buffer
            F.bit_xor(fp_word).alias("content_digest"),
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
    # two actions (data write + manifest) — persist so an expensive
    # upstream pipeline (this writer terminates the corpus build)
    # executes once, not twice
    sharded = sharded.persist()
    try:
        (
            sharded.repartition(n_shards, "shard")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(path)
        )
        manifest = shard_manifest(sharded, text_col)
        manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    finally:
        sharded.unpersist()
    return manifest
