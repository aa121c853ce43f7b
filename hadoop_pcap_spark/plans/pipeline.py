"""North-star pipeline queries: dedup, similarity search, text analysis
(SURVEY.md §2.5; BASELINE north-star ops).

Each Spark plan mirrors a DuckDB oracle bit-for-bit: shared md5-based
hashing, shared tokenization regex, DOUBLE math with explicit rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from . import query, table
from . import ann_oracles as ANN
from ..functions import text as TXT
from ..operators import dedup as DD
from ..operators import similarity as SIM

# shared SQL fragments for the oracles (same contract as functions.text)
SQL_TOKENS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
SQL_DTOKENS = f"list_distinct({SQL_TOKENS})"


# --- exact dedup ----------------------------------------------------------------


@query(
    "dedup_exact_fingerprint",
    oracle=f"""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           count(*) AS n_docs,
           MIN(doc_id) AS keep_doc_id,
           MIN(n_chars) AS min_chars
    FROM documents
    GROUP BY 1
    HAVING count(*) >= 1 AND MIN(doc_id) < 50
    """,
)
def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-dup groups by normalized-content md5 (the reference's
    packet-MD5 dedup, PcapReader.java:183-188, lifted to documents).
    Scale: one shuffle on the fingerprint."""
    return (
        table(spark, sf, "documents")
        .select("doc_id", "n_chars", TXT.exact_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.min("n_chars").alias("min_chars"),
        )
        .filter(F.col("keep_doc_id") < 50)
    )


# --- minhash + LSH near-dup -------------------------------------------------------


def _sql_minhash_cols(n: int) -> str:
    # Kirsch-Mitzenmacher family off one md5 (mirrors dedup.py):
    # h_i = a + i*b over the digest's two 60-bit halves.
    return ",\n".join(f"MIN(ha + {i} * hb) AS m{i}" for i in range(n))


SQL_SHINGLES3 = f"""list_distinct(
      CASE WHEN len({SQL_TOKENS}) >= 3
           THEN list_transform(range(1, len({SQL_TOKENS}) - 1),
                i -> {SQL_TOKENS}[i] || ' ' || {SQL_TOKENS}[i+1] || ' ' || {SQL_TOKENS}[i+2])
           ELSE [array_to_string({SQL_TOKENS}, ' ')] END)"""


# Shared CTE chain reproducing the MinHash→LSH→Jaccard pipeline in
# DuckDB SQL; reused by the pair query, the connected-components
# oracle and the corpus-keep-set oracle (the final verified pair set
# is `mh_pairs`).  ``src`` is the doc source relation — it must expose
# (doc_id, text).
def _sql_minhash_ctes(src: str = "documents") -> str:
    return f"""docarr AS MATERIALIZED (
      -- one shingle pass per doc, shared by the signature, size and
      -- intersection stages (MATERIALIZED: DuckDB would otherwise
      -- inline the shingle construction into each consumer)
      SELECT doc_id, {SQL_SHINGLES3} AS arr FROM {src}
    ),
    tok AS (
      SELECT doc_id, unnest(arr) AS token FROM docarr
    ),
    tokh AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT) AS ha,
             CAST(concat('0x', substr(md5(token), 17, 15)) AS BIGINT) AS hb
      FROM tok
    ),
    sigs AS (
      SELECT doc_id, {_sql_minhash_cols(8)}
      FROM tokh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band,
             md5(CAST(m0 AS VARCHAR) || '|' || CAST(m1 AS VARCHAR)) AS key FROM sigs
      UNION ALL SELECT doc_id, 1, md5(CAST(m2 AS VARCHAR) || '|' || CAST(m3 AS VARCHAR)) FROM sigs
      UNION ALL SELECT doc_id, 2, md5(CAST(m4 AS VARCHAR) || '|' || CAST(m5 AS VARCHAR)) FROM sigs
      UNION ALL SELECT doc_id, 3, md5(CAST(m6 AS VARCHAR) || '|' || CAST(m7 AS VARCHAR)) FROM sigs
    ),
    buckets AS (
      SELECT band, key, list(doc_id) AS members
      FROM bands GROUP BY band, key
    ),
    cands AS (
      -- bit-exact twin of operators/dedup.py:candidate_pairs
      -- INCLUDING the hot-bucket star guard: buckets over 64 members
      -- emit the m-1 star around their min doc_id instead of the m²
      -- clique.  The unguarded bands-self-join version silently
      -- diverged the moment real data pushed a bucket past the cap
      -- (first seen at the 10x SF, where planted duplicate clusters
      -- multiply bucket sizes) -- the guard is documented operator
      -- semantics, so the oracle must model it.
      SELECT DISTINCT p.a, p.b FROM (
        SELECT unnest(CASE WHEN len(members) <= 64
               THEN flatten(list_transform(members,
                    x -> list_transform(list_filter(members, y -> y > x),
                         y -> struct_pack(a := x, b := y))))
               ELSE list_transform(
                    list_filter(members, y -> y != list_min(members)),
                    y -> struct_pack(a := list_min(members), b := y))
               END) AS p
        FROM buckets)
    ),
    sizes AS (SELECT doc_id, len(arr) AS sz FROM docarr),
    harr AS (
      -- 60-bit md5-hash image of the shingle set: the SAME ha value
      -- the signature family derives, and exactly what the Spark side
      -- verifies on since r5 (array<bigint> keeps array_intersect on
      -- the atomic-type fast path and shrinks the persisted/shuffled
      -- rows ~3x vs string arrays)
      SELECT doc_id,
             list_transform(arr,
               t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)
             ) AS arrh
      FROM docarr
    ),
    inter AS (
      -- intersections ONLY for LSH candidate pairs, computed as a
      -- per-pair list_intersect exactly like the Spark side's
      -- array_intersect verify.  An unrestricted tok-self-join here
      -- is what the Spark side deliberately never does (O(sum df^2):
      -- 60+ CPU-minutes at 50k docs), and even the candidate-
      -- restricted token JOIN materialized candidates x tokens rows
      -- (25 GB resident at the 10x SF); the array form is
      -- O(candidates x tokens-per-doc) with nothing exploded.
      -- arr is list_distinct upstream and list_intersect
      -- de-duplicates, so the length is the set-intersection count
      -- (on hashes: identical to strings up to 2^-60 collisions,
      -- which both engines then share).
      SELECT c.a, c.b, len(list_intersect(da.arrh, db.arrh)) AS inter
      FROM cands c
      JOIN harr da ON da.doc_id = c.a
      JOIN harr db ON db.doc_id = c.b
    ),
    mh_pairs AS (
      SELECT i.a, i.b, i.inter,
             ROUND(i.inter * 1.0 / (sa.sz + sb.sz - i.inter), 6) AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.a
      JOIN sizes sb ON sb.doc_id = i.b
      WHERE ROUND(i.inter * 1.0 / (sa.sz + sb.sz - i.inter), 6) >= 0.5
    )"""


_SQL_MINHASH_CTES = _sql_minhash_ctes("documents")


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SQL_MINHASH_CTES}
    SELECT a, b, inter, jaccard FROM mh_pairs
    """,
)
def q_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """3-word-shingle MinHash → LSH bands → candidate pairs →
    exact-Jaccard verify.  The oracle reproduces the exact same
    md5-derived MinHash, so even the LSH candidate set matches
    bit-for-bit.  Scale: O(n·bands) shuffle for candidates, never
    O(n²); shingling keeps candidates sparse on low-vocab corpora."""
    return DD.minhash_lsh_pairs(table(spark, sf, "documents"), threshold=0.5)


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_DTOKENS}) AS token FROM documents WHERE doc_id < 120
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
    inter AS (
      SELECT ta.doc_id AS a, tb.doc_id AS b, count(*) AS inter
      FROM tok ta JOIN tok tb ON ta.token = tb.token AND ta.doc_id < tb.doc_id
      GROUP BY 1, 2
    )
    SELECT i.a, i.b,
           ROUND(i.inter * 1.0 / (sa.sz + sb.sz - i.inter), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.a
    JOIN sizes sb ON sb.doc_id = i.b
    WHERE i.inter * 1.0 / (sa.sz + sb.sz - i.inter) >= 0.4
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact pairwise token-set Jaccard on a bounded candidate set
    (doc_id < 120) — the verification primitive in isolation."""
    docs = table(spark, sf, "documents").filter(F.col("doc_id") < 120)
    tok = DD.doc_tokens(docs)
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ta, tb = tok.alias("ta"), tok.alias("tb")
    inter = (
        ta.join(tb, F.col("ta.token") == F.col("tb.token"))
        .filter(F.col("ta.doc_id") < F.col("tb.doc_id"))
        .groupBy(F.col("ta.doc_id").alias("a"), F.col("tb.doc_id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    jac = F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))
    return (
        inter.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .filter(jac >= 0.4)
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_DTOKENS}) AS token FROM documents
    ),
    votes AS (
      SELECT doc_id,
        {", ".join(
            f"SUM(CASE WHEN (strpos('0123456789abcdef', substring(md5(token), {i+1}, 1)) - 1) % 2 = 1 THEN 1 ELSE -1 END) AS v{i}"
            for i in range(32)
        )}
      FROM tok GROUP BY doc_id
    ),
    sh AS (
      SELECT doc_id,
        {" + ".join(f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(32))} AS simhash
      FROM votes
    ),
    bands AS (
      SELECT doc_id, simhash, 0 AS band, simhash & 255 AS key FROM sh
      UNION ALL SELECT doc_id, simhash, 1, (simhash >> 8) & 255 FROM sh
      UNION ALL SELECT doc_id, simhash, 2, (simhash >> 16) & 255 FROM sh
      UNION ALL SELECT doc_id, simhash, 3, (simhash >> 24) & 255 FROM sh
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b,
             a.simhash AS simhash_a, b.simhash AS simhash_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT a, b, simhash_a, simhash_b,
           bit_count(xor(simhash_a, simhash_b)) AS hamming
    FROM cands
    WHERE bit_count(xor(simhash_a, simhash_b)) <= 3
    """,
)
def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """32-bit SimHash near-dup pairs (Hamming ≤ 3) via pigeonhole
    banding: 4 bands of 8 bits; a pair within Hamming ≤ 3 must agree
    exactly on ≥1 band, so candidates come from band equi-joins
    (O(n·bands) shuffle, no quadratic pair join, no recall loss —
    retires the earlier lang-blocked quadratic variant).  Oracle
    reproduces the same hex-digit-vote construction and banding."""
    return DD.simhash_banded_pairs(
        table(spark, sf, "documents"), max_hamming=3, bits=32
    ).withColumn("hamming", F.col("hamming").cast("long"))


def _sql_simhash_wide(bits: int, width: int) -> str:
    """DuckDB twin of simhash_bits(scheme='nibble') + 15-bit banding."""
    votes = ", ".join(
        f"SUM(CASE WHEN ((strpos('0123456789abcdef', substring(md5(token), {i // 4 + 1}, 1)) - 1) & {1 << (i % 4)}) != 0 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(bits)
    )
    sh = " + ".join(f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits))
    mask = (1 << width) - 1
    bands = "\n      UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * width}) & {mask} AS key FROM sh"
        for b in range(bits // width)
    )
    return f"""tok AS (
      SELECT doc_id, unnest({SQL_DTOKENS}) AS token FROM documents
    ),
    votes AS (
      SELECT doc_id, {votes}
      FROM tok GROUP BY doc_id
    ),
    sh AS (
      SELECT doc_id, {sh} AS simhash FROM votes
    ),
    bands AS (
      {bands}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b,
             a.simhash AS simhash_a, b.simhash AS simhash_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )"""


@query(
    "dedup_simhash_wide",
    oracle=f"""
    WITH {_sql_simhash_wide(60, 15)}
    SELECT a, b, simhash_a, simhash_b,
           bit_count(xor(simhash_a, simhash_b)) AS hamming
    FROM cands
    WHERE bit_count(xor(simhash_a, simhash_b)) <= 3
    """,
)
def q_dedup_simhash_wide(spark: SparkSession, sf: str) -> DataFrame:
    """The 100 TB SimHash operating point: 60-bit nibble-scheme
    fingerprint (4 independent bits per md5 hex digit), 4 bands of
    15 bits.  Same pigeonhole guarantee as ``dedup_simhash`` (Hamming
    ≤ 3 ⇒ exact agreement on ≥1 band ⇒ zero recall loss) but band
    keys take 32k values instead of 256, so expected band-bucket size
    — and with it the in-bucket pair blowup the band join pays — drops
    128× at the same corpus size.  Wider fingerprints also separate
    unrelated docs better, so the verified pair set is cleaner.
    Oracle reproduces the construction digit-for-digit."""
    return DD.simhash_banded_pairs(
        table(spark, sf, "documents"), max_hamming=3, bits=60, scheme="nibble"
    ).withColumn("hamming", F.col("hamming").cast("long"))


# --- similarity search -------------------------------------------------------------


_SQL_DOT = (
    "list_sum(list_transform(list_zip(q.embedding, c.embedding), "
    "t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))"
)
_SQL_NORM_Q = "sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_SQL_NORM_C = "sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


@query(
    "similarity_cosine_topk",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             ROUND({_SQL_DOT} / ({_SQL_NORM_Q} * {_SQL_NORM_C}), 6) AS cos
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 8
    )
    SELECT q_id, n_id, cos, rank FROM (
      SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def q_similarity_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-5 for 8 query vectors — the ANN ground
    truth. All math in sequential DOUBLE folds in both engines."""
    emb = table(spark, sf, "embeddings")
    return SIM.cosine_topk_bruteforce(
        emb, emb.filter(F.col("vec_id") < 8), k=5, dim=64
    ).withColumn("rank", F.col("rank").cast("long"))


def _sql_sign_band(b: int, band_dims: int = 8) -> str:
    lo, hi = b * band_dims + 1, (b + 1) * band_dims
    return (
        f"array_to_string(list_transform(embedding[{lo}:{hi}], "
        "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"
    )


_SQL_DOT_AB = (
    "list_sum(list_transform(list_zip(ea.embedding, eb.embedding), "
    "t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))"
)
_SQL_NORM_A = "sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_SQL_NORM_B = "sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_SQL_COS_AB = f"ROUND({_SQL_DOT_AB} / ({_SQL_NORM_A} * {_SQL_NORM_B}), 6)"


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, {_sql_sign_band(0)} AS k0, {_sql_sign_band(1)} AS k1,
             {_sql_sign_band(2)} AS k2, {_sql_sign_band(3)} AS k3
      FROM embeddings
    ),
    bands AS (
      SELECT vec_id, 0 AS band, k0 AS key FROM sig
      UNION ALL SELECT vec_id, 1, k1 FROM sig
      UNION ALL SELECT vec_id, 2, k2 FROM sig
      UNION ALL SELECT vec_id, 3, k3 FROM sig
    ),
    cands AS (
      SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
      FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key
      WHERE l.vec_id < r.vec_id
    )
    SELECT c.a, c.b, {_SQL_COS_AB} AS cos
    FROM cands c
    JOIN embeddings ea ON ea.vec_id = c.a
    JOIN embeddings eb ON eb.vec_id = c.b
    WHERE {_SQL_COS_AB} >= 0.35
    """,
)
def q_dedup_embedding_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup — the vector member of the dedup
    family (exact / minhash / simhash / ngram / embedding).  Sign-band
    LSH candidates (coordinate hyperplanes, so the oracle reproduces
    the exact candidate set) → exact cosine ≥ 0.35.  The synthetic
    corpus has no true near-dups (max all-pairs cosine ≈0.51), so the
    threshold is set low to exercise the operator; production uses
    ≥0.9 with random-projection bands.  Scale: O(n·bands) shuffle +
    per-bucket row-local pairs with the hot-bucket guard — never
    O(n²)."""
    # dim=64 is the driver-contract embedding dimensionality: the
    # per-pair dot unrolls into codegen (similarity._dot)
    return SIM.embedding_near_dup(
        table(spark, sf, "embeddings"), threshold=0.35, dim=64
    )


@query("embeddings_semantic_clusters", oracle=ANN.clusters_oracle)
def q_embeddings_semantic_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic clustering of the embedding corpus
    (similarity.kmeans_assign): deterministic sampled k-means,
    nearest-centroid assignment in one shuffle-free codegen pass,
    then per-cluster size + DECIMAL-summed inertia (the k-means
    objective) — the curation primitive behind SemDeDup-style
    cluster-then-prune pipelines and cluster-stratified sampling.
    Hash-checked against a generated oracle that retrains the same
    centroids and replays the assignment in DuckDB."""
    from ..operators.similarity import kmeans_assign

    a = kmeans_assign(table(spark, sf, "embeddings"))
    return a.groupBy("cluster_id").agg(
        F.count("*").alias("n_vecs"),
        F.sum(F.round(F.col("dist2"), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("sse"),
    )


@query("similarity_ann_lsh", oracle=ANN.lsh_oracle)
def q_similarity_ann(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbors (hyperplane signs →
    bucket equi-join → exact rerank).  Approximate vs brute force
    (recall pytest-asserted) but deterministic as a program — the
    generated oracle (plans/ann_oracles.py) replays buckets, probes
    and rerank in DuckDB with the md5 planes as literals, so the
    distributed implementation is hash-checked since r9."""
    emb = table(spark, sf, "embeddings")
    return SIM.cosine_topk_lsh(
        emb, emb.filter(F.col("vec_id") < 8), k=5
    ).withColumn("rank", F.col("rank").cast("long"))


@query("similarity_ann_pq", oracle=ANN.pq_oracle)
def q_similarity_pq(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN (compress vectors to 16 sub-codes,
    score queries against reconstructions, exact-rerank the
    shortlist) — the scan-byte lever when the corpus outgrows
    storage-adjacent compute.  Recall vs brute force stays pytest-
    asserted; the implementation is hash-checked since r9 against a
    generated oracle that trains the same deterministic codebooks and
    replays encode + unrolled ADC + rerank in DuckDB."""
    emb = table(spark, sf, "embeddings")
    return SIM.cosine_topk_pq(
        emb, emb.filter(F.col("vec_id") < 8), k=5
    ).withColumn("rank", F.col("rank").cast("long"))


@query("similarity_ann_ivfpq", oracle=ANN.ivfpq_oracle)
def q_similarity_ivfpq(spark: SparkSession, sf: str) -> DataFrame:
    """The composed IVF+PQ index (cells bound which rows a query
    touches, codes bound the bytes per touched row, exact rerank
    restores precision) — the standard billion-scale ANN layout.
    Recall vs brute force stays pytest-asserted; the implementation is
    hash-checked since r9 against a generated oracle replaying cell
    routing + encode + unrolled ADC + rerank in DuckDB."""
    emb = table(spark, sf, "embeddings")
    return SIM.cosine_topk_ivfpq(
        emb, emb.filter(F.col("vec_id") < 8), k=5
    ).withColumn("rank", F.col("rank").cast("long"))


def _ann_index_table(spark: SparkSession, sf: str) -> str:
    """Build-once persisted IVF+PQ index over the embeddings table,
    keyed by the source parquet's identity (path+mtime+size, the
    join_bucketed_docs convention) so a regenerated dataset re-indexes
    instead of serving stale codes; stale keys for the same dataset
    are dropped so the warehouse stays bounded.  The default in-memory
    catalog is session-local while managed locations persist on disk,
    so a leftover location without catalog metadata is rebuilt."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from ..operators.ann_index import write_ann_index

    p = os.path.join(sf, "embeddings.parquet")
    st = os.stat(p)
    key = hashlib.md5(
        f"{os.path.abspath(p)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:10]
    # dataset tag in the name scopes housekeeping: stale keys are
    # dropped only for the SAME sf dir, so two SFs used in one
    # session don't evict each other's indexes.  The tag hashes the
    # ABSOLUTE path — a basename tag would alias /a/sf0.1 with
    # /b/sf0.1 and turn build-once into rebuild-per-alternation
    # (r10 review finding)
    tag = hashlib.md5(
        os.path.abspath(sf.rstrip("/")).encode()
    ).hexdigest()[:8]
    # family prefix VERSIONED with the tag scheme ("annix2" = hashed-
    # path tags): renaming the tag rule orphans every table built
    # under the previous rule unless the sweep knows the whole legacy
    # family — so housekeeping below reclaims any name from a retired
    # prefix outright (r10 review finding)
    prefix = f"annix2_{tag}_"
    legacy_prefixes = ("ann_ivfpq_",)
    t = prefix + key
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if os.path.isdir(wh):
        for old in os.listdir(wh):
            stale_same_dataset = old.startswith(prefix) and not old.startswith(t)
            retired_family = any(old.startswith(p) for p in legacy_prefixes)
            if stale_same_dataset or retired_family:
                spark.sql(f"DROP TABLE IF EXISTS {old}")
                shutil.rmtree(os.path.join(wh, old), ignore_errors=True)
    if not (
        spark.catalog.tableExists(t)
        and spark.catalog.tableExists(t + "__model")
    ):
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
        shutil.rmtree(os.path.join(wh, t + "__model"), ignore_errors=True)
        write_ann_index(table(spark, sf, "embeddings"), t)
    return t


@query("similarity_ann_index_persisted", oracle=ANN.ivfpq_oracle)
def q_similarity_ann_persisted(spark: SparkSession, sf: str) -> DataFrame:
    """IVF+PQ search over a PERSISTED index (operators/ann_index.py):
    the corpus is encoded once into a cell-bucketed codes table + model
    sidecar, and the query path runs zero training jobs and zero
    shuffles over the index scan (bucket-pruned probe join, plan
    CI-asserted) — the build-once/query-many shape that dominates at
    100 TB where the in-line variant's per-call corpus encode would.
    Same params as similarity_ann_ivfpq, and the stored
    norm/cell/codes round-trip parquet exactly, so the result is
    bit-for-bit the in-line variant's — hash-checked against the SAME
    generated model-replay oracle."""
    emb = table(spark, sf, "embeddings")
    from ..operators.ann_index import cosine_topk_indexed, read_ann_index

    idx = read_ann_index(spark, _ann_index_table(spark, sf))
    return cosine_topk_indexed(
        idx, emb.filter(F.col("vec_id") < 8), emb, k=5
    ).withColumn("rank", F.col("rank").cast("long"))


@query("dedup_embedding_cosine_rp", oracle=ANN.rp_neardup_oracle)
# recall ≥0.9 at threshold 0.9 additionally pytest-asserted on
# planted near-dups (test_operators.py); hash-checked since r9 — the
# seeded random projections are deterministic, so the generated
# oracle replays bands + star-guarded buckets + cosine verify
def q_dedup_embedding_rp(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup at the PRODUCTION operating point — random-
    projection sign bands, cosine ≥ 0.9 (VERDICT r3 item 5; the
    coordinate-band variant dedup_embedding_cosine stays the oracle-
    checked twin at its demo threshold).

    The synthetic corpus has no true ≥0.9 pairs (max all-pairs cosine
    ≈0.51), so the query PLANTS them: each vec_id < 50 gains a twin
    (id + 1_000_000) perturbed per-dimension by a deterministic ±5%
    factor (cos ≈ 0.998).  The returned pairs are exactly the planted
    twins the banding recovered — nonzero output that exercises the
    full candidate→verify path at threshold 0.9."""
    emb = table(spark, sf, "embeddings")
    planted = (
        emb.filter(F.col("vec_id") < 50)
        .select(
            (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                # lateral-column-alias resolution binds this vec_id to
                # the PLANTED id alias above (verified empirically; the
                # generated oracle spells sin(i + vec_id + 1000000)
                # out explicitly) — either binding plants a valid
                # ±5% twin, but the oracle must replay this exact one
                lambda x, i: x.cast("double")
                * (F.lit(1.0) + F.lit(0.05) * F.sin(i + F.col("vec_id"))),
            ).alias("embedding"),
            F.col("label"),
        )
    )
    both = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"), "label"
    ).unionByName(planted)
    return SIM.embedding_near_dup_rp(both, threshold=0.9).orderBy("a", "b")


@query(
    "embedding_array_stats",
    oracle="""
    SELECT label,
           count(*) AS n,
           MIN(len(embedding)) AS min_dim,
           MAX(len(embedding)) AS max_dim,
           ROUND(SUM(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))), 4) AS sum_all,
           ROUND(MAX(CAST(embedding[1] AS DOUBLE)), 6) AS max_first
    FROM embeddings GROUP BY label
    """,
)
def q_embedding_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Array function family over the vector column (size/element_at/
    fold)."""
    el_sum = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda acc, v: acc + v.cast("double")
    )
    return (
        table(spark, sf, "embeddings")
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.min(F.size("embedding")).alias("min_dim"),
            F.max(F.size("embedding")).alias("max_dim"),
            F.round(F.sum(el_sum), 4).alias("sum_all"),
            F.round(F.max(F.element_at("embedding", 1).cast("double")), 6).alias(
                "max_first"
            ),
        )
    )


# --- text analysis -----------------------------------------------------------------


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len({SQL_TOKENS}) AS n_tokens,
           len({SQL_DTOKENS}) AS n_distinct,
           ROUND(list_sum(list_transform({SQL_TOKENS}, t -> CAST(length(t) AS DOUBLE)))
                 / NULLIF(len({SQL_TOKENS}), 0), 4) AS avg_token_len
    FROM documents WHERE doc_id < 200
    """,
)
def q_text_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting (whitespace/punct split) — the BPE-ish budget
    estimator's cheap cousin."""
    t = F.col("text")
    return (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            TXT.token_count(t).alias("n_tokens"),
            TXT.distinct_token_count(t).alias("n_distinct"),
            TXT.avg_token_len(t).alias("avg_token_len"),
        )
    )


@query(
    "text_quality_scores",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, source,
             len({SQL_TOKENS}) AS n_tokens,
             ROUND(list_sum(list_transform({SQL_TOKENS}, t -> CAST(length(t) AS DOUBLE)))
                   / NULLIF(len({SQL_TOKENS}), 0), 4) AS atl,
             ROUND(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0
                   / NULLIF(length(text), 0), 6) AS punct_ratio,
             ROUND(len(list_filter({SQL_TOKENS},
                   t -> list_contains(['the','a','an','of','and','to','in','is','on','for'], t))) * 1.0
                   / NULLIF(len({SQL_TOKENS}), 0), 6) AS stopword_ratio
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           ROUND(AVG(ROUND(
             0.4 * LEAST(n_tokens / 50.0, 1.0)
           + 0.2 * (CASE WHEN atl BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END)
           + 0.2 * (CASE WHEN stopword_ratio >= 0.05 THEN 1.0 ELSE 0.6 END)
           + 0.2 * (CASE WHEN punct_ratio <= 0.1 THEN 1.0 ELSE 0.5 END), 6)), 4) AS avg_quality
    FROM feats GROUP BY source
    """,
)
def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Document quality scoring (length/token-shape/stopword/punct
    heuristics) aggregated per source — the corpus-filter motif."""
    # deliberately NOT spread: after punct_ratio's translate rewrite
    # the whole scoring pass is ~0.4 cpu-s at sf0.1 — the repartition
    # costs more than it parallelizes (interleaved A/B min-of-8:
    # 0.27 s unspread vs 0.45 s spread; OPTIMIZATION_r13.md)
    return (
        table(spark, sf, "documents")
        .select("source", TXT.quality_score(F.col("text")).alias("q"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.round(F.avg("q"), 4).alias("avg_quality"))
    )


def _classifier_oracle() -> str:
    """Model-replay oracle for docs_quality_classifier: retrain the
    identical logistic model from DuckDB-fetched features of the same
    bounded sample (operators/classify.py shares trainer + feature
    definitions), embed the weights as literals, replay the margin
    scoring + aggregate in SQL."""
    import os

    from ..operators.classify import feature_sql, margin_sql, oracle_weights

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    w, b = oracle_weights(sf_dir, SQL_TOKENS)
    return f"""
    WITH toks AS (
      SELECT doc_id, source, {SQL_TOKENS} AS T, text FROM documents),
    feat AS (
      SELECT doc_id, source, {feature_sql(SQL_TOKENS)} FROM toks),
    scored AS (
      SELECT source, {margin_sql(w, b)} AS margin FROM feat)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN ROUND(margin, 6) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CAST(ROUND(margin, 6) AS DECIMAL(18,6)) * 1000000)
                AS BIGINT) AS sum_margin_micros
    FROM scored GROUP BY source
    """


@query("docs_quality_classifier", oracle=_classifier_oracle)
def q_docs_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """TRAINED quality filter (operators/classify.py): deterministic
    logistic regression over six exact-rational text features, seeded
    from weak rule labels on a bounded sample, scoring the corpus as
    a shuffle-free codegen margin pass — the CCNet/GPT-3 learned-
    filter motif next to the rule-based Gopher filter.  Per source:
    doc count, kept count (margin > 0), exact micro-unit margin sum.
    Hash-checked end-to-end against a generated oracle that retrains
    the same weights from DuckDB-computed features (the ANN model-
    replay pattern)."""
    from ..operators.classify import quality_classifier_margins

    m = quality_classifier_margins(table(spark, sf, "documents"))
    # compared values all pass through ROUND(margin, 6): DuckDB
    # FMA-contracts the scoring chain so unrounded margins differ in
    # the last ulp (classify.py module docstring).  The margin sum is
    # emitted as ×10⁶ int64 (decimal arithmetic throughout) so no
    # engine/fetch-path float rendering can perturb the hash.
    return m.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.round("margin", 6) > 0).cast("int"))
        .cast("long")
        .alias("n_kept"),
        F.sum(F.round("margin", 6).cast("decimal(18,6)") * F.lit(1000000))
        .cast("long")
        .alias("sum_margin_micros"),
    )


@query(
    "text_langid",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, lang,
             len(list_filter({SQL_TOKENS}, t -> list_contains(['the','and','of','to','a','is'], t))) AS s_en,
             len(list_filter({SQL_TOKENS}, t -> list_contains(['der','die','das','und','ist','nicht'], t))) AS s_de,
             len(list_filter({SQL_TOKENS}, t -> list_contains(['le','la','les','et','est','une'], t))) AS s_fr,
             len(list_filter({SQL_TOKENS}, t -> list_contains(['el','la','los','y','es','una'], t))) AS s_es,
             len(list_filter({SQL_TOKENS}, t -> list_contains(['de','shi','bu','le','wo','zai'], t))) AS s_zh
      FROM documents
    ),
    guessed AS (
      SELECT doc_id, lang,
             CASE WHEN GREATEST(s_en,s_de,s_fr,s_es,s_zh) = 0 THEN 'und'
                  WHEN s_en = GREATEST(s_en,s_de,s_fr,s_es,s_zh) THEN 'en'
                  WHEN s_de = GREATEST(s_en,s_de,s_fr,s_es,s_zh) THEN 'de'
                  WHEN s_fr = GREATEST(s_en,s_de,s_fr,s_es,s_zh) THEN 'fr'
                  WHEN s_es = GREATEST(s_en,s_de,s_fr,s_es,s_zh) THEN 'es'
                  ELSE 'zh' END AS guess
      FROM scores
    )
    SELECT lang, guess, count(*) AS n
    FROM guessed GROUP BY lang, guess
    """,
)
def q_text_langid(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID heuristic (marker-lexicon argmax) vs the labeled
    lang column — confusion-matrix style output."""
    return (
        table(spark, sf, "documents")
        .select("lang", TXT.lang_guess(F.col("text")).alias("guess"))
        .groupBy("lang", "guess")
        .agg(F.count("*").alias("n"))
    )


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string(list_sort({SQL_DTOKENS}), ' ')) AS set_fp,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS exact_fp
    FROM documents WHERE doc_id < 100
    """,
)
def q_text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprinting: order-insensitive token-set md5 +
    normalized exact md5."""
    t = F.col("text")
    return (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            TXT.fingerprint(t).alias("set_fp"),
            TXT.exact_fingerprint(t).alias("exact_fp"),
        )
    )


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_DTOKENS}) AS token FROM documents
    ),
    n_docs AS (SELECT count(*) AS n FROM documents),
    df AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
    tf AS (
      SELECT t.doc_id, t.token, count(*) AS tf
      FROM (SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents) t
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ROUND(tf.tf * ln((SELECT n FROM n_docs) * 1.0 / df.df), 6) AS tfidf
      FROM tf JOIN df USING (token)
    )
    SELECT doc_id, token, tfidf, rnk FROM (
      SELECT doc_id, token, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
      FROM scored
    ) WHERE rnk <= 3 AND doc_id < 50
    """,
)
def q_text_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    """TF-IDF with per-doc top-3 terms — the classic corpus-weighting
    op.  Scale: document frequency is one groupBy over the token
    explode; tf⋈df rides the token shuffle UNHINTED — the df table is
    the corpus *vocabulary*, which at 100 TB is billions of terms, so
    an unconditional broadcast (the previous shape) would OOM; AQE
    still broadcasts it at validation SFs where it is genuinely
    small.  The corpus doc count is a 1-row broadcast scalar joined
    into the dataflow, not a driver-side .count() action at
    plan-build time (which forced an extra eager corpus scan per
    query construction).  The top-k is a WindowGroupLimit, not a
    global sort."""
    from pyspark.sql import Window as W

    docs = table(spark, sf, "documents")
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    from ..functions import explode_tokens

    all_tok = explode_tokens(docs, TXT.tokens(F.col("text")), "token", "doc_id")
    tf = all_tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = (
        explode_tokens(
            docs, F.array_distinct(TXT.tokens(F.col("text"))), "token", "doc_id"
        )
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") < 50))
        .select("doc_id", "token", "tfidf", "rnk")
    )


@query(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE {_SQL_MINHASH_CTES},
    sym AS (
      SELECT a AS x, b AS y FROM mh_pairs
      UNION SELECT b, a FROM mh_pairs
    ),
    reach(x, y) AS (
      SELECT DISTINCT x, x FROM sym
      UNION
      SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x
    )
    SELECT x AS doc_id, MIN(y) AS component FROM reach GROUP BY x
    """,
)
def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup CLUSTERS via connected components over the LSH pair
    graph (iterative smallest-id label propagation — the 'one
    representative per duplicate cluster' op a training-data pipeline
    actually runs).  The Spark side iterates to a fixpoint; the oracle
    reaches the same fixpoint with a recursive-CTE transitive closure
    (min reachable id), so even this iterative operator is
    hash-checked.  Scale: label propagation converges in O(cluster
    diameter) joins; near-dup clusters are shallow (diameter ≤ ~3) in
    practice.  (The closure oracle is oracle-side only — quadratic in
    cluster size, fine at validation SFs.)"""
    from ..operators.dedup import connected_components, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(table(spark, sf, "documents"), threshold=0.5)
    return connected_components(pairs.select("a", "b"))


@query(
    "dedup_corpus_keep_set",
    oracle=f"""
    WITH RECURSIVE
    fpt AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    erep AS (SELECT fp, MIN(doc_id) AS rep FROM fpt GROUP BY fp),
    eassign AS (SELECT f.doc_id, r.rep FROM fpt f JOIN erep r ON f.fp = r.fp),
    survivors AS (
      SELECT d.doc_id, d.text FROM documents d
      JOIN eassign e ON d.doc_id = e.doc_id
      WHERE e.doc_id = e.rep
    ),
    {_sql_minhash_ctes("survivors")},
    sym AS (
      SELECT a AS x, b AS y FROM mh_pairs
      UNION SELECT b, a FROM mh_pairs
    ),
    reach(x, y) AS (
      SELECT DISTINCT x, x FROM sym
      UNION
      SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x
    ),
    comp AS (SELECT x AS doc_id, MIN(y) AS component FROM reach GROUP BY x)
    SELECT e.doc_id,
           CASE WHEN e.doc_id != e.rep THEN FALSE
                WHEN c.component IS NOT NULL AND c.component < e.doc_id THEN FALSE
                ELSE TRUE END AS kept,
           CASE WHEN e.doc_id != e.rep THEN 'exact_dup'
                WHEN c.component IS NOT NULL AND c.component < e.doc_id THEN 'near_dup'
                ELSE 'kept' END AS reason,
           CASE WHEN e.doc_id != e.rep THEN e.rep
                WHEN c.component IS NOT NULL AND c.component < e.doc_id THEN c.component
                ELSE e.doc_id END AS rep
    FROM eassign e LEFT JOIN comp c ON e.doc_id = c.doc_id
    """,
)
def q_dedup_corpus_keep_set(spark: SparkSession, sf: str) -> DataFrame:
    """The pipeline deliverable: 'write the deduped corpus'.  One
    decision row per doc — exact-dup removal (min doc_id per
    normalized-content fingerprint) then near-dup cluster
    representative selection over the exact survivors (MinHash-LSH
    pairs → connected components → min id per component).  The oracle
    reproduces both stages, including the recursive-CTE closure, so
    the full keep/drop decision is hash-checked.  Scale: see
    operators/dedup.py:corpus_keep_set — fingerprint shuffle + banded
    LSH + label propagation; never quadratic."""
    return DD.corpus_keep_set(table(spark, sf, "documents"), threshold=0.5)


@query(
    "text_token_budget",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(SUM(len({SQL_TOKENS})) AS BIGINT) AS whitespace_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))) AS BIGINT) AS bpe_pretokens,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY source
    """,
)
def q_text_token_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus token budget per source: whitespace tokens vs BPE-ish
    pretokens vs chars — the sizing query every training-data pipeline
    runs first.  Scale: pure scan + map + tiny agg."""
    return (
        table(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(TXT.token_count(F.col("text"))).alias("whitespace_tokens"),
            F.sum(TXT.bpe_pretoken_count(F.col("text"))).alias("bpe_pretokens"),
            F.sum("n_chars").alias("chars"),
        )
    )


@query("similarity_ann_ivf", oracle=ANN.ivf_oracle)
def q_similarity_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-flat ANN (k-means cells + n_probe nearest-cell search +
    exact rerank) — the scale path when the corpus is stored bucketed
    by cell.  Recall vs brute force stays pytest-asserted; the
    implementation is hash-checked since r9 against a generated
    oracle that trains the same deterministic centroids and replays
    cell routing + rerank in DuckDB (plans/ann_oracles.py)."""
    emb = table(spark, sf, "embeddings")
    return SIM.cosine_topk_ivf(
        emb, emb.filter(F.col("vec_id") < 8), k=5
    ).withColumn("rank", F.col("rank").cast("long"))


# --- PII scrubbing & deterministic sampling -----------------------------------
# The synthetic documents carry no natural PII, so the scrub query
# *injects* deterministic PII derived from doc_id — identically in
# both engines — then redacts it; the md5 of the scrubbed text is the
# hash-checked evidence that every replacement came out byte-equal.

_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
_PII_PHONE = "\\+?[0-9][0-9 ()-]{6,}[0-9]"


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com from 10.1.'
                  || CAST(doc_id % 200 AS VARCHAR)
                  || '.7 call +1 555 010 ' || CAST(doc_id AS VARCHAR) AS t
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_email,
           len(regexp_extract_all(t, '{_PII_IPV4}')) AS n_ipv4,
           len(regexp_extract_all(t, '{_PII_PHONE}')) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IPV4}', '<IP>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g')) AS scrub_fp
    FROM aug
    """,
)
def q_text_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction over the corpus: count and replace emails, IPv4
    addresses and phone-like runs (functions.text.scrub_pii).
    Scale: a regexp_replace chain in whole-stage codegen — map-only
    over the scan, no shuffle, no Python; the category counts are
    regexp_count on the same pass."""
    docs = table(spark, sf, "documents").filter(F.col("doc_id") < 300)
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.1."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".7 call +1 555 010 "),
        F.col("doc_id").cast("string"),
    )
    counts = TXT.pii_counts(aug)
    return docs.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phone"),
        F.md5(TXT.scrub_pii(aug)).alias("scrub_fp"),
    )


@query(
    "docs_hash_sample",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
    """,
)
def q_docs_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 10% Bernoulli-by-hash sample (operators.
    sampling.hash_sample): keep rows whose md5(doc_id) hex prefix
    sorts under the fraction threshold.
    Scale: a pure scan filter — no shuffle, no state, reproducible
    across runs/partitionings/engines; THE way to cut a stable
    dev-subset out of a 100 TB corpus."""
    from ..operators.sampling import hash_sample

    docs = table(spark, sf, "documents").select("doc_id", "lang", "source")
    return hash_sample(docs, "doc_id", 0.1)


@query(
    "docs_stratified_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n_stratum
      FROM documents
    )
    SELECT doc_id, lang, n_chars, rn, n_stratum FROM ranked
    WHERE rn <= CAST(ceil(0.1 * n_stratum) AS BIGINT)
    """,
)
def q_docs_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 10%-per-language sample (operators.sampling.
    stratified_sample_exact): rank within each stratum by content
    hash, keep the first ceil(0.1·n).
    Scale: one shuffle on the strata key (the window); selection is
    hash-ordered so it's deterministic and engine-independent —
    used when language-balance quotas must be exact, vs the
    shuffle-free expectation-only hash_sample."""
    from ..operators.sampling import stratified_sample_exact

    docs = table(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    return stratified_sample_exact(docs, ["lang"], 0.1, "doc_id")


# --- benchmark contamination ---------------------------------------------------


def _sql_shingles_k(k: int) -> str:
    """DuckDB twin of dedup.doc_shingle_arrays for arbitrary k."""
    joined = " || ' ' || ".join(f"{SQL_TOKENS}[i+{j}]" for j in range(k))
    return f"""list_distinct(
      CASE WHEN len({SQL_TOKENS}) >= {k}
           THEN list_transform(range(1, len({SQL_TOKENS}) - {k - 2}),
                i -> {joined.replace(f'{SQL_TOKENS}[i+0]', f'{SQL_TOKENS}[i]')})
           ELSE [array_to_string({SQL_TOKENS}, ' ')] END)"""


@query(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH sh AS MATERIALIZED (
      -- tokenize/shingle each doc exactly ONCE; without MATERIALIZED
      -- DuckDB inlines this CTE into its three consumers and the
      -- 5-shingle construction (a ~15x-repeated regex split) ran
      -- 768 s at the 10x SF -- vs seconds shared
      SELECT doc_id, source, {_sql_shingles_k(5)} AS shingles
      FROM documents
    ),
    btok AS (
      SELECT DISTINCT unnest(shingles) AS shingle, doc_id AS bench_id
      FROM sh WHERE source = 'src0'
    ),
    ctok AS (
      SELECT doc_id, unnest(shingles) AS shingle
      FROM sh WHERE source <> 'src0'
    ),
    sizes AS (
      SELECT doc_id, len(shingles) AS sz
      FROM sh WHERE source <> 'src0'
    ),
    hits AS (
      SELECT c.doc_id,
             count(DISTINCT c.shingle) AS n_hit_shingles,
             count(DISTINCT b.bench_id) AS n_bench_docs
      FROM ctok c JOIN btok b USING (shingle)
      GROUP BY c.doc_id
    )
    SELECT h.doc_id, h.n_hit_shingles, h.n_bench_docs,
           ROUND(h.n_hit_shingles * 1.0 / s.sz, 6) AS contamination
    FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination (operators.contamination): corpus
    docs (source <> 'src0') sharing any distinct 5-word shingle with
    the benchmark set (source = 'src0'), with overlap counts and the
    contaminated-shingle fraction.
    Scale: benchmark shingles broadcast (eval sets are MBs vs a
    corpus of TBs); corpus side is a map-only shingle explode +
    BroadcastHashJoin, then one exchange for the per-doc aggregate —
    never all-pairs."""
    from ..operators.contamination import ngram_contamination

    docs = table(spark, sf, "documents")
    return ngram_contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        k=5,
    )


# --- Gopher-style rule filtering, repetition, sequence packing ----------------
# Three more training-data-pipeline staples over `documents`: rule-based
# quality filtering (Gopher/C4 motif), intra-document repetition
# detection (the "top bigram dominates the text" signal), and greedy
# sequence packing (concat-and-chunk batching by token budget).


@query(
    "docs_gopher_quality_filter",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, source,
             len({SQL_TOKENS}) AS wc,
             ROUND(list_sum(list_transform({SQL_TOKENS}, t -> CAST(length(t) AS DOUBLE)))
                   / NULLIF(len({SQL_TOKENS}), 0), 4) AS atl,
             ROUND(len(list_filter({SQL_TOKENS},
                   t -> list_contains(['the','a','an','of','and','to','in','is','on','for'], t))) * 1.0
                   / NULLIF(len({SQL_TOKENS}), 0), 6) AS sw
      FROM documents),
    flags AS (
      SELECT source,
             (wc BETWEEN 25 AND 80) AS wc_ok,
             (atl BETWEEN 3.0 AND 10.0) AS mwl_ok,
             (sw >= 0.03) AS sw_ok
      FROM feats)
    SELECT source,
           count(*) AS n_docs,
           CAST(SUM(CASE WHEN wc_ok AND mwl_ok AND sw_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN NOT wc_ok THEN 1 ELSE 0 END) AS BIGINT) AS fail_wordcount,
           CAST(SUM(CASE WHEN NOT mwl_ok THEN 1 ELSE 0 END) AS BIGINT) AS fail_wordlen,
           CAST(SUM(CASE WHEN NOT sw_ok THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopword
    FROM flags GROUP BY source
    """,
)
def q_gopher_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style rule-based quality filter (word-count band,
    mean-word-length band, minimum stopword mass) with a per-source
    keep/fail breakdown — the first gate of an LLM corpus pipeline.
    Scale: pure scan + map (all rules are JVM expressions over the
    token array) + one tiny agg exchange on source; at 100 TB this is
    embarrassingly parallel and the real output is the filtered
    corpus write (`.filter(keep)`), which shares the same plan."""
    docs = table(spark, sf, "documents")
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    # struct projected once (tokens bound once), fields selected above
    g = docs.select("source", TXT.gopher_flags_struct(F.col("text")).alias("gf"))
    return (
        g.select(
            "source",
            (F.col("gf.wc_ok") & F.col("gf.mwl_ok") & F.col("gf.sw_ok")).alias("keep"),
            F.col("gf.wc_ok").alias("wc_ok"),
            F.col("gf.mwl_ok").alias("mwl_ok"),
            F.col("gf.sw_ok").alias("sw_ok"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            one_if(F.col("keep")).alias("n_kept"),
            one_if(~F.col("wc_ok")).alias("fail_wordcount"),
            one_if(~F.col("mwl_ok")).alias("fail_wordlen"),
            one_if(~F.col("sw_ok")).alias("fail_stopword"),
        )
    )


@query(
    "text_repetition_topgram",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {SQL_TOKENS} AS toks FROM documents),
    b AS (
      SELECT doc_id, source,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS bg
      FROM t),
    c AS (SELECT doc_id, source, bg, count(*) AS n FROM b GROUP BY 1, 2, 3),
    m AS (
      SELECT doc_id, source,
             ROUND(max(n) * 1.0 / sum(n), 6) AS top_bigram_frac
      FROM c GROUP BY 1, 2)
    SELECT source,
           count(*) AS n_docs,
           CAST(SUM(CASE WHEN top_bigram_frac >= 0.08 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repetitive,
           ROUND(AVG(top_bigram_frac), 4) AS avg_top_bigram_frac
    FROM m GROUP BY source
    """,
)
def q_repetition_topgram(spark: SparkSession, sf: str) -> DataFrame:
    """Intra-document repetition: the fraction of a document's bigrams
    taken by its single most frequent bigram (Gopher's duplicated-
    n-gram rule family); documents above 8% are flagged repetitive.
    Scale: bigrams explode map-side from the token array (no join);
    ONE shuffle on (doc_id, bigram) for the counts, then the per-doc
    max/sum re-partitions by doc_id — both exchanges are partial-
    aggregated.  The per-doc fraction is rounded before the per-source
    AVG so the only order-dependent float sum works on values exact at
    6 decimals."""
    from ..functions import explode_tokens

    docs = table(spark, sf, "documents")
    bg = explode_tokens(docs, TXT.bigrams(F.col("text")), "bg", "doc_id", "source")
    per_doc = (
        bg.groupBy("doc_id", "source", "bg")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id", "source")
        .agg(
            F.round(F.max("n") * 1.0 / F.sum("n"), 6).alias("top_bigram_frac")
        )
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("top_bigram_frac") >= 0.08, 1).otherwise(0))
        .cast("bigint")
        .alias("n_repetitive"),
        F.round(F.avg("top_bigram_frac"), 4).alias("avg_top_bigram_frac"),
    )


@query(
    "docs_pack_sequences",
    oracle=f"""
    WITH wc AS (
      SELECT doc_id, source, len({SQL_TOKENS}) AS n_tok FROM documents),
    packed AS (
      SELECT source, n_tok,
             CAST((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tok) // 256
                  AS BIGINT) AS seq_id
      FROM wc)
    SELECT source,
           CAST(MAX(seq_id) + 1 AS BIGINT) AS n_sequences,
           count(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(n_tok) AS DOUBLE) / ((MAX(seq_id) + 1) * 256.0), 4)
               AS fill_ratio
    FROM packed GROUP BY source
    """,
)
def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy sequence packing (concat-and-chunk): documents are laid
    end-to-end per source shard in doc_id order and cut into
    256-token training sequences; a document's sequence is where its
    first token lands.  Reports sequences, docs, tokens and fill
    ratio per source.  Scale: ONE shuffle (the window's partition on
    source); at 100 TB the shard key would be (source, shard_id) so
    each window partition stays executor-sized — the cumulative-sum
    assignment itself is a single ordered pass per partition,
    exactly how a streaming packer would run."""
    docs = table(spark, sf, "documents")
    wc = docs.select(
        "doc_id", "source", TXT.token_count(F.col("text")).alias("n_tok")
    )
    win = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    packed = (
        wc.withColumn("cum", F.sum("n_tok").over(win))
        .withColumn("seq_id", F.expr("(cum - n_tok) div 256"))
    )
    return packed.groupBy("source").agg(
        (F.max("seq_id") + 1).cast("bigint").alias("n_sequences"),
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("n_tok").cast("double") / ((F.max("seq_id") + 1) * 256.0), 4
        ).alias("fill_ratio"),
    )


@query(
    "docs_mixture_weights",
    oracle=f"""
    WITH per_src AS (
      SELECT source, CAST(SUM(len({SQL_TOKENS})) AS BIGINT) AS tokens
      FROM documents GROUP BY source),
    tot AS (
      SELECT SUM(sqrt(CAST(tokens AS DOUBLE))) AS z,
             SUM(tokens) AS corpus_tokens
      FROM per_src)
    SELECT source, tokens,
           ROUND(sqrt(CAST(tokens AS DOUBLE)) / z, 6) AS target_share,
           ROUND(LEAST(1.0, (sqrt(CAST(tokens AS DOUBLE)) / z)
                            * (0.5 * corpus_tokens) / tokens), 6) AS sample_rate
    FROM per_src, tot
    ORDER BY source
    """,
)
def q_mixture_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus mixture re-weighting: per-source sampling rates that
    steer a 50%-of-corpus token budget toward sqrt-of-size target
    shares (the square-root tempering used to keep small sources
    from vanishing in LLM mixtures).  Scale: one agg shuffle to
    per-source totals (20 rows), the normalizer is a 1-row broadcast;
    the rates then drive a map-only Bernoulli filter over the corpus
    (see docs_hash_sample for the deterministic sampler)."""
    per_src = (
        table(spark, sf, "documents")
        .groupBy("source")
        .agg(F.sum(TXT.token_count(F.col("text"))).cast("bigint").alias("tokens"))
    )
    tot = per_src.agg(
        F.sum(F.sqrt(F.col("tokens").cast("double"))).alias("z"),
        F.sum("tokens").alias("corpus_tokens"),
    )
    share = F.sqrt(F.col("tokens").cast("double")) / F.col("z")
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "tokens",
            F.round(share, 6).alias("target_share"),
            F.round(
                F.least(
                    F.lit(1.0),
                    share * (0.5 * F.col("corpus_tokens")) / F.col("tokens"),
                ),
                6,
            ).alias("sample_rate"),
        )
        .orderBy("source")
    )


@query(
    "dedup_incremental",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents),
    existing AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0),
    incoming AS (SELECT * FROM fp WHERE doc_id % 2 = 1)
    SELECT source,
           count(*) AS n_incoming,
           CAST(SUM(CASE WHEN e.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN e.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_of_existing
    FROM incoming i LEFT JOIN existing e ON i.fp = e.fp
    GROUP BY source ORDER BY source
    """,
)
def q_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental (snapshot-delta) dedup: an incoming batch checked
    against the existing corpus's fingerprint set (even doc_ids stand
    in for the existing snapshot, odd for the delta).  Scale: the
    existing side is ONLY distinct 128-bit fingerprints — at 100 TB
    that set lives as a bucketed fingerprint table so the probe is a
    co-located join; here AQE broadcasts it.  The left join (not
    anti) keeps both verdict counts in one pass."""
    fp = table(spark, sf, "documents").select(
        "doc_id", "source", TXT.exact_fingerprint(F.col("text")).alias("fp")
    )
    existing = fp.filter(F.col("doc_id") % 2 == 0).select("fp").distinct()
    incoming = fp.filter(F.col("doc_id") % 2 == 1)
    return (
        incoming.join(
            existing.withColumnRenamed("fp", "efp"),
            incoming.fp == F.col("efp"),
            "left_outer",
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_incoming"),
            F.sum(F.when(F.col("efp").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
            F.sum(F.when(F.col("efp").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_of_existing"),
        )
        .orderBy("source")
    )


@query(
    "dedup_incremental_epochs",
    oracle="""
    WITH fp AS (
      SELECT doc_id, doc_id % 3 AS epoch,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents),
    first_epoch AS (
      SELECT fp, MIN(epoch) AS epoch FROM fp GROUP BY fp),
    rep AS (
      SELECT f.fp, f.epoch, MIN(p.doc_id) AS rep_id
      FROM first_epoch f JOIN fp p ON p.fp = f.fp AND p.epoch = f.epoch
      GROUP BY f.fp, f.epoch)
    SELECT epoch, COUNT(*) AS n_kept,
           CAST(SUM(rep_id) AS BIGINT) AS kept_id_sum
    FROM rep GROUP BY epoch ORDER BY epoch
    """,
)
def q_dedup_incremental_epochs(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-run incremental dedup driven over three corpus waves —
    the SAME ``incremental_dedup_step`` the streaming foreachBatch
    sink runs (streaming/stream.py), exercised batch-side so the
    driver can hash-check its epoch semantics: each wave anti-joins a
    durable fingerprint snapshot of strictly-earlier waves and
    commits its survivors.  The oracle restates the contract
    declaratively: a doc survives iff its fingerprint first appears
    in its wave and it is the min doc_id within that (fp, wave).
    Scale: the snapshot is only distinct 128-bit fingerprints; the
    per-wave probe is one anti-join (bucketed store at 100 TB)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..streaming.stream import incremental_dedup_step

    docs = table(spark, sf, "documents").select("doc_id", "text")
    # deterministic snapshot dir keyed by the source dataset, wiped at
    # the start of each invocation: the returned DataFrame's lineage
    # reads the snapshot parquet, so it cannot be deleted on exit —
    # but an unkeyed mkdtemp per run leaked one full fingerprint
    # snapshot per gate/audit/probe invocation; keyed-and-overwritten,
    # tmp holds at most one snapshot per dataset
    key = hashlib.md5(os.path.abspath(sf).encode()).hexdigest()[:12]
    snap = os.path.join(tempfile.gettempdir(), f"incdedup_q_{key}")
    shutil.rmtree(snap, ignore_errors=True)
    os.makedirs(snap, exist_ok=True)
    waves = []
    for epoch in range(3):
        kept = incremental_dedup_step(
            docs.filter(F.col("doc_id") % 3 == epoch), epoch, snap
        )
        kept.unpersist()  # materialized by the snapshot write; keep lineage
        waves.append(
            kept.select(F.lit(epoch).cast("bigint").alias("epoch"), "doc_id")
        )
    return (
        waves[0]
        .unionByName(waves[1])
        .unionByName(waves[2])
        .groupBy("epoch")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("kept_id_sum"),
        )
        .orderBy("epoch")
    )


# --- the end-to-end corpus build ----------------------------------------------
# Every pipeline stage above, composed in execution order over one
# corpus pass-through: Gopher rules → PII scrub → exact dedup →
# near-dup keep set → sequence packing.  The oracle chains the same
# stages' SQL twins (including the recursive-CTE component closure),
# so the WHOLE pipeline's per-source outcome is hash-checked — not
# just each stage in isolation.

_SQL_SCRUB = (
    "regexp_replace(regexp_replace(regexp_replace(text, "
    f"'{_PII_EMAIL}', '<EMAIL>', 'g'), "
    f"'{_PII_IPV4}', '<IP>', 'g'), "
    f"'{_PII_PHONE}', '<PHONE>', 'g')"
)


@query(
    "corpus_build_stats",
    oracle=f"""
    WITH RECURSIVE
    feats AS (
      SELECT doc_id, source, text,
             len({SQL_TOKENS}) AS wc,
             ROUND(list_sum(list_transform({SQL_TOKENS}, t -> CAST(length(t) AS DOUBLE)))
                   / NULLIF(len({SQL_TOKENS}), 0), 4) AS atl,
             ROUND(len(list_filter({SQL_TOKENS},
                   t -> list_contains(['the','a','an','of','and','to','in','is','on','for'], t))) * 1.0
                   / NULLIF(len({SQL_TOKENS}), 0), 6) AS sw
      FROM documents),
    rules AS (
      SELECT doc_id, source, {_SQL_SCRUB} AS text
      FROM feats
      WHERE (wc BETWEEN 25 AND 80) AND (atl BETWEEN 3.0 AND 10.0) AND (sw >= 0.03)),
    fpt AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM rules),
    erep AS (SELECT fp, MIN(doc_id) AS rep FROM fpt GROUP BY fp),
    eassign AS (SELECT f.doc_id, r.rep FROM fpt f JOIN erep r ON f.fp = r.fp),
    survivors AS (
      SELECT r.doc_id, r.source, r.text FROM rules r
      JOIN eassign e ON r.doc_id = e.doc_id
      WHERE e.doc_id = e.rep),
    {_sql_minhash_ctes("survivors")},
    sym AS (
      SELECT a AS x, b AS y FROM mh_pairs
      UNION SELECT b, a FROM mh_pairs),
    reach(x, y) AS (
      SELECT DISTINCT x, x FROM sym
      UNION
      SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x),
    comp AS (SELECT x AS doc_id, MIN(y) AS component FROM reach GROUP BY x),
    final AS (
      SELECT s.doc_id, s.source, s.text
      FROM survivors s LEFT JOIN comp c ON s.doc_id = c.doc_id
      WHERE c.component IS NULL OR c.component >= s.doc_id),
    packed AS (
      SELECT source,
             len({SQL_TOKENS}) AS n_tok,
             CAST((SUM(len({SQL_TOKENS})) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - len({SQL_TOKENS})) // 256
                  AS BIGINT) AS seq_id
      FROM final),
    raw_n AS (SELECT source, count(*) AS n_raw FROM documents GROUP BY source),
    rules_n AS (SELECT source, count(*) AS n FROM rules GROUP BY source),
    surv_n AS (SELECT source, count(*) AS n FROM survivors GROUP BY source),
    pack_n AS (
      SELECT source, count(*) AS n_final,
             CAST(MAX(seq_id) + 1 AS BIGINT) AS n_sequences,
             CAST(SUM(n_tok) AS BIGINT) AS total_tokens
      FROM packed GROUP BY source)
    SELECT raw_n.source AS source,
           n_raw,
           CAST(COALESCE(rules_n.n, 0) AS BIGINT) AS n_rules_kept,
           CAST(COALESCE(surv_n.n, 0) AS BIGINT) AS n_exact_survivors,
           CAST(COALESCE(pack_n.n_final, 0) AS BIGINT) AS n_final,
           CAST(COALESCE(pack_n.n_sequences, 0) AS BIGINT) AS n_sequences,
           CAST(COALESCE(pack_n.total_tokens, 0) AS BIGINT) AS total_tokens
    FROM raw_n
    LEFT JOIN rules_n ON raw_n.source = rules_n.source
    LEFT JOIN surv_n  ON raw_n.source = surv_n.source
    LEFT JOIN pack_n  ON raw_n.source = pack_n.source
    ORDER BY source
    """,
)
def q_corpus_build_stats(spark: SparkSession, sf: str) -> DataFrame:
    """The whole training-corpus build as ONE dataflow: Gopher-rule
    filtering → PII scrub → exact dedup → MinHash-LSH near-dup keep
    set → 256-token sequence packing, reporting per-source survivors
    at every stage.  Scale: the stages compose without a collect —
    rules+scrub are map-only over the scan, dedup is the banded-LSH
    chain (never quadratic), packing is one window; at 100 TB this
    is the job you actually run, and the per-stage counts are the
    monitoring you actually ship."""
    from pyspark import StorageLevel

    from ..operators.cache import propagate_persisted, register_persisted

    docs = table(spark, sf, "documents")
    # rules feeds four consumers (fingerprints, shingles, the final
    # join, the stage counts) — persist so the corpus is scanned and
    # rule-scored once, not once per consumer.  gopher_keep = ONE
    # boolean (tokens bound once inside), so pushdown can't re-expand
    # the rule terms.
    rules = (
        docs.filter(TXT.gopher_keep(F.col("text")))
        .select("doc_id", "source", TXT.scrub_pii(F.col("text")).alias("text"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    decisions = DD.corpus_keep_set(rules, threshold=0.5)
    d2 = decisions.join(rules.select("doc_id", "source"), "doc_id")
    finals = (
        d2.filter(F.col("kept"))
        .join(rules, "doc_id")
        .select("doc_id", d2["source"], TXT.token_count(F.col("text")).alias("n_tok"))
    )
    win = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    packed = finals.withColumn("cum", F.sum("n_tok").over(win)).withColumn(
        "seq_id", F.expr("(cum - n_tok) div 256")
    )
    raw_n = docs.groupBy("source").agg(F.count("*").alias("n_raw"))
    rules_n = rules.groupBy("source").agg(F.count("*").alias("rn"))
    surv_n = (
        d2.filter(F.col("reason") != "exact_dup")
        .groupBy("source")
        .agg(F.count("*").alias("sn"))
    )
    pack_n = packed.groupBy("source").agg(
        F.count("*").alias("fn"),
        (F.max("seq_id") + 1).cast("bigint").alias("ns"),
        F.sum("n_tok").cast("bigint").alias("tt"),
    )
    z = F.lit(0).cast("bigint")
    result = (
        raw_n.join(rules_n, "source", "left_outer")
        .join(surv_n, "source", "left_outer")
        .join(pack_n, "source", "left_outer")
        .select(
            "source",
            "n_raw",
            F.coalesce(F.col("rn").cast("bigint"), z).alias("n_rules_kept"),
            F.coalesce(F.col("sn").cast("bigint"), z).alias("n_exact_survivors"),
            F.coalesce(F.col("fn").cast("bigint"), z).alias("n_final"),
            F.coalesce(F.col("ns"), z).alias("n_sequences"),
            F.coalesce(F.col("tt"), z).alias("total_tokens"),
        )
        .orderBy("source")
    )
    # propagate release handles: ours + whatever the dedup chain
    # registered on its (discarded) decisions frame — BOTH kinds
    # (persisted caches AND localCheckpoint blocks)
    return register_persisted(propagate_persisted(result, decisions), rules)


@query(
    "corpus_shard_manifest",
    oracle="""
    WITH sharded AS (
      SELECT doc_id, text,
             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                       AS BIGINT) % 8 AS INT) AS shard
      FROM documents)
    SELECT shard,
           count(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars,
           bit_xor(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT))
               AS content_digest
    FROM sharded GROUP BY shard ORDER BY shard
    """,
)
def q_corpus_shard_manifest(spark: SparkSession, sf: str) -> DataFrame:
    """Shard membership + reproducibility manifest for the corpus
    writer (operators/shards.py): deterministic md5-mod shard
    assignment and an order-insensitive XOR content digest per shard
    — two builds of the same corpus compare manifest-to-manifest.
    Scale: one exchange on shard (8-way here); the digest is a
    map-side-combinable aggregate."""
    from ..operators.shards import assign_shards, shard_manifest

    return shard_manifest(assign_shards(table(spark, sf, "documents"), 8))


@query(
    "text_char_ngram_dup_rate",
    oracle="""
    WITH grams AS (
      SELECT DISTINCT doc_id, source, gram FROM (
        SELECT doc_id, source,
               unnest(list_transform(
                 generate_series(1, greatest(length(text) - 19, 1), 10),
                 i -> substr(text, i, 20))) AS gram
        FROM documents)),
    dup AS (
      SELECT gram FROM grams GROUP BY gram
      HAVING count(DISTINCT doc_id) > 1)
    SELECT g.source AS source,
           count(DISTINCT g.gram) AS n_grams,
           count(DISTINCT CASE WHEN d.gram IS NOT NULL THEN g.gram END)
               AS n_dup_grams,
           ROUND(count(DISTINCT CASE WHEN d.gram IS NOT NULL THEN g.gram END) * 1.0
                 / count(DISTINCT g.gram), 6) AS dup_rate
    FROM grams g LEFT JOIN dup d ON g.gram = d.gram
    GROUP BY g.source ORDER BY g.source
    """,
)
def q_char_ngram_dup_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Exact substring-level duplication: strided char-20-grams per
    doc, a gram is 'duplicated' when it appears in >1 distinct
    document; per-source duplicated-gram rate.  The character-grain
    twin of the word-shingle near-dup family (the substring-dedup
    motif for catching templated boilerplate word-level shingles
    miss).  Scale: grams explode map-side with stride 10 bounding
    volume at ~len/10 per doc; one exchange on gram for the
    cross-doc count, one on (source, gram) for the rate —
    at 100 TB the gram set is the classic candidate for a
    frequency-threshold prefilter before the distinct."""
    docs = table(spark, sf, "documents")
    from ..functions import explode_tokens

    grams = explode_tokens(
        docs,
        F.expr(
            "transform(sequence(1, greatest(length(text) - 19, 1), 10),"
            " i -> substr(text, i, 20))"
        ),
        "gram",
        "doc_id",
        "source",
    ).distinct()
    dup = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gram")
    )
    marked = grams.join(
        dup.withColumnRenamed("gram", "dgram"),
        grams.gram == F.col("dgram"),
        "left_outer",
    )
    return (
        marked.groupBy("source")
        .agg(
            F.countDistinct("gram").alias("n_grams"),
            F.countDistinct(
                F.when(F.col("dgram").isNotNull(), F.col("gram"))
            ).alias("n_dup_grams"),
            F.round(
                F.countDistinct(F.when(F.col("dgram").isNotNull(), F.col("gram")))
                * 1.0
                / F.countDistinct("gram"),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@query(
    "docs_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE
    fpt AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    erep AS (SELECT fp, MIN(doc_id) AS rep FROM fpt GROUP BY fp),
    eassign AS (SELECT f.doc_id, r.rep FROM fpt f JOIN erep r ON f.fp = r.fp),
    survivors AS (
      SELECT d.doc_id, d.text FROM documents d
      JOIN eassign e ON d.doc_id = e.doc_id
      WHERE e.doc_id = e.rep
    ),
    {_sql_minhash_ctes("survivors")},
    sym AS (
      SELECT a AS x, b AS y FROM mh_pairs
      UNION SELECT b, a FROM mh_pairs
    ),
    reach(x, y) AS (
      SELECT DISTINCT x, x FROM sym
      UNION
      SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x
    ),
    comp AS (SELECT x AS doc_id, MIN(y) AS component FROM reach GROUP BY x),
    cluster AS (
      -- every doc's ultimate cluster id: exact-dup rep, then that
      -- rep's near-dup component min (exact dups of a near-dup member
      -- follow their rep's component)
      SELECT e.doc_id,
             COALESCE(LEAST(c.component, e.rep), e.rep) AS cluster_id
      FROM eassign e LEFT JOIN comp c ON e.rep = c.doc_id),
    sided AS (
      SELECT d.source, cl.cluster_id,
             CASE WHEN substr(md5(CAST(cl.cluster_id AS VARCHAR)), 1, 8)
                       < '40000000'
                  THEN 'eval' ELSE 'train' END AS side
      FROM documents d JOIN cluster cl ON d.doc_id = cl.doc_id)
    SELECT source, side,
           count(*) AS n_docs,
           count(DISTINCT cluster_id) AS n_clusters
    FROM sided GROUP BY source, side ORDER BY source, side
    """,
)
def q_leakage_safe_split(spark: SparkSession, sf: str) -> DataFrame:
    """Train/eval split that cannot leak near-duplicates across the
    boundary: the split hash is taken on the doc's dup-CLUSTER id
    (exact-dup representative, then its near-dup component), so every
    member of a cluster lands on the same side — the contamination
    control a naive per-doc split lacks.  ~25% of clusters go to
    eval (deterministic md5-prefix threshold, engine-identical).
    Scale: reuses the corpus keep-set chain (banded LSH + label
    propagation — never quadratic); the split itself is a map over
    the decision table."""
    docs = table(spark, sf, "documents")
    decisions = DD.corpus_keep_set(docs, threshold=0.5)
    # decisions.rep is the exact-dup rep for exact dups, the near-dup
    # component min for near-dup members, self for kept docs — but an
    # exact dup of a near-dup member must follow its rep's component:
    reps = decisions.select(
        F.col("doc_id").alias("r_doc"), F.col("rep").alias("r_rep")
    )
    cluster = (
        decisions.join(reps, decisions.rep == F.col("r_doc"), "left_outer")
        .select(
            "doc_id",
            F.least(
                F.coalesce(F.col("r_rep"), F.col("rep")), F.col("rep")
            ).alias("cluster_id"),
        )
    )
    from ..operators.cache import propagate_persisted

    side = F.when(
        F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 8) < "40000000",
        "eval",
    ).otherwise("train")
    result = (
        docs.select("doc_id", "source")
        .join(cluster, "doc_id")
        .select("source", "cluster_id", side.alias("side"))
        .groupBy("source", "side")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
        .orderBy("source", "side")
    )
    return propagate_persisted(result, decisions)


@query(
    "text_unigram_logprob",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, unnest({SQL_TOKENS}) AS token FROM documents),
    freq AS (
      SELECT token, count(*) AS n FROM tok GROUP BY token),
    tot AS (SELECT SUM(n) AS total FROM freq),
    scored AS (
      SELECT t.doc_id, t.source,
             ROUND(AVG(-ln(f.n * 1.0 / tot.total)), 4) AS nll
      FROM tok t JOIN freq f ON t.token = f.token, tot
      GROUP BY t.doc_id, t.source)
    SELECT source,
           count(*) AS n_docs,
           ROUND(AVG(nll), 4) AS avg_nll,
           CAST(SUM(CASE WHEN nll > 4.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_surprising
    FROM scored GROUP BY source ORDER BY source
    """,
)
def q_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's
    own unigram model — the cheap stand-in for CCNet/KenLM perplexity
    filtering: documents of rare tokens score high ('surprising'),
    boilerplate scores low.  Scale: ONE agg builds the unigram table;
    the tok⋈freq join is left unhinted because the unigram table is
    the corpus VOCABULARY — at 100 TB that is billions of rows and a
    forced broadcast would OOM (AQE still broadcasts it at SFs where
    it is genuinely small); the token shuffle it rides is the same
    exchange the freq aggregation already required.  Only the 1-row
    total stays a broadcast.  The per-doc average is the last
    exchange.
    Determinism: per-doc NLL is rounded to 4 before the per-source
    AVG (libm ln() agrees to the last ulp on identical doubles, and
    the rounding sits far above fold-order noise)."""
    from ..functions import explode_tokens

    docs = table(spark, sf, "documents")
    tok = explode_tokens(docs, TXT.tokens(F.col("text")), "token", "doc_id", "source")
    freq = tok.groupBy("token").agg(F.count("*").alias("n"))
    tot = freq.agg(F.sum("n").alias("total"))
    scored = (
        tok.join(freq, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "source")
        .agg(
            F.round(F.avg(-F.log(F.col("n") * 1.0 / F.col("total"))), 4).alias("nll")
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("nll"), 4).alias("avg_nll"),
            F.sum(F.when(F.col("nll") > 4.0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_surprising"),
        )
        .orderBy("source")
    )


@query(
    "docs_boilerplate_shingles",
    oracle=f"""
    WITH sh AS MATERIALIZED (
      SELECT doc_id, {_sql_shingles_k(8)} AS shingles FROM documents),
    pairs AS (
      SELECT doc_id, md5(g) AS h
      FROM (SELECT doc_id, unnest(shingles) AS g FROM sh)),
    boiler AS (
      SELECT h FROM pairs GROUP BY h HAVING count(*) >= 3),
    sizes AS (SELECT doc_id, len(shingles) AS n_shingles FROM sh),
    hits AS (
      SELECT p.doc_id, count(*) AS n_boiler
      FROM pairs p JOIN boiler b USING (h) GROUP BY p.doc_id)
    SELECT s.doc_id, s.n_shingles,
           COALESCE(h.n_boiler, 0) AS n_boiler,
           ROUND(COALESCE(h.n_boiler, 0) * 1.0 / s.n_shingles, 6) AS boiler_frac
    FROM sizes s LEFT JOIN hits h USING (doc_id)
    ORDER BY s.doc_id
    """,
)
def q_docs_boilerplate(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-internal boilerplate detection
    (operators.contamination.corpus_boilerplate): distinct 8-word
    shingles appearing in >= 3 documents are boilerplate; per doc,
    the count and fraction of boilerplate shingles — sub-document
    dedup's flag pass (the shingle generalization of CCNet/RefinedWeb
    line-dedup; removal is then a filter on boiler_frac).
    Scale: document-frequency agg + hit join both keyed on
    md5(shingle) — one reusable hash partitioning, no raw phrase
    strings on the wire, df-bounded boilerplate set."""
    from ..operators.contamination import corpus_boilerplate

    docs = table(spark, sf, "documents")
    return corpus_boilerplate(docs, k=8, min_docs=3).orderBy("doc_id")


@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, {SQL_TOKENS} AS w FROM documents
      WHERE len({SQL_TOKENS}) >= 8),
    pos AS (
      SELECT doc_id, u.i AS pos,
             md5(array_to_string(list_slice(w, u.i, u.i + 7), ' ')) AS h
      FROM toks, unnest(generate_series(1, len(w) - 7)) AS u(i)),
    dup AS (
      SELECT h FROM pos GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT p.* FROM pos p JOIN dup d USING (h)),
    isl AS (
      SELECT doc_id, pos, h,
             CASE WHEN max(pos + 8) OVER w_prev IS NULL
                    OR pos > max(pos + 8) OVER w_prev
                  THEN 1 ELSE 0 END AS new_isl
      FROM hits
      WINDOW w_prev AS (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    isl2 AS (
      SELECT *, SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM isl)
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS start_tok,
           CAST(max(pos) + 8 - min(pos) AS BIGINT) AS n_toks,
           arg_min(h, pos) AS cluster,
           count(*) AS n_shingles
    FROM isl2 GROUP BY doc_id, island
    """,
)
def q_dedup_substring_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Sub-document exact-substring dedup MATERIALIZATION (VERDICT r11
    item 5, the suffix-array motif): emit the removable duplicate
    spans themselves — (doc_id, start_tok, n_toks, cluster,
    n_shingles), maximal merged runs of position-carrying 8-token
    shingles whose text occurs in ≥2 distinct documents — instead of
    the text_char_ngram_dup_rate metric or docs_boilerplate_shingles'
    per-doc counts.  Scale: shingle-hash-bucketed duplicate test (one
    md5-key shuffle), hit join reuses the partitioning, island merge
    is one doc_id window — all linear, never all-pairs
    (operators/contamination.py::duplicate_spans)."""
    from ..operators.contamination import duplicate_spans

    return duplicate_spans(table(spark, sf, "documents"), k=8, min_docs=2)


@query(
    "docs_remove_dup_spans",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, {SQL_TOKENS} AS w FROM documents
      WHERE len({SQL_TOKENS}) >= 1),
    pos AS (
      SELECT doc_id, u.i AS pos,
             md5(array_to_string(list_slice(w, u.i, u.i + 7), ' ')) AS h
      FROM toks, unnest(generate_series(1, len(w) - 7)) AS u(i)
      WHERE len(w) >= 8),
    dup AS (
      SELECT h FROM pos GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT p.* FROM pos p JOIN dup d USING (h)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN max(pos + 8) OVER w_prev IS NULL
                    OR pos > max(pos + 8) OVER w_prev
                  THEN 1 ELSE 0 END AS new_isl
      FROM hits
      WINDOW w_prev AS (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    isl2 AS (
      SELECT *, SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM isl),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 8 - min(pos) AS n
      FROM isl2 GROUP BY doc_id, island),
    tokpos AS (
      SELECT doc_id, u.i AS pos, w[u.i] AS tok
      FROM toks, unnest(generate_series(1, len(w))) AS u(i)),
    kept AS (
      SELECT t.* FROM tokpos t
      WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.doc_id = t.doc_id AND t.pos >= s.s AND t.pos < s.s + s.n)),
    rebuilt AS (
      SELECT doc_id, count(*) AS n_kept,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_md5
      FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(t.w) AS BIGINT) AS n_toks,
           CAST(len(t.w) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(r.clean_md5, md5('')) AS clean_md5
    FROM toks t LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def q_docs_remove_dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    """The suffix-array dedup motif END TO END: find the cross-doc
    duplicate spans (dedup_substring_spans) and CUT them, emitting per
    doc the token count, removed-token count and an md5 fingerprint of
    the cleaned tokenized text — metric → spans → removal in one
    dataflow, hash-checked against a full DuckDB replica
    (operators/contamination.py::remove_duplicate_spans).  Scale: the
    span pass plus one positioned-token explode, a doc_id anti join
    with the range predicate as secondary filter, and one doc_id
    aggregate — all keyed on doc_id, never all-pairs."""
    from ..operators.contamination import remove_duplicate_spans

    return remove_duplicate_spans(table(spark, sf, "documents"), k=8, min_docs=2)


@query(
    "docs_repetition_signals",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, {SQL_TOKENS} AS w FROM documents
      WHERE len({SQL_TOKENS}) >= 1),
    base AS (
      SELECT doc_id, w, length(array_to_string(w, ' ')) AS total_chars
      FROM toks),
    grams AS (
      SELECT doc_id, total_chars, ns.n,
             array_to_string(list_slice(w, u.i, u.i + ns.n - 1), ' ') AS g
      FROM base, (VALUES (2), (3), (4), (6)) AS ns(n),
           unnest(generate_series(1, len(w) - ns.n + 1)) AS u(i)
      WHERE len(w) >= ns.n),
    counts AS (
      SELECT doc_id, total_chars, n, g, count(*) AS c
      FROM grams GROUP BY ALL),
    per AS (
      SELECT doc_id, total_chars,
             max(CASE WHEN n = 2 THEN c * length(g) END) AS t2,
             max(CASE WHEN n = 3 THEN c * length(g) END) AS t3,
             max(CASE WHEN n = 4 THEN c * length(g) END) AS t4,
             sum(CASE WHEN n = 6 AND c >= 2 THEN (c - 1) * length(g) END)
                 AS d6
      FROM counts GROUP BY 1, 2)
    SELECT doc_id,
           ROUND(COALESCE(t2, 0) * 1.0 / NULLIF(total_chars, 0), 6)
               AS top2_gram_char_frac,
           ROUND(COALESCE(t3, 0) * 1.0 / NULLIF(total_chars, 0), 6)
               AS top3_gram_char_frac,
           ROUND(COALESCE(t4, 0) * 1.0 / NULLIF(total_chars, 0), 6)
               AS top4_gram_char_frac,
           ROUND(COALESCE(d6, 0) * 1.0 / NULLIF(total_chars, 0), 6)
               AS dup6_gram_char_frac
    FROM per
    """,
)
def q_docs_repetition_signals(spark: SparkSession, sf: str) -> DataFrame:
    """Within-document repetition fractions — the Gopher §A1 criteria
    the per-row rule set doesn't cover (operators/repetition.py): per
    doc, the char coverage of its most frequent 2/3/4-gram and of
    duplicated 6-grams beyond their first occurrence; removal is a
    threshold filter downstream.  Scale: one map-side (n, gram)
    explode, one (doc_id, n, gram) count shuffle with partial
    aggregation, one per-doc aggregate — linear, never per-row
    O(tokens²)."""
    from ..operators.repetition import repetition_signals

    return repetition_signals(table(spark, sf, "documents"))


@query(
    "corpus_vocab_topk",
    oracle=f"""
    WITH tok AS (
      SELECT t.tok FROM documents, unnest({SQL_TOKENS}) AS t(tok)),
    counts AS (SELECT tok, count(*) AS n FROM tok GROUP BY 1),
    tot AS (SELECT count(*) AS c FROM tok),
    top AS (SELECT tok, n FROM counts ORDER BY n DESC, tok LIMIT 200)
    SELECT tok, n,
           CAST(rank() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rnk,
           CAST(SUM(n) OVER (ORDER BY n DESC, tok
                             ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / (SELECT c FROM tot) AS cum_coverage
    FROM top ORDER BY rnk
    """,
)
def q_corpus_vocab_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary builder: global token frequencies, top-200 by count
    (ties broken lexically), with each prefix's cumulative share of
    ALL token occurrences — the coverage curve a tokenizer-training or
    stopword-selection pass reads.
    Scale: the frequency agg is one shuffle on token (partial
    map-side combine); the top-K is TakeOrderedAndProject —
    per-partition heaps, never a global sort; ONLY the K survivors
    (bounded, 200 rows) pass through the single-partition rank/cumsum
    window, and the corpus-wide denominator arrives via a broadcast
    1-row count.  No step is O(vocabulary) on one node."""
    from pyspark.sql import Window

    from ..functions.text import tokens

    docs = table(spark, sf, "documents")
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("_total"))
    top = counts.orderBy(F.desc("n"), "tok").limit(200)
    w = Window.orderBy(F.desc("n"), "tok")
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "tok",
            "n",
            F.rank().over(w).cast("bigint").alias("rnk"),
            (
                F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
                .cast("double")
                / F.col("_total")
            ).alias("cum_coverage"),
        )
        .orderBy("rnk")
    )


# --- retrieval / selection (operators/retrieval.py) -----------------------------

# the DSIR/quota hash, SQL twin of operators.retrieval._hex_bucket
_SQL_HEX_BUCKET = (
    "(((ascii(substr(md5(tok),1,1))*131 + ascii(substr(md5(tok),2,1)))*131"
    " + ascii(substr(md5(tok),3,1)))*131 + ascii(substr(md5(tok),4,1))) % 256"
)


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH q(term) AS (VALUES ('spark'), ('data'), ('fast')),
    tok AS (
      SELECT doc_id, t.tok FROM documents, unnest({SQL_TOKENS}) AS t(tok)),
    dl AS (SELECT doc_id, len({SQL_TOKENS}) AS dl FROM documents),
    corpus AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             avg(len({SQL_TOKENS})) AS avgdl
      FROM documents),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM tok JOIN q ON tok = q.term GROUP BY 1, 2),
    df AS (
      SELECT tok, count(DISTINCT doc_id) AS df
      FROM tok JOIN q ON tok = q.term GROUP BY 1),
    contrib AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               ln(1 + (c.n - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / c.avgdl)),
             6) AS DECIMAL(18,6)) AS co
      FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), corpus c)
    SELECT doc_id, CAST(SUM(co) AS DOUBLE) AS score
    FROM contrib GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def q_text_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 ranked retrieval (Lucene idf variant, k1=1.2, b=0.75) of
    the top-20 documents for a 3-term query — the eval-set /
    hard-negative mining primitive of a training-data pipeline.
    Scale: the token explode is filtered to the query's terms BEFORE
    any shuffle (only those postings move); df and the corpus avgdl
    are broadcasts; per-term contributions sum in DECIMAL so the
    score is partitioning-order-independent; the top-20 is
    TakeOrderedAndProject, never a global sort."""
    from ..operators.cache import propagate_persisted
    from ..operators.retrieval import bm25_score

    docs = table(spark, sf, "documents")
    scored = bm25_score(docs, ["spark", "data", "fast"])
    # carry the operator's cache-release handle onto the derived frame
    # (review r8: a bare .orderBy().limit() strands it, making
    # release_persisted on the registry result a silent no-op)
    return propagate_persisted(
        scored.orderBy(F.desc("score"), "doc_id").limit(20), scored
    )


@query(
    "docs_domain_quota",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS qrank
      FROM documents)
    SELECT doc_id, source, qrank FROM r WHERE qrank <= 10
    """,
)
def q_docs_domain_quota(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source quota capping: each source contributes at most its
    10 highest-priority documents, priority = deterministic md5 of
    the doc id (an unbiased, run-stable per-domain sample — no RNG,
    so the oracle can replay it).  The crawl-curation knob that stops
    one domain from dominating a 100 TB corpus.
    Scale: one exchange on source; the rank filter executes as
    WindowGroupLimit, so a pathologically hot source ships at most
    k rows per map task, never its full mass."""
    from ..operators.retrieval import group_quota

    docs = table(spark, sf, "documents").select("doc_id", "source")
    return group_quota(docs, "source", 10, tie_col="doc_id").select(
        "doc_id", "source", F.col("qrank").cast("bigint").alias("qrank")
    )


@query(
    "docs_dsir_importance",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, (lang = 'en' AND source IN ('src0','src1')) AS is_t,
             t.tok
      FROM documents, unnest({SQL_TOKENS}) AS t(tok)),
    tb AS (SELECT doc_id, is_t, {_SQL_HEX_BUCKET} AS bucket FROM tk),
    st AS (
      SELECT bucket, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
             count(*) AS cr
      FROM tb GROUP BY 1),
    tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM st),
    lr AS (
      SELECT bucket,
             CAST(ROUND(ln((ct + 1) / CAST(tt + 256 AS DOUBLE))
                      - ln((cr + 1) / CAST(tr + 256 AS DOUBLE)),
             8) AS DECIMAL(18,8)) AS lr
      FROM st, tot)
    SELECT doc_id, CAST(SUM(lr) AS DOUBLE) AS log_weight
    FROM tb JOIN lr USING (bucket)
    GROUP BY doc_id
    ORDER BY log_weight DESC, doc_id LIMIT 30
    """,
)
def q_docs_dsir_importance(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023): score every
    document by the log-likelihood ratio of a 256-bucket
    hashed-unigram model fit on the target slice (lang='en' ∧ source
    ∈ {src0,src1}) vs the raw corpus; return the 30 most
    target-like docs — the importance-resampling head that reweights
    a raw crawl toward a curated distribution.
    Scale: bucket statistics reduce the corpus to 256 broadcast rows
    (one token-explode agg, map-side combine); the per-doc sum — in
    DECIMAL, order-independent — is the only corpus-grain shuffle;
    nothing is O(vocabulary) on one node."""
    from ..operators.cache import propagate_persisted
    from ..operators.retrieval import dsir_log_weights

    docs = table(spark, sf, "documents")
    pred = (F.col("lang") == "en") & F.col("source").isin("src0", "src1")
    weighted = dsir_log_weights(docs, pred)
    # carry the cache-release handle onto the derived frame (see
    # text_bm25_topk)
    return propagate_persisted(
        weighted.orderBy(F.desc("log_weight"), "doc_id").limit(30), weighted
    )


@query(
    "corpus_bpe_pair_stats",
    oracle=f"""
    WITH tok AS (
      SELECT t.tok FROM documents, unnest({SQL_TOKENS}) AS t(tok)),
    pairs AS (
      SELECT unnest([substr(tok, i, 2) FOR i IN range(1, length(tok))]) AS pair
      FROM tok WHERE length(tok) >= 2)
    SELECT pair, count(*) AS n
    FROM pairs GROUP BY 1 ORDER BY n DESC, pair LIMIT 50
    """,
)
def q_corpus_bpe_pair_stats(spark: SparkSession, sf: str) -> DataFrame:
    """One merge-selection round of BPE tokenizer training: adjacent
    character-pair frequencies over every token OCCURRENCE (frequency
    weighting is what makes the merge choice corpus-representative),
    top-50 by count with a lexical tie-break — the statistic a
    vocabulary-induction pass computes each round before merging the
    winning pair.
    Scale: the pair explode is map-only (~word-length × token stream,
    no shuffle); the count is one aggregate with map-side combine
    into a pair vocabulary bounded by the alphabet squared (≤ ~1.3k
    rows for [a-z0-9]²), and the top-50 is TakeOrderedAndProject —
    per-partition heaps, never a global sort.  Single-char tokens
    contribute no pairs (filtered identically in both engines:
    Spark's inclusive sequence(1, len-1) would go DESCENDING for
    len=1 while DuckDB's half-open range(1, len) is empty — the
    length >= 2 guard pins the same semantics)."""
    from ..functions.text import tokens

    docs = table(spark, sf, "documents")
    pairs = (
        docs.select(F.explode(tokens(F.col("text"))).alias("_tok"))
        .filter(F.length("_tok") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(_tok)-1),"
                    " i -> substring(_tok, i, 2))"
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(50)
    )


_BPE_N_MERGES = 16


_BPE_CACHE: dict = {}


def _bpe_replay(sf_dir: str, n_merges: int = _BPE_N_MERGES):
    """Sequential pure-Python BPE replay over the SAME documents table
    (duckdb read — Spark never consulted): the independent reference
    interpretation the corpus_bpe_* oracles hash-check the distributed
    trainer/encoder against (the ann_oracles model-replay pattern).
    Returns (merges [(l, r, freq)], word_freq Counter keyed by
    (source, word), final per-word symbol tuples)."""
    import re
    from collections import Counter

    key = (sf_dir, n_merges)
    if key in _BPE_CACHE:
        return _BPE_CACHE[key]
    import duckdb

    from ..operators.bpe import BPE_WORD_RE

    rows = duckdb.sql(
        f"SELECT source, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    wre = re.compile(BPE_WORD_RE)
    wf: Counter = Counter()
    for source, text in rows:
        if text:
            for w in wre.findall(text):
                wf[(source, w)] += 1
    type_freq: Counter = Counter()
    for (_src, w), n in wf.items():
        type_freq[w] += n
    syms = {w: tuple(w) for w in type_freq}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, f in type_freq.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:  # min_freq contract shared with train_bpe
            break
        merges.append((l, r, n))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    _BPE_CACHE[key] = (merges, wf, syms)
    return _BPE_CACHE[key]


@query(
    "corpus_bpe_merges",
    oracle=lambda: "SELECT * FROM (VALUES "
    + ", ".join(
        f"({i + 1}, '{l.replace(chr(39), chr(39) * 2)}', "
        f"'{r.replace(chr(39), chr(39) * 2)}', {n})"
        for i, (l, r, n) in enumerate(_bpe_replay(ANN._sf_dir())[0])
    )
    + ") AS t(merge_no, lhs, rhs, pair_freq) ORDER BY merge_no",
)
def q_corpus_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    """FULL iterative BPE vocabulary induction (VERDICT r12 item 4 —
    corpus_bpe_pair_stats was one selection round; this loops it):
    16 learned merges in order with their pair frequencies.  The
    corpus is scanned ONCE into the word-type table; each round is a
    bounded type-grain job (pair explode + sum, top-1) and a
    codegen'd fold rewrite — operators/bpe.py docstring for the
    100 TB argument.  Oracle: sequential pure-Python replay over the
    same parquet (duckdb read), merge-for-merge."""
    from ..operators.bpe import train_bpe

    merges = train_bpe(
        table(spark, sf, "documents"), n_merges=_BPE_N_MERGES
    )
    return spark.createDataFrame(
        [(i + 1, l, r, n) for i, (l, r, n) in enumerate(merges)],
        "merge_no int, lhs string, rhs string, pair_freq bigint",
    ).orderBy("merge_no")


@query(
    "docs_bpe_token_budget",
    oracle=lambda: (
        lambda merges, wf, syms: "SELECT * FROM (VALUES "
        + ", ".join(
            f"('{src}', {nw}, {nt})"
            for src, nw, nt in sorted(
                (
                    (
                        src,
                        sum(n for (s, _w), n in wf.items() if s == src),
                        sum(
                            n * len(syms[w])
                            for (s, w), n in wf.items()
                            if s == src
                        ),
                    )
                    for src in {s for s, _w in wf}
                )
            )
        )
        + ") AS t(source, n_words, n_bpe_tokens) ORDER BY source"
    )(*_bpe_replay(ANN._sf_dir())),
)
def q_docs_bpe_token_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source token budget under the LEARNED BPE vocabulary — the
    real-tokenizer upgrade of text_token_budget's pretoken proxy
    (VERDICT r12 item 4 'so text_token_budget can price real BPE').
    Plan: one corpus shuffle for per-source word counts, each DISTINCT
    word encoded once (Arrow-batched sequential merge replay,
    O(types)), one join + aggregate.  Oracle: the same budget from the
    pure-Python replay's final symbol table."""
    from ..operators.bpe import bpe_token_budget, train_bpe

    docs = table(spark, sf, "documents")
    merges = train_bpe(docs, n_merges=_BPE_N_MERGES)
    return (
        bpe_token_budget(docs, merges, group_cols=["source"])
        .select(
            "source",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        )
        .orderBy("source")
    )


@query(
    "docs_weighted_sample",
    oracle="""
    WITH mx AS (
      SELECT max(CAST(n_chars AS DOUBLE)) AS wmax
      FROM documents WHERE n_chars > 0),
    pri AS (
      SELECT doc_id, n_chars,
             ROUND(
               ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) + 1.0) / 4294967297.0)
               / nullif(CASE WHEN n_chars > 0
                             THEN CAST(n_chars AS DOUBLE) / wmax END, 0.0),
             10) AS wpriority
      FROM documents, mx)
    SELECT doc_id, n_chars, wpriority FROM pri
    WHERE wpriority IS NOT NULL
    ORDER BY wpriority DESC, doc_id LIMIT 30
    """,
)
def q_docs_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis exponential sort, operators/sampling.py):
    draw 30 documents with probability ∝ n_chars — the token-budget-
    proportional mixture draw of a corpus build — with the uniform
    derived from md5(doc_id), so the oracle replays the exact draw
    (no RNG, the registry's sampling contract).
    Scale: priorities are one scan (md5 + ln in whole-stage codegen);
    the top-k is TakeOrderedAndProject — per-partition heaps, only k
    winners move."""
    from ..operators.sampling import weighted_sample

    docs = table(spark, sf, "documents").select("doc_id", "n_chars")
    return weighted_sample(docs, "doc_id", "n_chars", k=30)
