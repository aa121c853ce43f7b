"""Deduplication operators for large-scale corpora.

Four families, all shuffle-conscious:

* exact      — hash-groupBy on a content fingerprint (md5).  O(n),
               one shuffle on the hash.  The direct scale-out of the
               reference's per-packet MD5 dedup (PcapReader.java:183-188).
* minhash+LSH— token-set MinHash signatures, banded into LSH buckets;
               candidate pairs come from bucket joins (O(n·bands)
               shuffle), then exact-Jaccard verification.  This is the
               100 TB path: never materializes O(n²) pairs.
* simhash    — 16-bit sign-of-weighted-bits fingerprint; near-dup =
               small Hamming distance.
* n-gram Jaccard — exact pairwise verification primitive (used alone
               only within bounded candidate sets).

Determinism contract: all hashes derive from md5 of the token text, so
the DuckDB oracles can reproduce every value bit-for-bit.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .partitioning import spread

from ..functions.text import tokens

N_MINHASHES = 8
N_BANDS = 4  # 2 hashes per band


def doc_tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, token) pairs, distinct per doc — the set representation.
    explode_tokens, not explode: inner explode's inferred size-filter
    would re-run the tokenizer per row in the scan (functions
    package docstring; measured 29× on the shingle twin)."""
    from ..functions import explode_tokens

    return explode_tokens(
        docs, F.array_distinct(tokens(F.col(text_col))), "token", id_col
    )


def doc_shingles(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, shingle) pairs: distinct k-word shingles per doc.

    Shingles (not unigrams) are the MinHash input: the shingle space is
    |vocab|^k, so documents share shingles only through genuinely
    common word *sequences* — candidate sets stay sparse even on
    low-vocabulary corpora.  Docs shorter than k words contribute their
    whole text as one shingle.

    The token array is materialized as its own projection first:
    referencing the tokenizer expression inside the shingle lambda
    would re-run split+filter per element_at (no CSE inside lambdas —
    measured 130 s vs 4 s at sf0.1)."""
    from ..functions import explode_computed

    # shingle arrays are never empty (short docs contribute the whole
    # text as one shingle) → outer explode is a drop-in that avoids
    # the inferred-filter re-evaluation of the shingle construction
    return doc_shingle_arrays(docs, k, id_col, text_col).select(
        "doc_id", explode_computed("arr", never_empty=True).alias("token")
    )


def doc_shingle_arrays(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, arr, sz): the distinct k-shingle set as an array column.

    Narrow (no shuffle, no explode): the shingle set stays co-located
    with its doc row — at 100 TB this is a pure map over the scan.
    MinHash, LSH bands and Jaccard verification all derive from this
    column directly.

    The shingle expression is ONE parsed SQL string (r14, VERDICT r13
    item 5): the Column form paid a py4j round-trip per element_at/
    concat/when node on every query build; the parsed tree is
    node-identical (tests/test_expr_twins.py sameSemantics pin)."""
    base = docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks"))
    return base.select(
        "doc_id", F.expr(f"array_distinct({shingle_arr_sql(k)})").alias("arr")
    ).withColumn("sz", F.size("arr"))


def shingle_arr_sql(k: int, toks: str = "_toks") -> str:
    """SQL string for the k-word shingle array over a materialized
    token-array column — CASE/transform/element_at tree identical to
    the historical Column constructor (short docs contribute their
    whole text as one shingle; the ``i + {j} + 1`` rendering mirrors
    the old per-term Add chain exactly)."""
    parts = ", ".join(f"element_at({toks}, i + {j} + 1)" for j in range(k))
    return (
        f"CASE WHEN size({toks}) >= {k} THEN "
        f"transform(sequence(0, size({toks}) - {k}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE array(concat_ws(' ', {toks})) END"
    )


def exact_duplicates(docs: DataFrame, fingerprint_col) -> DataFrame:
    """Groups of byte-identical (post-normalization) docs.
    Scale: one shuffle on the 128-bit fingerprint; no skew (hash keys
    are uniform)."""
    return (
        docs.select(F.col("doc_id"), fingerprint_col.alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_dupes"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_dupes") > 1)
    )


def dedup_exact(docs: DataFrame, fingerprint_col) -> DataFrame:
    """Keep one representative (min doc_id) per fingerprint — the
    distributed dropDuplicates with explicit keep semantics."""
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        docs.withColumn("fp", fingerprint_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "fp")
    )


# Kirsch-Mitzenmacher double hashing: ONE md5 per shingle yields every
# hash family member as h_i = a + i*b, where a/b are the digest's two
# 60-bit halves (15 hex chars each — conv()-able into int64 with no
# sign issues, and a + 7b < 2^63 so the arithmetic never overflows).
# This cut the per-shingle hash work n_hashes-fold vs the previous
# md5(seed:token) family (~4x wall on the end-to-end sf0.1 pipeline)
# and is reproduced verbatim in the DuckDB oracles, which still match
# bit-for-bit including the candidate set.


def _check_n_hashes(n_hashes: int) -> None:
    """a + i*b stays below 2^63 only for i <= 7 (a, b are 60-bit md5
    halves); beyond that the int64 arithmetic silently wraps (or
    raises under ANSI mode) and diverges from the DuckDB oracle, so
    reject instead (ADVICE r3)."""
    if not 1 <= n_hashes <= 8:
        raise ValueError(
            f"n_hashes must be in [1, 8] for the a + i*b md5-halves "
            f"family (a + 8b can exceed 2^63 and wrap int64); got "
            f"{n_hashes}.  Use multiple signature sets for wider "
            f"families."
        )


def _md5_halves(col):
    """token column → struct(ha, hb): the two 60-bit md5 halves."""
    h = F.md5(col)
    return F.struct(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint").alias("ha"),
        F.conv(F.substring(h, 17, 15), 16, 10).cast("bigint").alias("hb"),
    )


def _md5_halves_sql(t: str) -> str:
    """Parsed-SQL twin of :func:`_md5_halves` (r14 plan-construction
    economy; sameSemantics-pinned)."""
    return (
        f"named_struct("
        f"'ha', CAST(conv(substring(md5({t}), 1, 15), 16, 10) AS BIGINT), "
        f"'hb', CAST(conv(substring(md5({t}), 17, 15), 16, 10) AS BIGINT))"
    )


def minhash_signatures(tok: DataFrame, n_hashes: int = N_MINHASHES) -> DataFrame:
    """doc_id → m0..m{n-1} int64 MinHash values from (doc_id, token)
    pairs.  min(a + i*b) per doc is a valid MinHash under the 'random
    permutation by hash order' construction.  Pure built-ins,
    map-side aggregable; the md5 is computed once per token row."""
    _check_n_hashes(n_hashes)
    with_h = tok.select(
        "doc_id", F.expr(_md5_halves_sql("token")).alias("h")
    )
    aggs = [
        F.expr(f"min(h.ha + {i} * h.hb) AS m{i}") for i in range(n_hashes)
    ]
    return with_h.groupBy("doc_id").agg(*aggs)


def minhash_signatures_from_arrays(
    arrays: DataFrame, n_hashes: int = N_MINHASHES
) -> DataFrame:
    """MinHash straight off the shingle-array column — shuffle-free:
    array_min per row replaces the explode + groupBy of the pair form.
    Two projection stages so the md5-halves array materializes once;
    CollapseProject keeps them separate because the transform() is
    non-cheap and referenced n_hashes times."""
    _check_n_hashes(n_hashes)
    halved = arrays.select(
        "doc_id",
        F.expr(f"transform(arr, t -> {_md5_halves_sql('t')})").alias("hs"),
    )
    cols = [
        F.expr(f"array_min(transform(hs, x -> x.ha + {i} * x.hb)) AS m{i}")
        for i in range(n_hashes)
    ]
    return halved.select("doc_id", *cols)


def lsh_bands(sigs: DataFrame, n_bands: int = N_BANDS, n_hashes: int = N_MINHASHES) -> DataFrame:
    """Signature → (doc_id, band, key) rows; same (band, key) ⇒ LSH
    candidate bucket.  rows = n·bands, so the bucket join shuffles
    O(n·bands) keys — the whole point vs O(n²) pairs."""
    per_band = n_hashes // n_bands
    bands = []
    for b in range(n_bands):
        cols = ", ".join(f"m{b * per_band + j}" for j in range(per_band))
        bands.append(
            f"named_struct('band', {b}, 'key', md5(concat_ws('|', {cols})))"
        )
    band_arr = F.expr("array(" + ", ".join(bands) + ")")
    return (
        sigs.select("doc_id", F.explode(band_arr).alias("bk"))
        .select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )


def candidate_pairs(bands: DataFrame, max_bucket: int = 64) -> DataFrame:
    """Distinct (a, b) doc pairs sharing ≥1 LSH bucket, a < b.

    Hot-bucket guard: a bucket with m members otherwise emits m² pairs
    on one reducer — web corpora put millions of boilerplate near-copies
    in the same bucket.  Buckets larger than ``max_bucket`` short-
    circuit through the exact-dup path: all members share the band's
    full minhash signature slice, so instead of the clique we emit only
    the m−1 star pairs around the bucket's min doc_id.  Downstream
    Jaccard verification still scores every emitted pair; for the true
    duplicate-cluster case (near-identical docs) the anchor pairs
    verify and connected components recovers the full cluster through
    the anchor.  Known recall tradeoff above the cap: a member-member
    pair whose similarity exceeds the threshold while both anchor
    pairs fall below it is not emitted — acceptable because the guard
    only fires on pathological buckets where the m² clique is not
    computable anyway; raise ``max_bucket`` if that tail matters more
    than boundedness.  The cap sits well above observed honest bucket
    sizes (13 at sf0.1), so sub-cap results are byte-identical to the
    unguarded join.

    Mechanically the buckets are built with ONE shuffle
    (groupBy(band, key) → member list) and pairs explode row-locally
    from each member array — no window, no bucket self-join, and the
    upstream signature lineage is consumed exactly once.  The previous
    window + self-join formulation re-evaluated it up to 4× (measured
    2.2× CPU on the end-to-end pipeline), and the union-of-two-filters
    formulation that replaced it still evaluated the whole signature
    subtree twice — once per branch — because Spark has no common-
    subplan elimination across a Union (confirmed in the executed
    plan: two full ObjectHashAggregate+banding trees; single-branch
    rewrite cut the query's CPU roughly in half).  Now the hot/cold
    decision is a row-local CASE over the member array: cold buckets
    build their a<b clique with nested transform/filter (bounded by
    max_bucket² combinations scanned per row), hot buckets their m−1
    anchor star — one consumer, one evaluation.  A pathological
    bucket's member array is O(m) on its reducer (8 MB per million
    members) — linear, vs the m² pair blowup the guard exists to
    prevent."""
    buckets = bands.groupBy("band", "key").agg(
        F.collect_list("doc_id").alias("members")
    )
    # amin must be a projected attribute, NOT an inline array_min:
    # Spark does no common-subexpression elimination inside higher-
    # order-function lambdas (same trap as the md5 interning note at
    # the top of this file), so referencing array_min(members) from
    # the star lambdas would re-scan the whole member array once per
    # element — O(m²) on exactly the pathological buckets the guard
    # exists to keep linear.
    buckets = buckets.withColumn("amin", F.array_min("members"))
    clique = (
        "flatten(transform(members, x -> "
        "transform(filter(members, y -> y > x), "
        "y -> named_struct('a', x, 'b', y))))"
    )
    star = (
        "transform(filter(members, y -> y != amin), "
        "y -> named_struct('a', amin, 'b', y))"
    )
    pair_arr = F.expr(
        f"CASE WHEN size(members) <= {max_bucket} THEN {clique} "
        f"ELSE {star} END"
    )
    # explode_outer + output-null filter, NOT inner explode: the
    # inferred size(pair_arr)>0 filter would substitute and re-run
    # the whole clique/star CASE per bucket row — doubling exactly
    # the O(m²)-bounded work the guard exists to bound.  pair_arr CAN
    # be empty (single-member buckets), so the all-NULL outer rows
    # are dropped on the generated output, which no rule pushes back
    # below the Generate.
    return (
        buckets.select(F.explode_outer(pair_arr).alias("p"))
        .filter(F.col("p").isNotNull())
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, arrays: DataFrame, threshold: float) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs.

    ``arrays`` is (doc_id, arr, sz); ``arr`` may be the string shingle
    set or (since r5) its 60-bit md5-hash image — any atomic element
    type keeps array_intersect on the fast path.  Per-pair set
    intersection via array_intersect: cost is O(pairs ·
    tokens-per-doc), independent of how many docs share a hot token —
    a token self-join degrades quadratically inside near-dup clusters
    (measured 48 s → ~2 s at sf0.1 for 826 candidate pairs).

    Join strategy: both joins are pinned to sort-merge.  Left to
    itself the static planner picks the ARRAY side as the broadcast
    build side whenever upstream filters make its size estimate
    optimistic (observed at sf1: a windowed-survivor filter shrank
    the estimate under the threshold, Spark tried to broadcast the
    ~600 MB shingle-array relation and OOM'd a 1 GiB driver; at
    100 TB the array side is corpus-sized by construction, so
    broadcasting it is never the right plan).  SMJ costs nearly
    nothing here: ``arrays`` is already hash-partitioned on doc_id
    from the signature stage, so it sorts in place with no extra
    exchange, and only the (small) pair list shuffles — while a
    broadcast of the PAIR side would also be wrong in the other
    direction (dup-heavy corpora make pairs corpus-sized; an
    unconditional F.broadcast would OOM the driver at 100 TB)."""
    a_arr = arrays.select(
        F.col("doc_id").alias("a"), F.col("arr").alias("arr_a"), F.col("sz").alias("sza")
    )
    b_arr = arrays.select(
        F.col("doc_id").alias("b"), F.col("arr").alias("arr_b"), F.col("sz").alias("szb")
    )
    return (
        a_arr.join(pairs.hint("merge"), "a")
        .join(b_arr.hint("merge"), "b")
        .withColumn("inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "jaccard")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = N_MINHASHES,
    n_bands: int = N_BANDS,
    shingle_k: int = 3,
    storage_level=None,
) -> DataFrame:
    """End-to-end near-dup pipeline: k-word shingles → MinHash → LSH
    bands → candidate pairs → exact shingle-Jaccard ≥ threshold.
    ``shingle_k=1`` degrades to unigram token sets.

    ``storage_level`` controls the persisted relation (default
    MEMORY_AND_DISK; ``DISK_ONLY`` frees the unified pool for corpora
    whose cache is a meaningful fraction of executor memory).

    Memory floor (r5 rework): what persists — and what the verify
    join's sort-merge rows carry — is no longer the ~1 KB string
    shingle array but its 60-bit md5-hash image as ``array<bigint>``
    (8 B/shingle; the SAME ha = conv(md5[:15]) value the signature
    family already computes, so the oracle reproduces it exactly and
    Jaccard is unchanged up to 2^-60 collisions, which the oracle
    mirrors bit-for-bit anyway).  Signatures and the hash array come
    out of ONE md5-halves pass per doc — the string arrays are never
    persisted and never shuffled.  The old floor was the sort of
    string-array-bearing rows (~256 MB/core at 150k docs: 1 GiB
    local[8] OOM'd at any storage level); the int64 rows are ~3×
    smaller and 150k docs run clean in the same 1 GiB harness with
    ``storage_level=DISK_ONLY`` — the knob to use when the cache is
    a meaningful fraction of executor memory (gate:
    tests/test_operators.py::test_minhash_150k_low_memory)."""
    # Small-file inputs arrive as one partition; shingling + minhash
    # is the dominant cost and embarrassingly parallel — spread it
    # first (no-op at real scale, where the many-file scan already
    # fills the cluster; operators/partitioning.py).
    docs = spread(docs, "doc_id")
    if shingle_k > 1:
        arrays = doc_shingle_arrays(docs, shingle_k)
    else:
        arrays = doc_tokens(docs).groupBy("doc_id").agg(
            F.collect_list("token").alias("arr"), F.count("*").alias("sz")
        )
    _check_n_hashes(n_hashes)
    # One md5 pass feeds BOTH the K-M signature family and the verify
    # hash array.  Two projection stages so the halves array
    # materializes once (no CSE inside lambdas; CollapseProject keeps
    # non-cheap transforms separate — same structure as
    # minhash_signatures_from_arrays).
    halved = arrays.select(
        "doc_id", "sz",
        F.expr(f"transform(arr, t -> {_md5_halves_sql('t')})").alias("hs"),
    )
    sig_cols = [
        F.expr(f"array_min(transform(hs, x -> x.ha + {i} * x.hb)) AS m{i}")
        for i in range(n_hashes)
    ]
    hashed = halved.select(
        "doc_id",
        "sz",
        F.expr("transform(hs, x -> x.ha)").alias("arr"),
        *sig_cols,
    )
    # The hashed relation feeds three consumers (bands and both sides
    # of the verification join); without persistence the whole
    # shingling+md5 recomputes per consumer (measured 3-4× end-to-end).
    from pyspark import StorageLevel

    hashed = hashed.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    sigs = hashed.select("doc_id", *[f"m{i}" for i in range(n_hashes)])
    cands = candidate_pairs(lsh_bands(sigs, n_bands, n_hashes))
    from .cache import register_persisted

    # caller releases via operators.release_persisted(result) after
    # materializing (ADVICE r2: no unpersist path leaked cache blocks
    # across benchmark loops / multi-corpus jobs)
    verify_side = hashed.select("doc_id", "arr", "sz")
    return register_persisted(
        jaccard_verify(cands, verify_side, threshold), hashed
    )


HEX_DIGITS = "0123456789abcdef"
SIMHASH_BITS = 16


def simhash_bits(
    tok: DataFrame, bits: int = SIMHASH_BITS, scheme: str = "parity"
) -> DataFrame:
    """doc_id → ``bits``-wide SimHash over the distinct token set.

    ``scheme='parity'`` (default, bits ≤ 32): bit i comes from hex
    digit i of md5(token) — odd digit → +1 vote, even → −1.  The
    original construction; kept byte-stable because goldens and the
    ``dedup_simhash`` oracle pin it.

    ``scheme='nibble'`` (bits ≤ 62): bit i uses bit (i mod 4) of hex
    digit (i div 4) — 4 vote streams per digest digit, so one md5
    yields up to 128 independent bits.  This is the wide-fingerprint
    path the 100 TB pigeonhole guidance needs: Hamming ≤ 3 banding
    over a 60-bit simhash gives 15-bit band keys (32k values) instead
    of 8-bit ones (256), keeping band buckets ~128× smaller at the
    same corpus size.  Capped at 62 so every ``1 << i`` term stays a
    positive int64 in both engines (no sign-bit special case).

    Both schemes are deterministic and oracle-reproducible (strpos on
    a hex alphabet + integer arithmetic, no engine-specific hashing).
    """
    if scheme == "parity":
        if not 1 <= bits <= 32:
            raise ValueError(f"parity scheme supports 1..32 bits, got {bits}")
    elif scheme == "nibble":
        if not 1 <= bits <= 62:
            raise ValueError(f"nibble scheme supports 1..62 bits, got {bits}")
    else:
        raise ValueError(f"unknown simhash scheme {scheme!r}")
    # Expression construction is parsed SQL strings, not per-term
    # Column calls (r14, VERDICT r13 item 5): the Column form cost one
    # py4j round-trip per operator — ~6 per vote × 60 votes + 60
    # CASE terms ≈ 1.6 s of driver time per dedup_simhash_wide call —
    # where F.expr parses each vote in ONE round-trip.  Tree-identical
    # to the historical Column form (pinned by sameSemantics in
    # tests/test_expr_twins.py), so plans, results and the DuckDB
    # oracles are unchanged.
    def vote_sql(i: int) -> str:
        if scheme == "parity":
            digit = (
                f"(instr('{HEX_DIGITS}', substring(md5(token), {i + 1}, 1))"
                f" - 1)"
            )
            cond = f"({digit} % 2) = 1"
        else:
            digit = (
                f"(instr('{HEX_DIGITS}', substring(md5(token),"
                f" {i // 4 + 1}, 1)) - 1)"
            )
            cond = f"({digit} & {1 << (i % 4)}) != 0"
        return f"sum(CASE WHEN {cond} THEN 1 ELSE -1 END) AS v{i}"

    agg = tok.groupBy("doc_id").agg(*[F.expr(vote_sql(i)) for i in range(bits)])
    simhash_sql = " + ".join(
        f"CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(bits)
    )
    return agg.select("doc_id", F.expr(simhash_sql).alias("simhash"))


def simhash16(tok: DataFrame) -> DataFrame:
    """16-bit SimHash (see simhash_bits)."""
    return simhash_bits(tok, SIMHASH_BITS)


def simhash_banded_pairs(
    docs: DataFrame, max_hamming: int = 3, bits: int = 32, scheme: str = "parity"
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``,
    with **no recall loss and no quadratic join**.

    Pigeonhole banding: split the ``bits``-wide simhash into
    ``max_hamming + 1`` bands; any pair within Hamming ≤ max_hamming
    differs in at most max_hamming bands, so it agrees *exactly* on at
    least one band.  Candidates come from band-value equi-joins
    (O(n·bands) shuffle keys — same shape as MinHash LSH), then exact
    ``bit_count(xor)`` verification.  With 32 bits / 4 bands each band
    key has 256 values — fine at validation SFs; the 100 TB call is
    ``bits=60, scheme='nibble'`` (registered as ``dedup_simhash_wide``):
    15-bit band keys give 32k values per band, shrinking expected band
    buckets 128× at the same corpus size, with the same zero-recall-
    loss guarantee.  Beyond that, bucket the band join through
    ``candidate_pairs`` WITHOUT the star guard only if buckets stay
    bounded — a guard here would break the pigeonhole guarantee, so
    the correct lever for bucket size is band width, not capping.
    """
    n_bands = max_hamming + 1
    width = bits // n_bands
    mask = (1 << width) - 1
    docs = spread(docs, "doc_id")
    sh = simhash_bits(doc_tokens(docs), bits, scheme)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).alias("key"),
        )
        for b in range(n_bands)
    ]
    bands = sh.select(
        "doc_id", "simhash", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.alias("a")
    b = bands.alias("b")
    joined = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.band").alias("band"),
        F.col("a.doc_id").alias("a"),
        F.col("b.doc_id").alias("b"),
        F.col("a.simhash").alias("simhash_a"),
        F.col("b.simhash").alias("simhash_b"),
    )
    # Exactly-once emission WITHOUT a global distinct: a pair agreeing
    # on several bands joins once per agreeing band, and the agreeing
    # band set is computable row-locally from xor(simhash) — keep only
    # the row whose band is the FIRST agreeing one (every lower band
    # differs).  The r4 shape shuffled every duplicate pair row into a
    # DISTINCT — 660M rows at the 30× SF; this filter is map-side and
    # emission is unique by construction.
    xor = F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))
    band_differs = [
        (F.shiftright(xor, j * width).bitwiseAND(F.lit(mask)) != 0)
        for j in range(n_bands)
    ]
    first_band = F.lit(True)
    for k in range(n_bands - 1, 0, -1):
        lower_all_differ = band_differs[0]
        for j in range(1, k):
            lower_all_differ = lower_all_differ & band_differs[j]
        first_band = F.when(F.col("band") == k, lower_all_differ).otherwise(
            first_band
        )
    return (
        joined.filter(first_band)
        .withColumn("hamming", F.bit_count(xor))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "simhash_a", "simhash_b", "hamming")
    )


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3, block_col=None) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked by an
    attribute column — a BOUNDED primitive: the pair join is quadratic
    within each ``block_col`` group, so use it only when groups are
    small.  The scale path is :func:`simhash_banded_pairs` (pigeonhole
    banding, no quadratic join, no recall loss)."""
    docs = spread(docs, "doc_id")
    tok = doc_tokens(docs)
    sh = simhash16(tok)
    if block_col is not None:
        sh = sh.join(docs.select("doc_id", block_col), "doc_id")
        block = [block_col]
    else:
        sh = sh.withColumn("_blk", F.lit(1))
        block = ["_blk"]
    a = sh.alias("a")
    b = sh.alias("b")
    cond = F.col("a.doc_id") < F.col("b.doc_id")
    for c in block:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .withColumn(
            "hamming",
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.doc_id").alias("a"),
            F.col("b.doc_id").alias("b"),
            F.col("a.simhash").alias("simhash_a"),
            F.col("b.simhash").alias("simhash_b"),
            "hamming",
        )
    )


def connected_components(edges: DataFrame, max_iter: int = 12) -> DataFrame:
    """Connected components of an undirected (a, b) edge set by
    smallest-id label propagation with pointer jumping.

    Returns (doc_id, component) where component = min doc_id reachable.
    Each iteration does TWO label-improving steps before the
    convergence check:

    * *hop* — take the min label over graph neighbors (the classic
      one-edge propagation);
    * *jump* — take the label OF the current label
      (``component ← labels[component]``), the pointer-doubling move
      from the O(log n) PRAM algorithm (Shiloach-Vishkin style).

    A hop alone needs O(diameter) rounds, and chained near-dup
    families (templated / quoted text) can have diameters in the
    hundreds at 100 TB — the silent-non-convergence hazard VERDICT
    r12 flagged.  Hop+jump roughly doubles the covered distance per
    round, so ``max_iter=12`` converges any component with diameter
    up to ~2^12; if the loop still exhausts without converging it now
    RAISES instead of returning labels that would let
    ``docs_leakage_safe_split`` put one cluster on both sides of a
    train/eval split (adversarial long-chain pytest pins both the
    round count and the loud failure).

    Lineage & cache hygiene: each iteration references the previous
    labels several times (hop join, jump join, convergence check), so
    without truncation the logical plan doubles per iteration —
    localCheckpoint keeps plans flat AND avoids replaying iterations
    1..N-1.  Each superseded iteration's checkpoint blocks are freed
    eagerly (cache.release_checkpoint) instead of waiting for the
    ContextCleaner; the final labels and the symmetrized edge list
    back the returned DataFrame and are registered on it — call
    ``operators.release_persisted(result)`` after materializing to
    free them too (the result is not recomputable afterwards)."""
    from .cache import register_checkpointed, release_checkpoint

    sym = (
        edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .union(edges.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select("x")
        .distinct()
        .select(F.col("x").alias("doc_id"), F.col("x").alias("component"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.y == labels.doc_id)
            .groupBy("x")
            .agg(F.min("component").alias("nbr_min"))
        )
        hopped = labels.join(
            neighbor_min, labels.doc_id == neighbor_min.x, "left"
        ).select(
            "doc_id",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
        )
        # pointer jump: component ← min(component, labels[component]).
        # Every label IS a vertex id (it starts as the vertex itself and
        # only ever becomes some reachable vertex's id), so the lookup
        # join always matches; left+coalesce keeps it total anyway.
        # One extra shuffle per round buys O(log diameter) convergence.
        ptr = hopped.select(
            F.col("doc_id").alias("p_id"), F.col("component").alias("p_comp")
        )
        new_labels = (
            hopped.join(ptr, hopped.component == ptr.p_id, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("p_comp"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()  # eager: materialized here
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        release_checkpoint(labels)  # superseded; nothing references it
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        release_checkpoint(labels)
        release_checkpoint(sym)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "hop+jump rounds (component diameter > ~2^"
            f"{max_iter}); returning partial labels would split a "
            "dup cluster across a train/eval boundary — raise "
            "max_iter explicitly if the graph is genuinely that deep"
        )
    return register_checkpointed(labels, labels, sym)


def corpus_keep_set(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The end-to-end corpus-dedup decision table: exact-dup removal
    followed by near-dup cluster representative selection, one row per
    input doc.

    Output: ``(doc_id, kept, reason, rep)`` where

    * ``reason='exact_dup'`` — another doc with a smaller id has the
      same normalized-content fingerprint; ``rep`` is that doc.
    * ``reason='near_dup'`` — among exact survivors, MinHash-LSH pairs
      (Jaccard ≥ ``threshold``) connect this doc to a component whose
      smallest member id is ``rep``.
    * ``reason='kept'`` — the doc is its own representative
      (``kept=true``, ``rep=doc_id``); everything else has
      ``kept=false``.

    Filtering ``kept`` and joining back to the corpus materializes the
    deduped training set — see :func:`dedup_corpus`.

    Scale: one shuffle on the 128-bit fingerprint, then the standard
    banded-LSH pipeline over the (smaller) survivor set, then
    O(cluster-diameter) label-propagation joins.  Nothing here is
    quadratic; the decision table is one row per doc.
    """
    from ..functions.text import exact_fingerprint

    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    # min-per-fingerprint via a window, not a groupBy+self-join: one
    # scan subtree and one exchange (on fp), which Spark's ReuseExchange
    # dedupes across the dropped/survivor branches of the final union
    w = Window.partitionBy("fp")
    assign = (
        base.withColumn("fp", exact_fingerprint(F.col("text")))
        .withColumn("rep", F.min("doc_id").over(w))
        .drop("fp")
    )

    survivors = assign.filter(F.col("doc_id") == F.col("rep")).select(
        "doc_id", "text"
    )
    pairs = minhash_lsh_pairs(survivors, threshold=threshold)
    comp = connected_components(pairs.select("a", "b"))

    dropped_exact = assign.filter(F.col("doc_id") != F.col("rep")).select(
        "doc_id",
        F.lit(False).alias("kept"),
        F.lit("exact_dup").alias("reason"),
        F.col("rep"),
    )
    # component = min reachable id (≤ doc_id when present); the doc is
    # the cluster representative iff it IS that minimum (or is isolated)
    surv_out = (
        survivors.join(comp, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("component").isNull() | (F.col("component") == F.col("doc_id"))).alias("kept"),
            F.when(
                F.col("component").isNull() | (F.col("component") == F.col("doc_id")),
                F.lit("kept"),
            ).otherwise(F.lit("near_dup")).alias("reason"),
            F.coalesce(F.col("component"), F.col("doc_id")).alias("rep"),
        )
    )
    from .cache import propagate_persisted

    # minhash_lsh_pairs persisted its shingle arrays and
    # connected_components its labels/edges; move both handles to the
    # unioned result so release_persisted() frees everything
    out = propagate_persisted(dropped_exact.unionByName(surv_out), pairs)
    return propagate_persisted(out, comp)


def dedup_corpus(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The deduped corpus itself: input rows (full width) whose doc_id
    is in the keep set.  Write with ``.write.parquet(path)`` — the
    decision table is one broadcast-or-shuffle semi-join away from the
    corpus scan, so the materialization plan is scan→join→write."""
    from .cache import propagate_persisted

    decisions = corpus_keep_set(docs, threshold, id_col, text_col)
    keep = decisions.filter("kept").select(F.col("doc_id").alias(id_col))
    return propagate_persisted(
        docs.join(keep, id_col, "left_semi"), decisions
    )
