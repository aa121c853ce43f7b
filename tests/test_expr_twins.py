"""r14 plan-construction rewrites: every F.expr-string constructor
must be SEMANTICS-IDENTICAL to the historical Column form it replaced
(VERDICT r13 item 5 — the rewrite is only legal if the parsed tree is
the same tree, so results and the DuckDB oracles cannot move).

Each test keeps the pre-r14 Column constructor VERBATIM as the
reference and pins ``DataFrame.sameSemantics`` (canonicalized
logical-plan equality — stronger than result equality: same results
on every possible input)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hadoop_pcap_spark.operators import dedup as DD
from hadoop_pcap_spark.operators.dedup import HEX_DIGITS


@pytest.fixture()
def tok(spark):
    return spark.createDataFrame(
        [(1, "alpha"), (1, "beta"), (2, "gamma")], "doc_id long, token string"
    )


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "x y")], "doc_id long, text string"
    )


def _old_simhash_bits(tok, bits, scheme):
    """Pre-r14 Column form, verbatim (dedup.py @ r13)."""
    h = F.md5(F.col("token"))

    def vote(i: int):
        if scheme == "parity":
            digit = F.instr(F.lit(HEX_DIGITS), F.substring(h, i + 1, 1)) - 1
            cond = digit % 2 == 1
        else:
            digit = F.instr(F.lit(HEX_DIGITS), F.substring(h, i // 4 + 1, 1)) - 1
            cond = digit.bitwiseAND(F.lit(1 << (i % 4))) != 0
        return F.sum(F.when(cond, 1).otherwise(-1)).alias(f"v{i}")

    agg = tok.groupBy("doc_id").agg(*[vote(i) for i in range(bits)])
    terms = [
        F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(bits)
    ]
    return agg.select("doc_id", sum(terms[1:], start=terms[0]).alias("simhash"))


def test_simhash_bits_parity_semantics(spark, tok):
    assert DD.simhash_bits(tok, 16, "parity").sameSemantics(
        _old_simhash_bits(tok, 16, "parity")
    )


def test_simhash_bits_nibble_semantics(spark, tok):
    assert DD.simhash_bits(tok, 60, "nibble").sameSemantics(
        _old_simhash_bits(tok, 60, "nibble")
    )


def _old_doc_shingle_arrays(docs, k, id_col="doc_id", text_col="text"):
    """Pre-r14 Column form, verbatim."""
    from hadoop_pcap_spark.functions.text import tokens

    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    )
    t = F.col("_toks")
    parts = lambda i: [F.element_at(t, i + j + 1) for j in range(k)]  # noqa: E731
    shingles = F.when(
        F.size(t) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - k),
            lambda i: F.concat_ws(" ", *parts(i)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", t)))
    return base.select(
        "doc_id", F.array_distinct(shingles).alias("arr")
    ).withColumn("sz", F.size("arr"))


@pytest.mark.parametrize("k", [3, 5, 8])
def test_doc_shingle_arrays_semantics(spark, docs, k):
    assert DD.doc_shingle_arrays(docs, k).sameSemantics(
        _old_doc_shingle_arrays(docs, k)
    )


def _old_md5_halves(col):
    h = F.md5(col)
    return F.struct(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint").alias("ha"),
        F.conv(F.substring(h, 17, 15), 16, 10).cast("bigint").alias("hb"),
    )


def _old_minhash_signatures(tok, n_hashes):
    with_h = tok.select("doc_id", _old_md5_halves(F.col("token")).alias("h"))
    aggs = [
        F.min(F.col("h.ha") + F.lit(i) * F.col("h.hb")).alias(f"m{i}")
        for i in range(n_hashes)
    ]
    return with_h.groupBy("doc_id").agg(*aggs)


def test_minhash_signatures_semantics(spark, tok):
    assert DD.minhash_signatures(tok, 8).sameSemantics(
        _old_minhash_signatures(tok, 8)
    )


def _old_minhash_signatures_from_arrays(arrays, n_hashes):
    halved = arrays.select(
        "doc_id", F.transform(F.col("arr"), _old_md5_halves).alias("hs")
    )
    cols = [
        F.array_min(
            F.transform(F.col("hs"), lambda x: x["ha"] + F.lit(i) * x["hb"])
        ).alias(f"m{i}")
        for i in range(n_hashes)
    ]
    return halved.select("doc_id", *cols)


def test_minhash_signatures_from_arrays_semantics(spark, docs):
    arrays = DD.doc_shingle_arrays(docs, 3)
    assert DD.minhash_signatures_from_arrays(arrays, 8).sameSemantics(
        _old_minhash_signatures_from_arrays(arrays, 8)
    )


def _old_lsh_bands(sigs, n_bands, n_hashes):
    per_band = n_hashes // n_bands
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"m{b * per_band + j}") for j in range(per_band)]
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("key"),
            )
        )
    return (
        sigs.select("doc_id", F.explode(F.array(*bands)).alias("bk"))
        .select(
            "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
        )
    )


def test_lsh_bands_semantics(spark, docs):
    sigs = DD.minhash_signatures_from_arrays(DD.doc_shingle_arrays(docs, 3), 8)
    assert DD.lsh_bands(sigs, 4, 8).sameSemantics(_old_lsh_bands(sigs, 4, 8))


def _old_candidate_pairs(bands, max_bucket=64):
    buckets = bands.groupBy("band", "key").agg(
        F.collect_list("doc_id").alias("members")
    )
    buckets = buckets.withColumn("amin", F.array_min("members"))
    m = F.col("members")
    amin = F.col("amin")
    clique = F.flatten(
        F.transform(
            m,
            lambda x: F.transform(
                F.filter(m, lambda y: y > x),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    star = F.transform(
        F.filter(m, lambda y: y != amin),
        lambda y: F.struct(amin.alias("a"), y.alias("b")),
    )
    pair_arr = F.when(F.size(m) <= max_bucket, clique).otherwise(star)
    return (
        buckets.select(F.explode_outer(pair_arr).alias("p"))
        .filter(F.col("p").isNotNull())
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .distinct()
    )


def test_candidate_pairs_semantics(spark, docs):
    bands = DD.lsh_bands(
        DD.minhash_signatures_from_arrays(DD.doc_shingle_arrays(docs, 3), 8), 4, 8
    )
    assert DD.candidate_pairs(bands).sameSemantics(_old_candidate_pairs(bands))


def _old_duplicate_spans_shingle(base, k):
    """The positioned-shingle projection of duplicate_spans, pre-r14
    Column form, verbatim (contamination.py @ r13)."""
    t = F.col("_toks")
    parts = lambda i: [F.element_at(t, i + j + 1) for j in range(k)]  # noqa: E731
    shingle_arr = F.transform(
        F.sequence(F.lit(0), F.size(t) - k),
        lambda i: F.concat_ws(" ", *parts(i)),
    )
    return base.select("doc_id", F.posexplode_outer(shingle_arr).alias("i", "s"))


def test_duplicate_spans_shingle_semantics(spark, docs):
    from hadoop_pcap_spark.functions.text import tokens

    k = 8
    base = docs.select(
        F.col("doc_id"), tokens(F.col("text")).alias("_toks")
    ).filter(F.size("_toks") >= k)
    parts = ", ".join(f"element_at(_toks, i + {j} + 1)" for j in range(k))
    new = base.select(
        "doc_id",
        F.posexplode_outer(
            F.expr(
                f"transform(sequence(0, size(_toks) - {k}), "
                f"i -> concat_ws(' ', {parts}))"
            )
        ).alias("i", "s"),
    )
    assert new.sameSemantics(_old_duplicate_spans_shingle(base, k))


def _old_grams_for(n: int):
    t = F.col("_toks")
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(
                    " ", *[F.element_at(t, i + j + 1) for j in range(n)]
                ).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<n:int,g:string>>"))


def test_repetition_signals_semantics(spark, docs):
    """Whole-operator pin: repetition_signals' r14 expr-string grams
    must equal the r13 Column-form operator end to end."""
    from hadoop_pcap_spark.functions import explode_tokens
    from hadoop_pcap_spark.functions.text import tokens
    from hadoop_pcap_spark.operators.repetition import repetition_signals

    top_ns, dup_n = (2, 3, 4), 6
    base = docs.repartition(F.col("doc_id")).select(
        F.col("doc_id").alias("doc_id"), tokens(F.col("text")).alias("_toks")
    ).filter(F.size("_toks") >= 1)
    base = base.withColumn(
        "total_chars", F.length(F.concat_ws(" ", F.col("_toks")))
    )
    all_ns = list(dict.fromkeys(list(top_ns) + [dup_n]))
    all_grams = F.concat(*[_old_grams_for(n) for n in all_ns])
    pairs = explode_tokens(base, all_grams, "s", "doc_id", "total_chars").select(
        "doc_id", "total_chars", F.col("s.n").alias("n"), F.col("s.g").alias("g")
    )
    counts = pairs.groupBy("doc_id", "total_chars", "n", "g").agg(
        F.count("*").alias("c")
    )
    aggs = [
        F.max(F.when(F.col("n") == n, F.col("c") * F.length("g"))).alias(f"_top{n}")
        for n in top_ns
    ] + [
        F.sum(
            F.when(
                (F.col("n") == dup_n) & (F.col("c") >= 2),
                (F.col("c") - 1) * F.length("g"),
            )
        ).alias("_dup")
    ]
    per = counts.groupBy("doc_id", "total_chars").agg(*aggs)
    out_cols = [
        F.round(
            F.coalesce(F.col(f"_top{n}"), F.lit(0))
            / F.nullif(F.col("total_chars"), F.lit(0)),
            6,
        ).alias(f"top{n}_gram_char_frac")
        for n in top_ns
    ] + [
        F.round(
            F.coalesce(F.col("_dup"), F.lit(0))
            / F.nullif(F.col("total_chars"), F.lit(0)),
            6,
        ).alias(f"dup{dup_n}_gram_char_frac")
    ]
    old = per.select("doc_id", *out_cols)
    assert repetition_signals(docs).sameSemantics(old)
