"""Unit semantics for operators/retrieval.py: BM25 scoring vs a
hand-computed value, group quotas (cap binds, determinism, hot-group
behavior), and DSIR importance weights (target-like docs rank above
off-target ones; weights are partitioning-invariant)."""

import math

import pytest
from pyspark.sql import functions as F

from hadoop_pcap_spark.operators import released
from hadoop_pcap_spark.operators.retrieval import (
    bm25_score,
    dsir_log_weights,
    group_quota,
)


def _rows(df):
    """Collect and release the operator's persisted intermediate —
    the cache-hygiene contract shared with the dedup tests."""
    with released(df, blocking=True) as d:
        return d.collect()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBM25:
    def test_hand_computed_score(self, spark):
        # 3 docs; query = ["cat"].  N=3, df=2, dl = 4/4/2, avgdl = 10/3.
        docs = _docs(
            spark,
            [
                (0, "cat dog cat bird"),  # tf=2, dl=4
                (1, "dog dog fish bird"),  # no match
                (2, "cat fish"),  # tf=1, dl=2
            ],
        )
        got = {
            r.doc_id: r.score
            for r in _rows(bm25_score(docs, ["cat"]))
        }
        assert set(got) == {0, 2}

        def bm25(tf, dl, n=3.0, df=2, k1=1.2, b=0.75, avgdl=10 / 3):
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            return round(
                idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6
            )

        assert got[0] == pytest.approx(bm25(2, 4), abs=1e-6)
        assert got[2] == pytest.approx(bm25(1, 2), abs=1e-6)

    def test_multi_term_sums_per_term_contributions(self, spark):
        docs = _docs(spark, [(0, "cat dog"), (1, "cat cat"), (2, "fish")])
        one = {
            r.doc_id: r.score
            for r in _rows(bm25_score(docs, ["cat"]))
        }
        two = {
            r.doc_id: r.score
            for r in _rows(bm25_score(docs, ["cat", "dog"]))
        }
        dog = {
            r.doc_id: r.score
            for r in _rows(bm25_score(docs, ["dog"]))
        }
        assert two[0] == pytest.approx(one[0] + dog[0], abs=2e-6)
        assert two[1] == one[1]  # doc 1 has no "dog" contribution

    def test_no_match_no_row(self, spark):
        docs = _docs(spark, [(0, "alpha beta"), (1, "gamma")])
        assert len(_rows(bm25_score(docs, ["zzz"]))) == 0


class TestGroupQuota:
    def _df(self, spark):
        rows = [(i, "hot" if i < 40 else "cold") for i in range(50)]
        return spark.createDataFrame(rows, "doc_id long, grp string")

    def test_cap_binds_per_group(self, spark):
        out = group_quota(
            self._df(spark), "grp", 5, tie_col="doc_id"
        ).collect()
        by_grp = {}
        for r in out:
            by_grp.setdefault(r.grp, []).append(r.qrank)
        assert sorted(by_grp["hot"]) == [1, 2, 3, 4, 5]
        assert sorted(by_grp["cold"]) == [1, 2, 3, 4, 5]

    def test_md5_priority_is_deterministic(self, spark):
        df = self._df(spark)
        a = {(r.doc_id, r.qrank) for r in
             group_quota(df, "grp", 5, tie_col="doc_id").collect()}
        b = {(r.doc_id, r.qrank) for r in
             group_quota(df, "grp", 5, tie_col="doc_id").collect()}
        assert a == b

    def test_explicit_priority_column(self, spark):
        df = spark.createDataFrame(
            [(1, "g", 0.9), (2, "g", 0.1), (3, "g", 0.5)],
            "doc_id long, grp string, prio double",
        )
        out = group_quota(
            df, "grp", 2, priority_col="prio", tie_col="doc_id"
        ).collect()
        # ascending priority: 0.1 (rank 1), 0.5 (rank 2); 0.9 cut
        assert {(r.doc_id, r.qrank) for r in out} == {(2, 1), (3, 2)}

    def test_requires_tie_col(self, spark):
        with pytest.raises(ValueError):
            group_quota(self._df(spark), "grp", 5)

    def test_plan_uses_window_group_limit(self, spark):
        plan = group_quota(
            self._df(spark), "grp", 5, tie_col="doc_id"
        )._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan


class TestDSIR:
    def test_target_like_docs_score_higher(self, spark):
        # target vocabulary {aa,bb}; off-target {xx,yy}.  A doc made of
        # target tokens must out-weight one made of off-target tokens.
        rows = (
            [(i, "aa bb aa bb", True) for i in range(10)]
            + [(100 + i, "xx yy xx yy", False) for i in range(10)]
            + [(200, "aa bb", False), (201, "xx yy", False)]
        )
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, is_target boolean"
        )
        w = {
            r.doc_id: r.log_weight
            for r in _rows(dsir_log_weights(docs, F.col("is_target")))
        }
        assert w[200] > 0 > w[201]
        assert w[200] > w[201]

    def test_weight_scales_with_length(self, spark):
        # doubling a doc's tokens doubles its log-weight (bag model)
        rows = [
            (0, "aa", True),
            (1, "aa", False),
            (2, "aa aa", False),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, is_target boolean"
        )
        w = {
            r.doc_id: r.log_weight
            for r in _rows(dsir_log_weights(docs, F.col("is_target")))
        }
        assert w[2] == pytest.approx(2 * w[1], abs=1e-7)

    def test_partitioning_invariance(self, spark):
        rows = [(i, f"tok{i % 7} tok{i % 3} aa", i % 2 == 0)
                for i in range(60)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, is_target boolean"
        )
        one = {
            (r.doc_id, r.log_weight)
            for r in _rows(
                dsir_log_weights(docs.coalesce(1), F.col("is_target"))
            )
        }
        many = {
            (r.doc_id, r.log_weight)
            for r in _rows(
                dsir_log_weights(docs.repartition(8), F.col("is_target"))
            )
        }
        assert one == many  # DECIMAL contribution sum ⇒ exact equality


def test_release_persisted_frees_retrieval_caches(spark):
    """bm25_score and dsir_log_weights persist one intermediate each;
    release_persisted must return the session to its prior cache
    footprint (same contract as the dedup operators)."""
    sc = spark.sparkContext
    docs = spark.createDataFrame(
        [(0, "aa bb", True), (1, "bb cc", False)],
        "doc_id long, text string, is_target boolean",
    )
    before = sc._jsc.sc().getPersistentRDDs().size()
    with released(bm25_score(docs, ["bb"]), blocking=True) as r:
        r.collect()
    with released(
        dsir_log_weights(docs, F.col("is_target")), blocking=True
    ) as r:
        r.collect()
    assert sc._jsc.sc().getPersistentRDDs().size() <= before


def test_bm25_matches_pure_python_reference(spark):
    """Equivalence on a seeded random corpus: the distributed plan must
    reproduce a from-scratch single-process BM25 (Lucene idf variant)
    for every matching doc, to the operator's 6-decimal rounding."""
    import random

    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(12)]
    corpus = {
        d: [rng.choice(vocab) for _ in range(rng.randint(1, 30))]
        for d in range(60)
    }
    query = ["w0", "w3", "w7"]

    n = float(len(corpus))
    avgdl = sum(len(t) for t in corpus.values()) / n
    df = {q: sum(q in t for t in corpus.values()) for q in query}
    k1, b = 1.2, 0.75

    def ref_score(toks):
        s = 0.0
        for q in query:
            tf = toks.count(q)
            if not tf or not df[q]:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += round(
                idf * tf * (k1 + 1)
                / (tf + k1 * (1 - b + b * len(toks) / avgdl)),
                6,
            )
        return round(s, 6)

    expected = {
        d: ref_score(t)
        for d, t in corpus.items()
        if any(q in t for q in query)
    }
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.score for r in _rows(bm25_score(docs, query))}
    assert set(got) == set(expected)
    for d in expected:
        assert got[d] == pytest.approx(expected[d], abs=2e-6), d


def test_dsir_xxhash64_path_same_semantics(spark):
    """The production hash knob changes bucket assignment, not the
    model: target-like docs still out-weight off-target ones, the
    weights are deterministic across calls, and an unknown hash_fn
    raises."""
    rows = (
        [(i, "aa bb aa bb", True) for i in range(10)]
        + [(100 + i, "xx yy xx yy", False) for i in range(10)]
        + [(200, "aa bb", False), (201, "xx yy", False)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, is_target boolean"
    )
    w1 = {
        r.doc_id: r.log_weight
        for r in _rows(
            dsir_log_weights(docs, F.col("is_target"), hash_fn="xxhash64")
        )
    }
    assert w1[200] > 0 > w1[201]
    w2 = {
        r.doc_id: r.log_weight
        for r in _rows(
            dsir_log_weights(docs, F.col("is_target"), hash_fn="xxhash64")
        )
    }
    assert w1 == w2
    with pytest.raises(ValueError):
        dsir_log_weights(docs, F.col("is_target"), hash_fn="sha1")


def test_bm25_null_text_excluded_from_avgdl(spark):
    """A NULL-text row must not poison avgdl: Spark's size(NULL) is -1
    under default legacy.sizeOfNull, so the operator guards _dl with a
    NULL (matching DuckDB's len(NULL), excluded from avg).  Scores
    over the remaining docs must equal the corpus-without-the-NULL-row
    scores exactly."""
    clean = _docs(spark, [(0, "cat dog cat bird"), (2, "cat fish")])
    with_null = spark.createDataFrame(
        [(0, "cat dog cat bird"), (1, None), (2, "cat fish")],
        "doc_id long, text string",
    )
    a = {r.doc_id: r.score for r in _rows(bm25_score(clean, ["cat"]))}
    # N differs (2 vs 3 docs) so recompute expected idf shift is
    # nontrivial — instead compare against a 3-doc corpus whose third
    # doc is EMPTY text (tokenizes to []), which DuckDB treats the
    # same as NULL for avgdl except size([])=0 enters avg... so the
    # strong check is: NULL text yields no score row and no error,
    # and the matched docs' doclen/avgdl terms use only non-NULL docs.
    b = {r.doc_id: r.score for r in _rows(bm25_score(with_null, ["cat"]))}
    assert set(b) == {0, 2}
    # avgdl over non-NULL docs is identical (4+2)/2 in both corpora;
    # only N (and thus idf) differs — verify by recomputing doc 2:
    import math as _m

    def score(tf, dl, n, df, avgdl, k1=1.2, bb=0.75):
        idf = _m.log(1 + (n - df + 0.5) / (df + 0.5))
        return round(
            idf * tf * (k1 + 1) / (tf + k1 * (1 - bb + bb * dl / avgdl)), 6
        )

    assert b[2] == pytest.approx(score(1, 2, 3.0, 2, 3.0), abs=1e-6)
    assert a[2] == pytest.approx(score(1, 2, 2.0, 2, 3.0), abs=1e-6)


def test_registry_retrieval_queries_release_their_caches(spark):
    """The registry wrappers derive .orderBy().limit() frames from the
    operators' results; propagate_persisted must carry the release
    handle so release_persisted on the REGISTRY result frees the
    operator's persisted intermediate (review r8: a bare derivation
    stranded the handle and the caches outlived every driver run)."""
    from hadoop_pcap_spark.operators.cache import release_persisted
    from hadoop_pcap_spark.plans import QUERIES, load_all

    load_all()
    sc = spark.sparkContext._jsc.sc()
    before = sc.getPersistentRDDs().size()
    for name in ("text_bm25_topk", "docs_dsir_importance"):
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        df.count()
        release_persisted(df, blocking=True)
    assert sc.getPersistentRDDs().size() <= before
