"""Trained text-quality classifier (the CCNet / fastText-filter motif).

The heuristic quality scores in ``functions/text.py`` are fixed rules;
real curation pipelines instead TRAIN a lightweight linear classifier
on document features and keep what scores above a margin (CCNet's
fastText LM-filter, GPT-3's LR quality filter over CommonCrawl).  This
module is that operator, built so the distributed scoring pass is
hash-checkable by the driver:

* **Features** are six exact-rational document statistics (token
  count, type/token ratio, mean token length, stopword ratio,
  punctuation density, digit-token ratio).  Every one is a ratio of
  integer counts computed by the SAME tokenization contract the other
  text oracles already hash-verify (``TOKEN_SPLIT_RE``), and IEEE
  division of identical ints is correctly rounded in both engines, so
  the Spark feature vector and the DuckDB feature vector agree
  bit-for-bit — no transcendental enters a compared value.
* **Training** is deterministic full-batch logistic-regression
  gradient descent (fixed iterations, float64, zero init) on a
  bounded ``ORDER BY doc_id LIMIT n`` sample, against weak labels
  derived from the features themselves (the public weak-supervision
  shortcut: seed the classifier from rule labels, the rules being the
  Gopher-ish bands).  The operator trains on Spark-collected features;
  the generated oracle (plans/pipeline.py) retrains on DuckDB-fetched
  features through THIS module's helpers — identical X → identical
  weights, the plans/ann_oracles.py model-replay pattern.
* **Scoring** emits the linear margin w·x + b (monotone in the
  logistic probability — the sigmoid is deliberately NOT applied to a
  compared value, keeping ``exp``'s last-ulp libm variance out of the
  gate).  The multiply-add chain is written left-to-right in both
  engines; Spark/JVM evaluates it as discrete IEEE multiply-then-add
  while DuckDB's compiled expression CONTRACTS it to fused
  multiply-add, so unrounded margins can differ in the final ulp
  (~1e-16 relative — measured, tests/test_classify.py).  Every
  compared value therefore goes through ROUND(margin, 6), including
  the keep decision, which both engines take on the ROUNDED margin.

Scale: the sample collect is a bounded TakeOrderedAndProject (2048
rows × 6 doubles); weights are 7 plan literals; the scoring pass is
pure whole-stage-codegen arithmetic over one scan — no shuffle, no
Python in the hot path.  At 100 TB this is a map-only pass, exactly
like the heuristic filters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS_EN, tokens

FEATURE_NAMES = ("x_len", "x_ttr", "x_atl", "x_stop", "x_punct", "x_digit")

# weak-label bands (in normalized feature units; see weak_labels)
_MIN_TOKENS = 30.0 / 256.0
_MIN_STOP = 0.03
_ATL_LO, _ATL_HI = 2.0 / 16.0, 12.0 / 16.0


def feature_struct(text_col) -> Column:
    """All six features as one struct, the token array bound ONCE via
    the 1-element-array transform idiom (quality_score's fix: HOF
    subexpressions sit outside codegen CSE, so composing the features
    naively re-runs the tokenizer regex per feature)."""

    def _feats(toks):
        nt = F.size(toks)
        ntd = nt.cast("double")
        tot = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        sw = F.array(*[F.lit(s) for s in STOPWORDS_EN])
        nsw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        # exact non-regex forms (r13 optimization, guide §1.2 step 2):
        # a token matches ^[0-9]+$ iff it is nonempty and deleting the
        # digits empties it, and the punctuation count is the length
        # drop from deleting the punctuation class — translate() is a
        # per-char table lookup vs a regex-engine pass per token/text
        # (measured 1.29 → 0.57 cpu-s on the sf0.1 feature pass);
        # feature values are bit-identical (equality pytested)
        ndig = F.size(
            F.filter(
                toks,
                lambda t: (F.length(t) > 0)
                & (F.length(F.translate(t, "0123456789", "")) == 0),
            )
        )
        nlen = F.length(text_col)
        npunct = nlen - F.length(F.translate(text_col, ".,;:!?", ""))

        def ratio(num, den):
            return F.when(den == 0, F.lit(0.0)).otherwise(
                num.cast("double") / den.cast("double")
            )

        return F.struct(
            (F.least(ntd, F.lit(256.0)) / 256.0).alias("x_len"),
            ratio(F.size(F.array_distinct(toks)), nt).alias("x_ttr"),
            F.when(nt == 0, F.lit(0.0))
            .otherwise(
                F.least(tot.cast("double") / ntd, F.lit(16.0)) / 16.0
            )
            .alias("x_atl"),
            ratio(nsw, nt).alias("x_stop"),
            ratio(npunct, nlen).alias("x_punct"),
            ratio(ndig, nt).alias("x_digit"),
        )

    return F.element_at(F.transform(F.array(tokens(text_col)), _feats), 1)


def feature_sql(tokens_sql: str, text_expr: str = "text") -> str:
    """DuckDB twin of :func:`feature_struct` — six projections over a
    CTE that has already bound ``{tokens_sql}`` as ``T``.  Kept next
    to the Spark expressions so a drift in one is a one-screen diff."""
    stop = "[" + ", ".join(f"'{s}'" for s in STOPWORDS_EN) + "]"
    return f"""
      LEAST(CAST(len(T) AS DOUBLE), 256.0) / 256.0 AS x_len,
      CASE WHEN len(T) = 0 THEN 0.0
           ELSE CAST(len(list_distinct(T)) AS DOUBLE) / CAST(len(T) AS DOUBLE)
      END AS x_ttr,
      CASE WHEN len(T) = 0 THEN 0.0
           ELSE LEAST(CAST(list_sum(list_transform(T, t -> length(t))) AS DOUBLE)
                      / CAST(len(T) AS DOUBLE), 16.0) / 16.0
      END AS x_atl,
      CASE WHEN len(T) = 0 THEN 0.0
           ELSE CAST(len(list_filter(T, t -> list_contains({stop}, t))) AS DOUBLE)
                / CAST(len(T) AS DOUBLE)
      END AS x_stop,
      CASE WHEN length({text_expr}) = 0 THEN 0.0
           ELSE CAST(length(regexp_replace({text_expr}, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                / CAST(length({text_expr}) AS DOUBLE)
      END AS x_punct,
      CASE WHEN len(T) = 0 THEN 0.0
           ELSE CAST(len(list_filter(T, t -> regexp_matches(t, '^[0-9]+$'))) AS DOUBLE)
                / CAST(len(T) AS DOUBLE)
      END AS x_digit"""


def weak_labels(X):
    """Rule labels the classifier is seeded from: long enough, some
    stopword mass, readable mean token length (all in normalized
    feature units).  Shared by operator and oracle."""
    import numpy as np

    return (
        (X[:, 0] >= _MIN_TOKENS)
        & (X[:, 3] >= _MIN_STOP)
        & (X[:, 2] >= _ATL_LO)
        & (X[:, 2] <= _ATL_HI)
    ).astype(np.float64)


def train_lr(X, n_iter: int = 300, lr: float = 1.0):
    """Deterministic full-batch logistic GD from zero init; returns
    (weights[6], bias).  Bit-reproducible for identical X on one host
    (fixed iteration count, float64 throughout, no shuffling).

    Runs under a single-threaded BLAS pool (r13 optimization): the
    2048×6 matmuls are far too small for OpenBLAS's default
    all-cores pool, whose per-call spin-wait charged ~35 fake
    cpu-seconds (and ~1 s wall) per 300-iteration train to the
    process tree.  BOTH oracle arms share this function
    (quality_classifier_margins and oracle_weights), so the trained
    weights stay arm-consistent by construction."""
    import numpy as np

    from .._blas import single_threaded_blas

    X = np.asarray(X, dtype=np.float64)
    y = weak_labels(X)
    n = float(len(X))
    w = np.zeros(X.shape[1], dtype=np.float64)
    b = 0.0
    with single_threaded_blas():
        for _ in range(n_iter):
            z = X @ w + b
            p = 1.0 / (1.0 + np.exp(-z))
            err = p - y
            w -= lr * (X.T @ err) / n
            b -= lr * float(err.sum()) / n
    return w, b


def margin_expr(w, b, fs) -> Column:
    """Left-to-right literal multiply-add chain over the feature
    struct ``fs`` — parenthesization mirrors :func:`margin_sql`."""
    m = F.lit(float(w[0])) * fs["x_len"]
    for i, name in enumerate(FEATURE_NAMES[1:], start=1):
        m = m + F.lit(float(w[i])) * fs[name]
    return m + F.lit(float(b))


def margin_sql(w, b) -> str:
    """DuckDB twin of :func:`margin_expr` (same literal reprs, same
    left-associative chain)."""
    terms = " + ".join(
        f"{float(w[i])!r} * {name}" for i, name in enumerate(FEATURE_NAMES)
    )
    return f"{terms} + {float(b)!r}"


def quality_classifier_margins(
    docs: DataFrame,
    sample_size: int = 2048,
    n_iter: int = 300,
    lr: float = 1.0,
) -> DataFrame:
    """Train on a bounded sample, score every document: returns
    ``(doc_id, source, margin)`` with margin > 0 ⇔ keep."""
    fs = feature_struct(F.col("text")).alias("fs")
    sample = (
        docs.orderBy("doc_id")
        .limit(sample_size)
        .select(fs)
        .select(*[F.col(f"fs.{n}") for n in FEATURE_NAMES])
        .collect()
    )
    import numpy as np

    w, b = train_lr(np.array(sample, dtype=np.float64), n_iter, lr)
    # deliberately NOT spread: with the translate() feature rewrites
    # the full scoring pass is ~1 cpu-s at sf0.1 — an interleaved A/B
    # (min-of-8) measured 0.72 s unspread vs 0.91 s spread, i.e. the
    # repartition costs more than it parallelizes at validation scale,
    # and at real scale the many-file scan parallelizes it anyway
    featured = docs.select("doc_id", "source", fs)
    return featured.select(
        "doc_id", "source", margin_expr(w, b, F.col("fs")).alias("margin")
    )


def oracle_weights(sf_dir: str, tokens_sql: str, sample_size: int = 2048,
                   n_iter: int = 300, lr: float = 1.0):
    """Retrain the exact model from DuckDB-fetched features of the
    same ``ORDER BY doc_id LIMIT n`` sample — the model-replay oracle
    arm (plans/ann_oracles.py pattern)."""
    import duckdb
    import numpy as np

    sql = f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql} AS T, text
      FROM read_parquet('{sf_dir}/documents.parquet')
      ORDER BY doc_id LIMIT {sample_size})
    SELECT {feature_sql(tokens_sql)} FROM toks ORDER BY doc_id
    """
    X = np.array(duckdb.sql(sql).fetchall(), dtype=np.float64)
    return train_lr(X, n_iter, lr)
