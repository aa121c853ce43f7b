"""Text-analysis column functions (north-star: LLM training-data prep).

Everything here is built from JVM-side ``pyspark.sql.functions`` —
no Python UDFs — so the expressions stay inside whole-stage codegen
and scale linearly with the scan.  Each has an exact SQL twin used by
the DuckDB oracles (same tokenization regex, same hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization contract shared with the oracles: lowercase, split on
# runs of non-alphanumerics, drop empty tokens.
TOKEN_SPLIT_RE = "[^a-z0-9]+"

STOPWORDS_EN = ["the", "a", "an", "of", "and", "to", "in", "is", "on", "for"]

# tiny per-language marker lexicons for the n-gram/stopword language
# heuristic (documents.lang ∈ en/zh/de/fr/es in the test tables)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "la", "los", "y", "es", "una"],
    "zh": ["de", "shi", "bu", "le", "wo", "zai"],
}


def tokens(col) -> Column:
    """text → array<string> of lowercase alphanumeric tokens."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(col) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def avg_token_len(col) -> Column:
    """Mean token length, NULL for token-free text (no div-by-zero
    under ANSI mode)."""
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total.cast("double") / F.nullif(F.size(toks), F.lit(0)), 4)


def punct_ratio(col) -> Column:
    """Fraction of characters that are sentence punctuation.

    Counted as the length drop from ``translate``-deleting the
    punctuation class — bit-identical to the historical
    ``regexp_replace(col, '[^.,;:!?]', '')`` length but a per-char
    table lookup instead of a regex-engine pass over the text
    (r13 optimization, guide §1.2 step 2)."""
    punct = F.length(col) - F.length(F.translate(col, ".,;:!?", ""))
    return F.round(punct.cast("double") / F.nullif(F.length(col), F.lit(0)), 6)


def stopword_ratio(col, stopwords=None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    toks = tokens(col)
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.round(n_sw.cast("double") / F.nullif(F.size(toks), F.lit(0)), 6)


def quality_score(col) -> Column:
    """Composite quality heuristic in [0,1]: long enough, readable
    token lengths, some stopword mass, not punctuation soup.
    (Shape follows public C4/Gopher-style filters.)

    The token array is BOUND ONCE via a 1-element-array transform
    (``element_at(transform(array(tokens), score), 1)``): composing
    token_count/avg_token_len/stopword_ratio directly would inline
    the tokenizer regex into each term — HOF-bearing subexpressions
    sit outside codegen subexpression elimination, so the split ran
    4× per row (the honest noop-materialized scaling probe surfaced
    the cost).  Terms and their roundings are byte-identical to the
    composed form."""

    def _score(toks):
        n = F.size(toks)
        length_term = F.least(n.cast("double") / 50.0, F.lit(1.0))
        total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        atl = F.round(total_len.cast("double") / F.nullif(n, F.lit(0)), 4)
        token_term = F.when((atl >= 3) & (atl <= 10), 1.0).otherwise(0.5)
        sw = F.array(*[F.lit(s) for s in STOPWORDS_EN])
        swr = F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("double")
            / F.nullif(n, F.lit(0)),
            6,
        )
        sw_term = F.when(swr >= 0.05, 1.0).otherwise(0.6)
        punct_term = F.when(punct_ratio(col) <= 0.1, 1.0).otherwise(0.5)
        return F.round(
            0.4 * length_term + 0.2 * token_term + 0.2 * sw_term + 0.2 * punct_term, 6
        )

    return F.element_at(F.transform(F.array(tokens(col)), _score), 1)


def lang_scores(col) -> dict:
    """Per-language marker-hit counts (the n-gram language-ID
    heuristic's evidence)."""
    toks = tokens(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_guess(col) -> Column:
    """argmax of lang_scores with deterministic tie-break (priority
    order en>de>fr>es>zh); 'und' when no marker hits.

    Computed inside ONE bound-token lambda (quality_score's idiom):
    composing lang_scores directly referenced each per-language score
    expression 2-3× (greatest + the when-chain), re-running the
    tokenizer ~15× per row outside codegen CSE."""

    def _guess(toks):
        scores = {}
        for lang, markers in LANG_MARKERS.items():
            arr = F.array(*[F.lit(m) for m in markers])
            scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        langs = list(LANG_MARKERS)
        best = F.greatest(*[scores[l] for l in langs])
        expr = F.when(best == 0, "und")
        for l in langs:
            expr = expr.when(scores[l] == best, l)
        return expr

    return F.element_at(F.transform(F.array(tokens(col)), _guess), 1)


def fingerprint(col) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (near-canonical form; catches shuffled copies).
    The reference's md5-packet-dedup motif (PcapReader.java:183-188)
    lifted to documents."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col))))
    return F.md5(canon)


def exact_fingerprint(col) -> Column:
    """Whitespace-normalized exact-content fingerprint."""
    norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(norm)


# GPT-2-style pretokenizer shape: letter runs, digit runs, punctuation
# runs — the cheap token-budget estimator for LLM data prep.
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_pretoken_count(col) -> Column:
    """Count of BPE-style pretokens (letters/digits/punct runs) — a
    closer proxy for LLM token budgets than whitespace words."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_RE), 0))


# PII redaction contract shared with the oracles.  Patterns are kept
# inside the Java-regex ∩ RE2 common dialect (char classes, bounded
# repeats, \b word boundaries — no lookaround) so Spark and DuckDB
# produce byte-identical scrubbed text.  Replacement order matters
# and is part of the contract: emails first (their local parts may
# contain digit runs a later pattern would chew on), then dotted
# quads, then free-form phone runs (whose class excludes '.' so it
# can never straddle an IP).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
]


def pii_counts(col) -> dict:
    """Per-category PII match counts (pre-redaction), JVM-side."""
    return {
        name: F.regexp_count(col, F.lit(pat)) for name, pat, _repl in PII_PATTERNS
    }


def scrub_pii(col) -> Column:
    """Redact emails, IPv4 addresses and phone-like digit runs.
    Pure regexp_replace chain — stays in whole-stage codegen; at
    100 TB this is a map-only pass over the corpus scan."""
    out = col
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def bigrams(col) -> Column:
    """text → array of adjacent token bigrams ("tok_i tok_i+1").
    Empty array for 0/1-token text.  JVM-side (zip_with over two
    slices) — stays in whole-stage codegen."""
    toks = tokens(col)
    n = F.size(toks)
    bg = F.zip_with(
        F.slice(toks, F.lit(1), n - 1),
        F.slice(toks, F.lit(2), n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.when(n >= 2, bg).otherwise(F.array().cast("array<string>"))


# Gopher-style quality rule thresholds (Rae et al. 2021, Table A1
# shape).  Word-count and repetition bounds are re-tuned to the
# synthetic corpus (10-99 words/doc) so each rule keeps AND drops
# documents; the mean-word-length band [3, 10] is the published one.
GOPHER_WC_MIN, GOPHER_WC_MAX = 25, 80
GOPHER_MWL_MIN, GOPHER_MWL_MAX = 3.0, 10.0
GOPHER_STOPWORD_MIN = 0.03


def _gopher_terms(toks):
    """(wc_ok, mwl_ok, sw_ok) from a BOUND token-array column —
    roundings identical to avg_token_len / stopword_ratio."""
    n = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    atl = F.round(total_len.cast("double") / F.nullif(n, F.lit(0)), 4)
    swarr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    swr = F.round(
        F.size(F.filter(toks, lambda t: F.array_contains(swarr, t))).cast("double")
        / F.nullif(n, F.lit(0)),
        6,
    )
    return (
        n.between(GOPHER_WC_MIN, GOPHER_WC_MAX),
        (atl >= GOPHER_MWL_MIN) & (atl <= GOPHER_MWL_MAX),
        swr >= GOPHER_STOPWORD_MIN,
    )


def gopher_flags_struct(col) -> Column:
    """All three Gopher rule verdicts as ONE struct column with the
    token array bound once (same 1-element-array transform idiom as
    quality_score — the composed per-flag form re-ran the tokenizer
    regex up to 5× per row).  Project this to a column FIRST, then
    select its fields: CollapseProject keeps the non-cheap,
    multiply-referenced struct in its own projection."""

    def _flags(toks):
        wc_ok, mwl_ok, sw_ok = _gopher_terms(toks)
        return F.struct(
            wc_ok.alias("wc_ok"), mwl_ok.alias("mwl_ok"), sw_ok.alias("sw_ok")
        )

    return F.element_at(F.transform(F.array(tokens(col)), _flags), 1)


def gopher_keep(col) -> Column:
    """The conjunction of all Gopher rules as a SINGLE boolean column
    — the form to use in a ``filter()``: predicate pushdown
    substitutes projected aliases into filter conditions, so a
    three-field struct access would re-expand the struct 3×; one
    boolean evaluates the rules once wherever the filter lands."""

    def _keep(toks):
        wc_ok, mwl_ok, sw_ok = _gopher_terms(toks)
        return wc_ok & mwl_ok & sw_ok

    return F.element_at(F.transform(F.array(tokens(col)), _keep), 1)


def gopher_flags(col):
    """The per-document Gopher rule verdicts as named boolean columns:
    word-count band, mean-word-length band, minimum stopword mass.
    Each entry re-derives from its own bound-token lambda — fine for
    single-flag use; project :func:`gopher_flags_struct` once instead
    when selecting several flags in one projection."""
    s = gopher_flags_struct(col)
    return {k: s[k] for k in ("wc_ok", "mwl_ok", "sw_ok")}
