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
    """Fraction of characters that are sentence punctuation."""
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    return F.round(punct.cast("double") / F.nullif(F.length(col), F.lit(0)), 6)


def stopword_ratio(col, stopwords=None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    toks = tokens(col)
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.round(n_sw.cast("double") / F.nullif(F.size(toks), F.lit(0)), 6)


def quality_score(col) -> Column:
    """Composite quality heuristic in [0,1]: long enough, readable
    token lengths, some stopword mass, not punctuation soup.
    (Shape follows public C4/Gopher-style filters.)"""
    n = token_count(col)
    length_term = F.least(n.cast("double") / 50.0, F.lit(1.0))
    atl = avg_token_len(col)
    token_term = F.when((atl >= 3) & (atl <= 10), 1.0).otherwise(0.5)
    sw_term = F.when(stopword_ratio(col) >= 0.05, 1.0).otherwise(0.6)
    punct_term = F.when(punct_ratio(col) <= 0.1, 1.0).otherwise(0.5)
    return F.round(0.4 * length_term + 0.2 * token_term + 0.2 * sw_term + 0.2 * punct_term, 6)


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
    order en>de>fr>es>zh); 'und' when no marker hits."""
    scores = lang_scores(col)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[l] for l in langs])
    expr = F.when(best == 0, "und")
    for l in langs:
        expr = expr.when(scores[l] == best, l)
    return expr


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


def gopher_flags(col):
    """The per-document Gopher rule verdicts as named boolean columns:
    word-count band, mean-word-length band, minimum stopword mass."""
    wc = token_count(col)
    atl = avg_token_len(col)
    sw = stopword_ratio(col)
    return {
        "wc_ok": wc.between(GOPHER_WC_MIN, GOPHER_WC_MAX),
        "mwl_ok": (atl >= GOPHER_MWL_MIN) & (atl <= GOPHER_MWL_MAX),
        "sw_ok": sw >= GOPHER_STOPWORD_MIN,
    }
