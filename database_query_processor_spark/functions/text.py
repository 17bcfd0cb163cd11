"""Text-analysis functions for training-data pipelines: tokenization,
language ID, quality scoring, token counting, fingerprinting.

All built from JVM-side `pyspark.sql.functions` (no Python UDFs in the
hot path) so they ride whole-stage codegen and scale linearly — at
100 TB these run as a single scan + map, no shuffle.

Determinism contract: every function here has an exactly-equivalent
ANSI-SQL form (see workload/extensions.py oracles) — tokenization
regex, stopword lists, and arithmetic are shared verbatim so DuckDB
reproduces results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared with the DuckDB oracles — change in lockstep.
TOKEN_SPLIT_RE = "[^a-z0-9]+"
PUNCT_RE = r"[^a-zA-Z0-9\s]"
CJK_RE = "[一-鿿]"

# Small public stopword lists (top function words per language).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as", "at", "this"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "den", "dem", "auf", "im", "sich"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que", "qui", "sur", "avec", "au", "du"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "en", "que", "para", "con", "por", "del", "se", "lo"],
}


def tokens(col: Column | str) -> Column:
    """Lowercased word tokens (empty strings from leading/trailing
    delimiters filtered out)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: F.length(x) > 0)


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-gram shingles as space-joined strings.

    Built as ONE flat concat of 2n-1 O(1) element_at lookups per
    position instead of concat_ws over a per-position slice() — the
    slice allocates a fresh n-element array for every gram, and that
    allocation measured ~40% of the whole bigram-build cost at sf0.1
    (r11 A/B: 0.50s -> 0.32s on the x32 bigram stage). Value-identical:
    tokens are non-null and space-free, so concat(el, ' ', el, ...)
    produces exactly concat_ws(' ', slice(...)). element_at indexes
    stay within 1..size(toks) (max i+n-1 = size), so ANSI strict
    indexing never trips.

    CALLER CONTRACT (r12): pass `toks` as a MATERIALIZED column (its
    own projection alias), never an inline tokenize expression — the
    element_at lookups sit inside a transform lambda, and higher-order
    functions are CodegenFallback (interpreted, no subexpression reuse
    across lambda invocations), so an inlined expression re-evaluates
    the full tokenize pipeline once per lookup: O(n·grams) tokenizes
    per document, measured 16x slower on the n=3 shingle map at sf0.1
    (14.4 s vs 0.9 s, artifacts/NGRAM_SHAPE_AB_r12.json). A plain
    projection boundary is enough — CollapseProject keeps it because
    the alias is non-cheap and multiply-referenced (a zip_with-over-
    slices shape that tolerates inline inputs measured 1.7x slower
    than this form on materialized input; same artifact)."""
    parts = lambda i: [  # noqa: E731
        piece
        for k in range(n)
        for piece in ([F.lit(" ")] if k else []) + [F.element_at(toks, i + k)]
    ]
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat(*parts(i)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _stopword_score(toks_distinct: Column, lang: str) -> Column:
    return F.size(F.array_intersect(toks_distinct, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


def lang_id(text: Column | str) -> Column:
    """N-gram-free language ID heuristic: CJK codepoints → zh, else
    argmax of distinct-stopword overlap (deterministic tie order
    en > de > fr > es; all-zero → 'und')."""
    c = F.col(text) if isinstance(text, str) else text
    td = F.array_distinct(tokens(c))
    s = {lang: _stopword_score(td, lang) for lang in STOPWORDS}
    # NULL text must stay NULL: every WHEN condition NULL-skips on
    # NULL input, so without the gate control falls through to the
    # tie-order ELSE and null-text rows get silently labeled 'es'.
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(c.rlike(CJK_RE), F.lit("zh"))
        .when((s["en"] == 0) & (s["de"] == 0) & (s["fr"] == 0) & (s["es"] == 0), F.lit("und"))
        .when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), F.lit("en"))
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), F.lit("de"))
        .when(s["fr"] >= s["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def punct_ratio(text: Column | str) -> Column:
    """Share of characters that are punctuation. Empty docs score 0,
    not NULL — denominator guarded like stopword_ratio (a NULL here
    would silently NULL quality_score and drop the doc from every
    score>threshold filter instead of scoring it low)."""
    c = F.col(text) if isinstance(text, str) else text
    return (F.length(c) - F.length(F.regexp_replace(c, PUNCT_RE, ""))) / F.greatest(
        F.length(c), F.lit(1)
    )


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Share of token OCCURRENCES that are stopwords. Zero-token docs
    (punctuation-only text) score 0, not NULL — the denominator is
    guarded exactly like the oracles' greatest(len(toks), 1)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))) / F.greatest(
        F.size(toks), F.lit(1)
    )


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: length saturation ×
    cleanliness × stopword naturalness (word-salad and punctuation
    soup both score low)."""
    c = F.col(text) if isinstance(text, str) else text
    n_toks = F.size(tokens(c))
    return (
        F.least(F.lit(1.0), n_toks / F.lit(50.0))
        * (F.lit(1.0) - punct_ratio(c))
        * (F.lit(0.5) + F.lit(0.5) * stopword_ratio(c))
    )


def ws_token_count(text: Column | str) -> Column:
    """Whitespace tokenizer count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.filter(F.split(c, r"\s+"), lambda x: F.length(x) > 0))


BPE_ISH_RE = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-flavored proxy count: letter runs are one token, each digit
    and each punctuation mark its own token (a cheap, deterministic
    stand-in for a real BPE vocab)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0))


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse
    whitespace, trim."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def content_fingerprint(text: Column | str) -> Column:
    """MD5 of the normalized text — the exact-dedup key. (The rolling
    winnowing fingerprint lives in operators/dedup.py simhash path.)"""
    return F.md5(normalize_text(text))


# PII scrubbing — patterns kept in the Java∩RE2 common dialect so the
# DuckDB oracle applies byte-identical replacements.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://\S+"


def pii_scrub(text: Column | str) -> Column:
    """Training-data PII redaction: URLs then emails replaced with
    placeholder tokens. Single scan-side map (two regex passes inside
    one projection); extend the chain for phones/ids/keys the same
    way."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(
        F.regexp_replace(c, URL_RE, "<URL>"), EMAIL_RE, "<EMAIL>"
    )
