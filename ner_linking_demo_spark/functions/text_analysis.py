"""Text-analysis columns for corpus curation: language id, quality
scoring, token counting, fingerprinting.

All pure Catalyst column expressions (whole-stage codegen, no Python) —
these run as part of the page scan projection at 100 TB, so staying
JVM-side is non-negotiable. Each has an exact DuckDB-SQL equivalent used
by the correctness harness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny seeded stopword lists — heuristic language id (the real pipeline
# would broadcast fastText-style models via mapInPandas; this is the
# JVM-side cheap pass used for bulk filtering).
ES_STOPWORDS = [
    "el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
    "del", "se", "por", "con", "para", "es", "al", "como", "su", "más",
]
EN_STOPWORDS = [
    "the", "of", "and", "to", "a", "in", "that", "is", "was", "for",
    "it", "with", "as", "his", "on", "be", "at", "by", "this", "had",
]


def tokens(text: Column) -> Column:
    """Whitespace tokens (empty-safe)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: alternating letter-runs / digit-runs /
    single punctuation, the usual pre-BPE segmentation regex."""
    return F.size(
        F.regexp_extract_all(
            text, F.lit(r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"), F.lit(0)
        )
    )


def _stopword_hits(text: Column, stopwords: list[str]) -> Column:
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    sw = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def lang_id(text: Column) -> Column:
    """'es' / 'en' / 'unknown' by stopword-hit majority."""
    es = _stopword_hits(text, ES_STOPWORDS)
    en = _stopword_hits(text, EN_STOPWORDS)
    return (
        F.when((es > en) & (es > 0), F.lit("es"))
        .when((en > es) & (en > 0), F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^\p{P}]", ""))
    return n_punct.cast("double") / F.greatest(F.length(text), F.lit(1)).cast(
        "double"
    )


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast(
        "double"
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, sane mean word
    length, low punctuation ratio, has stopwords (es or en)."""
    n = token_count(text).cast("double")
    len_ok = F.least(n / F.lit(50.0), F.lit(1.0))
    mwl = mean_word_length(text)
    mwl_ok = F.when((mwl >= 3.0) & (mwl <= 12.0), 1.0).otherwise(0.3)
    p_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.3)
    sw = (
        _stopword_hits(text, ES_STOPWORDS) + _stopword_hits(text, EN_STOPWORDS)
    ).cast("double")
    sw_ok = F.least(sw / F.greatest(n * F.lit(0.1), F.lit(1.0)), F.lit(1.0))
    return (len_ok * 0.3 + mwl_ok * 0.2 + p_ok * 0.2 + sw_ok * 0.3).alias(
        "quality"
    )


def content_fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 of lowercase, whitespace-collapsed
    text — the cheap exact-dup key after cosmetic edits."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def rolling_fingerprints(text: Column, window: int = 16, every: int = 64) -> Column:
    """Sampled rolling fingerprints: md5 of each ``window``-char slice at
    stride ``every`` — a cheap containment/shift-robust signature
    (winnowing-lite). array<string>."""
    n = F.greatest(F.length(text) - window + 1, F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n, F.lit(every)),
        lambda i: F.md5(F.substring(text, i, window)),
    )
