"""Text analysis for training-data pipelines (brief mandate): language ID,
quality scoring, token counting, document fingerprinting. All pure Catalyst
expressions over the `documents` table — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this",
]

# crude n-gram/function-word heuristic profiles per language
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "que", "es"],
}


def token_count(col: Column) -> Column:
    """Whitespace + BPE-ish token estimate: words + punctuation marks counted
    separately (a cheap stand-in for a real tokenizer at survey fidelity)."""
    words = F.size(F.split(F.trim(col), r"\s+"))
    punct = F.length(F.regexp_replace(col, r"[^\.,;:!\?\(\)\[\]]", ""))
    return (words + punct).cast("long")


def quality_score(col: Column) -> Column:
    """Length / punctuation / stopword-ratio composite in [0, 1]."""
    length = F.length(col).cast("double")
    words = F.split(F.lower(col), r"\s+")
    n_words = F.size(words).cast("double")
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS))).cast("double")
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    punct_ratio = F.length(F.regexp_replace(col, r"[a-zA-Z0-9\s]", "")) / F.greatest(length, F.lit(1.0))
    len_score = F.least(length / F.lit(500.0), F.lit(1.0))
    avg_word = F.when(n_words > 0, length / n_words).otherwise(F.lit(0.0))
    word_score = F.when((avg_word >= 3) & (avg_word <= 12), F.lit(1.0)).otherwise(F.lit(0.3))
    raw = (
        0.4 * len_score + 0.2 * (1 - F.least(punct_ratio * 4, F.lit(1.0)))
        + 0.2 * F.least(stop_ratio * 5, F.lit(1.0)) + 0.2 * word_score
    )
    # floor-form rounding: same float ops on Spark and DuckDB (oracle parity)
    return F.floor(raw * 1000000 + F.lit(0.5)) / 1000000


def language_id(col: Column) -> Column:
    """Function-word-voting language heuristic → 2-letter code or 'und'."""
    words = F.split(F.lower(col), r"\s+")
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        hits = F.size(F.filter(words, lambda w: w.isin(*markers)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column, normalize: bool = True, hash_fn=F.xxhash64) -> Column:
    """Document fingerprint: 64-bit hash of the normalized text (rolling-hash
    equivalent at document granularity; shingle-level hashing lives in
    functions/dedup.py). `hash_fn=portable.phash64` gives a DuckDB-
    reproducible fingerprint for oracle runs."""
    c = col
    if normalize:
        c = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return hash_fn(c)


def add_text_features(df: DataFrame, text_col: str = "text", hash_fn=F.xxhash64) -> DataFrame:
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_pred", language_id(c))
        .withColumn("fingerprint", fingerprint(c, hash_fn=hash_fn))
    )


# PII redaction patterns, ordered: email first (contains dots/digits that
# later families could nibble), then SSN (3-2-4) before phone (3-3-4 —
# disjoint shapes, but explicit order makes that irrelevant), IP last.
# Every pattern sticks to the regex subset where Java regex (Spark) and
# RE2 (DuckDB) agree: character classes, bounded repeats, \b, (…) groups —
# no lookaround, no backrefs.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_pii(col: Column, families: tuple = ("email", "ssn", "phone", "ipv4")) -> Column:
    """Scrub PII from free text before it enters a training corpus: chained
    Catalyst regexp_replace (JVM, codegen — no Python in the path), one
    pass per enabled family, replacement tokens preserved so downstream
    dedup/quality stages see stable text."""
    out = col
    for name, pat, tok in PII_PATTERNS:
        if name in families:
            out = F.regexp_replace(out, pat, tok)
    return out


def pii_hit_counts(col: Column) -> Column:
    """Struct of per-family match counts — the audit twin of redact_pii
    (how much PII a corpus slice carries, without materializing it)."""
    return F.struct(
        *[
            F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).alias(name)
            for name, pat, _ in PII_PATTERNS
        ]
    )
