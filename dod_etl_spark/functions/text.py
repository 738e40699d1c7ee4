"""Text-analysis column functions for the training-data pipeline
operators (BASELINE.json north-star: language-ID, quality scoring,
token counting, fingerprinting).

All pure Spark built-ins (codegen'd); the md5-based hashing is chosen
deliberately: identical results in any engine (DuckDB oracle, a future
Flink/Trino port), unlike engine-private hash() functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PUNCT_RE = "[.,!?;:]"

# Tiny per-language stopword lists for the heuristic language
# identifier. Order matters: ties resolve to the earlier language.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "de": ["der", "die", "und", "das", "ein", "ist"],
    "fr": ["le", "la", "et", "les", "des", "un"],
    "es": ["el", "los", "de", "y", "en", "que"],
    "zh": ["de", "le", "shi", "bu", "wo"],
}
LANG_PRIORITY = list(STOPWORDS)


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space split, matching the oracle's
    string_split semantics exactly — consecutive spaces yield empty
    tokens, which distinct-consumers drop)."""
    return F.split(text, " ")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(F.filter(tokens(F.lower(text)), lambda x: x != ""))


def char_ngrams(text: Column, n: int) -> Column:
    """All length-n character shingles, as in the oracle's
    [substr(text,i,n) for i in range(...)] comprehension."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(1))),
        lambda i: F.substring(text, i, n),
    )


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PUNCT_RE))


def md5_prefix_long(col: Column, prefix_len: int = 8) -> Column:
    """First `prefix_len` hex digits of md5 as a non-negative BIGINT —
    the cross-engine deterministic hash primitive."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, prefix_len), 16, 10).cast("long")


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: token-count saturation
    discounted by punctuation density."""
    nt = n_tokens(text).cast("double")
    punct_ratio = punct_count(text).cast("double") / F.greatest(F.length(text), F.lit(1)).cast(
        "double"
    )
    return F.least(nt / F.lit(100.0), F.lit(1.0)) * (F.lit(1.0) - punct_ratio)
