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


def soundex_sql(col: str, engine: str = "spark") -> str:
    """American Soundex as ENGINE-NEUTRAL SQL text (upper/strip,
    translate-to-digits, H/W elision, adjacent-run collapse, vowel
    removal, first-letter + 3 digits zero-padded) — the same
    arithmetic evaluates in Spark and in a DuckDB oracle, so
    phonetic-blocked queries hash-check end-to-end. Verified against
    the canonical test vectors (Robert/Rupert→R163, Ashcraft→A261,
    Tymczak→T522, Pfister→P236, Honeyman→H555, Washington→W252) and
    against Spark's builtin soundex() on real tokens
    (tests/test_phonetic.py).

    The one cross-engine trap (found live): DuckDB's regexp_replace
    is FIRST-MATCH-ONLY without the 'g' flag, Spark's is always
    global — hence the engine parameter instead of one shared string.
    The run-collapse uses per-digit patterns ('11+'→'1', …) because
    RE2 (DuckDB) has no backreferences."""
    g = ", 'g'" if engine == "duckdb" else ""
    u = f"regexp_replace(upper({col}), '[^A-Z]', ''{g})"
    t0 = f"translate({u}, 'AEIOUYBFPVCGJKQSXZDTLMNR', '000000111122222222334556')"
    c = f"replace(replace({t0}, 'H', ''), 'W', '')"
    for d in range(7):
        c = f"regexp_replace({c}, '{d}{d}+', '{d}'{g})"
    first = f"substr({u}, 1, 1)"
    # the first letter's own code participates in adjacent collapsing
    # and is then dropped — unless the first letter is H/W, which never
    # entered the digit stream (Holmes → H452, not H520)
    body = f"CASE WHEN {first} IN ('H', 'W') THEN {c} ELSE substr({c}, 2) END"
    noz = f"replace({body}, '0', '')"
    return (
        f"(CASE WHEN length({u}) = 0 THEN '' "
        f"ELSE {first} || rpad(substr({noz}, 1, 3), 3, '0') END)"
    )
