"""Round-8 corpus-quality signals: readability scoring and broadcast
blocklist filtering.

Both are beyond the reference's surface (its quality gates are the
fixed predicates in stp/DataTransformer.scala); these follow the
published web-corpus curation recipes — Flesch (1948) / Kincaid et al.
(1975) readability, and the C4 / RefinedWeb banned-word document
filter — re-expressed as map-only Spark column arithmetic with exact
DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import stable_round
from dod_etl_spark.queries.base import query, sround_sql, t

# --- Readability (Flesch reading ease / Flesch-Kincaid grade) ----------------
#
# Deterministic syllable heuristic: one syllable per vowel group
# ([aeiouy]+) in the lowercased text. Sentences: runs of [.!?]
# (minimum 1 so fragment-only docs stay defined). Words: the repo's
# split-on-space convention. All three are single regexp scans that
# fuse into the parquet read stage — a 100 TB readability pass is one
# map-only scan, no exchange.

_READABILITY_ORACLE = f"""
WITH m AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
           AS n_words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
           AS n_sents,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS n_sylls
  FROM documents
)
SELECT doc_id, n_words, n_sents, n_sylls,
       {sround_sql(
           "206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)"
           " - 84.6 * (CAST(n_sylls AS DOUBLE) / greatest(n_words, 1))", 4)}
         AS flesch_ease,
       {sround_sql(
           "0.39 * (CAST(n_words AS DOUBLE) / n_sents)"
           " + 11.8 * (CAST(n_sylls AS DOUBLE) / greatest(n_words, 1)) - 15.59", 4)}
         AS fk_grade
FROM m
"""


@query("readability_score_docs", _READABILITY_ORACLE)
def readability_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per document, with the
    vowel-group syllable heuristic (the standard automatable stand-in
    for dictionary syllabification). Zero shuffles: three regexp_count
    scans and pure double arithmetic, op-order-identical to the DuckDB
    oracle so the 4-digit stable_round hashes match. Sentence-bearing
    behavior is pinned on a hand fixture in tests/test_signals.py (the
    synthetic corpus has no sentence punctuation, so n_sents=1 there)."""
    docs = t(spark, sf_dir, "documents")
    n_words = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")).cast(
        "long"
    )
    n_sents = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)
    ).cast("long")
    n_sylls = F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+")).cast("long")
    m = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_sylls.alias("n_sylls"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sents")
    spw = F.col("n_sylls").cast("double") / F.greatest(F.col("n_words"), F.lit(1))
    return m.select(
        "doc_id",
        "n_words",
        "n_sents",
        "n_sylls",
        stable_round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4
        ).alias("flesch_ease"),
        stable_round(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4
        ).alias("fk_grade"),
    )


# --- Broadcast blocklist filter ----------------------------------------------
#
# The C4 / RefinedWeb banned-word document filter: a document is
# dropped when flagged tokens exceed a fraction of its length, or on
# ANY hard-blocked token. The list here is corpus-appropriate
# placeholder vocabulary; a production list (a few hundred to a few
# thousand terms) still fits in the plan as a literal array — beyond
# that it becomes a broadcast semi-join on the exploded token frame.
# Either way the corpus itself never shuffles.

_SOFT_TERMS = ["slow", "dup", "batch"]
_HARD_TERMS = ["leak"]
_SOFT_FRAC = 0.2


def _sql_list(terms: list[str]) -> str:
    return "[" + ", ".join(f"'{t}'" for t in terms) + "]"


_BLOCKLIST_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
  FROM documents
)
SELECT doc_id,
       CAST(len(tk) AS BIGINT) AS n_toks,
       CAST(len(list_filter(tk, x -> list_contains({_sql_list(_SOFT_TERMS)}, x)))
            AS BIGINT) AS n_soft,
       CAST(len(list_filter(tk, x -> list_contains({_sql_list(_HARD_TERMS)}, x)))
            AS BIGINT) AS n_hard,
       {sround_sql(
           f"len(list_filter(tk, x -> list_contains({_sql_list(_SOFT_TERMS)}, x)))"
           " / CAST(greatest(len(tk), 1) AS DOUBLE)", 4)} AS soft_frac,
       (len(list_filter(tk, x -> list_contains({_sql_list(_HARD_TERMS)}, x))) > 0
        OR len(list_filter(tk, x -> list_contains({_sql_list(_SOFT_TERMS)}, x)))
           / CAST(greatest(len(tk), 1) AS DOUBLE) >= {_SOFT_FRAC}) AS blocked
FROM toks
"""


@query("blocklist_score_docs", _BLOCKLIST_ORACLE)
def blocklist_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist document filter: per-doc counts of soft-flagged and
    hard-blocked tokens; blocked = any hard hit OR soft fraction >=
    _SOFT_FRAC. The term sets ride inside the plan as literals, so this
    is a single map-only array scan — the filter pushes into the read
    stage and the 100 TB pass emits only (doc_id, counts). Hard-term
    semantics pinned on a fixture in tests/test_signals.py."""
    docs = t(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    n_toks = F.size(tk).cast("long")
    n_soft = F.size(F.filter(tk, lambda x: x.isin(_SOFT_TERMS))).cast("long")
    n_hard = F.size(F.filter(tk, lambda x: x.isin(_HARD_TERMS))).cast("long")
    base = docs.select(
        "doc_id",
        n_toks.alias("n_toks"),
        n_soft.alias("n_soft"),
        n_hard.alias("n_hard"),
    )
    soft_frac = F.col("n_soft") / F.greatest(F.col("n_toks"), F.lit(1)).cast("double")
    return base.select(
        "doc_id",
        "n_toks",
        "n_soft",
        "n_hard",
        stable_round(soft_frac, 4).alias("soft_frac"),
        ((F.col("n_hard") > 0) | (soft_frac >= F.lit(_SOFT_FRAC))).alias("blocked"),
    )
