"""BPE tokenizer training: the first N merge rules, learned
distributed and deterministically.

Token counting (functions/text.py) measures an EXISTING tokenizer;
training one is the upstream job a training-data platform also owns.
This module implements byte-pair-encoding merge learning (Sennrich et
al. 2016, the standard subword algorithm) Spark-first:

- the corpus collapses to the VOCABULARY frame once — (word, freq,
  symbol string) — exactly the working set the reference BPE trainer
  iterates on; corpus size stops mattering after one shuffle;
- each merge round is ONE vocab-level aggregation: adjacent symbol
  pairs explode in the scan stage (weighted by word frequency,
  overlapping occurrences counted — Sennrich's get_stats), the argmax
  is a 1-row TakeOrdered (count DESC, pair ASC — total-order
  deterministic), and the merge applies as a single `replace()` over
  the separator-delimited symbol string. `replace()` is left-to-right
  non-overlapping in Spark AND DuckDB (verified: ' a a a ' -> ' aa a ')
  — exactly BPE's merge convention, so the whole training loop is
  SQL-mirrorable and the learned RULE SEQUENCE itself oracle-checkable;
- the only driver traffic is the 1-row argmax per round (the IVF
  centroid precedent: model state is metadata).

At 100 TB: the vocab frame is |distinct words| rows (millions, not
trillions), checkpointed once; each round costs one map-side-combined
aggregation over it. That is the shape real BPE trainers have — the
corpus-sized work happens exactly once.

Reference parity: none (no text surface in the reference) —
LLM-pipeline extension per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PAIR_T = "array<struct<left_sym:string,right_sym:string>>"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, repr): the BPE working set. `repr` is the word's
    current symbol sequence as a space-delimited, space-wrapped string
    (' h e l l o ') — initially one symbol per character."""
    word = F.explode(
        F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    ).alias("word")
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, 1),
    )
    return (
        docs.select(word)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "word",
            "freq",
            F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" ")).alias("repr"),
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    syms = F.filter(F.split(F.col("repr"), " "), lambda x: x != "")
    n = F.size(syms)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda j: F.struct(
                F.element_at(syms, j + 1).alias("left_sym"),
                F.element_at(syms, j + 2).alias("right_sym"),
            ),
        ),
    ).otherwise(F.lit(None).cast(_PAIR_T))
    return (
        vocab.select("freq", F.explode(pairs).alias("p"))
        .groupBy("p.left_sym", "p.right_sym")
        .agg(F.sum("freq").alias("pair_count"))
    )


def bpe_merges(
    docs: DataFrame, n_merges: int = 6, text_col: str = "text"
) -> DataFrame:
    """Learn the first `n_merges` BPE merge rules over the corpus.

    Returns (step 1.., left_sym, right_sym, pair_count) — the rule
    sequence in training order, each row the round's most frequent
    adjacent pair (ties break lexicographically). Stops early if the
    vocabulary runs out of adjacent pairs (every word fused to one
    symbol) — degenerate corpora only."""
    spark = docs.sparkSession
    vocab = word_vocab(docs, text_col).localCheckpoint(eager=True)
    rules: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left_sym").asc(),
                F.col("right_sym").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["left_sym"], top[0]["right_sym"], top[0]["pair_count"]
        rules.append((step, l, r, c))
        vocab = vocab.withColumn(
            "repr",
            F.expr(
                "replace(repr, {src}, {dst})".format(
                    src=_sql_str(f" {l} {r} "), dst=_sql_str(f" {l}{r} ")
                )
            ),
        )
    return spark.createDataFrame(
        rules, "step long, left_sym string, right_sym string, pair_count long"
    )


def bpe_segment(
    docs: DataFrame,
    rules: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned rule sequence to the corpus: (id, word, pieces)
    — each word's subword segmentation after replaying the merges in
    order. Pure scan-stage string arithmetic (one replace per rule),
    zero exchanges beyond the tokenize explode."""
    word = F.explode(
        F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    ).alias("word")
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, 1),
    )
    out = docs.select(F.col(id_col), word).withColumn(
        "repr", F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" "))
    )
    for l, r in rules:
        out = out.withColumn(
            "repr",
            F.expr(
                "replace(repr, {src}, {dst})".format(
                    src=_sql_str(f" {l} {r} "), dst=_sql_str(f" {l}{r} ")
                )
            ),
        )
    return out.select(
        id_col,
        "word",
        F.filter(F.split(F.col("repr"), " "), lambda x: x != "").alias("pieces"),
    )


def _sql_str(s: str) -> str:
    """SQL single-quoted string literal (quotes doubled)."""
    return "'" + s.replace("'", "''") + "'"
