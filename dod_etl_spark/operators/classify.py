"""Corpus-trained token classifiers in the cross-engine exact-integer
convention (KN LM / DSIR precedent: no libm logs cross engines, so
discriminants are MEAN PER-TOKEN MICRO-LIKELIHOODS — exact integer
millionths with truncating division — rather than summed log
probabilities; same smoothing, same ranking intent, hash-replayable).

The trained artifact is relational state (class priors + per-(class,
token) counts), the maintain-don't-rebuild shape every store in this
package uses — a production deployment would persist it exactly like
NgramLmStore persists bigram counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MICRO = 1_000_000


def _toks(docs: DataFrame, id_col: str, text_col: str, class_col: str) -> DataFrame:
    tk = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(class_col).alias("cls"),
        F.explode(tk).alias("tok"),
    )


def nb_train(
    labeled: DataFrame,
    class_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train the add-one-smoothed likelihood grid on a LABELED corpus:
    (cls, tok, micro) with micro(t, c) = ((count(t,c)+1) * 1e6)
    div (T_c + V). The grid is (vocab x classes) — a vocab-bounded
    frame built from one map-combined count (checkpointed so totals,
    vocab, the driver-side V, and the grid all derive from ONE
    tokenize pass — kn_score_frame's rule). This is the trainable
    artifact; a production deployment persists it like NgramLmStore
    persists bigram counts."""
    toks = _toks(labeled, id_col, text_col, class_col)
    counts = (
        toks.groupBy("cls", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    totals = counts.groupBy("cls").agg(F.sum("c").alias("t_c"))
    vocab = counts.select("tok").distinct()
    v = vocab.count()  # driver scalar: one number
    return (
        vocab.crossJoin(totals)
        .join(counts, ["cls", "tok"], "left")
        .select(
            "cls",
            "tok",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + 1) * _MICRO
            ).cast("long").alias("num"),
            (F.col("t_c") + v).cast("long").alias("den"),
        )
        .select("cls", "tok", F.expr("num div den").alias("micro"))
    )


def nb_score(
    docs: DataFrame,
    grid: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a trained grid: mean per-token
    micro-likelihood per (doc, class) over the doc's IN-VOCABULARY
    tokens (out-of-vocabulary tokens carry no class evidence in any
    class and drop from the mean; a doc with zero in-vocab tokens gets
    NO rows — unscorable, the caller's no-evidence rule applies).
    Returns (doc_id, cls, n_toks, micro_affinity). The scoring join
    fans each token occurrence by |classes| (a small constant); every
    aggregate map-combines.

    The grid rides BROADCAST with an explicit hint: it is
    vocab x |classes| rows of three scalars (metadata-sized next to
    the token stream), but it derives from a crossJoin + outer join
    whose size the planner cannot estimate — and explode fan-out is
    equally invisible to it, so the planner's static plan built the
    hash join on the EXPLODED CORPUS TOKEN STREAM (a BroadcastExchange
    over (doc_id, tok); plans/r10/nb_source_classifier_before.txt) —
    merely slower at sf0.1 (1.77 s -> 1.42 s measured), an OOM at
    100 TB. A web-scale vocabulary whose grid outgrows the broadcast
    cap would drop the hint and accept the vocab-keyed shuffle."""
    tk = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    doc_toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tk).alias("tok")
    )
    return (
        doc_toks.join(F.broadcast(grid), "tok")
        .groupBy("doc_id", "cls")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.expr("sum(micro) div count(1)").cast("long").alias("micro_affinity"),
        )
    )


def nb_class_affinity(
    docs: DataFrame,
    class_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Multinomial class affinity, self-trained: nb_train on the
    corpus itself, nb_score every document against EVERY class — the
    log-free form of the naive-Bayes discriminant (geometric mean ->
    arithmetic mean is the package's exact-arithmetic trade; ranking
    quality pinned separately, determinism by construction). Returns
    (doc_id, cls, n_toks, micro_affinity)."""
    return nb_score(
        docs, nb_train(docs, class_col, id_col, text_col), id_col, text_col
    )


def nb_classify(
    docs: DataFrame,
    class_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Argmax over nb_class_affinity (ties -> lexicographically
    smallest class), with the true class retained so accuracy and the
    confusion matrix are one groupBy away. Returns
    (doc_id, pred_cls, micro_affinity, true_cls, correct)."""
    aff = nb_class_affinity(docs, class_col, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("micro_affinity").desc(), F.col("cls").asc()
    )
    pred = (
        aff.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("cls").alias("pred_cls"), "micro_affinity")
    )
    truth = docs.select(
        F.col(id_col).alias("doc_id"), F.col(class_col).alias("true_cls")
    )
    return pred.join(truth, "doc_id").select(
        "doc_id",
        "pred_cls",
        "micro_affinity",
        "true_cls",
        (F.col("pred_cls") == F.col("true_cls")).cast("int").alias("correct"),
    )
