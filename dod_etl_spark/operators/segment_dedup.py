"""Global segment-level exact dedup with document reassembly.

The C4 / RefinedWeb curation step the doc-level passes can't express:
duplicated UNITS INSIDE otherwise-unique documents (boilerplate lines,
license paragraphs, navigation chrome) are removed corpus-wide, keeping
exactly ONE occurrence — the global first in (doc_id, position) order —
and every document is reassembled from its surviving segments. Doc-level
dedup (operators/dedup.py) drops whole near-identical documents;
ExactSubstr (operators/substring.py) scrubs ALL copies of repeated
spans; this keeps one canonical copy, which is the C4 line-dedup rule.

Two segmenters, one pipeline:
- "lines": split on a literal separator (newline — the C4 unit);
- "words": fixed-length non-overlapping word windows, for corpora
  without line structure (the testdata documents are single-line).

Scale shape (the design decision): the winner table groupBy(seg) with
min(struct(doc_id, pos)) is map-side combinable and ALREADY CARRIES the
surviving (doc_id, pos) — there is no join back from winners to the
exploded segment stream. A join-back would shuffle every segment
occurrence keyed by segment text and melt on degenerate segments (the
empty line appears in ~every web document); here the degenerate key
costs one combined aggregation cell. Reassembly is one groupBy(doc_id)
over the SURVIVING segments only — sized by output text, not input.

Reference parity: none (no corpus surface in the reference) —
LLM-pipeline extension per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    mode: str = "words",
    seg_words: int = 10,
    line_sep: str = "\n",
) -> DataFrame:
    """(id, pos, seg): 1-based segment stream per document.

    "words" normalizes whitespace (split on single space, empty tokens
    dropped) — reassembly is space-joined, the repo-wide token
    convention. "lines" preserves line text verbatim (including empty
    lines, which are legitimate — and maximally duplicated — segments).
    """
    if mode == "lines":
        segs = F.split(F.col(text_col), F.lit(line_sep), -1)
        pos_seg = F.posexplode(segs)
        return docs.select(F.col(id_col).alias("id"), pos_seg).select(
            "id", (F.col("pos") + 1).alias("pos"), F.col("col").alias("seg")
        )
    if mode != "words":
        raise ValueError(f"unknown segmenter {mode!r}")
    w = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    n_segs = F.ceil(F.size(w) / F.lit(float(seg_words))).cast("int")
    # sequence(1, 0) would COUNT DOWN in Spark; guard empty docs to an
    # empty segment list (matches the oracle's range(1, n+1) = []).
    idx = F.when(n_segs >= 1, F.sequence(F.lit(1), n_segs)).otherwise(
        F.array().cast("array<int>")
    )
    exploded = docs.select(
        F.col(id_col).alias("id"), w.alias("w"), F.explode(idx).alias("pos")
    )
    seg = F.array_join(
        F.slice(F.col("w"), (F.col("pos") - 1) * seg_words + 1, seg_words), " "
    )
    return exploded.select("id", F.col("pos").cast("long").alias("pos"), seg.alias("seg"))


def segment_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    mode: str = "words",
    seg_words: int = 10,
    line_sep: str = "\n",
) -> DataFrame:
    """(doc_id, n_segs, n_kept, text_dedup): corpus-wide first-occurrence
    segment dedup. A segment survives iff (doc_id, pos) is the minimum
    occurrence of its exact text across the corpus; documents reassemble
    from survivors in original order ('' when nothing survives)."""
    joiner = " " if mode == "words" else line_sep
    segs = segment_docs(
        docs, id_col, text_col, mode=mode, seg_words=seg_words, line_sep=line_sep
    )
    # n_segs map-only from the doc scan (same expression the segmenter
    # explodes) — counting the exploded stream would shuffle every
    # segment occurrence by doc id for a number the scan already knows.
    if mode == "lines":
        n_segs = F.size(F.split(F.col(text_col), F.lit(line_sep), -1))
    else:
        w = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
        n_segs = F.ceil(F.size(w) / F.lit(float(seg_words)))
    counts = docs.select(
        F.col(id_col).alias("id"), n_segs.cast("long").alias("n_segs")
    )
    winners = segs.groupBy("seg").agg(
        F.min(F.struct("id", "pos")).alias("w")
    )
    kept = winners.select(
        F.col("w.id").alias("id"), F.col("w.pos").alias("pos"), "seg"
    )
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda x: x["seg"],
            ),
            joiner,
        ).alias("text_dedup"),
    )
    return counts.join(rebuilt, "id", "left").select(
        F.col("id").alias(id_col),
        F.col("n_segs"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
    )
