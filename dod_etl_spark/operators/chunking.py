"""Overlapping token-window chunking — documents to training windows.

Map-only by construction: tokenize, explode the chunk indices, slice
the token array per chunk. Zero shuffles at any scale; output volume is
input x (1 + overlap fraction). Works identically on batch frames and
inside foreachBatch micro-batches (streaming ingestion chunks each
batch independently — chunking is stateless per document).

Reference parity: none (no text surface in the reference) —
LLM-pipeline extension per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_tokens(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
    keep_text: bool = False,
) -> DataFrame:
    """(id, chunk_id, start_tok, n_chunk_toks, chunk_fp[, chunk_text]).

    Chunks start at 0, stride `stride`, length `window`; the last chunk
    may be short. Empty documents produce ONE empty chunk (md5 of ''),
    so every input row is represented downstream. chunk_fp is the
    cross-engine md5 of the space-joined chunk — the key a cross-chunk
    dedup uses. `keep_text` additionally materializes the chunk text
    (off by default: the fingerprint is enough for dedup accounting and
    keeps shuffle payloads scalar)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    n1 = F.greatest(F.size(toks), F.lit(1))
    max_i = F.floor((n1 - F.lit(1)) / F.lit(float(stride))).cast("long")
    chunked = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0).cast("long"), max_i)).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("_toks"), F.col("chunk_id").cast("int") * stride + 1, window
    )
    cols = [
        F.col(id_col),
        F.col("chunk_id"),
        (F.col("chunk_id") * stride).alias("start_tok"),
        F.size(chunk).cast("long").alias("n_chunk_toks"),
        F.md5(F.array_join(chunk, " ").cast("binary")).alias("chunk_fp"),
    ]
    if keep_text:
        cols.append(F.array_join(chunk, " ").alias("chunk_text"))
    return chunked.select(*cols)
