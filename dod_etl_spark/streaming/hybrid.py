"""Store-served hybrid retrieval: RRF fusion of the two serving
indexes (the maintain-don't-rebuild completion of the batch
hybrid_rrf_topk query).

The batch hybrid (queries/quality.py hybrid_rrf_topk) re-derives both
arms from the corpus per call; over a STANDING corpus the arms should
come from the incremental indexes instead — PostingStore (BM25) and
VectorIndexStore (LSH-bucketed ANN) — which are each individually
pinned bit-identical to their batch twins. This module composes them
through the SAME rrf_fuse combiner the batch query uses, so a
store-served hybrid equals rrf_fuse(batch BM25 arm, batch LSH arm)
over the same corpus, bit-for-bit (pinned in
tests/test_hybrid_serve.py) — including with compliance deletes
applied (both arms exclude tombstoned ids before ranking, so the
fused list reflects the retained corpus).

Scale shape: both arms top-k-prune before fusion (n_queries x k rows),
so the fusion full-outer join and final window are metadata-sized at
any corpus size — the heavy lifting stays inside each store's pruned,
exchange-free serve plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dod_etl_spark.operators.retrieval import rrf_fuse
from dod_etl_spark.streaming.posting_store import PostingStore
from dod_etl_spark.streaming.vector_store import VectorIndexStore


def hybrid_topk_from_stores(
    posting_store: PostingStore,
    vector_store: VectorIndexStore,
    probes: DataFrame,
    k: int = 10,
    c: int = 60,
    rational_idf: bool = True,
    probe_bits: int = 0,
    round_digits: int = 3,
) -> DataFrame:
    """Hybrid similar-document top-k for probe documents that carry
    BOTH modalities: `probes` has (query_id, query_text, embedding) —
    in this engine's testdata convention doc_id == vec_id, and in a
    production pipeline the probe frame is one row per takedown/audit
    candidate. Self-matches are excluded in both arms (the near-dup
    mining posture of the batch query)."""
    lex = posting_store.search(
        probes.select("query_id", "query_text"),
        k=k,
        rational_idf=rational_idf,
        exclude_self=True,
    )
    dense = vector_store.search(
        probes.select(
            F.col("query_id").alias("vec_id"), F.col("embedding")
        ),
        k=k,
        probe_bits=probe_bits,
        round_digits=round_digits,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rk").cast("long").alias("rank"),
    )
    return rrf_fuse(lex, dense, k=k, c=c)
