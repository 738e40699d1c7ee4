"""Store-served hybrid retrieval (streaming/hybrid.py): RRF fusion of
PostingStore BM25 and VectorIndexStore ANN must be BIT-IDENTICAL to
fusing the batch arms over the same corpus — and must respect
compliance deletes in both arms."""

from __future__ import annotations

import shutil
import uuid
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.catalog import load_table
from dod_etl_spark.operators.retrieval import bm25_topk, rrf_fuse
from dod_etl_spark.operators.similarity import lsh_bucketed_topk
from dod_etl_spark.streaming.hybrid import hybrid_topk_from_stores
from dod_etl_spark.streaming.posting_store import PostingStore
from dod_etl_spark.streaming.tombstones import tombstone_table_name
from dod_etl_spark.streaming.vector_store import VectorIndexStore
from tests.conftest import SF_SMOKE

N_BITS = 4
K = 10


@pytest.fixture()
def stores(spark):
    tag = uuid.uuid4().hex[:8]
    ps = PostingStore(
        spark, table=f"hyb_p_{tag}", docs_table=f"hyb_pd_{tag}", n_buckets=4
    )
    vs = VectorIndexStore(
        spark,
        table=f"hyb_v_{tag}",
        vecs_table=f"hyb_vv_{tag}",
        n_bits=N_BITS,
        n_buckets=4,
    )
    yield ps, vs
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (
        ps.table,
        ps.docs_table,
        tombstone_table_name(ps.table),
        vs.table,
        vs.vecs_table,
        tombstone_table_name(vs.table),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def _corpus(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    return docs, emb


def _probes(spark):
    docs, emb = _corpus(spark)
    return (
        docs.where(F.col("doc_id") < 3)
        .select(F.col("doc_id").alias("query_id"), F.col("text").alias("query_text"))
        .join(
            emb.where(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("query_id"), "embedding"
            ),
            "query_id",
        )
    )


def _batch_hybrid(spark, docs, emb, probes):
    lex = bm25_topk(
        docs,
        probes.select("query_id", "query_text"),
        k=K,
        rational_idf=True,
        exclude_self=True,
    )
    dense = lsh_bucketed_topk(
        probes.select(F.col("query_id").alias("vec_id"), "embedding"),
        emb,
        k=K,
        n_bits=N_BITS,
        probe_bits=0,
    ).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), F.col("rk").alias("rank")
    )
    return rrf_fuse(lex, dense, k=K)


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["rank"], r["lex_rank"], r["dense_rank"], r["rrf"])
        for r in df.collect()
    )


def test_store_hybrid_equals_batch_hybrid(spark, stores):
    ps, vs = stores
    docs, emb = _corpus(spark)
    # two micro-batches per store (incremental build)
    ps.index_batch(docs.where(F.col("doc_id") < 250))
    ps.index_batch(docs.where(F.col("doc_id") >= 250))
    vs.index_batch(emb.where(F.col("vec_id") < 250))
    vs.index_batch(emb.where(F.col("vec_id") >= 250))

    probes = _probes(spark)
    served = hybrid_topk_from_stores(ps, vs, probes, k=K)
    batch = _batch_hybrid(spark, docs, emb, probes)
    assert _rows(served) == _rows(batch)


def test_store_hybrid_respects_deletes_in_both_arms(spark, stores):
    ps, vs = stores
    docs, emb = _corpus(spark)
    ps.index_batch(docs)
    vs.index_batch(emb)
    dead = [7, 8, 9, 10, 11, 12]
    ps.delete_docs(dead)
    vs.delete_vecs(dead)

    probes = _probes(spark)
    served = hybrid_topk_from_stores(ps, vs, probes, k=K)
    retained_docs = docs.where(~F.col("doc_id").isin(dead))
    retained_emb = emb.where(~F.col("vec_id").isin(dead))
    batch = _batch_hybrid(spark, retained_docs, retained_emb, probes)
    assert _rows(served) == _rows(batch)
    assert not {r[1] for r in _rows(served)} & set(dead)
