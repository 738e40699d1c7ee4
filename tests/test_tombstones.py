"""Compliance deletes (streaming/tombstones.py): post-delete serving
must be BIT-IDENTICAL to an index freshly built without the deleted
ids (including BM25 df/idf/avgdl shifts), deletes must be idempotent
and replay-durable (no resurrection, even after physical purge), and
the tombstone anti-join must not add a store-side exchange."""

from __future__ import annotations

import re
import shutil
import uuid
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.catalog import load_table
from dod_etl_spark.operators.retrieval import bm25_topk
from dod_etl_spark.operators.similarity import lsh_bucketed_topk
from dod_etl_spark.streaming.posting_store import PostingStore
from dod_etl_spark.streaming.tombstones import tombstone_table_name
from dod_etl_spark.streaming.vector_store import IvfVectorStore, VectorIndexStore
from tests.conftest import SF_SMOKE

N_BITS = 4
K = 5


def _drop(spark, *tables):
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


@pytest.fixture()
def pstore(spark):
    tag = uuid.uuid4().hex[:8]
    s = PostingStore(
        spark, table=f"tomb_p_{tag}", docs_table=f"tomb_pd_{tag}", n_buckets=4
    )
    yield s
    _drop(spark, s.table, s.docs_table, tombstone_table_name(s.table))


@pytest.fixture()
def vstore(spark):
    tag = uuid.uuid4().hex[:8]
    s = VectorIndexStore(
        spark,
        table=f"tomb_v_{tag}",
        vecs_table=f"tomb_vv_{tag}",
        n_bits=N_BITS,
        n_buckets=4,
    )
    yield s
    _drop(spark, s.table, s.vecs_table, tombstone_table_name(s.table))


B1 = [
    (1, "apple banana cherry"),
    (2, "apple apple kiwi"),
    (3, "pear plum quince"),
]
B2 = [
    (4, "apple banana"),
    (5, "banana kiwi pear pear"),
]
DEAD = [2, 4]
QUERIES = [(1, "apple banana"), (2, "pear")]


def _q(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query_text string")


def _prows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["rank"], r["score"]) for r in df.collect()
    )


def _vrows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["rk"], r["cosine"]) for r in df.collect()
    )


# --- PostingStore -------------------------------------------------------------


def test_posting_delete_equals_fresh_index(spark, pstore):
    """The headline contract: after delete_docs, rankings AND scores
    equal a from-scratch batch index over the retained corpus — the
    deleted docs' postings are out of df, n_docs and avgdl, not just
    hidden from the result list. Both idf modes."""
    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    b2 = spark.createDataFrame(B2, "doc_id long, text string")
    pstore.index_batch(b1)
    pstore.index_batch(b2)
    assert pstore.delete_docs(DEAD) == 2

    retained = b1.unionByName(b2).where(~F.col("doc_id").isin(DEAD))
    for rational in (True, False):
        fresh = bm25_topk(retained, _q(spark), k=10, rational_idf=rational)
        served = pstore.search(_q(spark), k=10, rational_idf=rational)
        assert _prows(served) == _prows(fresh), f"rational_idf={rational}"
    # stats reflect the retained corpus exactly
    st = pstore.stats().collect()[0]
    assert st["n_docs"] == 3
    assert st["avgdl"] == (3 + 3 + 4) / 3


def test_posting_delete_is_idempotent(spark, pstore):
    pstore.index_batch(spark.createDataFrame(B1, "doc_id long, text string"))
    assert pstore.delete_docs([2]) == 1
    assert pstore.delete_docs([2]) == 0  # re-delete: no new tombstone
    assert pstore.delete_docs([99]) == 1  # unknown id: recorded (pre-delete)
    assert spark.table(tombstone_table_name(pstore.table)).count() == 2


def test_posting_purge_and_no_resurrection(spark, pstore):
    """purge_deleted physically removes the docs' rows; serving is
    unchanged; and a replayed source batch containing a deleted doc
    CANNOT re-admit it (the tombstone outlives the commit record)."""
    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    b2 = spark.createDataFrame(B2, "doc_id long, text string")
    pstore.index_batch(b1)
    pstore.index_batch(b2)
    pstore.delete_docs(DEAD)
    before = _prows(pstore.search(_q(spark), k=10))

    removed = pstore.purge_deleted()
    assert removed["docs_removed"] == 2
    assert removed["postings_removed"] > 0
    assert pstore.n_docs() == 3  # commit records physically gone
    assert _prows(pstore.search(_q(spark), k=10)) == before

    # replay both source batches wholesale (at-least-once delivery):
    # doc 1/3/5 are already committed, doc 2/4 are tombstoned -> zero.
    assert pstore.index_batch(b1) == 0
    assert pstore.index_batch(b2) == 0
    assert _prows(pstore.search(_q(spark), k=10)) == before
    # tombstones retained: the guard survives the purge
    assert spark.table(tombstone_table_name(pstore.table)).count() == 2


def test_posting_pre_delete_blocks_future_index(spark, pstore):
    """Deleting an id the store has never seen blocks it from ever
    being indexed (opt-out before crawl)."""
    pstore.delete_docs([2])
    n = pstore.index_batch(spark.createDataFrame(B1, "doc_id long, text string"))
    assert n == 2  # docs 1 and 3 only
    got = {r["doc_id"] for r in spark.table(pstore.docs_table).collect()}
    assert got == {1, 3}


def test_posting_serve_plan_stays_unshuffled_with_tombstones(spark, pstore):
    """The tombstone anti-join is broadcast: no Exchange appears on the
    posting side of the serve plan."""
    pstore.index_batch(spark.createDataFrame(B1, "doc_id long, text string"))
    pstore.delete_docs([2])
    plan = (
        pstore.search(_q(spark), k=10)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert not re.search(r"Exchange hashpartitioning\(tok", plan), plan
    assert not re.search(r"Exchange hashpartitioning\(doc_id", plan), plan
    assert "BroadcastExchange" in plan


# --- VectorIndexStore ---------------------------------------------------------


def _emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")


def _vqueries(spark):
    return _emb(spark).where(F.col("vec_id") < 5)


def test_vector_delete_equals_fresh_index(spark, vstore):
    """Post-delete top-k equals lsh_bucketed_topk over the retained
    corpus, in both probe modes (deleted vectors vacate their top-k
    slots for the next-best neighbors, not just disappear)."""
    emb = _emb(spark)
    vstore.index_batch(emb.where(F.col("vec_id") < 250))
    vstore.index_batch(emb.where(F.col("vec_id") >= 250))
    dead = [10, 11, 12, 13, 14, 15, 16, 17, 18, 19]
    assert vstore.delete_vecs(dead) == len(dead)

    retained = emb.where(~F.col("vec_id").isin(dead))
    q = _vqueries(spark)
    for probe_bits in (0, 2):
        adhoc = lsh_bucketed_topk(q, retained, k=K, n_bits=N_BITS, probe_bits=probe_bits)
        served = vstore.search(q, k=K, probe_bits=probe_bits)
        assert _vrows(served) == _vrows(adhoc), f"probe_bits={probe_bits}"


def test_vector_purge_and_no_resurrection(spark, vstore):
    emb = _emb(spark)
    b1 = emb.where(F.col("vec_id") < 100)
    vstore.index_batch(b1)
    dead = [1, 2, 3]
    vstore.delete_vecs(dead)
    before = _vrows(vstore.search(_vqueries(spark), k=K))

    removed = vstore.purge_deleted()
    assert removed["vecs_removed"] == 3
    assert removed["bucket_rows_removed"] == 3
    assert vstore.n_vecs() == 97
    assert _vrows(vstore.search(_vqueries(spark), k=K)) == before
    assert vstore.index_batch(b1) == 0  # replay: tombstones block 1-3
    assert vstore.n_vecs() == 97


# --- IvfVectorStore -----------------------------------------------------------


@pytest.fixture()
def ivf_store(spark):
    from dod_etl_spark.operators.similarity import seed_centroids

    tag = uuid.uuid4().hex[:8]
    cents = seed_centroids(load_table(spark, SF_SMOKE, "embeddings"), 8)
    s = IvfVectorStore(
        spark,
        table=f"tomb_i_{tag}",
        vecs_table=f"tomb_iv_{tag}",
        cent_table=f"tomb_ik_{tag}",
        n_buckets=4,
        centroids=cents,
    )
    yield s
    _drop(spark, s.table, s.vecs_table, s.cent_table, tombstone_table_name(s.table))


def test_ivf_delete_equals_fresh_index(spark, ivf_store):
    from dod_etl_spark.operators.similarity import ivf_topk

    emb = _emb(spark)
    ivf_store.index_batch(emb)
    dead = [20, 21, 22, 23, 24]
    assert ivf_store.delete_vecs(dead) == len(dead)

    retained = emb.where(~F.col("vec_id").isin(dead))
    q = _vqueries(spark)
    for n_probe in (1, 3):
        adhoc = ivf_topk(
            q, retained, k=K, centroids=ivf_store.centroids, n_probe=n_probe
        )
        served = ivf_store.search(q, k=K, n_probe=n_probe)
        assert _vrows(served) == _vrows(adhoc), f"n_probe={n_probe}"


# --- runbook order: purge then compact, serving invariant ---------------------


def test_posting_purge_then_compact_serving_invariant(spark, pstore):
    """docs/SCALE.md runbook order (repair -> purge_deleted ->
    compact): after a delete, physical purge AND file compaction, the
    serve result is still bit-identical to the pre-purge tombstone
    view, and the bucket layout survives for the serve plan."""
    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    b2 = spark.createDataFrame(B2, "doc_id long, text string")
    pstore.index_batch(b1)
    pstore.index_batch(b2)
    pstore.delete_docs(DEAD)
    before = _prows(pstore.search(_q(spark), k=10))

    pstore.purge_deleted()
    pstore.compact()
    assert _prows(pstore.search(_q(spark), k=10)) == before
    # post-compaction replays still blocked
    assert pstore.index_batch(b1) == 0
    assert _prows(pstore.search(_q(spark), k=10)) == before


def test_vector_purge_then_compact_serving_invariant(spark, vstore):
    emb = _emb(spark)
    vstore.index_batch(emb.where(F.col("vec_id") < 120))
    vstore.delete_vecs([4, 5, 6])
    before = _vrows(vstore.search(_vqueries(spark), k=K, probe_bits=2))
    vstore.purge_deleted()
    vstore.compact()
    assert _vrows(vstore.search(_vqueries(spark), k=K, probe_bits=2)) == before
    assert vstore.index_batch(emb.where(F.col("vec_id") < 120)) == 0
    assert _vrows(vstore.search(_vqueries(spark), k=K, probe_bits=2)) == before


def test_counts_exclude_tombstones_pre_purge(spark, pstore, vstore):
    """n_docs()/n_vecs() report the SERVING corpus in the
    delete-to-purge window — consistent with search()/stats(), which
    already exclude tombstoned ids (ADVICE r8: a caller reading
    n_docs() as retained-corpus size must not see deleted docs)."""
    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    b2 = spark.createDataFrame(B2, "doc_id long, text string")
    pstore.index_batch(b1)
    pstore.index_batch(b2)
    assert pstore.n_docs() == 5
    pstore.delete_docs(DEAD)
    assert pstore.n_docs() == 3  # BEFORE purge: tombstones excluded
    assert pstore.stats().collect()[0]["n_docs"] == 3
    pstore.purge_deleted()
    assert pstore.n_docs() == 3

    emb = _emb(spark)
    vstore.index_batch(emb.where(F.col("vec_id") < 100))
    assert vstore.n_vecs() == 100
    vstore.delete_vecs([1, 2, 3])
    assert vstore.n_vecs() == 97  # BEFORE purge
    vstore.purge_deleted()
    assert vstore.n_vecs() == 97
