"""Incremental BM25 posting store (streaming/posting_store.py):
batch-equivalence, replay idempotence, crash repair, streaming drive,
and the store-side no-shuffle plan contract."""

from __future__ import annotations

import shutil
import uuid
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.operators.retrieval import bm25_topk
from dod_etl_spark.streaming.posting_store import PostingStore


@pytest.fixture()
def store(spark):
    tag = uuid.uuid4().hex[:8]
    s = PostingStore(
        spark,
        table=f"post_t_{tag}",
        docs_table=f"post_d_{tag}",
        n_buckets=4,
    )
    yield s
    spark.sql(f"DROP TABLE IF EXISTS {s.table}")
    spark.sql(f"DROP TABLE IF EXISTS {s.docs_table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{s.table}", ignore_errors=True)
    shutil.rmtree(f"{wh}/{s.docs_table}", ignore_errors=True)


B1 = [
    (1, "apple banana cherry"),
    (2, "apple apple kiwi"),
    (3, "pear plum quince"),
]
B2 = [
    (4, "apple banana"),
    (5, "banana kiwi pear pear"),
]
QUERIES = [(1, "apple banana"), (2, "pear")]


def _q(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query_text string")


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["rank"], r["score"]) for r in df.collect()
    )


def test_incremental_equals_batch_index(spark, store):
    """The headline contract: an index built over N batches returns
    EXACTLY the ranking a from-scratch batch index over the union
    corpus returns (same decimal-exact core, same stats arithmetic) —
    in both idf modes."""
    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    b2 = spark.createDataFrame(B2, "doc_id long, text string")
    assert store.index_batch(b1) == 3
    assert store.index_batch(b2) == 2

    union = b1.unionByName(b2)
    for rational in (True, False):
        batch = bm25_topk(union, _q(spark), k=10, rational_idf=rational)
        inc = store.search(_q(spark), k=10, rational_idf=rational)
        assert _rows(inc) == _rows(batch), f"rational_idf={rational}"


def test_replay_adds_nothing(spark, store):
    """At-least-once replay: re-indexing a committed batch is a no-op
    for the doc count, the posting count, and the search results."""
    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    store.index_batch(b1)
    before = _rows(store.search(_q(spark), k=10))
    n_post = spark.table(store.table).count()
    assert store.index_batch(b1) == 0
    assert store.n_docs() == 3
    assert spark.table(store.table).count() == n_post
    assert _rows(store.search(_q(spark), k=10)) == before


def test_within_batch_duplicate_ids_collapse(spark, store):
    """Duplicate doc_ids inside one batch index exactly one
    deterministic representative (min text)."""
    b = spark.createDataFrame(
        [(1, "zebra"), (1, "apple"), (2, "apple")], "doc_id long, text string"
    )
    assert store.index_batch(b) == 2
    toks = {
        (r["doc_id"], r["tok"]) for r in spark.table(store.table).collect()
    }
    assert toks == {(1, "apple"), (2, "apple")}


def test_crash_repair_reconciles_orphans(spark, store):
    """Crash window: postings appended, docs commit record missing.
    The orphan postings are (a) excluded from search, (b) removed by
    repair(), after which the replayed batch indexes cleanly."""
    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    store.index_batch(b1)

    # Simulate the torn batch: postings for doc 99 with no docs row.
    orphan = spark.createDataFrame(
        [("apple", 99, 5, 5)], "tok string, doc_id long, tf long, dl long"
    )
    orphan.write.insertInto(store.table, overwrite=False)
    spark.catalog.refreshTable(store.table)

    hits = {r["doc_id"] for r in store.search(_q(spark), k=10).collect()}
    assert 99 not in hits  # uncommitted docs never surface

    assert store.repair() == 1
    assert store.repair() == 0  # idempotent
    # The replayed batch (now containing doc 99) indexes normally.
    b_replay = spark.createDataFrame(
        B1 + [(99, "apple apple apple apple apple")], "doc_id long, text string"
    )
    assert store.index_batch(b_replay) == 1
    hits = {r["doc_id"] for r in store.search(_q(spark), k=10).collect()}
    assert 99 in hits


def test_streaming_drive(spark, store, tmp_path):
    """foreachBatch wiring: a file stream feeds index_batch; search
    sees the whole corpus afterward."""
    src = tmp_path / "post_src"
    spark.createDataFrame(B1, "doc_id long, text string").write.parquet(str(src))

    q = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src))
        .writeStream.foreachBatch(lambda df, bid: store.index_batch(df))
        .option("checkpointLocation", str(tmp_path / "post_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert store.n_docs() == 3
    assert len(_rows(store.search(_q(spark), k=10))) > 0


def test_store_side_join_has_no_exchange(spark, store):
    """Serve-time contract: the posting scan reaches the tok window
    through its bucket layout — no Exchange between the store scan and
    the df window (the frame that grows with the corpus never
    re-shuffles per query)."""
    import re

    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    store.index_batch(b1)
    plan = store.search(_q(spark), k=10)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # window over tok + final rank window + score agg partials: the
    # only Exchanges allowed are on the POST-prune metadata-sized
    # frames; the bucketed scan itself must not be followed by an
    # Exchange hash(tok) (bucket layout satisfies the window).
    scan_to_window = plan.split("Window")[0]
    assert not re.search(
        r"Exchange hashpartitioning\(tok", scan_to_window
    ), scan_to_window


def test_search_on_empty_store(spark, store):
    """A never-indexed store answers with zero rows and the stable
    output schema — not an AnalysisException."""
    out = store.search(_q(spark), k=10)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id",
        "doc_id",
        "rank",
        "score",
    ]
    assert store.n_docs() == 0
