"""Positional posting store (streaming/posting_store.py
PositionalPostingStore): serve-time phrase search must be
BIT-IDENTICAL to the batch in-array scan (queries/lexicon.py), replays
are no-ops, and compliance deletes remove docs from phrase results
with no resurrection after purge."""

from __future__ import annotations

import shutil
import uuid
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.queries.lexicon import _phrase_match_struct, _words
from dod_etl_spark.streaming.posting_store import PositionalPostingStore
from dod_etl_spark.streaming.tombstones import tombstone_table_name


@pytest.fixture()
def store(spark):
    tag = uuid.uuid4().hex[:8]
    s = PositionalPostingStore(
        spark, table=f"pos_t_{tag}", docs_table=f"pos_d_{tag}", n_buckets=4
    )
    yield s
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (s.table, s.docs_table, tombstone_table_name(s.table)):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


B1 = [
    (1, "a a a b c"),
    (2, "x y z a b"),
    (3, "b c b c"),
]
B2 = [
    (4, "a b a b a"),
    (5, "z z z"),
]
PHRASES = ["a a", "a b", "b c b", "q r"]


def _batch_expected(docs, phrases):
    """The batch scan's result (queries/lexicon.py machinery) over an
    in-memory frame — the semantics phrase_search must reproduce."""
    toks = docs.select("doc_id", _words(F.col("text")).alias("w"))
    arr = F.array(*[_phrase_match_struct(F.col("w"), p) for p in phrases])
    return (
        toks.select("doc_id", F.explode(arr).alias("m"))
        .select("doc_id", "m.phrase", "m.n_matches", "m.first_pos")
        .where(F.col("n_matches") > 0)
    )


def _rows(df):
    return sorted(
        (r["doc_id"], r["phrase"], r["n_matches"], r["first_pos"])
        for r in df.collect()
    )


def test_phrase_search_equals_batch_scan(spark, store):
    """Headline contract: an index built over two micro-batches serves
    exactly what the batch in-array scan computes over the union —
    including overlapping matches ("a a" in "a a a" -> 2 at pos 1),
    repeated-term phrases, and a phrase with no corpus occurrences."""
    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    b2 = spark.createDataFrame(B2, "doc_id long, text string")
    assert store.index_batch(b1) == 3
    assert store.index_batch(b2) == 2

    expected = _rows(_batch_expected(b1.unionByName(b2), PHRASES))
    assert _rows(store.phrase_search(PHRASES)) == expected
    # sanity on the hand-countable cases
    assert (1, "a a", 2, 1) in expected  # overlap
    assert (4, "a b", 2, 1) in expected
    assert not any(p == "q r" for _, p, _n, _f in expected)


def test_replay_adds_nothing(spark, store):
    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    store.index_batch(b1)
    before = _rows(store.phrase_search(PHRASES))
    n_post = spark.table(store.table).count()
    assert store.index_batch(b1) == 0
    assert spark.table(store.table).count() == n_post
    assert _rows(store.phrase_search(PHRASES)) == before


def test_delete_purge_no_resurrection(spark, store):
    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    b2 = spark.createDataFrame(B2, "doc_id long, text string")
    store.index_batch(b1)
    store.index_batch(b2)
    assert store.delete_docs([1, 4]) == 2

    retained = b1.unionByName(b2).where(~F.col("doc_id").isin([1, 4]))
    expected = _rows(_batch_expected(retained, PHRASES))
    assert _rows(store.phrase_search(PHRASES)) == expected

    removed = store.purge_deleted()
    assert removed["docs_removed"] == 2
    assert _rows(store.phrase_search(PHRASES)) == expected
    # replay the purged batches: tombstones block docs 1 and 4
    assert store.index_batch(b1) == 0
    assert store.index_batch(b2) == 0
    assert _rows(store.phrase_search(PHRASES)) == expected
    assert store.n_docs() == 3


def test_single_word_phrase_and_positions(spark, store):
    store.index_batch(
        spark.createDataFrame([(7, "m n m n m")], "doc_id long, text string")
    )
    got = _rows(store.phrase_search(["m", "n m"]))
    assert got == [(7, "m", 3, 1), (7, "n m", 2, 2)]


def test_empty_store_schema(spark, store):
    out = store.phrase_search(PHRASES)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "phrase",
        "n_matches",
        "first_pos",
    ]


def test_purge_then_compact_serving_invariant(spark, store):
    """Runbook order on the positional store: delete -> purge ->
    compact leaves phrase results bit-identical and replays blocked."""
    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    store.index_batch(b1)
    store.delete_docs([1])
    before = _rows(store.phrase_search(PHRASES))
    store.purge_deleted()
    store.compact()
    assert _rows(store.phrase_search(PHRASES)) == before
    assert store.index_batch(b1) == 0
    assert _rows(store.phrase_search(PHRASES)) == before


def test_empty_and_whitespace_phrases_match_nothing(spark, store):
    """An empty or whitespace-only phrase tokenizes to zero terms and
    must return no rows (not crash building a zero-branch plan —
    ADVICE r8), alone or mixed with real phrases."""
    store.index_batch(spark.createDataFrame(B1, "doc_id long, text string"))
    assert store.phrase_search([""]).count() == 0
    assert store.phrase_search(["   "]).count() == 0
    mixed = store.phrase_search(["", "a b", "  "])
    assert _rows(mixed) == _rows(
        _batch_expected(
            spark.createDataFrame(B1, "doc_id long, text string"), ["a b"]
        )
    )
