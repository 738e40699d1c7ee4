"""Property-based invariants for the retrieval/tokenizer families:

(a) PostingStore is split-invariant: ANY partition of a corpus into
    ordered batches yields exactly the rankings of the from-scratch
    batch index (Spark-vs-Spark, decimal-exact — safe to compare
    exactly);
(b) bm25_topk is partition-invariant on random corpora (the
    decimal-aggregation contract, generalized beyond the fixture);
(c) BPE merge rules equal an independent reference implementation on
    random corpora (pure integer counts — exact).
"""

from __future__ import annotations

import collections
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dod_etl_spark.operators.retrieval import bm25_topk
from dod_etl_spark.operators.tokenizer import bpe_merges

VOCAB = ["ab", "abc", "bc", "ca", "cab", "b", "a"]


@st.composite
def corpus(draw, min_docs=2, max_docs=10):
    n = draw(st.integers(min_docs, max_docs))
    docs = []
    for i in range(n):
        toks = draw(st.lists(st.sampled_from(VOCAB), min_size=1, max_size=8))
        docs.append((i, " ".join(toks)))
    return docs


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["rank"], r["score"]) for r in df.collect()
    )


@given(corpus(), st.integers(1, 3), st.data())
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_posting_store_split_invariant(spark, docs, n_batches, data):
    """index(batches) == index(whole corpus), for any batch split."""
    from dod_etl_spark.streaming.posting_store import PostingStore

    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(0, len(docs)),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    bounds = [0, *cuts, len(docs)]
    tag = uuid.uuid4().hex[:8]
    store = PostingStore(
        spark, table=f"prop_t_{tag}", docs_table=f"prop_d_{tag}", n_buckets=2
    )
    try:
        full = spark.createDataFrame(docs, "doc_id long, text string")
        for lo, hi in zip(bounds, bounds[1:]):
            if hi > lo:
                store.index_batch(
                    spark.createDataFrame(docs[lo:hi], "doc_id long, text string")
                )
        queries = spark.createDataFrame(
            [(1, "ab bc"), (2, "cab a")], "query_id long, query_text string"
        )
        expected = bm25_topk(full, queries, k=10, rational_idf=True)
        got = store.search(queries, k=10, rational_idf=True)
        assert _rows(got) == _rows(expected)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {store.table}")
        spark.sql(f"DROP TABLE IF EXISTS {store.docs_table}")


@given(corpus())
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_bm25_partition_invariant(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(1, "ab b"), (2, "ca abc")], "query_id long, query_text string"
    )
    a = bm25_topk(df.repartition(5), queries, k=10, rational_idf=True)
    b = bm25_topk(df.coalesce(1), queries, k=10, rational_idf=True)
    assert _rows(a) == _rows(b)


def _reference_bpe(word_freq, n_merges):
    vocab = {tuple(w): f for w, f in word_freq.items()}
    rules = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((a, b, c))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return rules


@given(corpus(), st.integers(1, 5))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_bpe_matches_reference_on_random_corpora(spark, docs, n_merges):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    wf = collections.Counter(w for _, t in docs for w in t.split(" ") if w)
    expected = _reference_bpe(dict(wf), n_merges)
    got = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_merges(df, n_merges=n_merges).sort("step").collect()
    ]
    assert got == expected
