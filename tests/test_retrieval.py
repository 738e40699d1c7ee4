"""BM25 lexical retrieval (operators/retrieval.py): ranking semantics,
log-idf production mode, and partition invariance."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dod_etl_spark.operators.retrieval import bm25_topk


def _docs(spark):
    rows = [
        # doc 1: both query terms, short -> best for q1
        (1, "apple banana"),
        # doc 2: both terms but diluted by length
        (2, "apple banana kiwi kiwi kiwi kiwi kiwi kiwi kiwi kiwi"),
        # doc 3: one term only
        (3, "apple pear plum"),
        # doc 4: no query terms
        (4, "pear plum quince"),
        # doc 5: term repetition (tf saturation, not linear reward)
        (5, "apple apple apple apple"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(1, "apple banana")], "query_id long, query_text string"
    )


def test_bm25_ranking_semantics(spark):
    out = bm25_topk(_docs(spark), _queries(spark), k=10, rational_idf=True)
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 4 shares no term: absent entirely
    assert 4 not in rows
    # two-term short doc beats the long two-term doc and every one-term doc
    assert rows[1]["rank"] == 1
    # both-terms-diluted still beats single-term docs: 'banana' is rarer
    # (df=2) than 'apple' (df=4), so its idf dominates
    assert rows[2]["rank"] == 2
    # tf saturation: 4x 'apple' must not overtake a doc containing the
    # rare term
    assert rows[5]["rank"] > rows[2]["rank"]
    assert all(r["score"] > 0 for r in rows.values())


def test_bm25_log_idf_mode(spark):
    """Production (log-idf) mode: same candidate set, sane scores; the
    Robertson ln(1 + (N-df+.5)/(df+.5)) form is strictly positive."""
    out = bm25_topk(_docs(spark), _queries(spark), k=10, rational_idf=False)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 5}
    assert rows[1]["rank"] == 1
    assert all(r["score"] > 0 for r in rows.values())
    # hand-check doc 3 ('apple' once, dl=3): one term, tf=1
    n, df, tf, dl, avgdl = 5, 4, 1, 3, (2 + 10 + 3 + 3 + 4) / 5
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    expected = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert abs(rows[3]["score"] - expected) < 1e-3


def test_bm25_partition_invariance(spark):
    """Scores and ranks are identical under any input partitioning —
    the decimal-exact aggregation contract."""
    docs = _docs(spark)
    q = _queries(spark)
    a = bm25_topk(docs.repartition(7), q, k=10, rational_idf=True)
    b = bm25_topk(docs.coalesce(1), q, k=10, rational_idf=True)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_bm25_k_cut_and_tiebreak(spark):
    """Identical documents tie exactly (decimal scores equal); the
    doc_id ASC tiebreak makes the k-cut deterministic."""
    rows = [(i, "apple banana") for i in range(1, 8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(docs, _queries(spark), k=3, rational_idf=True)
    got = [(r["doc_id"], r["rank"]) for r in out.sort("rank").collect()]
    assert got == [(1, 1), (2, 2), (3, 3)]
    scores = {r["score"] for r in out.collect()}
    assert len(scores) == 1


def test_rrf_fusion_semantics(spark):
    """A doc ranked by BOTH arms outranks a doc ranked first by only
    one arm; absent-arm ranks surface as -1."""
    from dod_etl_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2)], "query_id long, doc_id long, rank long"
    )
    dense = spark.createDataFrame(
        [(1, 20, 1), (1, 30, 2)], "query_id long, doc_id long, rank long"
    )
    out = {r["doc_id"]: r for r in rrf_fuse(lex, dense, k=10).collect()}
    # doc 20: 1/62 + 1/61 beats doc 10's 1/61 and doc 30's 1/62
    assert out[20]["rank"] == 1
    assert out[10]["rank"] == 2 and out[10]["dense_rank"] == -1
    assert out[30]["rank"] == 3 and out[30]["lex_rank"] == -1
    assert abs(out[20]["rrf"] - (1 / 62 + 1 / 61)) < 1e-6


def test_rrf_tie_breaks_on_doc_id(spark):
    """Symmetric single-arm firsts tie exactly; doc_id ASC decides."""
    from dod_etl_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 50, 1)], "query_id long, doc_id long, rank long"
    )
    dense = spark.createDataFrame(
        [(1, 40, 1)], "query_id long, doc_id long, rank long"
    )
    got = [
        (r["doc_id"], r["rank"])
        for r in rrf_fuse(lex, dense, k=10).sort("rank").collect()
    ]
    assert got == [(40, 1), (50, 2)]


def test_bm25_empty_text_and_empty_query(spark):
    """Empty documents contribute to corpus stats but never match;
    empty queries return no rows; neither crashes the plan."""
    docs = spark.createDataFrame(
        [(1, "apple banana"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "apple"), (2, ""), (3, "   ")],
        "query_id long, query_text string",
    )
    out = bm25_topk(docs, queries, k=5, rational_idf=True).collect()
    assert {(r["query_id"], r["doc_id"]) for r in out} == {(1, 1)}
    assert all(r["score"] > 0 for r in out)


def test_prf_expansion_recalls_vocabulary_neighbors(spark):
    """The PRF contract: a document sharing NO term with the query but
    sharing vocabulary with the query's top results becomes
    retrievable after expansion (and stays unreachable without it)."""
    from dod_etl_spark.operators.retrieval import prf_expand_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana"),
            (2, "apple banana cherry"),
            (3, "cherry durian"),  # no 'apple' — unreachable round 1
            (4, "fig grape"),  # unrelated — must stay out
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "apple")], "query_id long, query_text string")

    plain = {r["doc_id"] for r in bm25_topk(docs, q, k=10, rational_idf=True).collect()}
    assert plain == {1, 2}

    expanded = {
        r["doc_id"]
        for r in prf_expand_topk(
            docs, q, k=10, k_fb=2, m_expand=2, rational_idf=True
        ).collect()
    }
    assert 3 in expanded  # reached through feedback term 'cherry'/'banana'
    assert 4 not in expanded
    assert {1, 2} <= expanded
