"""Hand-fixture pins for the lexicon surface (queries/lexicon.py):
PMI collocation arithmetic, phrase-match edge cases, and the
vocabulary-growth bucketing.

Corpus-level value parity is covered by test_oracle_parity; these pin
behaviors the synthetic corpus can't exercise (overlapping phrase
matches, docs shorter than the phrase, exact lift arithmetic on a
countable corpus, multi-bucket type accretion) against hand-computed
expectations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.queries.lexicon import (
    _bigram_structs,
    _phrase_match_struct,
    _words,
    pmi_collocations,
    vocab_growth_docs,
    zipf_coverage_docs,
)


def _fixture_dir(spark, tmp_path, rows):
    d = tmp_path / "lexfix"
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


# --- bigram construction ------------------------------------------------------


def test_bigram_structs_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "x"), (3, ""), (4, "a  a")],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id", _bigram_structs(_words(F.col("text"))).alias("p")
    ).collect()
    got = {r["doc_id"]: [(s["w1"], s["w2"]) for s in r["p"]] for r in out}
    assert got[1] == [("a", "b"), ("b", "c"), ("c", "a"), ("a", "b")]
    assert got[2] == []  # single token: no pair
    assert got[3] == []  # empty doc
    # double space collapses (empties filtered): adjacent pair survives
    assert got[4] == [("a", "a")]


# --- phrase matching ----------------------------------------------------------


@pytest.mark.parametrize(
    "text,phrase,positions",
    [
        ("a a a", "a a", [1, 2]),  # overlapping matches both count
        ("x y z", "y z", [2]),  # match flush at doc end
        ("y z", "x y z", []),  # doc shorter than phrase
        ("a b a b a", "a b a", [1, 3]),  # self-overlapping trigram
        ("q", "q", [1]),  # single-word phrase
        ("a b", "b a", []),  # order matters
    ],
)
def test_phrase_positions(spark, text, phrase, positions):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    m = df.select(
        _phrase_match_struct(_words(F.col("text")), phrase).alias("m")
    ).collect()[0]["m"]
    assert m["n_matches"] == len(positions)
    assert m["first_pos"] == (positions[0] if positions else None)


# --- PMI lift arithmetic ------------------------------------------------------


def test_pmi_lift_exact_on_countable_corpus(spark, tmp_path):
    # 10 copies of "p q" and 10 of "p r": N=40 unigrams, M=20 bigrams,
    # c(p)=20, c(q)=c(r)=10, c_xy=10 each.
    # lift(p,q) = c_xy*N^2 / (M*c_p*c_q) = 10*1600/(20*20*10) = 4
    #   -> 4_000_000 ppm exactly.
    rows = [(i, "p q") for i in range(10)] + [(10 + i, "p r") for i in range(10)]
    out = pmi_collocations(spark, _fixture_dir(spark, tmp_path, rows))
    got = {(r["w1"], r["w2"]): r.asDict() for r in out.collect()}
    assert set(got) == {("p", "q"), ("p", "r")}
    for key in got:
        assert got[key]["c_xy"] == 10
        assert got[key]["c_x"] == 20
        assert got[key]["c_y"] == 10
        assert got[key]["lift_ppm"] == 4_000_000


def test_pmi_lift_truncates_not_rounds(spark, tmp_path):
    # 5 docs "a b" + 2 docs "b a": N=14, M=7, c(a)=c(b)=7, c_xy(a,b)=5.
    # lift = 5*196/(7*7*7) = 980/343 = 2.857142857... -> 2_857_142 ppm
    # (truncation; a rounding implementation would emit 2_857_143).
    # (b,a) at c_xy=2 falls under the min-count cut.
    rows = [(i, "a b") for i in range(5)] + [(5 + i, "b a") for i in range(2)]
    out = pmi_collocations(spark, _fixture_dir(spark, tmp_path, rows))
    got = {(r["w1"], r["w2"]): r.asDict() for r in out.collect()}
    assert set(got) == {("a", "b")}
    assert got[("a", "b")]["lift_ppm"] == 2_857_142


def test_pmi_min_count_cut(spark, tmp_path):
    # "u v" occurs 4 times < 5: filtered; "p q" at 5 survives.
    rows = [(i, "p q") for i in range(5)] + [(5 + i, "u v") for i in range(4)]
    out = pmi_collocations(spark, _fixture_dir(spark, tmp_path, rows))
    assert {(r["w1"], r["w2"]) for r in out.collect()} == {("p", "q")}


# --- vocabulary growth --------------------------------------------------------


def test_vocab_growth_buckets_accrete(spark, tmp_path):
    # Bucket 0 (docs 0-99 -> only doc 0): "a b" => 2 tokens, 2 uni
    # types, 1 bigram type. Bucket 1 (doc 100): "b c b" adds type c and
    # bigram types (b,c),(c,b). Bucket 2 (doc 250): "a b" adds nothing
    # but tokens.
    rows = [(0, "a b"), (100, "b c b"), (250, "a b")]
    out = vocab_growth_docs(spark, _fixture_dir(spark, tmp_path, rows))
    got = {r["bucket"]: r.asDict() for r in out.collect()}
    assert set(got) == {0, 1, 2}
    assert (got[0]["cum_tokens"], got[0]["cum_uni_types"], got[0]["cum_bi_types"]) == (
        2,
        2,
        1,
    )
    assert (got[1]["cum_tokens"], got[1]["cum_uni_types"], got[1]["cum_bi_types"]) == (
        5,
        3,
        3,
    )
    assert (got[2]["cum_tokens"], got[2]["cum_uni_types"], got[2]["cum_bi_types"]) == (
        7,
        3,
        3,
    )


# --- Zipf coverage ------------------------------------------------------------


def test_zipf_coverage_ranks_and_ppm(spark, tmp_path):
    # tokens: a x6, b x3, c x1 -> N=10.
    # rank 1 a cum 6 -> 600000 ppm; rank 2 b cum 9 -> 900000;
    # rank 3 c cum 10 -> 1000000.
    rows = [(0, "a a a b"), (1, "a b c"), (2, "a a b")]
    out = zipf_coverage_docs(spark, _fixture_dir(spark, tmp_path, rows))
    got = sorted((r["rank"], r["tok"], r["c"], r["coverage_ppm"]) for r in out.collect())
    assert got == [(1, "a", 6, 600_000), (2, "b", 3, 900_000), (3, "c", 1, 1_000_000)]


def test_zipf_rank_ties_break_on_token(spark, tmp_path):
    # equal counts: rank order must be alphabetical (deterministic).
    rows = [(0, "z y x")]
    out = zipf_coverage_docs(spark, _fixture_dir(spark, tmp_path, rows))
    got = [(r["rank"], r["tok"]) for r in sorted(out.collect(), key=lambda r: r["rank"])]
    assert got == [(1, "x"), (2, "y"), (3, "z")]


# --- source TVD and burstiness ------------------------------------------------


def _fixture_dir_src(spark, tmp_path, rows):
    d = tmp_path / "lexsrc"
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_source_token_tvd_exact(spark, tmp_path):
    from dod_etl_spark.queries.lexicon import source_token_tvd

    # s1: "a a b" (N=3: a 2/3, b 1/3); s2: "a c" (N=2: a 1/2, c 1/2).
    # TVD = (|2/3-1/2| + |1/3-0| + |0-1/2|)/2 = 1/2 -> 500000 ppm
    # (numerator |ca*Nb - cb*Na|: a=1, b=2, c=3 -> 6; den 2*3*2=12).
    rows = [(1, "a a b", "s1"), (2, "a c", "s2")]
    out = source_token_tvd(spark, _fixture_dir_src(spark, tmp_path, rows))
    got = [(r["source_a"], r["source_b"], r["tvd_ppm"]) for r in out.collect()]
    assert got == [("s1", "s2", 500_000)]


def test_source_token_tvd_bounds(spark, tmp_path):
    from dod_etl_spark.queries.lexicon import source_token_tvd

    # identical distributions -> 0; disjoint vocabularies -> 1e6.
    rows = [
        (1, "a b", "same1"),
        (2, "a b", "same2"),
        (3, "x y", "other"),
    ]
    out = source_token_tvd(spark, _fixture_dir_src(spark, tmp_path, rows))
    got = {(r["source_a"], r["source_b"]): r["tvd_ppm"] for r in out.collect()}
    assert got[("same1", "same2")] == 0
    assert got[("other", "same1")] == 1_000_000
    assert got[("other", "same2")] == 1_000_000


def test_token_burstiness_fano(spark, tmp_path):
    from dod_etl_spark.queries.lexicon import token_burstiness

    # 4 docs: "a a a a" in one doc -> a is maximally bursty;
    # "b" spread one-per-doc in the other three -> sub-Poisson.
    # a: n=4, sx=4, sxx=16 -> (4*16-16)*1e6/(4*4) = 3_000_000.
    # b: n=4, sx=3, sxx=3 -> (12-9)*1e6/12 = 250_000.
    rows = [(1, "a a a a"), (2, "b"), (3, "b"), (4, "b")]
    out = token_burstiness(spark, _fixture_dir(spark, tmp_path, rows))
    got = {r["tok"]: (r["n_docs_with"], r["sx"], r["fano_ppm"]) for r in out.collect()}
    assert got["a"] == (1, 4, 3_000_000)
    assert got["b"] == (3, 3, 250_000)


# --- null-text robustness (dirty-corpus convention) ---------------------------


def test_lexicon_null_text_docs(spark, tmp_path):
    """A null-text doc must not crash any lexicon query and must count
    as an empty doc exactly as the DuckDB oracles treat it (unnest of
    NULL emits nothing; count(*) still counts the document row)."""
    from dod_etl_spark.queries.lexicon import (
        phrase_match_docs,
        source_token_tvd,
        token_burstiness,
        zipf_coverage_docs,
    )

    d = tmp_path / "lexnull"
    spark.createDataFrame(
        [(1, "a b a b a b a b a b", "s1"), (2, None, "s1"), (3, "a b", "s2")],
        "doc_id long, text string, source string",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    sf = str(d)

    zipf = {r["tok"]: r["c"] for r in zipf_coverage_docs(spark, sf).collect()}
    assert zipf == {"a": 6, "b": 6}
    assert phrase_match_docs(spark, sf).count() == 0  # phrases absent
    fano = {r["tok"]: r["n_docs_with"] for r in token_burstiness(spark, sf).collect()}
    assert fano == {"a": 2, "b": 2}
    tvd = source_token_tvd(spark, sf).collect()
    assert [(r["source_a"], r["source_b"], r["tvd_ppm"]) for r in tvd] == [
        ("s1", "s2", 0)
    ]

    growth = vocab_growth_docs(spark, sf).collect()
    assert [(r["bucket"], r["cum_tokens"]) for r in growth] == [(0, 12)]


# --- skipgram lift ------------------------------------------------------------


def test_skipgram_pairs_and_window(spark, tmp_path):
    from dod_etl_spark.queries.lexicon import skipgram_lift, _skipgram_structs

    # pair construction: "a b c d" window 2 ->
    # (a,b)(b,c)(c,d) at d=1 + (a,c)(b,d) at d=2
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    got = [
        (s["w1"], s["w2"])
        for s in df.select(
            _skipgram_structs(_words(F.col("text")), 2).alias("p")
        ).collect()[0]["p"]
    ]
    assert got == [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("b", "d")]

    # exact lift on a countable corpus: 5 docs "p q r".
    # skipgrams/doc: (p,q)(q,r)(p,r) -> each c_xy=5, M=15, N=15, c=5 each.
    # lift = 5*225*1e6/(15*5*5) = 3_000_000 for every pair.
    rows = [(i, "p q r") for i in range(5)]
    out = skipgram_lift(spark, _fixture_dir(spark, tmp_path, rows))
    got2 = {(r["w1"], r["w2"]): r["lift_ppm"] for r in out.collect()}
    assert got2 == {
        ("p", "q"): 3_000_000,
        ("q", "r"): 3_000_000,
        ("p", "r"): 3_000_000,
    }
