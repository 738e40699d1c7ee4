"""Property pins for the lexicon surface: on random small corpora the
Spark implementations must equal a pure-Python brute-force computation
(guards the tokenize/bigram/position conventions beyond the fixed
fixtures; the deterministic seeds keep the suite reproducible)."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.queries.lexicon import (
    _bigram_structs,
    _phrase_match_struct,
    _words,
)

VOCAB = ["a", "b", "c", "d"]


def _random_corpus(rng, n_docs, max_len):
    rows = []
    for i in range(n_docs):
        n = rng.randint(0, max_len)
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(n))))
    return rows


def _py_bigrams(text):
    toks = [t for t in text.lower().split(" ") if t]
    return list(zip(toks, toks[1:]))


def _py_phrase_positions(text, phrase):
    toks = [t for t in text.lower().split(" ") if t]
    ph = [t for t in phrase.lower().split(" ") if t]
    k = len(ph)
    return [
        i + 1 for i in range(len(toks) - k + 1) if toks[i : i + k] == ph
    ]


@pytest.mark.parametrize("seed", [11, 47, 2026])
def test_bigram_structs_match_python(spark, seed):
    rng = random.Random(seed)
    rows = _random_corpus(rng, 30, 12)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: [(s["w1"], s["w2"]) for s in r["p"]]
        for r in df.select(
            "doc_id", _bigram_structs(_words(F.col("text"))).alias("p")
        ).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _py_bigrams(text), (doc_id, text)


@pytest.mark.parametrize("seed", [7, 99])
def test_phrase_positions_match_python(spark, seed):
    rng = random.Random(seed)
    rows = _random_corpus(rng, 25, 10)
    # random phrases of length 1-3 from the same vocabulary (self-
    # overlapping repeats like "a a" arise naturally)
    phrases = [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 3)))
        for _ in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    w = _words(F.col("text"))
    sel = df.select(
        "doc_id",
        *[
            _phrase_match_struct(w, p).alias(f"m{i}")
            for i, p in enumerate(phrases)
        ],
    ).collect()
    for r in sel:
        text = dict(rows)[r["doc_id"]]
        for i, p in enumerate(phrases):
            exp = _py_phrase_positions(text, p)
            m = r[f"m{i}"]
            assert m["n_matches"] == len(exp), (text, p)
            assert m["first_pos"] == (exp[0] if exp else None), (text, p)


@pytest.mark.parametrize("seed", [3])
def test_zipf_and_burstiness_match_python(spark, seed, tmp_path):
    from dod_etl_spark.queries.lexicon import token_burstiness, zipf_coverage_docs

    rng = random.Random(seed)
    rows = _random_corpus(rng, 40, 15)
    d = tmp_path / "prop"
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    sf = str(d)

    counts = Counter(t for _, text in rows for t in text.lower().split(" ") if t)
    n_total = sum(counts.values())
    order = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    cum = 0
    exp_zipf = []
    for rank, (tok, c) in enumerate(order, 1):
        cum += c
        exp_zipf.append((rank, tok, c, cum * 1_000_000 // n_total))
    got = sorted(
        (r["rank"], r["tok"], r["c"], r["coverage_ppm"])
        for r in zipf_coverage_docs(spark, sf).collect()
    )
    assert got == exp_zipf

    n_docs = len(rows)
    per_doc = {
        tok: [0] * n_docs for tok in counts
    }
    for doc_id, text in rows:
        for t in text.lower().split(" "):
            if t:
                per_doc[t][doc_id] += 1
    exp_fano = {}
    for tok, cs in per_doc.items():
        sx = sum(cs)
        sxx = sum(c * c for c in cs)
        exp_fano[tok] = (n_docs * sxx - sx * sx) * 1_000_000 // (n_docs * sx)
    got_fano = {
        r["tok"]: r["fano_ppm"] for r in token_burstiness(spark, sf).collect()
    }
    assert got_fano == exp_fano
