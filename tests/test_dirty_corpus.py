"""Dirty-corpus robustness: real 100 TB feeds carry nulls, empties,
mojibake, wrong-width vectors, and NaNs. This module pins, operator by
operator, what the engine DOES with them — no crashes on the text
path, an explicit quarantine front door on the vector path, and the
one silent-corruption hazard (NaN ranks first in top-k) demonstrated
and then closed.

Companion to operators/quarantine.py (JSON parse dirt) and
operators/similarity.validate_embeddings (vector dirt). The fixtures
are in-test; driver testdata is never touched.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# --- fixtures ----------------------------------------------------------------

NEAR_DUP_A = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while the sun sets slowly behind the old stone bridge tonight "
) * 3
NEAR_DUP_B = NEAR_DUP_A + "extra trailing words here"


@pytest.fixture(scope="module")
def dirty_docs(spark):
    """Two genuine near-duplicates buried in pathological rows: null
    text, empty text, null lang/source, a 50k-word doc, multi-script
    unicode with an emoji, whitespace-only."""
    rows = [
        (1, None, "en", "src0"),
        (2, "", "en", "src0"),
        (3, NEAR_DUP_A, "en", "src1"),
        (4, NEAR_DUP_B, "en", "src1"),
        (5, "word " * 50_000, "en", "src1"),
        (6, "héllo wörld naïve café — em–dash 你好 世界 🙂 " * 3, "zh", "src2"),
        (7, "x", "en", None),
        (8, "  \t\n  ", "en", "src3"),
        (9, "a", None, "src1"),
    ]
    return spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING"
    )


# --- text path: no crashes, dirt excluded, signal preserved ------------------


def test_minhash_survives_dirt_and_finds_the_real_pair(spark, dirty_docs):
    from dod_etl_spark.operators.text_dedup import minhash_candidates

    pairs = minhash_candidates(
        dirty_docs, num_hashes=16, band_size=4, hash_fn="xxhash64"
    ).collect()
    found = {(r["id_1"], r["id_2"]) for r in pairs}
    assert (3, 4) in found  # the genuine near-dup still surfaces
    flat = {i for p in found for i in p}
    assert 1 not in flat and 2 not in flat  # null/empty emit no shingles


def test_simhash_survives_dirt_and_finds_the_real_pair(spark, dirty_docs):
    from dod_etl_spark.operators.text_dedup import simhash16, simhash_near_pairs

    pairs = simhash_near_pairs(simhash16(dirty_docs)).collect()
    found = {(r["id_1"], r["id_2"]) for r in pairs}
    assert (3, 4) in found


def test_winnowing_survives_dirt(spark, dirty_docs):
    from dod_etl_spark.operators.text_dedup import winnow_fingerprints

    fps = winnow_fingerprints(dirty_docs)
    ids = {r["doc_id"] for r in fps.select("doc_id").distinct().collect()}
    assert 1 not in ids  # null text yields no fingerprints
    assert {3, 4, 5, 6} <= ids  # real docs (incl. huge + unicode) do


def test_chunking_handles_huge_and_unicode_docs(spark, dirty_docs):
    from dod_etl_spark.operators.chunking import chunk_tokens

    chunks = chunk_tokens(
        dirty_docs.filter(F.col("doc_id").isin(5, 6)), keep_text=True
    )
    n5 = chunks.filter(F.col("doc_id") == 5).count()
    assert n5 > 1  # 50k-token doc actually splits
    uni = chunks.filter(F.col("doc_id") == 6).select("chunk_text").first()
    assert "你好" in uni["chunk_text"]  # multi-byte text intact end-to-end


def test_token_semantics_on_degenerate_whitespace(spark, dirty_docs):
    """The single-space split is the DOCUMENTED cross-engine contract
    (functions/text.tokens: consecutive spaces yield empty tokens;
    DuckDB string_split agrees, which is what keeps every token-count
    oracle engine-exact). Pin its degenerate edges so nobody 'fixes'
    one side and silently breaks parity: null -> null count, '' -> 1,
    whitespace-only counts split fields, not words."""
    from dod_etl_spark.functions.text import n_tokens, quality_score

    got = {
        r["doc_id"]: (r["n"], r["q"])
        for r in dirty_docs.select(
            "doc_id",
            n_tokens(F.col("text")).alias("n"),
            quality_score(F.col("text")).alias("q"),
        ).collect()
    }
    assert got[1] == (None, None)  # null propagates, never a crash
    assert got[2][0] == 1  # split('', ' ') = [''] — documented
    assert got[8][0] == 5  # '  \t\n  ' -> 5 split fields
    assert got[5][0] == 50_001 and got[5][1] == 1.0  # huge doc saturates


# --- vector path: the crash, the silent hazard, and the front door -----------


@pytest.fixture(scope="module")
def dirty_emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0], 0),
        (2, None, 1),  # null vector
        (3, [float("nan"), 1.0, 0.0, 0.0], 1),  # NaN component
        (4, [0.0, 0.0, 0.0, 0.0], 1),  # zero vector: VALID (denom guard)
        (5, [1.0, 1.0], 2),  # wrong width
        (6, [float("inf"), 0.0, 0.0, 0.0], 2),  # Inf component
    ]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")


def test_wrong_width_vector_kills_the_raw_job(spark, dirty_emb):
    """Unvalidated input: ONE 2-wide vector in a 4-wide corpus throws
    INVALID_ARRAY_INDEX under ANSI positional indexing — the failure
    mode validate_embeddings exists to prevent."""
    from dod_etl_spark.operators.similarity import brute_force_topk

    with pytest.raises(Exception, match="INVALID_ARRAY_INDEX|ArrayIndex"):
        brute_force_topk(dirty_emb, dirty_emb, k=2).collect()


def test_nan_vector_pollutes_topk_without_validation(spark):
    """Same widths, one NaN component: no crash — quiet pollution. The
    NaN propagates through dot/norm into a NaN similarity; Spark's
    floor(NaN)=0 makes stable_round collapse it to cosine 0.0 (DuckDB's
    floor(NaN)=NaN would NOT — a cross-engine divergence if dirt ever
    reached an oracle-paired query). The corrupt row thus (a) appears
    as a fake 0.0-cosine neighbor burning a k slot for every query and
    (b) emits its own all-zero query group. Pinned so a Spark behavior
    change (or an 'improvement' to stable_round) resurfaces the
    hazard; validate_embeddings is the actual fix."""
    from dod_etl_spark.operators.similarity import brute_force_topk

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0], 0),
        (3, [float("nan"), 1.0, 0.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    rows_out = brute_force_topk(emb, emb, k=2).collect()
    got = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in rows_out}
    assert got[(0, 3)] == 0.0 and got[(1, 3)] == 0.0  # fake neighbors, k slots burned
    assert got[(3, 0)] == 0.0 and got[(3, 1)] == 0.0  # all-zero query group


def test_validate_embeddings_splits_and_restores_correctness(spark, dirty_emb):
    from dod_etl_spark.operators.similarity import (
        brute_force_topk,
        validate_embeddings,
    )

    valid, quarantined = validate_embeddings(dirty_emb)
    assert {r["vec_id"] for r in valid.collect()} == {0, 1, 4}
    assert {r["vec_id"] for r in quarantined.collect()} == {2, 3, 5, 6}
    # The cleaned corpus computes exact top-k: real neighbor first, the
    # zero vector scores 0.0 via the denom guard instead of dividing by 0.
    res = brute_force_topk(valid, valid, k=2).collect()
    top = {(r["query_id"], r["rk"]): (r["neighbor_id"], r["cosine"]) for r in res}
    assert top[(0, 1)][0] == 1
    zero_rows = [v for (q, _), v in top.items() if q == 4]
    assert all(c == 0.0 for _, c in zero_rows)


def test_validate_embeddings_probe_skips_leading_null(spark):
    """dim inference samples NON-NULL rows only (a null vector at
    position 0 previously poisoned the width probe) and breaks width
    ties toward the larger candidate — truncation is the dirt, so the
    3-wide vector defines the corpus and the 1-wide one quarantines."""
    from dod_etl_spark.operators.similarity import validate_embeddings

    rows = [(0, None, 0), (1, [1.0, 2.0, 3.0], 0), (2, [1.0], 1)]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    valid, quarantined = validate_embeddings(emb)
    assert [r["vec_id"] for r in valid.collect()] == [1]
    assert {r["vec_id"] for r in quarantined.collect()} == {0, 2}


def test_validate_embeddings_empty_and_all_null(spark):
    from dod_etl_spark.operators.similarity import validate_embeddings

    schema = "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    empty = spark.createDataFrame([], schema)
    v, q = validate_embeddings(empty)
    assert v.count() == 0 and q.count() == 0
    all_null = spark.createDataFrame([(0, None, 0), (1, None, 0)], schema)
    v, q = validate_embeddings(all_null)
    assert v.count() == 0 and q.count() == 2
