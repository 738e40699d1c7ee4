"""Behavior pins for the round-8 quality signals (queries/signals.py).

The driver's sf0.01 corpus has no sentence punctuation and no
hard-blocked terms, so the oracle gate alone can't distinguish a broken
sentence/syllable counter or hard-term path from a working one. This
fixture corpus carries real sentences and hard-term hits, and asserts
both hand-computed values and fixture-level oracle parity."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

DOCS = [
    # 1: two sentences, known word/syllable counts
    (1, "The cat sat. The dog ran away!", "en", "crawl_a"),
    # 2: hard-blocked term present once
    (2, "this corpus has a leak somewhere inside", "en", "crawl_a"),
    # 3: soft terms over the 0.2 fraction threshold (3 of 5 tokens)
    (3, "slow dup batch fast table", "en", "crawl_b"),
    # 4: clean doc, below soft threshold (1 of 6 tokens)
    (4, "slow scan merge join sort filter", "en", "crawl_b"),
    # 5: empty-ish doc (single token, no vowels)
    (5, "zzz", "en", "crawl_c"),
]


@pytest.fixture(scope="module")
def sig_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sigdocs")
    rows = [(i, t, l, s, len(t)) for i, t, l, s in DOCS]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck_sig(sig_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sig_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == bool:
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", ["readability_score_docs", "blocklist_score_docs"])
def test_signal_fixture_parity(name, spark, sig_dir, duck_sig):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    sdf = _norm(qs[name](spark, sig_dir).toPandas())
    odf = _norm(duck_sig.execute(oracles[name]).fetchdf())
    assert list(sdf.columns) == list(odf.columns)
    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)


def test_readability_hand_values(spark, sig_dir):
    out = (
        entry_mod.queries()["readability_score_docs"](spark, sig_dir)
        .toPandas()
        .set_index("doc_id")
    )
    # doc 1: "The cat sat. The dog ran away!" — 7 words, 2 sentence
    # runs, vowel groups: e,a,a,e,o,a,a-a(y counts: awa|y -> a,a + y
    # joins preceding? 'away' lowercased = a,w,a,y -> groups 'a','ay')
    r = out.loc[1]
    assert r["n_words"] == 7 and r["n_sents"] == 2
    assert r["n_sylls"] == 8  # e,a,a,e,o,a + away-> a, ay
    wps, spw = 7 / 2, 8 / 7
    assert r["flesch_ease"] == pytest.approx(
        206.835 - 1.015 * wps - 84.6 * spw, abs=1e-3
    )
    assert r["fk_grade"] == pytest.approx(0.39 * wps + 11.8 * spw - 15.59, abs=1e-3)
    # doc 5: no vowels, no punctuation -> 1 word, 1 sentence, 0 syllables
    r5 = out.loc[5]
    assert r5["n_words"] == 1 and r5["n_sents"] == 1 and r5["n_sylls"] == 0


def test_blocklist_hand_values(spark, sig_dir):
    out = (
        entry_mod.queries()["blocklist_score_docs"](spark, sig_dir)
        .toPandas()
        .set_index("doc_id")
    )
    # doc 2: one hard hit -> blocked regardless of soft fraction
    assert out.loc[2, "n_hard"] == 1 and bool(out.loc[2, "blocked"])
    # doc 3: 3/5 soft tokens -> over threshold, blocked
    assert out.loc[3, "n_soft"] == 3 and bool(out.loc[3, "blocked"])
    # doc 4: 1/6 soft tokens -> below 0.2, not blocked
    assert out.loc[4, "n_soft"] == 1 and not bool(out.loc[4, "blocked"])
    # doc 1: clean
    assert out.loc[1, "n_soft"] == 0 and not bool(out.loc[1, "blocked"])
