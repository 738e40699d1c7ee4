"""Short-document shingle convention (advisor r7, medium): docs shorter
than the 8-char shingle must emit ONE truncated shingle — matching both
the DuckDB oracles' range(1, greatest(length-6, 2)) and the repo-wide
char_ngrams convention — not an empty array that silently drops the doc
from source_overlap_jaccard denominators and the doc_novelty_scores
output. sf0.01 has no doc under 48 chars, so the driver gate can't see
this; this fixture corpus pins it."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

DOCS = [
    # (doc_id, text, lang, source, n_chars) — doc 3/6 are sub-shingle
    (1, "the quick brown fox jumps over the lazy dog", "en", "crawl_a"),
    (2, "the quick brown fox jumps over the lazy cat", "en", "crawl_b"),
    (3, "tiny", "en", "crawl_a"),
    (4, "completely different material with no overlap here", "en", "crawl_b"),
    (5, "the quick brown fox jumps over the lazy dog", "en", "crawl_c"),
    (6, "ok", "en", "crawl_c"),
]


@pytest.fixture(scope="module")
def short_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("shortdocs")
    rows = [(i, t, l, s, len(t)) for i, t, l, s in DOCS]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck_short(short_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{short_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", ["doc_novelty_scores", "source_overlap_jaccard"])
def test_short_doc_oracle_parity(name, spark, short_dir, duck_short):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    sdf = _norm(qs[name](spark, short_dir).toPandas())
    odf = _norm(duck_short.execute(oracles[name]).fetchdf())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs oracle {len(odf)}"
    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)


def test_short_docs_present_in_novelty(spark, short_dir):
    out = (
        entry_mod.queries()["doc_novelty_scores"](spark, short_dir)
        .toPandas()
        .set_index("doc_id")
    )
    # every doc appears, including the sub-shingle ones
    assert set(out.index) == {1, 2, 3, 4, 5, 6}
    # a short doc's single truncated shingle is unique corpus-wide here
    assert out.loc[3, "n_shingles"] == 1 and out.loc[3, "novelty"] == 1.0
    # identical docs 1 and 5 have zero novelty
    assert out.loc[1, "novelty"] == 0.0 and out.loc[5, "novelty"] == 0.0
