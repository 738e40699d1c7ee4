"""American Soundex (functions/text.soundex_sql): canonical test
vectors in BOTH engines, agreement with Spark's builtin soundex() on
real corpus tokens, and block-size sanity for the phonetic pair query.
Full DuckDB parity for phonetic_token_pairs rides
tests/test_oracle_parity.py."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dod_etl_spark.catalog import load_table
from dod_etl_spark.functions.text import soundex_sql
from tests.conftest import SF_SMOKE

# Odell/Russell canonical vectors (the patent + census set everyone
# validates against), plus the H/W-elision and first-letter cases.
VECTORS = [
    ("Robert", "R163"),
    ("Rupert", "R163"),
    ("Ashcraft", "A261"),
    ("Ashcroft", "A261"),
    ("Tymczak", "T522"),
    ("Pfister", "P236"),
    ("Honeyman", "H555"),
    ("Holmes", "H452"),
    ("Jackson", "J250"),
    ("Washington", "W252"),
    ("Lee", "L000"),
    ("Gutierrez", "G362"),
    ("a", "A000"),
    ("x123y", "X000"),  # the DuckDB global-flag trap's regression case
]


def test_canonical_vectors_both_engines(spark):
    df = spark.createDataFrame([(w,) for w, _ in VECTORS], "w string")
    got_spark = {
        r["w"]: r["sx"]
        for r in df.selectExpr("w", soundex_sql("w", "spark") + " AS sx").collect()
    }
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w, _ in VECTORS)
    got_duck = dict(
        con.execute(
            f"SELECT w, {soundex_sql('w', 'duckdb')} FROM (VALUES {vals}) t(w)"
        ).fetchall()
    )
    for w, want in VECTORS:
        assert got_spark[w] == want, (w, got_spark[w])
        assert got_duck[w] == want, (w, got_duck[w])


def test_agrees_with_spark_builtin_on_corpus_tokens(spark):
    """On every alphabetic token in the part names, the generated SQL
    matches Spark's builtin soundex() — the expression IS the
    documented algorithm, not an approximation of it."""
    part = load_table(spark, SF_SMOKE, "part")
    toks = (
        part.select(F.explode(F.split("p_name", " ")).alias("tok"))
        .filter(F.col("tok").rlike("^[A-Za-z]+$"))
        .distinct()
    )
    cmp = toks.selectExpr(
        "tok", soundex_sql("tok", "spark") + " AS sx", "soundex(tok) AS builtin"
    )
    bad = cmp.filter(F.col("sx") != F.col("builtin")).collect()
    assert not bad, bad[:5]
    assert cmp.count() > 10  # the corpus genuinely exercised it


def test_blocking_is_bounded_and_catches_sound_alikes(spark):
    from dod_etl_spark.queries import QUERIES

    rows = QUERIES["phonetic_token_pairs"](spark, SF_SMOKE).collect()
    assert rows, "part-name tokens must collide somewhere"
    # every pair shares its block key and is genuinely two tokens
    assert all(r["tok_1"] < r["tok_2"] and len(r["code"]) == 4 for r in rows)
    # block fan-out stays far from all-pairs: pairs << n_tokens^2 / 2
    part = load_table(spark, SF_SMOKE, "part")
    n = (
        part.select(F.explode(F.split("p_name", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
        .count()
    )
    assert len(rows) < n * (n - 1) / 8


def _py_soundex(w: str) -> str:
    """Pure-Python American Soundex (the algorithm the SQL generator
    encodes), used as the independent reference for the property
    sweep."""
    u = "".join(ch for ch in w.upper() if "A" <= ch <= "Z")
    if not u:
        return ""
    code_of = {}
    for grp, d in [("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                   ("L", "4"), ("MN", "5"), ("R", "6"), ("AEIOUY", "0")]:
        for ch in grp:
            code_of[ch] = d
    # digit stream with H/W elided (letters separated only by H/W
    # collapse); the first letter's code participates in collapsing
    stream = [code_of[ch] for ch in u if ch not in "HW"]
    collapsed = []
    for d in stream:
        if not collapsed or collapsed[-1] != d:
            collapsed.append(d)
        # adjacent duplicates collapse
    if u[0] not in "HW" and collapsed:
        collapsed = collapsed[1:]  # drop the first letter's own code
    digits = [d for d in collapsed if d != "0"]
    return u[0] + "".join(digits[:3]).ljust(3, "0")


def test_property_sweep_vs_python_reference(spark):
    """Random alphabetic-ish strings (with digits/punct mixed in to
    exercise the strip) through BOTH engines vs the independent Python
    implementation — all three must agree everywhere."""
    import random

    rng = random.Random(4242)
    alphabet = "abcdefghijklmnopqrstuvwxyzAEIOUHW-'1 "
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12))).strip()
        or "x"
        for _ in range(300)
    ]
    words = [w.replace(" ", "") or "x" for w in words]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got_spark = {
        r["w"]: r["sx"]
        for r in df.selectExpr("w", soundex_sql("w", "spark") + " AS sx").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE words (w VARCHAR)")
    con.executemany("INSERT INTO words VALUES (?)", [(w,) for w in words])
    got_duck = dict(
        con.execute(f"SELECT w, {soundex_sql('w', 'duckdb')} FROM words").fetchall()
    )
    for w in set(words):
        want = _py_soundex(w)
        assert got_spark[w] == want, (w, got_spark[w], want)
        assert got_duck[w] == want, (w, got_duck[w], want)
