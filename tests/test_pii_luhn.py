"""Luhn card detection (queries/llm.py pii_card_numbers_docs): the
checksum and the candidate grammar pinned on card-shaped fixtures and
against a pure-Python Luhn over random digit strings; DuckDB parity
for the registered query rides tests/test_oracle_parity.py."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.queries.llm import (
    _CARD_PAT_SPARK,
    _CARD_SRC_SPARK,
    _LUHN_VALID_EXPR,
)


def _py_luhn(d: str) -> bool:
    total = 0
    for pos, ch in enumerate(reversed(d)):
        x = int(ch)
        if pos % 2 == 1:
            x *= 2
            if x > 9:
                x -= 9
        total += x
    return total % 10 == 0


def _scan(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.selectExpr(
        "doc_id",
        f"size(regexp_extract_all({_CARD_SRC_SPARK}, '{_CARD_PAT_SPARK}', 0))"
        " AS n_cand",
        f"({_LUHN_VALID_EXPR}) AS n_valid",
    )
    return {r["doc_id"]: (r["n_cand"], r["n_valid"]) for r in out.collect()}


def test_card_fixtures(spark):
    got = _scan(
        spark,
        [
            (1, "pay 4111111111111111 now"),        # Visa test number
            (2, "card 4111 1111 1111 1111 ok"),     # spaced
            (3, "dash 4111-1111-1111-1111"),        # dashed
            (4, "bad 4111111111111112"),             # checksum off by one
            (5, "amex 378282246310005"),             # 15 digits, valid
            (6, "no numbers here"),
            (7, "short 123456789012"),               # 12 digits: not a candidate
            (8, "two: 4111111111111111 and 378282246310005"),
        ],
    )
    assert got[1] == (1, 1)
    assert got[2] == (1, 1)
    assert got[3] == (1, 1)
    assert got[4] == (1, 0)
    assert got[5] == (1, 1)
    assert got[6] == (0, 0)
    assert got[7] == (0, 0)
    assert got[8] == (2, 2)


def test_long_digit_runs_are_not_card_candidates(spark):
    """Digit-boundary guard: a 20+-digit contiguous run (order id,
    hash) must yield ZERO candidates — before the pre-split its first
    19 digits were a candidate and a Luhn-lucky prefix false-positived
    a compliance drop. A real card adjacent to (but separated from)
    such a run still detects."""
    luhny = "4111111111111111111"  # 19 digits, crafted Luhn-valid prefix shape
    assert len(luhny) == 19
    got = _scan(
        spark,
        [
            (1, "order 123456789012345678901234 shipped"),  # 24-digit run
            (2, f"hash {luhny}9 tail"),                     # 20 digits
            (3, "id 12345678901234567890 card 4111111111111111"),
            (4, "exactly 1234567890123456789 ok"),          # 19: still a candidate
        ],
    )
    assert got[1] == (0, 0)
    assert got[2] == (0, 0)
    assert got[3] == (1, 1)
    assert got[4][0] == 1


def test_luhn_matches_pure_python_on_random_digit_runs(spark):
    rng = random.Random(909)
    rows = []
    expected = {}
    for i in range(80):
        d = "".join(rng.choice("0123456789") for _ in range(rng.randint(13, 19)))
        rows.append((i, f"ref {d} end"))
        expected[i] = (1, 1 if _py_luhn(d) else 0)
    got = _scan(spark, rows)
    assert got == expected


def test_valid_rate_is_one_in_ten(spark):
    """Sanity on the checksum itself: over many random runs, ~10%
    validate (Luhn is a mod-10 code). Guards against an
    accidentally-always-true predicate."""
    rng = random.Random(17)
    rows = [
        (i, "".join(rng.choice("0123456789") for _ in range(16)))
        for i in range(400)
    ]
    got = _scan(spark, rows)
    rate = sum(v for _, v in got.values()) / len(got)
    assert 0.05 < rate < 0.16
