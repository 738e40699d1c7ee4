"""Deletion-neighborhood fuzzy join (operators/fuzzy.py): completeness
vs brute force on adversarial strings, key construction, guard rails."""

from __future__ import annotations

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dod_etl_spark.operators.fuzzy import deletion_keys, fuzzy_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_deletion_keys_contract(spark):
    rows = spark.createDataFrame([("abc",), ("aa",)], "s string").select(
        F.col("s"), deletion_keys(F.col("s")).alias("k")
    ).collect()
    keys = {r["s"]: set(r["k"]) for r in rows}
    assert keys["abc"] == {"abc", "bc", "ac", "ab"}
    assert keys["aa"] == {"aa", "a"}  # duplicate deletions collapse


@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=4), min_size=2, max_size=8
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_fuzzy_pairs_complete_on_random_strings(spark, names):
    """Adversarial tiny alphabet (dense distance-1 neighborhoods):
    the blocked join returns EXACTLY the brute-force distance<=1 pairs."""
    distinct = sorted(set(names))
    expected = {
        (a, b)
        for a, b in itertools.combinations(distinct, 2)
        if _lev(a, b) <= 1
    }
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    got = {
        (r["name_1"], r["name_2"])
        for r in fuzzy_pairs(df, "p_name").collect()
    }
    assert got == expected


def test_fuzzy_pairs_rejects_unsupported_distance(spark):
    df = spark.createDataFrame([("x",)], "p_name string")
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "p_name", max_distance=3)


@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=4), min_size=2, max_size=8
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_fuzzy_pairs_d2_complete_on_random_strings(spark, names):
    """d=2: 2-deletion neighborhoods return exactly the brute-force
    distance<=2 pairs on the dense alphabet."""
    distinct = sorted(set(names))
    expected = {
        (a, b)
        for a, b in itertools.combinations(distinct, 2)
        if _lev(a, b) <= 2
    }
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    got = {
        (r["name_1"], r["name_2"])
        for r in fuzzy_pairs(df, "p_name", max_distance=2).collect()
    }
    assert got == expected
