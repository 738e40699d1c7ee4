"""Band (epsilon) join semantics and plan shape (operators/band_join.py)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dod_etl_spark.operators.band_join import band_join


def _pairs(spark, avals, bvals, eps, as_int=False):
    t = "BIGINT" if as_int else "DOUBLE"
    a = spark.createDataFrame([(i, v) for i, v in enumerate(avals)], f"ida LONG, va {t}")
    b = spark.createDataFrame([(i, v) for i, v in enumerate(bvals)], f"idb LONG, vb {t}")
    got = band_join(a, b, "va", "vb", eps).select("ida", "idb").collect()
    return {(r["ida"], r["idb"]) for r in got}


def test_band_join_integer_exact(spark):
    avals = [0, 5, 10, 100]
    bvals = [2, 7, 13, 99]
    got = _pairs(spark, avals, bvals, eps=3, as_int=True)
    want = {
        (i, j)
        for i, va in enumerate(avals)
        for j, vb in enumerate(bvals)
        if abs(va - vb) <= 3
    }
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    avals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=12),
    bvals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=12),
    eps=st.integers(1, 50),
)
def test_band_join_matches_bruteforce_integers(spark, avals, bvals, eps):
    got = _pairs(spark, avals, bvals, eps, as_int=True)
    want = {
        (i, j)
        for i, va in enumerate(avals)
        for j, vb in enumerate(bvals)
        if abs(va - vb) <= eps
    }
    assert got == want


def test_band_join_with_equi_keys(spark):
    a = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 10.0)], "ida LONG, k STRING, va DOUBLE"
    )
    b = spark.createDataFrame(
        [(3, "x", 10.5), (4, "y", 20.0)], "idb LONG, k STRING, vb DOUBLE"
    )
    got = {
        (r["ida"], r["idb"])
        for r in band_join(a, b, "va", "vb", 1.0, on=["k"]).collect()
    }
    assert got == {(1, 3)}  # (2,3) blocked by key, (2,4) by band


def test_band_join_rejects_nonpositive_eps(spark):
    df = spark.range(1).withColumn("v", F.lit(1.0))
    with pytest.raises(ValueError):
        band_join(df, df, "v", "v", 0.0)


def test_band_join_no_cartesian(spark):
    a = spark.range(100).select(
        F.col("id").alias("ida"), (F.col("id") * 1.5).alias("va")
    )
    b = spark.range(100).select(
        F.col("id").alias("idb"), (F.col("id") * 1.7).alias("vb")
    )
    plan = (
        band_join(a, b, "va", "vb", 2.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_band_join_rejects_outer_how(spark):
    """Outer types would silently degenerate to inner results (the 3x
    fan-out + residual NULL filter drop null-extended rows), so the
    operator must refuse them loudly (round-5 ADVICE, band_join.py:39)."""
    a = spark.createDataFrame([(1, 1.0)], "ida LONG, va DOUBLE")
    b = spark.createDataFrame([(1, 9.0)], "idb LONG, vb DOUBLE")
    for how in ("left", "right", "full", "left_outer", "outer"):
        with pytest.raises(ValueError, match="inner"):
            band_join(a, b, "va", "vb", 0.5, how=how)
