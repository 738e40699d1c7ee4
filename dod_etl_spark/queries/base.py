"""Registry plumbing and cross-engine helpers for oracle-checked queries."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dod_etl_spark.catalog import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; `oracle` is the DuckDB-equivalent SQL (None =>
    rows-only check by the driver)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def sround_sql(expr: str, digits: int) -> str:
    """SQL mirror of functions.scalar.stable_round — identical IEEE ops
    in any engine (round() implementations differ on doubles)."""
    k = 10**digits
    return f"(floor(({expr}) * {k} + 0.5) / {k})"


def ssum_sql(expr: str, digits: int = 2, scale: int = 6) -> str:
    """SQL mirror of functions.scalar.stable_sum: decimal-exact
    (order-independent) aggregation of a per-row double expression."""
    return sround_sql(
        f"CAST(sum(CAST(({expr}) AS DECIMAL(27,{scale}))) AS DOUBLE)", digits
    )
