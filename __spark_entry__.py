"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in dod_etl_spark/queries/ (registry pattern: each
query module pairs the Spark callable with its DuckDB oracle SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the end-to-end OEE pipeline (enrichment joins +
    interval-overlap grain split + OEE metric) on sf0.001."""
    from dod_etl_spark.queries.mes import oee_flagship

    return oee_flagship(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dod_etl_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/types)."""
    from dod_etl_spark.queries import ORACLES

    return dict(ORACLES)
