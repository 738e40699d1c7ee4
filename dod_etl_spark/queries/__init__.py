"""Query registry: every SURVEY §2 operator exposed as a named query.

Each entry pairs a Spark callable `(spark, sf_dir) -> DataFrame` with an
equivalent DuckDB oracle SQL string (None for genuinely
non-SQL-expressible operators, which the driver checks rows-only).

Determinism contract (driver hashes values after sorting columns by
name): every output column is aliased identically on both sides,
timestamps are emitted as epoch-millis BIGINT, and double columns are
round()ed to a fixed number of digits in BOTH engines.
"""

from __future__ import annotations

from dod_etl_spark.queries.base import ORACLES, QUERIES

# Import for registration side effects.
from dod_etl_spark.queries import tpch as _tpch  # noqa: E402,F401
from dod_etl_spark.queries import mes as _mes  # noqa: E402,F401
from dod_etl_spark.queries import ops as _ops  # noqa: E402,F401
from dod_etl_spark.queries import llm as _llm  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES"]
