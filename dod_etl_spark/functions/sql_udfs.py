"""SQL-surface twin of the scalar library (functions/scalar.py): the
F1–F9 helpers registered as Spark 4 SQL scalar UDFs, so a pure
`spark.sql(...)` user gets the same semantics as the DataFrame API
without writing a line of Python.

SQL UDFs (CREATE TEMPORARY FUNCTION ... RETURN <expr>) are INLINED by
the analyzer into the calling plan — the physical plan shows the
expanded expression inside WholeStageCodegen, so this costs exactly
nothing at 100 TB (verified by tests/test_sql_udfs.py plan check).
That property is why this surface exists at all: a Python UDF
registered under the same name would silently insert a serialization
wall into every SQL query that called it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, body) — bodies mirror functions/scalar.py and the
# oracle helpers in queries/base.py exactly.
SQL_UDFS: dict[str, tuple[str, str]] = {
    # F1: epoch-millis -> timestamp (stp/DataTransformer.scala:22-23).
    "epoch_ms_to_ts": ("(ms BIGINT) RETURNS TIMESTAMP", "timestamp_millis(ms)"),
    # F1 inverse: integer-stable timestamp emission.
    "ts_to_epoch_ms": ("(ts TIMESTAMP) RETURNS BIGINT", "unix_millis(ts)"),
    # DuckDB-compat alias so oracle SQL texts run VERBATIM through the
    # Spark SQL frontend (tests/test_sql_frontend_tpch.py): DuckDB
    # spells unix_millis as epoch_ms.
    "epoch_ms": ("(ts TIMESTAMP) RETURNS BIGINT", "unix_millis(ts)"),
    # F5: duration in ms (stp/DataTransformer.scala:104-114).
    "duration_ms": (
        "(s TIMESTAMP, e TIMESTAMP) RETURNS DOUBLE",
        "CAST(unix_millis(e) - unix_millis(s) AS DOUBLE)",
    ),
    # F4: interval intersection bounds (stp/DataTransformer.scala:79-87).
    "interval_clamp_lo": (
        "(a TIMESTAMP, b TIMESTAMP) RETURNS TIMESTAMP",
        "greatest(a, b)",
    ),
    "interval_clamp_hi": (
        "(a TIMESTAMP, b TIMESTAMP) RETURNS TIMESTAMP",
        "least(a, b)",
    ),
    # F9/P11: NaN guard (utils/JDBCSink.scala:21).
    "nan_to_zero": ("(x DOUBLE) RETURNS DOUBLE", "nanvl(x, 0.0d)"),
    # Generic clamp.
    "clamp": (
        "(x DOUBLE, lo DOUBLE, hi DOUBLE) RETURNS DOUBLE",
        "least(greatest(x, lo), hi)",
    ),
    # Cross-engine-deterministic rounding (scalar.stable_round /
    # base.sround_sql): pure IEEE ops, identical in any engine.
    "sround": (
        "(x DOUBLE, d INT) RETURNS DOUBLE",
        "floor(x * power(10, d) + 0.5) / power(10, d)",
    ),
    # Text-quality heuristics (functions/text.py twins).
    "n_tokens": ("(t STRING) RETURNS INT", "size(split(t, ' '))"),
    "punct_count": ("(t STRING) RETURNS INT", "CAST(regexp_count(t, '[.,!?;:]') AS INT)"),
    # Deterministic content-hash primitives (operators/sampling.py /
    # functions/text.md5_prefix_long): the engine-invariant decision
    # hash used by sampling, sharding and dedup.
    "md5_prefix64": (
        "(s STRING) RETURNS BIGINT",
        "CAST(conv(substring(md5(CAST(s AS BINARY)), 1, 8), 16, 10) AS BIGINT)",
    ),
    "hash_bucket": (
        "(key STRING, seed INT, n INT) RETURNS BIGINT",
        "CAST(conv(substring(md5(CAST(concat(key, '_', CAST(seed AS STRING)) "
        "AS BINARY)), 1, 8), 16, 10) AS BIGINT) % n",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every engine SQL UDF (temporary, session-scoped).
    Returns the registered names. Idempotent (OR REPLACE)."""
    for name, (sig, body) in SQL_UDFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name} {sig} RETURN {body}"
        )
    return list(SQL_UDFS)
