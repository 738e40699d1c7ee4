"""Column-level function library (all JVM-side built-ins, zero UDFs)."""

from dod_etl_spark.functions.scalar import (
    duration_ms,
    epoch_ms_to_ts,
    interval_clamp,
    nan_to_zero,
    ts_to_epoch_ms,
)

__all__ = [
    "duration_ms",
    "epoch_ms_to_ts",
    "interval_clamp",
    "nan_to_zero",
    "ts_to_epoch_ms",
]
