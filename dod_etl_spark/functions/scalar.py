"""Scalar column functions — the reference's F1–F9 surface (SURVEY §2.6)
as native Spark Column expressions.

Everything here stays inside whole-stage codegen: no Python crosses the
row path. Reference citations per function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms_to_ts(col: Column | str) -> Column:
    """F1: epoch-millis long -> timestamp.

    Reference: `new Timestamp(bigint.toLong)`
    (stp/DataTransformer.scala:22-23,42-43,86)."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def ts_to_epoch_ms(col: Column | str) -> Column:
    """Inverse of F1; used to emit integer-stable outputs."""
    return F.unix_millis(F.col(col) if isinstance(col, str) else col)


def duration_ms(start: Column, end: Column) -> Column:
    """F5: duration in milliseconds as double.

    Reference: `endTs.getTime - startTs.getTime`
    (stp/DataTransformer.scala:104-114)."""
    return (F.unix_millis(end) - F.unix_millis(start)).cast("double")


def interval_clamp(
    start_a: Column, end_a: Column, start_b: Column, end_b: Column
) -> tuple[Column, Column]:
    """F4: intersection of two intervals [max(starts), min(ends)].

    Reference: if/else chains in stp/DataTransformer.scala:79-87."""
    return F.greatest(start_a, start_b), F.least(end_a, end_b)


def nan_to_zero(col: Column | str) -> Column:
    """F9/P11: NaN -> 0.0 (reference utils/JDBCSink.scala:21)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nanvl(c, F.lit(0.0))


def stable_round(col: Column | str, digits: int) -> Column:
    """Cross-engine-deterministic rounding: floor(x·10^d + 0.5) / 10^d.

    Engine round() implementations legitimately disagree on doubles
    (Spark converts to exact decimal then HALF_UP; DuckDB works in float
    space), so identical input doubles can round differently at a
    boundary. This form is pure IEEE double arithmetic — identical ops,
    identical result, on any engine. Ties are impossible: x·10^d + 0.5
    can only equal an integer when x·10^d has an exact binary .5
    fraction, and then floor is still well-defined and identical.
    Mirror in SQL oracles via queries.base.sround_sql."""
    c = F.col(col) if isinstance(col, str) else col
    k = float(10**digits)
    return F.floor(c.cast("double") * F.lit(k) + F.lit(0.5)).cast("double") / F.lit(k)


def stable_sum(col: Column, digits: int = 2, scale: int = 6) -> Column:
    """Order-independent cross-engine double aggregation: cast each
    per-row double to DECIMAL(27,scale) (exact, associative addition —
    partition/merge order stops mattering), sum, emit double, then
    stable_round to `digits`. The per-row expression must use the same
    association order as the SQL oracle so the pre-cast doubles are
    bit-identical. Mirror: queries.base.ssum_sql."""
    s = F.sum(col.cast("double").cast(f"decimal(27,{scale})")).cast("double")
    return stable_round(s, digits)
