"""Stream-stream joins with watermark-bounded state.

The reference never joins two live streams (its dims are table
snapshots — SURVEY §2.7); this is the Spark-native extension for
fact-to-fact correlation (e.g. order events ⋈ payment events within an
hour). What makes it deployable at 100 TB is the STATE BOUND: both
sides carry watermarks and the join condition carries a time range, so
Spark evicts buffered rows once the watermark passes — without the
range, stream-stream state grows forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_lag: str = "1 hour",
    watermark_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join events on `key` where the right event lands within
    [left_ts, left_ts + max_lag].

    State lifecycle: each side buffers only until its watermark passes
    the other side's qualifying window — Spark derives the eviction
    horizon FROM the range predicate, which is why the predicate must
    stay an interval, not an open-ended inequality. Outer modes emit
    the unmatched row when (and only when) the watermark proves no
    match can still arrive.
    """
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_lag}"))
    )
    return lw.join(rw, cond, how)
