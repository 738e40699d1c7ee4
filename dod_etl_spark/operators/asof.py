"""As-of (nearest-timestamp) join — a temporal operator Spark's join
surface lacks natively.

The reference's only temporal join is strict interval OVERLAP
(DataTransformer.scala:40-61 → operators/interval_join.py); as-of —
"the latest dimension row at or before each event" — is the other
temporal-join shape a training-data/feature pipeline needs (point-in-
time-correct feature lookup), so the engine provides it as a
first-class operator.

Implementation is the distributed merge-asof: tag both sides, union on
the key, and let a single `last(ignorenulls)` window carry each
dimension row forward to every later event in key-time order.

Why this beats the obvious alternatives at 100 TB:
- vs. non-equi join (e.ts >= d.ts) + argmax: that join fans out to
  |events| × |dims-per-key| rows before the argmax prunes — quadratic
  in dimension churn. The union trick is strictly linear: one row per
  input row, ever.
- vs. broadcasting the dimension: dims that need as-of semantics are
  usually SCD-style histories — too big to broadcast.
- Cost shape: exactly ONE shuffle (partition by key, order by time) —
  the same sort both sides would need anyway, fused. Skewed keys fall
  under AQE's skew handling since it is a plain window shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the single right row
    with the greatest right_ts <= left_ts (direction="backward") or the
    smallest right_ts >= left_ts ("forward"), matching on the key.
    Unmatched left rows keep NULL payloads (left-outer semantics).

    Right-side ties on (key, ts) must be resolved by the caller (e.g.
    groupBy(key, ts).agg(max(...))) — the operator asserts nothing
    about them, same contract as pandas merge_asof.

    With `tolerance_ms`, matches farther than the tolerance are nulled
    (payload AND matched ts), still keeping the left row.

    Output: all left columns + `asof_ts` (matched right timestamp) +
    the payload columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    lcols = left.columns
    pay = F.struct(
        F.col(right_ts).cast("timestamp").alias("_rts"),
        *[F.col(c) for c in payload_cols],
    )
    r = right.select(
        F.col(right_on).alias("_key"),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        pay.alias("_pay"),
        F.lit(1).alias("_is_dim"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(left_on).alias("_key"),
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        F.lit(0).alias("_is_dim"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    # Key-time order with the dimension row sorting BEFORE the event at
    # equal timestamps (backward is <=, forward is >=). One shuffle.
    if direction == "backward":
        w = (
            Window.partitionBy("_key")
            .orderBy(F.col("_ts").asc(), F.col("_is_dim").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy("_key")
            .orderBy(F.col("_ts").desc(), F.col("_is_dim").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    matched = (
        r.unionByName(l)
        .withColumn("_asof", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_is_dim") == 0)
    )
    asof: Column = F.col("_asof")
    if tolerance_ms is not None:
        gap = F.abs(
            F.unix_millis(F.col("_ts")) - F.unix_millis(asof.getField("_rts"))
        )
        matched = matched.withColumn(
            "_asof", F.when(gap <= tolerance_ms, asof).otherwise(F.lit(None))
        )
    return matched.select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        F.col("_asof").getField("_rts").alias("asof_ts"),
        *[F.col("_asof").getField(c).alias(c) for c in payload_cols],
    )
