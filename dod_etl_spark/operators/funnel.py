"""Ordered N-stage funnel as a single-shuffle fold aggregation.

Stage k counts only if it happens STRICTLY after the user's stage-k-1
time (classic ordered-funnel semantics).  The plan is one
groupBy(key): the per-key event list is sorted and folded once with an
N-slot struct accumulator — the textbook N-way progressive self-join
costs N shuffles of the fact table instead.

Per-key list size is bounded by per-key activity; for power-key skew
the two-phase collect in operators/skew.py is the documented escape
hatch.  Batch twin of streaming/funnel.py (same strict-'>' rules).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_fold(
    events: DataFrame,
    stages: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(key, t1..tN timestamps, stage_reached) — one row per key that
    reached at least stage 1.

    The stage filter pushes into the scan; the fold carries an N-slot
    struct, checking each event against the first unfilled slot with a
    strict ts comparison (so tie semantics are explicit, not an
    artifact of sort order).
    """
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    if len(set(stages)) != len(stages):
        raise ValueError("funnel stages must be distinct event types")
    n = len(stages)
    ev = events.filter(F.col(type_col).isin(*stages))
    seq = F.sort_array(
        F.collect_list(F.struct(F.col(ts_col), F.col(type_col), F.col(tiebreak_col)))
    )
    acc0 = F.struct(
        *[F.lit(None).cast("timestamp").alias(f"t{k + 1}") for k in range(n)]
    )

    def _step(acc: Column, x: Column) -> Column:
        et = x[type_col]
        outs = []
        for k in range(n):
            slot = acc[f"t{k + 1}"]
            take = slot.isNull() & (et == stages[k])
            if k > 0:  # stage 1 needs no predecessor
                take = (
                    take
                    & acc[f"t{k}"].isNotNull()
                    & (x[ts_col] > acc[f"t{k}"])
                )
            # only the FIRST unfilled slot may accept: later slots
            # require their predecessor already set, which guarantees it.
            outs.append(F.when(take, x[ts_col]).otherwise(slot).alias(f"t{k + 1}"))
        return F.struct(*outs)

    folded = (
        ev.groupBy(key_col)
        .agg(F.aggregate(seq, acc0, _step).alias("_f"))
        .filter(F.col("_f.t1").isNotNull())
    )
    stage_reached = F.lit(0)
    for k in range(n):
        stage_reached = stage_reached + F.col(f"_f.t{k + 1}").isNotNull().cast("int")
    return folded.select(
        key_col,
        *[F.col(f"_f.t{k + 1}").alias(f"t{k + 1}") for k in range(n)],
        stage_reached.alias("stage_reached"),
    )
