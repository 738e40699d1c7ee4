"""T2 strict mode as a genuine Spark stateful operator:
applyInPandasWithState holding pending events per equipment until the
dimension high-water mark passes them.

Reference semantics (imtu/InMemoryTableUpdaterManager.scala:19,67-78 +
stp/BeamStreamProcessor.scala:56-64, re-injection fixed per SURVEY §2.10
item 2): an event whose required dimension tables haven't caught up
(per-table high-water timestamp A2 <= event timestamp) waits in a
missing-data list; once every required table's high-water mark passes
the event's timestamp, the event is released ahead of the live stream.

Spark realization: the fact stream is grouped by COD_EQUIPMENT;
`applyInPandasWithState` keeps the pending events for that equipment in
GroupState. Each micro-batch the handler receives (new events + current
high-water marks) and emits exactly the events that are now releasable,
holding the rest. The high-water marks ride ON the stream (joined in as
columns before grouping) so the handler state is pure per-key data —
no driver-side state, horizontally scalable, checkpointable.

A state timeout bounds patience (the reference's was unbounded):
events pending longer than `timeout_minutes` of processing time are
emitted with released=false so the caller can route them to a dead
letter sink instead of silently dropping.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RELEASE_SCHEMA = StructType(
    [
        StructField("COD_EQUIPMENT", StringType(), False),
        StructField("ID", LongType(), False),
        StructField("event_ts", LongType(), False),
        StructField("released", BooleanType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("ids", StringType(), True),  # csv of pending "id:ts" pairs
    ]
)


def _pending_from_state(state: GroupState) -> list[tuple[int, int]]:
    if not state.exists:
        return []
    (csv,) = state.get
    if not csv:
        return []
    out = []
    for part in csv.split(","):
        i, t = part.split(":")
        out.append((int(i), int(t)))
    return out


def hold_and_release(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """The per-key handler (signature: key tuple, batch iterator, group
    state). Input rows: (COD_EQUIPMENT, ID, event_ts, high_water) where
    high_water is the minimum of the required tables' A2 marks at batch
    time. Emits (COD_EQUIPMENT, ID, event_ts, released)."""
    pending = _pending_from_state(state)
    (key,) = key
    high_water = 0
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        high_water = max(high_water, int(pdf["high_water"].max()))
        # ID < 0 rows are high-water-only markers (dimension progress with
        # no new events) — they advance the mark but are never pending.
        pending.extend(
            (int(i), int(t)) for i, t in zip(pdf["ID"], pdf["event_ts"]) if i >= 0
        )

    released = [(i, t) for i, t in pending if t < high_water]
    still = [(i, t) for i, t in pending if t >= high_water]

    if state.hasTimedOut:
        # Patience exhausted: flush everything, flagged unreleased.
        expired = still
        still = []
        if key is None and expired:
            key = ""
        if expired:
            yield pd.DataFrame(
                {
                    "COD_EQUIPMENT": [key] * len(expired),
                    "ID": [i for i, _ in expired],
                    "event_ts": [t for _, t in expired],
                    "released": [False] * len(expired),
                }
            )
        state.remove()
    else:
        if still:
            state.update((",".join(f"{i}:{t}" for i, t in still),))
            state.setTimeoutDuration(10 * 60 * 1000)  # reference watermark T1
        elif state.exists:
            state.remove()

    if released and key is not None:
        yield pd.DataFrame(
            {
                "COD_EQUIPMENT": [key] * len(released),
                "ID": [i for i, _ in released],
                "event_ts": [t for _, t in released],
                "released": [True] * len(released),
            }
        )


def release_when_dims_arrive(events_with_hw: DataFrame) -> DataFrame:
    """Build the stateful release stream. `events_with_hw` must be a
    STREAMING DataFrame with columns (COD_EQUIPMENT, ID, event_ts,
    high_water)."""
    return events_with_hw.groupBy("COD_EQUIPMENT").applyInPandasWithState(
        hold_and_release,
        outputStructType=RELEASE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
