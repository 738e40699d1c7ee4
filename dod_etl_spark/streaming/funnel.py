"""Streaming twin of the batch ordered funnel
(queries/behavior.funnel_signup_purchase): per-user stage tracking as a
genuine Spark stateful operator.

GroupState per user holds the (t1, t2, t3) stage timestamps; each
micro-batch folds its new events into the state with the SAME strict
'>' ordering rules as the batch fold, and emits one row whenever the
user advances a stage. Append-mode output — downstream sees a stage-
advance event log (the thing a real-time activation pipeline consumes),
while the latest row per user equals the batch funnel on the same
prefix of the stream.

Scale shape: state is three longs per user (no event buffering —
events fold into the state and are dropped), partitioned by user_id
across executors, checkpointable; no driver-side state anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FUNNEL_STAGES = ("signup", "click", "purchase")

FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("stage_reached", IntegerType(), False),
        StructField("signup_ms", LongType(), True),
        StructField("click_ms", LongType(), True),
        StructField("purchase_ms", LongType(), True),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("t1", LongType(), True),
        StructField("t2", LongType(), True),
        StructField("t3", LongType(), True),
    ]
)


def make_funnel_handler(stages: tuple[str, str, str] = FUNNEL_STAGES):
    """Handler for applyInPandasWithState: fold new events into the
    3-slot stage state (strict '>' ordering, same as the batch fold)
    and emit one row per stage advance."""

    def handler(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        t = list(state.get) if state.exists else [None, None, None]
        prev_stage = sum(x is not None for x in t)
        events: list[tuple[int, int, str]] = []
        for pdf in pdf_iter:
            for ts_ms, event_id, et in zip(
                pdf["ts_ms"], pdf["event_id"], pdf["event_type"]
            ):
                events.append((int(ts_ms), int(event_id), str(et)))
        for ts_ms, _eid, et in sorted(events):
            if t[0] is None:
                if et == stages[0]:
                    t[0] = ts_ms
            elif t[1] is None:
                if et == stages[1] and ts_ms > t[0]:
                    t[1] = ts_ms
            elif t[2] is None:
                if et == stages[2] and ts_ms > t[1]:
                    t[2] = ts_ms
        state.update(tuple(t))
        new_stage = sum(x is not None for x in t)
        if new_stage > prev_stage and new_stage > 0:
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "stage_reached": [new_stage],
                    "signup_ms": [t[0]],
                    "click_ms": [t[1]],
                    "purchase_ms": [t[2]],
                }
            )

    return handler


def funnel_stream(
    events: DataFrame,
    stages: tuple[str, str, str] = FUNNEL_STAGES,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Stage-advance event log from a streaming events frame.

    The stage filter pushes into the source scan; only
    (user, ts_ms, id, type) reaches the stateful operator.
    """
    prepared = (
        events.where(F.col(type_col).isin(*stages))
        .select(
            F.col(user_col).cast("long").alias("user_id"),
            F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
            F.col(id_col).cast("long").alias("event_id"),
            F.col(type_col).alias("event_type"),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        make_funnel_handler(stages),
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithState variant (Spark 4 arbitrary-state v2) ---------------------
#
# Same funnel semantics on the NEW StatefulProcessor API: named,
# schema'd state slots managed by the state-store (ValueState), TTL and
# timers available, initial-state bootstrap supported — the surface
# Spark is converging on for custom stateful operators. Kept alongside
# the applyInPandasWithState variant so both generations of the
# stateful API are exercised by tests.
#
# Environment gates (the test self-skips when unmet, like the live-Kafka
# tests): requires the RocksDB state store provider AND a working
# google.protobuf (the TWS state server speaks protobuf to the Python
# worker; this container ships a broken protobuf, so the v1
# applyInPandasWithState variant remains the tested default here).

try:  # Spark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class FunnelProcessor(StatefulProcessor):
        """ValueState = the 3 stage timestamps; emits one row per stage
        advance (same contract as make_funnel_handler)."""

        def __init__(self, stages: tuple[str, str, str] = FUNNEL_STAGES):
            self._stages = stages

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "funnel", "t1 long, t2 long, t3 long"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            got = self._state.get()
            t = list(got) if got is not None else [None, None, None]
            prev_stage = sum(x is not None for x in t)
            events: list[tuple[int, int, str]] = []
            for pdf in rows:
                for ts_ms, event_id, et in zip(
                    pdf["ts_ms"], pdf["event_id"], pdf["event_type"]
                ):
                    events.append((int(ts_ms), int(event_id), str(et)))
            for ts_ms, _eid, et in sorted(events):
                if t[0] is None:
                    if et == self._stages[0]:
                        t[0] = ts_ms
                elif t[1] is None:
                    if et == self._stages[1] and ts_ms > t[0]:
                        t[1] = ts_ms
                elif t[2] is None:
                    if et == self._stages[2] and ts_ms > t[1]:
                        t[2] = ts_ms
            self._state.update(tuple(t))
            new_stage = sum(x is not None for x in t)
            if new_stage > prev_stage and new_stage > 0:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "stage_reached": [new_stage],
                        "signup_ms": [t[0]],
                        "click_ms": [t[1]],
                        "purchase_ms": [t[2]],
                    }
                )

        def close(self) -> None:
            pass

    def funnel_stream_v2(
        events: DataFrame,
        stages: tuple[str, str, str] = FUNNEL_STAGES,
        ts_col: str = "ts",
        user_col: str = "user_id",
        id_col: str = "event_id",
        type_col: str = "event_type",
    ) -> DataFrame:
        """funnel_stream on transformWithStateInPandas."""
        prepared = (
            events.where(F.col(type_col).isin(*stages))
            .select(
                F.col(user_col).cast("long").alias("user_id"),
                F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
                F.col(id_col).cast("long").alias("event_id"),
                F.col(type_col).alias("event_type"),
            )
        )
        return prepared.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=FunnelProcessor(stages),
            outputStructType=FUNNEL_SCHEMA,
            outputMode="append",
            timeMode="none",
        )

except ImportError:  # pragma: no cover - Spark 3.x fallback
    FunnelProcessor = None  # type: ignore[assignment]
    funnel_stream_v2 = None  # type: ignore[assignment]
