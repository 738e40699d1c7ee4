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
    time. Emits (COD_EQUIPMENT, ID, event_ts, released).

    NOTE: patience here is a per-EQUIPMENT approximation — the timeout
    re-arms whenever the key still holds pending events, so under steady
    per-key traffic an old event can wait past the nominal bound, and a
    firing flushes every pending event for the key. The production gate
    (make_gate_handler) tracks exact per-event deadlines; this simpler
    operator keeps the reference's (id, ts)-only shape for tests."""
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


# --- Full-payload release gate (the strict-mode default path) ----------------
#
# The operator above releases (id, ts) pairs keyed by equipment; the full
# pipeline needs the event PAYLOAD to flow through the gate so released
# events can be enriched downstream without a driver-side buffer. Design:
#
# - The fact stream and every dimension CDC stream are unioned into ONE
#   streaming DataFrame. Fact rows carry kind='event' + a JSON payload;
#   dimension progress rides as kind='marker' rows carrying
#   (table_name, hw) — the A2 high-water mark transported IN-BAND, which
#   sidesteps the stream-static rebinding problem (a static side resolved
#   at query start never sees later view updates).
# - State is keyed by a HASH BUCKET of the equipment code, not the raw
#   key: markers must reach every group, and fanning each marker to
#   n_buckets rows (a projection-time explode, no shuffle amplification
#   beyond the bounded factor) is tractable where fanning to every
#   distinct equipment would not be. Bucket count bounds marker
#   amplification AND sets release parallelism.
# - GroupState per bucket holds {table -> hw} plus the pending events
#   (id, ts, payload) as JSON — on executors, checkpointed, zero driver
#   residency. An event releases when min(hw over required tables) passes
#   its timestamp (reference gate: InMemoryTableUpdaterManager.scala:67-78).
# - ProcessingTimeTimeout bounds patience: pending events flushed with
#   released=false for dead-letter routing (the reference's was unbounded).

GATE_INPUT_SCHEMA = StructType(
    [
        StructField("bucket", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("table_name", StringType(), True),
        StructField("hw", LongType(), True),
        StructField("COD_EQUIPMENT", StringType(), True),
        StructField("ID", LongType(), True),
        StructField("event_ts", LongType(), True),
        StructField("payload", StringType(), True),
    ]
)

GATE_OUTPUT_SCHEMA = StructType(
    [
        StructField("COD_EQUIPMENT", StringType(), True),
        StructField("ID", LongType(), False),
        StructField("event_ts", LongType(), False),
        StructField("payload", StringType(), True),
        StructField("released", BooleanType(), False),
    ]
)

GATE_STATE_SCHEMA = StructType(
    [
        StructField("marks", StringType(), True),  # json {table: hw_ms}
        # json [[equip, id, ts, payload, deadline_ms], ...] — deadline is
        # the per-EVENT dead-letter instant (arrival + timeout), so
        # patience is bounded per event, not per bucket.
        StructField("pending", StringType(), True),
    ]
)


def _epoch_ms(df: DataFrame, col: str):
    """Column as epoch millis: long columns are taken as already-ms (the
    wire format); timestamps go through unix_millis (timezone-fixed). A
    long→timestamp cast would silently misread millis as seconds."""
    from pyspark.sql import functions as F

    if dict(df.dtypes).get(col) == "bigint":
        return F.col(col).cast("long")
    return F.unix_millis(F.col(col).cast("timestamp"))


def events_for_gate(events: DataFrame, n_buckets: int, ts_col: str = "timestamp") -> DataFrame:
    """Project raw fact rows into the gate's union shape. The payload is
    the full row as JSON so the gate is schema-agnostic and the row can
    be reconstructed losslessly downstream."""
    from pyspark.sql import functions as F

    payload = F.to_json(F.struct(*[F.col(c) for c in events.columns]))
    return events.select(
        F.pmod(F.xxhash64(F.col("COD_EQUIPMENT").cast("string")), F.lit(n_buckets))
        .cast("long")
        .alias("bucket"),
        F.lit("event").alias("kind"),
        F.lit(None).cast("string").alias("table_name"),
        F.lit(None).cast("long").alias("hw"),
        F.col("COD_EQUIPMENT").cast("string").alias("COD_EQUIPMENT"),
        F.col("ID").cast("long").alias("ID"),
        _epoch_ms(events, ts_col).alias("event_ts"),
        payload.alias("payload"),
    )


def markers_for_gate(cdc: DataFrame, table_name: str, tx_col: str, n_buckets: int) -> DataFrame:
    """Project dimension CDC rows into high-water marker rows, fanned to
    every bucket (bounded ×n_buckets amplification of the LOW-rate dim
    stream, not the fact stream)."""
    from pyspark.sql import functions as F

    return cdc.select(
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(n_buckets - 1).cast("long"))
        ).alias("bucket"),
        F.lit("marker").alias("kind"),
        F.lit(table_name).alias("table_name"),
        _epoch_ms(cdc, tx_col).alias("hw"),
        F.lit(None).cast("string").alias("COD_EQUIPMENT"),
        F.lit(None).cast("long").alias("ID"),
        F.lit(None).cast("long").alias("event_ts"),
        F.lit(None).cast("string").alias("payload"),
    )


# Shape of the re-gate feedback files (streaming/pipeline.py writes them
# for post-gate misses; the gate consumes them as one more event source).
FEEDBACK_SCHEMA = StructType(
    [
        StructField("COD_EQUIPMENT", StringType(), True),
        StructField("ID", LongType(), False),
        StructField("event_ts", LongType(), False),
        StructField("payload", StringType(), True),
    ]
)


def regated_for_gate(feedback: DataFrame, n_buckets: int) -> DataFrame:
    """Project re-gated miss rows (FEEDBACK_SCHEMA) back into the gate's
    union shape. Their payload already carries the `_regate` counter, so
    a second miss routes to missing_sink instead of looping."""
    from pyspark.sql import functions as F

    return feedback.select(
        F.pmod(F.xxhash64(F.col("COD_EQUIPMENT").cast("string")), F.lit(n_buckets))
        .cast("long")
        .alias("bucket"),
        F.lit("event").alias("kind"),
        F.lit(None).cast("string").alias("table_name"),
        F.lit(None).cast("long").alias("hw"),
        F.col("COD_EQUIPMENT"),
        F.col("ID"),
        F.col("event_ts"),
        F.col("payload"),
    )


def make_gate_handler(required_tables: list[str], timeout_ms: int = 10 * 60 * 1000):
    """Build the per-bucket handler. `required_tables`: the dimension
    tables whose A2 marks must ALL pass an event's timestamp before it
    releases (min-gate). Closure args, not state — the required set is
    plan-time configuration.

    Patience is a PER-EVENT bound: each pending event carries its own
    dead-letter deadline (processing-time arrival + timeout_ms). The
    GroupState processing-time timeout is re-armed to the EARLIEST
    pending deadline each invocation, and when it fires only events past
    their own deadline are flushed released=false — a fresh arrival in
    the same bucket keeps its full patience window."""
    import json as _json
    import time as _time

    required = list(required_tables)

    def gate(key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        now_ms = int(_time.time() * 1000)
        marks: dict[str, int] = {}
        pending: list[list] = []
        if state.exists:
            marks_json, pending_json = state.get
            marks = _json.loads(marks_json) if marks_json else {}
            pending = _json.loads(pending_json) if pending_json else []
            for r in pending:  # pre-deadline checkpoint state: pad in place
                if len(r) == 4:
                    r.append(now_ms + timeout_ms)

        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            is_marker = pdf["kind"] == "marker"
            for t, h in zip(pdf.loc[is_marker, "table_name"], pdf.loc[is_marker, "hw"]):
                marks[t] = max(marks.get(t, 0), int(h))
            ev = pdf.loc[~is_marker]
            pending.extend(
                [e, int(i), int(ts), p, now_ms + timeout_ms]
                for e, i, ts, p in zip(
                    ev["COD_EQUIPMENT"], ev["ID"], ev["event_ts"], ev["payload"]
                )
            )

        # Release first (a releasable-and-overdue event still releases),
        # then dead-letter only the rows past their OWN deadline.
        hw = min((marks.get(t, 0) for t in required), default=float("inf"))
        released = [r for r in pending if r[2] < hw]
        held = [r for r in pending if r[2] >= hw]
        expired = [r for r in held if r[4] <= now_ms]
        still = [r for r in held if r[4] > now_ms]

        state.update((_json.dumps(marks), _json.dumps(still)))
        if still:
            next_fire = min(r[4] for r in still) - now_ms
            state.setTimeoutDuration(max(int(next_fire), 1000))

        if expired:
            yield pd.DataFrame(
                {
                    "COD_EQUIPMENT": [r[0] for r in expired],
                    "ID": [r[1] for r in expired],
                    "event_ts": [r[2] for r in expired],
                    "payload": [r[3] for r in expired],
                    "released": [False] * len(expired),
                }
            )
        if released:
            yield pd.DataFrame(
                {
                    "COD_EQUIPMENT": [r[0] for r in released],
                    "ID": [r[1] for r in released],
                    "event_ts": [r[2] for r in released],
                    "payload": [r[3] for r in released],
                    "released": [True] * len(released),
                }
            )

    return gate


def strict_gate(
    unioned: DataFrame,
    required_tables: list[str],
    timeout_ms: int = 10 * 60 * 1000,
) -> DataFrame:
    """events_for_gate(facts) ∪ markers_for_gate(each dim CDC) -> the
    released/expired stream. State lives in per-bucket GroupState on
    executors; the driver never holds an event row."""
    return unioned.groupBy("bucket").applyInPandasWithState(
        make_gate_handler(required_tables, timeout_ms),
        outputStructType=GATE_OUTPUT_SCHEMA,
        stateStructType=GATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
