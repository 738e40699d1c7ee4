"""Streaming funnel (streaming/funnel.py): GroupState stage tracking
must match the batch fold's strict-'>' semantics across micro-batch
boundaries, and emit exactly one row per stage ADVANCE.

Pinned contracts:
- an out-of-order event (ts before the recorded previous stage) never
  advances the funnel — within a batch AND across batches;
- a multi-stage advance within one batch emits ONE row at the highest
  stage (the event log is per-advance, not per-event);
- the latest row per user equals the batch funnel fold over the full
  event prefix.
"""

from __future__ import annotations

import pytest

from dod_etl_spark.streaming.funnel import funnel_stream


def test_streaming_funnel_stage_advances(spark, tmp_path):
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def ts(ms: int):
        from datetime import datetime, timezone

        return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(
            tzinfo=None
        )

    # Batch 1: u1 has a click BEFORE its signup (must not count),
    # then signup; u2 signs up late.
    b1 = spark.createDataFrame(
        [
            (1, ts(500), 1, "click"),
            (2, ts(1000), 1, "signup"),
            (3, ts(2000), 2, "signup"),
        ],
        schema,
    )
    # Batch 2: u1 click@1500 then purchase@1400 (stale, before click ->
    # no) and purchase@1600 (counts): a 1->3 double advance in one
    # batch. u2's click@1900 precedes its signup@2000 -> no advance.
    b2 = spark.createDataFrame(
        [
            (4, ts(1500), 1, "click"),
            (5, ts(1400), 1, "purchase"),
            (6, ts(1600), 1, "purchase"),
            (7, ts(1900), 2, "click"),
        ],
        schema,
    )
    b1.coalesce(1).write.parquet(str(src / "f1"))
    b2.coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        funnel_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    rows = {
        (r["user_id"], r["stage_reached"]): r
        for r in spark.read.parquet(out).collect()
    }
    # u1: stage-1 advance in batch 1, stage-3 advance in batch 2
    # (single row at the highest stage). u2: stage-1 only.
    assert set(rows) == {(1, 1), (1, 3), (2, 1)}
    assert rows[(1, 1)]["signup_ms"] == 1000
    assert rows[(1, 1)]["click_ms"] is None
    final = rows[(1, 3)]
    assert (final["signup_ms"], final["click_ms"], final["purchase_ms"]) == (
        1000,
        1500,
        1600,
    )
    assert rows[(2, 1)]["signup_ms"] == 2000
    assert rows[(2, 1)]["click_ms"] is None


def test_streaming_funnel_checkpoint_recovery(spark, tmp_path):
    """Funnel GroupState must survive a query restart: a stage-1 user
    whose click+purchase arrive AFTER the restart still completes the
    funnel with the pre-restart signup timestamp (state restored from
    the checkpoint, input not re-processed)."""
    from datetime import datetime, timezone

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def ts(ms: int):
        return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(
            tzinfo=None
        )

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            funnel_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    spark.createDataFrame([(1, ts(1000), 9, "signup")], schema).coalesce(
        1
    ).write.parquet(str(src / "f1"))
    run_once()

    spark.createDataFrame(
        [(2, ts(2000), 9, "click"), (3, ts(3000), 9, "purchase")], schema
    ).coalesce(1).write.parquet(str(src / "f2"))
    run_once()

    rows = {
        (r["user_id"], r["stage_reached"]): r
        for r in spark.read.parquet(out).collect()
    }
    assert set(rows) == {(9, 1), (9, 3)}
    final = rows[(9, 3)]
    # signup_ms comes from the PRE-restart batch via restored state.
    assert (final["signup_ms"], final["click_ms"], final["purchase_ms"]) == (
        1000,
        2000,
        3000,
    )


def test_streaming_funnel_v2_transform_with_state(spark, tmp_path):
    """The transformWithStateInPandas variant must produce the same
    stage-advance log as the applyInPandasWithState one on the same
    two-batch input (cross-batch state, out-of-order rejection)."""
    from datetime import datetime, timezone

    from dod_etl_spark.streaming.funnel import funnel_stream_v2

    if funnel_stream_v2 is None:
        pytest.skip("transformWithStateInPandas requires Spark >= 4")
    try:
        # the TWS state server speaks protobuf to the Python worker;
        # a broken/absent protobuf crashes the driver worker pre-init
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable: transformWithState "
                    "state server cannot start in this environment")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def ts(ms: int):
        return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(
            tzinfo=None
        )

    spark.createDataFrame(
        [(1, ts(500), 1, "click"), (2, ts(1000), 1, "signup")], schema
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [(3, ts(1500), 1, "click"), (4, ts(1400), 1, "purchase"),
         (5, ts(1600), 1, "purchase")],
        schema,
    ).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        funnel_stream_v2(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    rows = {
        (r["user_id"], r["stage_reached"]): r
        for r in spark.read.parquet(out).collect()
    }
    assert set(rows) == {(1, 1), (1, 3)}
    final = rows[(1, 3)]
    assert (final["signup_ms"], final["click_ms"], final["purchase_ms"]) == (
        1000,
        1500,
        1600,
    )
