"""As-of join operator: backward/forward direction and tolerance
semantics on a handcrafted frame (the backward path is additionally
oracle-checked end-to-end via asof_latest_order)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dod_etl_spark.operators.asof import as_of_join


def _frames(spark):
    events = spark.createDataFrame(
        [(1, "k1", "2024-01-01 10:00:00"), (2, "k1", "2024-01-01 12:00:00"),
         (3, "k2", "2024-01-01 09:00:00"), (4, "k3", "2024-01-01 09:00:00")],
        "event_id long, key string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    dims = spark.createDataFrame(
        [("k1", "2024-01-01 09:30:00", 100), ("k1", "2024-01-01 11:00:00", 200),
         ("k1", "2024-01-01 13:00:00", 300), ("k2", "2024-01-01 09:00:00", 400)],
        "key string, ts string, payload long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return events, dims


def test_asof_backward(spark):
    events, dims = _frames(spark)
    out = {
        r["event_id"]: r["payload"]
        for r in as_of_join(events, dims, "key", "key", "ts", "ts", ["payload"]).collect()
    }
    # event1 @10:00 -> dim @9:30; event2 @12:00 -> dim @11:00;
    # event3 @9:00 -> dim @9:00 EXACT tie matches (<=); k3 has no dim.
    assert out == {1: 100, 2: 200, 3: 400, 4: None}


def test_asof_forward(spark):
    events, dims = _frames(spark)
    out = {
        r["event_id"]: r["payload"]
        for r in as_of_join(
            events, dims, "key", "key", "ts", "ts", ["payload"], direction="forward"
        ).collect()
    }
    # forward: next dim at-or-after; event2 @12:00 -> dim @13:00.
    assert out == {1: 200, 2: 300, 3: 400, 4: None}


def test_asof_tolerance(spark):
    events, dims = _frames(spark)
    out = {
        r["event_id"]: r["payload"]
        for r in as_of_join(
            events, dims, "key", "key", "ts", "ts", ["payload"],
            tolerance_ms=45 * 60 * 1000,
        ).collect()
    }
    # 45-min tolerance: event1 gap 30min keeps; event2 gap 60min nulls.
    assert out == {1: 100, 2: None, 3: 400, 4: None}
