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


# --- Property test vs pandas merge_asof ----------------------------------------

from hypothesis import given, settings, strategies as st


_key = st.integers(min_value=0, max_value=4)
_ts = st.integers(min_value=0, max_value=10_000)

_left_rows = st.lists(st.tuples(_key, _ts), min_size=1, max_size=30)
# unique (key, ts) on the right: the operator's documented tie contract
_right_rows = st.lists(
    st.tuples(_key, _ts), min_size=1, max_size=30, unique_by=lambda r: (r[0], r[1])
)


@settings(max_examples=25, deadline=None)
@given(left=_left_rows, right=_right_rows, direction=st.sampled_from(["backward", "forward"]))
def test_asof_matches_pandas_merge_asof(spark, left, right, direction):
    """as_of_join == pandas.merge_asof on arbitrary (key, ts) data for
    both directions (exact matches allowed, no tolerance)."""
    import pandas as pd

    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        "event_id long, key long, ts_ms long",
    ).withColumn("ts", F.expr("timestamp_millis(ts_ms)"))
    rdf = spark.createDataFrame(
        [(k, ts, k * 100_000 + ts) for (k, ts) in right],
        "key long, ts_ms long, payload long",
    ).withColumn("ts", F.expr("timestamp_millis(ts_ms)"))

    got = (
        as_of_join(
            ldf.select("event_id", "key", "ts"),
            rdf.select("key", "ts", "payload"),
            left_on="key",
            right_on="key",
            left_ts="ts",
            right_ts="ts",
            payload_cols=["payload"],
            direction=direction,
        )
        .select("event_id", "payload")
        .toPandas()
        .sort_values("event_id", ignore_index=True)
    )

    lp = pd.DataFrame(
        {"event_id": range(len(left)), "key": [k for k, _ in left],
         "ts": [ts for _, ts in left]}
    ).sort_values(["ts", "event_id"], kind="mergesort", ignore_index=True)
    rp = pd.DataFrame(
        {"key": [k for k, _ in right], "ts": [ts for _, ts in right],
         "payload": [k * 100_000 + ts for k, ts in right]}
    ).sort_values(["ts", "key"], kind="mergesort", ignore_index=True)
    want = (
        pd.merge_asof(lp, rp, on="ts", by="key", direction=direction)
        .sort_values("event_id", ignore_index=True)[["event_id", "payload"]]
    )

    assert len(got) == len(want)
    for g, w in zip(got["payload"], want["payload"]):
        g_null, w_null = pd.isna(g), pd.isna(w)
        assert g_null == w_null and (g_null or int(g) == int(w)), (got, want)
