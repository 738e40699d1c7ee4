"""Incremental aggregate materialized view (streaming/matview.py):
multi-batch equivalence with the batch aggregate, replay idempotency,
restart resumption, and HLL-distinct mergeability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.streaming.matview import AggMatView, Metric


def _mk(spark, tmp_path, name="mv_test"):
    return AggMatView(
        spark,
        name=name,
        key_cols=["event_type"],
        metrics=[
            Metric("n", "count"),
            Metric("total", "sum", "value"),
            Metric("lo", "min", "value"),
            Metric("hi", "max", "value"),
            Metric("n_users", "approx_distinct", "user_id"),
        ],
        snapshot_dir=str(tmp_path / name),
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "event_type STRING, value DOUBLE, user_id LONG"
    )


def test_incremental_equals_batch_aggregate(spark, tmp_path):
    mv = _mk(spark, tmp_path)
    b1 = _batch(spark, [("a", 1.0, 1), ("a", 2.0, 2), ("b", 5.0, 1)])
    b2 = _batch(spark, [("a", 3.0, 1), ("b", -1.0, 3), ("c", 9.0, 9)])
    b3 = _batch(spark, [("c", 1.0, 9)])
    mv.apply_batch(b1, 0)
    mv.apply_batch(b2, 1)
    mv.apply_batch(b3, 2)

    got = {
        r["event_type"]: (r["n"], r["total"], r["lo"], r["hi"], r["n_users"])
        for r in mv.view().collect()
    }
    full = b1.unionByName(b2).unionByName(b3)
    want = {
        r["event_type"]: (
            r["n"],
            float(r["total"]),
            r["lo"],
            r["hi"],
            r["n_users"],
        )
        for r in full.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        n, tot, lo, hi, nd = got[k]
        wn, wtot, wlo, whi, wnd = want[k]
        assert (n, lo, hi) == (wn, wlo, whi), k
        assert tot == pytest.approx(wtot)
        assert nd == wnd  # tiny cardinalities: HLL is exact here


def test_replay_is_idempotent(spark, tmp_path):
    mv = _mk(spark, tmp_path, "mv_replay")
    b1 = _batch(spark, [("a", 1.0, 1)])
    mv.apply_batch(b1, 0)
    before = sorted(map(tuple, mv.view().collect()))
    mv.apply_batch(b1, 0)  # foreachBatch redelivery after restart
    after = sorted(map(tuple, mv.view().collect()))
    assert before == after
    assert mv.view().first()["n"] == 1


def test_restart_resumes_from_snapshot(spark, tmp_path):
    mv = _mk(spark, tmp_path, "mv_restart")
    mv.apply_batch(_batch(spark, [("a", 1.0, 1)]), 0)
    mv.apply_batch(_batch(spark, [("a", 2.0, 2)]), 1)

    # New instance over the same directory = process restart.
    mv2 = _mk(spark, tmp_path, "mv_restart")
    assert mv2._last_batch == 1
    # The redelivered last batch is skipped...
    mv2.apply_batch(_batch(spark, [("a", 2.0, 2)]), 1)
    assert mv2.view().first()["n"] == 2
    # ...and new batches keep folding.
    mv2.apply_batch(_batch(spark, [("a", 7.0, 3)]), 2)
    row = mv2.view().first()
    assert row["n"] == 3 and row["total"] == pytest.approx(10.0)


def test_streaming_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _batch(spark, [("a", 1.0, 1), ("b", 2.0, 2)]).coalesce(1).write.parquet(
        str(src / "f1")
    )
    _batch(spark, [("a", 3.0, 3)]).coalesce(1).write.parquet(str(src / "f2"))
    mv = _mk(spark, tmp_path, "mv_stream")
    stream = (
        spark.readStream.schema("event_type STRING, value DOUBLE, user_id LONG")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(mv.foreach_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {r["event_type"]: r["n"] for r in mv.view().collect()}
    assert got == {"a": 2, "b": 1}


def test_bad_specs_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="kind"):
        Metric("x", "avg", "value")
    with pytest.raises(ValueError, match="column"):
        Metric("x", "sum")
    with pytest.raises(ValueError, match="unique"):
        AggMatView(spark, "mv_bad", ["k"], [Metric("n", "count"), Metric("n", "count")])


def test_streaming_count_min_sketch_via_matview(spark, tmp_path):
    """Composition: a continuously-maintained Count-Min sketch IS an
    AggMatView keyed on (depth, bucket) fed with the per-batch CM
    pairs — the sketch counters merge by addition, so heavy-hitter
    estimates stay exact-to-the-sketch across any number of
    micro-batches."""
    from pyspark.sql import functions as F

    from dod_etl_spark.functions.sketches import cm_bucket, cm_estimate
    from dod_etl_spark.streaming.matview import AggMatView, Metric

    depth, width = 4, 64

    def pairs(batch):
        return batch.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("depth"),
                            cm_bucket("v", j, width).alias("bucket"),
                        )
                        for j in range(depth)
                    ]
                )
            ).alias("p")
        ).select("p.depth", "p.bucket")

    mv = AggMatView(
        spark,
        name="mv_cm",
        key_cols=["depth", "bucket"],
        metrics=[Metric("cnt", "count")],
        snapshot_dir=str(tmp_path / "cm"),
    )
    b1 = spark.createDataFrame([("hot",)] * 30 + [("a",), ("b",)], "v STRING")
    b2 = spark.createDataFrame([("hot",)] * 20 + [("c",)], "v STRING")
    mv.apply_batch(pairs(b1), 0)
    mv.apply_batch(pairs(b2), 1)

    items = spark.createDataFrame([("hot",), ("a",), ("zz",)], "v STRING")
    est = {
        r["v"]: r["est"]
        for r in cm_estimate(mv.view(), items, "v", depth=depth, width=width).collect()
    }
    assert est["hot"] >= 50  # never undercounts, across batches
    assert est["a"] >= 1
    assert est["zz"] <= 5  # absent key: only collision noise


def test_time_travel_reads_previous_version(spark, tmp_path):
    mv = _mk(spark, tmp_path, "mv_tt")
    mv.apply_batch(_batch(spark, [("a", 1.0, 1)]), 0)
    mv.apply_batch(_batch(spark, [("a", 2.0, 2)]), 1)
    assert mv.versions() == [1, 2]
    prev = {r["event_type"]: r["n"] for r in mv.view_at(1).collect()}
    cur = {r["event_type"]: r["n"] for r in mv.view_at(2).collect()}
    assert prev == {"a": 1} and cur == {"a": 2}
    mv.apply_batch(_batch(spark, [("a", 3.0, 3)]), 2)  # GC drops v1
    assert mv.versions() == [2, 3]
    with pytest.raises(ValueError, match="not retained"):
        mv.view_at(1)
