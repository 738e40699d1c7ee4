"""Streaming drift monitor — composition of the histogram AggMatView
(reference distribution accumulated across batches) with the TVD
calculation: each incoming micro-batch is compared against everything
seen so far, and a distribution shift raises the alarm while
same-distribution batches stay quiet."""

from __future__ import annotations

from pyspark.sql import functions as F

from dod_etl_spark.streaming.matview import AggMatView, Metric


def _hist(batch, width=10):
    return batch.select(F.expr(f"CAST(v AS BIGINT) div {width}").alias("bucket"))


def _tvd(ref_counts: dict, batch_counts: dict) -> float:
    nr, nb = sum(ref_counts.values()), sum(batch_counts.values())
    buckets = set(ref_counts) | set(batch_counts)
    return 0.5 * sum(
        abs(ref_counts.get(b, 0) / nr - batch_counts.get(b, 0) / nb)
        for b in buckets
    )


def test_streaming_drift_monitor(spark, tmp_path):
    import random

    rng = random.Random(5)
    mv = AggMatView(
        spark,
        name="mv_hist",
        key_cols=["bucket"],
        metrics=[Metric("cnt", "count")],
        snapshot_dir=str(tmp_path / "hist"),
    )

    def batch_of(dist, n=400):
        return spark.createDataFrame([(float(dist()),) for _ in range(n)], "v DOUBLE")

    uniform = lambda: rng.uniform(0, 100)
    shifted = lambda: rng.uniform(60, 160)  # drifted regime

    alarms = []
    for i in range(4):
        src = uniform if i < 3 else shifted
        batch = batch_of(src)
        bc = {
            r["bucket"]: r["n"]
            for r in _hist(batch).groupBy("bucket").agg(F.count("*").alias("n")).collect()
        }
        if i > 0:  # compare against the accumulated reference first
            rc = {r["bucket"]: r["cnt"] for r in mv.view().collect()}
            alarms.append(_tvd(rc, bc) > 0.25)
        mv.apply_batch(_hist(batch), i)

    # Batches 1-2 are same-distribution (no alarm); batch 3 drifted.
    assert alarms == [False, False, True]
