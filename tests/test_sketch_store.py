"""Persistent per-key HLL distinct (streaming/sketch_store.py): error
floor vs exact distinct, replay/split invariance by union algebra,
merge_rows estimate-preserving collapse, no-exchange serve plan, and
file-stream wiring."""

from __future__ import annotations

import re
import shutil
import uuid
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.catalog import load_table
from dod_etl_spark.streaming.sketch_store import HllSketchStore
from tests.conftest import SF_SMOKE


@pytest.fixture()
def store(spark):
    s = HllSketchStore(
        spark, table=f"hll_{uuid.uuid4().hex[:8]}", n_buckets=4
    )
    yield s
    from dod_etl_spark.streaming.maintenance import _staging_name

    for name in (s.table, _staging_name(s.table)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{wh}/{name}", ignore_errors=True)


def _events(spark):
    return load_table(spark, SF_SMOKE, "events").select(
        F.col("event_type").alias("key"), F.col("user_id").alias("value")
    )


def _est(store):
    return {r["key"]: r["n_distinct"] for r in store.estimates().collect()}


def test_estimates_within_hll_error_floor(spark, store):
    ev = _events(spark)
    for third in range(3):
        store.update_batch(ev.where(F.col("value") % 3 == third))
    exact = {
        r["key"]: r["n"]
        for r in ev.groupBy("key")
        .agg(F.countDistinct("value").alias("n"))
        .collect()
    }
    est = _est(store)
    assert set(est) == set(exact)
    for k, n in exact.items():
        rel = abs(est[k] - n) / max(n, 1)
        assert rel <= 0.05, f"{k}: est {est[k]} vs exact {n} (rel {rel:.3f})"


def test_replay_and_split_invariance(spark, store):
    """Union is register-wise max: a replayed batch changes nothing,
    and ANY partitioning of the same rows yields bit-identical
    estimates."""
    ev = _events(spark)
    b1 = ev.where(F.col("value") % 2 == 0)
    b2 = ev.where(F.col("value") % 2 == 1)
    store.update_batch(b1)
    store.update_batch(b2)
    baseline = _est(store)

    store.update_batch(b1)  # replay
    assert _est(store) == baseline

    other = HllSketchStore(
        spark, table=f"hll_{uuid.uuid4().hex[:8]}", n_buckets=4
    )
    try:
        for fifth in range(5):  # different split of the same rows
            other.update_batch(ev.where(F.col("value") % 5 == fifth))
        assert _est(other) == baseline
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {other.table}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{wh}/{other.table}", ignore_errors=True)


def test_merge_rows_preserves_estimates(spark, store):
    ev = _events(spark)
    for third in range(3):
        store.update_batch(ev.where(F.col("value") % 3 == third))
    store.update_batch(ev.where(F.col("value") % 3 == 0))  # replay rows too
    baseline = _est(store)
    n_keys = len(baseline)
    removed = store.merge_rows()
    assert removed > 0
    assert store.n_rows() == n_keys
    assert _est(store) == baseline
    # compaction after the merge: one file per bucket, same estimates
    stats = store.compact()[store.table]
    assert stats["files_after"] <= store.n_buckets
    assert _est(store) == baseline


def test_serve_plan_aggregates_in_bucket_layout(spark, store):
    store.update_batch(_events(spark))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            store.estimates()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Bucketed: true" in plan
        assert not re.search(r"Exchange hashpartitioning\(key", plan), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_streaming_drive(spark, store, tmp_path):
    src = tmp_path / "hll_src"
    _events(spark).write.parquet(str(src))
    q = (
        spark.readStream.schema("key string, value long")
        .parquet(str(src))
        .writeStream.foreachBatch(lambda df, bid: store.update_batch(df))
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(_est(store)) > 0
