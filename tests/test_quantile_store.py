"""Persistent per-key quantiles (streaming/quantile_store.py): exact
bin placement vs per-element rank math, split invariance as equality,
commit-gated torn-batch safety, inert replay duplicates, merge/compact
invariance, no-exchange serve plan, and file-stream wiring."""

from __future__ import annotations

import math
import re
import shutil
import uuid
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.catalog import load_table
from dod_etl_spark.streaming.quantile_store import (
    QuantileStore,
    _NEG_BASE,
    _ZERO_BIN,
    value_bin,
)
from tests.conftest import SF_SMOKE

PROBS = [0.5, 0.95, 0.99]


@pytest.fixture()
def store(spark):
    tag = uuid.uuid4().hex[:8]
    s = QuantileStore(
        spark,
        table=f"qh_{tag}",
        commits_table=f"qc_{tag}",
        n_buckets=4,
    )
    yield s
    from dod_etl_spark.streaming.maintenance import _staging_name

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in (s.table, s.commits_table):
        for n in (name, _staging_name(name)):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            shutil.rmtree(f"{wh}/{n}", ignore_errors=True)


def _events(spark):
    return load_table(spark, SF_SMOKE, "events").select(
        F.col("event_type").alias("key"), F.col("value").alias("value")
    )


def _quant(store):
    return {
        (r["key"], r["p"]): (r["bin"], r["n_total"], r["estimate"])
        for r in store.quantiles(PROBS).collect()
    }


def _hist(store):
    return sorted(tuple(r) for r in store.histogram().collect())


def test_bin_function_sign_aware_ordering(spark):
    vals = [-50.0, -1.0, -0.013, 0.0, 0.007, 1.0, 2.5, 1e6]
    df = spark.createDataFrame([(v,) for v in vals], "v double").select(
        "v", value_bin(F.col("v"), 0.01).alias("b")
    )
    rows = sorted(tuple(r) for r in df.collect())
    bins = [b for _, b in rows]
    assert bins == sorted(bins), "bins must be order-preserving"
    got = dict(rows)
    assert got[0.0] == _ZERO_BIN
    assert all(b < _ZERO_BIN for v, b in got.items() if v < 0)
    assert all(b > _ZERO_BIN for v, b in got.items() if v > 0)
    assert got[-50.0] > _NEG_BASE - 10**6


def test_quantile_bin_is_exactly_the_rank_bin(spark, store):
    """The served bin must CONTAIN the ceil(p*n)-th smallest value —
    an exact integer statement, checked per (key, p) against a full
    sort of the raw values."""
    ev = _events(spark)
    for third in range(3):
        store.update_batch(ev.where(F.floor(F.col("value") * 100).cast("long") % 3 == third), batch_id=third)
    got = _quant(store)
    rows = ev.collect()
    by_key: dict[str, list[float]] = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r["value"])
    w = math.log1p(store.eps)
    for key, vals in by_key.items():
        vals.sort()
        for p in PROBS:
            kth = vals[max(1, math.ceil(p * len(vals))) - 1]
            expect_bin = (
                _ZERO_BIN
                if kth == 0
                else (
                    math.floor(math.log(kth) / w)
                    if kth > 0
                    else _NEG_BASE - math.floor(math.log(-kth) / w)
                )
            )
            b, n_total, est = got[(key, p)]
            assert n_total == len(vals)
            assert b == expect_bin, (key, p, kth, b, expect_bin)
            # midpoint within sqrt(1+eps) of the exact kth value
            assert abs(math.log(est / kth)) <= w / 2 + 1e-12


def test_split_invariance_exact(spark, store):
    ev = _events(spark)
    store.update_batch(ev, batch_id=0)
    baseline_h, baseline_q = _hist(store), _quant(store)

    tag = uuid.uuid4().hex[:8]
    other = QuantileStore(
        spark, table=f"qh_{tag}", commits_table=f"qc_{tag}", n_buckets=4
    )
    try:
        for fifth in range(5):
            other.update_batch(
                ev.where(F.floor(F.col("value") * 100).cast("long") % 5 == fifth),
                batch_id=fifth,
            )
        assert _hist(other) == baseline_h
        assert _quant(other) == baseline_q
    finally:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for n in (other.table, other.commits_table):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            shutil.rmtree(f"{wh}/{n}", ignore_errors=True)


def test_committed_replay_is_noop(spark, store):
    ev = _events(spark)
    store.update_batch(ev, batch_id=0)
    baseline = _hist(store)
    assert store.update_batch(ev, batch_id=0) == 0  # short-circuit
    assert _hist(store) == baseline


def test_torn_batch_invisible_then_replay_converges(spark, store):
    """Crash window: cells appended, commit record missing — serve
    ignores the orphans; the replay re-appends (duplicates inert via
    max-per-cell) and commits, landing on the single-append state."""
    ev = _events(spark)
    store.update_batch(ev.where(F.col("value") < 100), batch_id=0)
    baseline = _hist(store)

    # simulate the torn append: cells under batch_id=1, NO commit row
    torn = (
        ev.where(F.col("value") >= 100)
        .select(
            "key",
            value_bin(F.col("value").cast("double"), store.eps).alias("bin"),
        )
        .groupBy("key", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(1).cast("long").alias("batch_id"), "key", "bin", "n")
    )
    from dod_etl_spark.streaming.maintenance import bucket_align

    bucket_align(torn, "key", store.n_buckets).write.insertInto(
        store.table, overwrite=False
    )
    spark.catalog.refreshTable(store.table)
    assert _hist(store) == baseline, "orphan cells must be invisible"

    # replay of the torn batch through the normal path
    store.update_batch(ev.where(F.col("value") >= 100), batch_id=1)
    replayed = _hist(store)

    # expected: one clean store fed both batches once
    tag = uuid.uuid4().hex[:8]
    clean = QuantileStore(
        spark, table=f"qh_{tag}", commits_table=f"qc_{tag}", n_buckets=4
    )
    try:
        clean.update_batch(ev.where(F.col("value") < 100), batch_id=0)
        clean.update_batch(ev.where(F.col("value") >= 100), batch_id=1)
        assert replayed == _hist(clean)
    finally:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for n in (clean.table, clean.commits_table):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            shutil.rmtree(f"{wh}/{n}", ignore_errors=True)


def test_merge_and_compact_preserve_serve(spark, store):
    ev = _events(spark)
    for third in range(3):
        store.update_batch(ev.where(F.floor(F.col("value") * 100).cast("long") % 3 == third), batch_id=third)
    baseline_h, baseline_q = _hist(store), _quant(store)
    removed = store.merge_rows()
    assert removed >= 0
    assert _hist(store) == baseline_h
    assert _quant(store) == baseline_q
    stats = store.compact()[store.table]
    assert stats["files_after"] <= store.n_buckets
    assert _hist(store) == baseline_h


def test_serve_plan_aggregates_in_bucket_layout(spark, store):
    store.update_batch(_events(spark), batch_id=0)
    plan = (
        store.histogram()._jdf.queryExecution().executedPlan().toString()
    )
    assert "Bucketed: true" in plan
    assert not re.search(r"Exchange hashpartitioning\(key", plan), plan


def test_streaming_drive(spark, store, tmp_path):
    src = tmp_path / "q_src"
    _events(spark).write.parquet(str(src))
    q = (
        spark.readStream.schema("key string, value double")
        .parquet(str(src))
        .writeStream.foreachBatch(
            lambda df, bid: store.update_batch(df, batch_id=bid)
        )
        .option("checkpointLocation", str(tmp_path / "q_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(_quant(store)) > 0


def test_merge_keeps_commit_records_replay_after_merge_noop(spark, store):
    """Post-merge replay of an OLD batch_id (checkpoint loss) must
    short-circuit on its kept commit record — re-appending it into the
    merged history would double every count."""
    ev = _events(spark)
    b0 = ev.where(F.floor(F.col("value") * 100).cast("long") % 2 == 0)
    b1 = ev.where(F.floor(F.col("value") * 100).cast("long") % 2 == 1)
    store.update_batch(b0, batch_id=0)
    store.update_batch(b1, batch_id=1)
    baseline = _hist(store)
    store.merge_rows()
    assert _hist(store) == baseline
    assert store.update_batch(b0, batch_id=0) == 0  # old id still committed
    assert _hist(store) == baseline


def test_as_of_batch_time_travel(spark, store):
    """histogram/quantiles(as_of_batch=k) equal a fresh store fed only
    batches 0..k (the commit log as version history)."""
    ev = _events(spark)
    lo, hi = ev.where(F.col("value") < 100), ev.where(F.col("value") >= 100)
    store.update_batch(lo, batch_id=0)
    store.update_batch(hi, batch_id=1)

    tag = uuid.uuid4().hex[:8]
    clean = QuantileStore(
        spark, table=f"qh_{tag}", commits_table=f"qc_{tag}", n_buckets=4
    )
    try:
        clean.update_batch(lo, batch_id=0)
        assert sorted(
            tuple(r) for r in store.histogram(as_of_batch=0).collect()
        ) == _hist(clean)
        assert {
            (r["key"], r["p"]): (r["bin"], r["n_total"], r["estimate"])
            for r in store.quantiles(PROBS, as_of_batch=0).collect()
        } == _quant(clean)
        assert _hist(store) != _hist(clean)  # the travel actually moved
    finally:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for n in (clean.table, clean.commits_table):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            shutil.rmtree(f"{wh}/{n}", ignore_errors=True)


def test_merge_crash_window_preserves_serve(spark, store):
    """The merge commit protocol's crash point: the -1 sentinel commit
    lands BEFORE the history overwrite. Simulate the crash AFTER the
    sentinel but BEFORE the overwrite — serving must be unchanged
    (per-batch rows intact and committed; the early -1 has no rows) —
    then a re-run of merge_rows converges without duplicating the
    sentinel commit."""
    ev = _events(spark)
    for third in range(3):
        store.update_batch(
            ev.where(F.floor(F.col("value") * 100).cast("long") % 3 == third),
            batch_id=third,
        )
    baseline = _quant(store)

    # crash simulation: sentinel committed, overwrite never happened
    spark.createDataFrame([(-1,)], "batch_id long").write.insertInto(
        store.commits_table, overwrite=False
    )
    spark.catalog.refreshTable(store.commits_table)
    assert _quant(store) == baseline

    removed = store.merge_rows()
    assert removed >= 0
    assert _quant(store) == baseline
    # the guarded merge did not append a second sentinel
    n_sentinels = (
        spark.table(store.commits_table).filter(F.col("batch_id") == -1).count()
    )
    assert n_sentinels == 1
