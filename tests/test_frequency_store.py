"""Per-key heavy hitters (streaming/frequency_store.py) and the
composed StreamingProfiler: exact-when-collision-free estimates,
cross-batch heavy-hitter capture, CM split invariance as equality,
commit-gated torn-batch safety, merge/compact invariance, no-exchange
CM serve, and the one-body profiler drive."""

from __future__ import annotations

import math
import re
import shutil
import uuid
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.streaming.frequency_store import FrequencyStore
from dod_etl_spark.streaming.profiler import StreamingProfiler


def _cleanup(spark, *tables):
    from dod_etl_spark.streaming.maintenance import _staging_name

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in tables:
        for n in (name, _staging_name(name)):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            shutil.rmtree(f"{wh}/{n}", ignore_errors=True)


@pytest.fixture()
def store(spark):
    tag = uuid.uuid4().hex[:8]
    s = FrequencyStore(
        spark,
        cm_table=f"fcm_{tag}",
        cand_table=f"fcd_{tag}",
        commits_table=f"fco_{tag}",
        n_buckets=4,
        top_m=8,
    )
    yield s
    _cleanup(spark, s.cm_table, s.cand_table, s.commits_table)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, value string")


def _hh(store, k=10):
    return {
        (r["key"], r["value"]): (r["est"], r["rank"])
        for r in store.heavy_hitters(k).collect()
    }


def test_exact_when_collision_free(spark, store):
    # 6 distinct values over width 1024: no CM collisions, estimates
    # are the exact counts and ranks follow them.
    rows = (
        [("a", "x")] * 5 + [("a", "y")] * 3 + [("a", "z")] * 1
        + [("b", "p")] * 4 + [("b", "q")] * 2 + [("b", "x")] * 7
    )
    store.update_batch(_mk(spark, rows), batch_id=0)
    got = _hh(store)
    assert got[("a", "x")] == (5, 1)
    assert got[("a", "y")] == (3, 2)
    assert got[("a", "z")] == (1, 3)
    assert got[("b", "x")] == (7, 1)
    assert got[("b", "p")] == (4, 2)
    assert got[("b", "q")] == (2, 3)


def test_persistent_heavy_hitter_across_batches(spark, store):
    # H appears 6x in EVERY batch (always in the batch top-m); the
    # noise values are unique per batch. Served total is exact.
    for b in range(5):
        rows = [("k", "H")] * 6 + [("k", f"noise_{b}_{i}") for i in range(4)]
        store.update_batch(_mk(spark, rows), batch_id=b)
    got = store.heavy_hitters(1).collect()
    assert len(got) == 1
    assert (got[0]["value"], got[0]["est"]) == ("H", 30)


def test_cm_cells_split_invariance_exact(spark, store):
    rows = [("k%d" % (i % 3), "v%d" % (i % 17)) for i in range(300)]
    store.update_batch(_mk(spark, rows), batch_id=0)
    baseline = sorted(tuple(r) for r in store.cm_cells().collect())

    tag = uuid.uuid4().hex[:8]
    other = FrequencyStore(
        spark,
        cm_table=f"fcm_{tag}",
        cand_table=f"fcd_{tag}",
        commits_table=f"fco_{tag}",
        n_buckets=4,
        top_m=8,
    )
    try:
        for fifth in range(5):
            other.update_batch(
                _mk(spark, [r for i, r in enumerate(rows) if i % 5 == fifth]),
                batch_id=fifth,
            )
        assert sorted(tuple(r) for r in other.cm_cells().collect()) == baseline
        # the candidate UNION is split-dependent by design (per-batch
        # top-m); what must agree is the head of the ranking, whose
        # values are candidates under any split of this data
        assert {
            (k, v): r for (k, v), r in _hh(other, 3).items()
        } == {(k, v): r for (k, v), r in _hh(store, 3).items()}
    finally:
        _cleanup(spark, other.cm_table, other.cand_table, other.commits_table)


def test_replay_noop_and_torn_batch(spark, store):
    rows1 = [("a", "x")] * 3 + [("a", "y")] * 2
    rows2 = [("a", "x")] * 4 + [("a", "w")] * 1
    store.update_batch(_mk(spark, rows1), batch_id=0)
    baseline = _hh(store)
    assert store.update_batch(_mk(spark, rows1), batch_id=0) == 0
    assert _hh(store) == baseline

    # torn: cells+cands appended under batch 1 with NO commit
    from dod_etl_spark.streaming.maintenance import bucket_align

    counted = (
        _mk(spark, rows2).groupBy("key", "value").agg(F.count(F.lit(1)).alias("n"))
    )
    torn_cand = counted.select(
        F.lit(1).cast("long").alias("batch_id"), "key", "value", "n"
    )
    bucket_align(torn_cand, "key", store.n_buckets).write.insertInto(
        store.cand_table, overwrite=False
    )
    spark.catalog.refreshTable(store.cand_table)
    assert _hh(store) == baseline, "orphan candidate rows must be invisible"

    # replay through the normal path lands on the clean two-batch state
    store.update_batch(_mk(spark, rows2), batch_id=1)
    got = _hh(store)
    assert got[("a", "x")] == (7, 1)
    assert got[("a", "y")][0] == 2
    assert got[("a", "w")][0] == 1


def test_merge_and_compact_preserve_serve(spark, store):
    for b in range(3):
        rows = [("k", "H")] * 5 + [("k", f"v{b}")] * 2
        store.update_batch(_mk(spark, rows), batch_id=b)
    baseline = _hh(store)
    removed = store.merge_rows()
    assert removed >= 0
    assert _hh(store) == baseline
    stats = store.compact()[store.cm_table]
    assert stats["files_after"] <= store.n_buckets
    assert _hh(store) == baseline


def test_cm_serve_aggregates_in_bucket_layout(spark, store):
    store.update_batch(
        _mk(spark, [("a", "x"), ("a", "y"), ("b", "z")]), batch_id=0
    )
    plan = store.cm_cells()._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert not re.search(r"Exchange hashpartitioning\(key", plan), plan


# --- StreamingProfiler -------------------------------------------------------


@pytest.fixture()
def profiler(spark):
    tag = uuid.uuid4().hex[:8]
    p = StreamingProfiler(spark, prefix=f"prof_{tag}", n_buckets=4)
    yield p
    _cleanup(
        spark,
        p.hll.table,
        p.quant.table,
        p.quant.commits_table,
        p.freq.cm_table,
        p.freq.cand_table,
        p.freq.commits_table,
    )


def test_profiler_drive_and_consistency(spark, profiler, tmp_path):
    # Deterministic source: key = id % 4, value = id % 50 (doubles).
    # Mode per key: every value equally frequent EXCEPT we inject a
    # dominant value 7.0 for key "3".
    src = (
        spark.range(2000)
        .select(
            (F.col("id") % 4).cast("string").alias("key"),
            (F.col("id") % 50).cast("double").alias("value"),
        )
        .union(
            spark.range(300).select(
                F.lit("3").alias("key"), F.lit(7.0).alias("value")
            )
        )
    )
    path = tmp_path / "prof_src"
    src.write.parquet(str(path))
    q = (
        spark.readStream.schema("key string, value double")
        .parquet(str(path))
        .writeStream.foreachBatch(
            lambda df, bid: profiler.update_batch(df, batch_id=bid)
        )
        .option("checkpointLocation", str(tmp_path / "prof_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    prof = {r["key"]: r.asDict() for r in profiler.profile(k=3).collect()}
    assert set(prof) == {"0", "1", "2", "3"}
    exact_rows = {
        r["key"]: r["n"]
        for r in src.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    exact_distinct = {
        r["key"]: r["n"]
        for r in src.groupBy("key")
        .agg(F.countDistinct("value").alias("n"))
        .collect()
    }
    for k, row in prof.items():
        assert row["n_rows"] == exact_rows[k], k  # exact by construction
        rel = abs(row["n_distinct"] - exact_distinct[k]) / exact_distinct[k]
        assert rel <= 0.10, (k, row["n_distinct"], exact_distinct[k])
        assert row["q50"] is not None and row["q50"] > 0
    # key 3's dominant value is the injected 7.0
    top3 = prof["3"]["top_values"]
    assert top3[0]["value"] == "7.0"
    assert top3[0]["est"] >= 300


def test_as_of_batch_time_travel(spark, store):
    """heavy_hitters(as_of_batch=k) equals a fresh store fed only
    batches 0..k."""
    b0 = _mk(spark, [("k", "a")] * 5 + [("k", "b")] * 2)
    b1 = _mk(spark, [("k", "b")] * 9)
    store.update_batch(b0, batch_id=0)
    store.update_batch(b1, batch_id=1)

    tag = uuid.uuid4().hex[:8]
    clean = FrequencyStore(
        spark,
        cm_table=f"fcm_{tag}",
        cand_table=f"fcd_{tag}",
        commits_table=f"fco_{tag}",
        n_buckets=4,
        top_m=8,
    )
    try:
        clean.update_batch(b0, batch_id=0)
        got = {
            (r["key"], r["value"]): (r["est"], r["rank"])
            for r in store.heavy_hitters(10, as_of_batch=0).collect()
        }
        assert got == _hh(clean)
        assert got[("k", "a")][1] == 1  # a led before batch 1
        assert _hh(store)[("k", "b")][1] == 1  # b leads now
    finally:
        _cleanup(spark, clean.cm_table, clean.cand_table, clean.commits_table)
