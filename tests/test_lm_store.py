"""Incremental KN language model (streaming/lm_store.py): store-served
scores must be BIT-IDENTICAL to the from-scratch batch plan
(kn_lm_score_docs) over the same train corpus under ANY batch split;
replays and re-crawls add nothing; torn batches are inert; merge and
compact preserve the model; the serve plan never exchanges the store
scan."""

from __future__ import annotations

import re
import shutil
import uuid
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.catalog import load_table
from dod_etl_spark.queries import QUERIES
from dod_etl_spark.queries.quality import _KN_SEED, _KN_TRAIN_CUT
from dod_etl_spark.streaming.lm_store import NgramLmStore
from tests.conftest import SF_SMOKE


@pytest.fixture()
def store(spark):
    tag = uuid.uuid4().hex[:8]
    s = NgramLmStore(
        spark,
        table=f"lmb_{tag}",
        docs_table=f"lmd_{tag}",
        commits_table=f"lmc_{tag}",
        n_buckets=4,
    )
    yield s
    from dod_etl_spark.streaming.maintenance import _staging_name

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in (s.table, s.docs_table, s.commits_table):
        for n in (name, _staging_name(name)):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            shutil.rmtree(f"{wh}/{n}", ignore_errors=True)


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")


def _train(spark):
    """The batch query's train split (content-hash bucket >= cut)."""
    from dod_etl_spark.operators.sampling import hash_bucket

    return _docs(spark).filter(
        hash_bucket(F.col("doc_id"), _KN_SEED) >= _KN_TRAIN_CUT
    )


def _scores(df):
    return sorted(
        (r["doc_id"], r["n_bigrams"], r["n_oov_ctx"], r["avg_microprob"])
        for r in df.collect()
    )


def test_store_scores_equal_batch_plan_any_split(spark, store):
    """The headline contract: ingest the batch query's train split in
    three micro-batches, score ALL documents — every row equals the
    one-shot batch plan, including the smoothing paths (unseen bigram
    under seen context, unseen context)."""
    train = _train(spark)
    for i in range(3):
        store.update_batch(train.filter(F.col("doc_id") % 3 == i), batch_id=i)
    got = _scores(store.score(_docs(spark)))
    want = _scores(QUERIES["kn_lm_score_docs"](spark, SF_SMOKE))
    assert got == want
    # holdout docs are being scored against a model that never saw
    # them (the smoothing paths run; at sf0.001 every CONTEXT happens
    # to be in-vocab, so assert scored coverage, not n_oov_ctx > 0)
    assert len(want) > store.n_train_docs()


def test_single_batch_equals_three(spark, store):
    train = _train(spark)
    store.update_batch(train, batch_id=0)
    one = _scores(store.score(_docs(spark)))
    want = _scores(QUERIES["kn_lm_score_docs"](spark, SF_SMOKE))
    assert one == want


def test_committed_replay_and_recrawl_add_nothing(spark, store):
    train = _train(spark)
    store.update_batch(train, batch_id=0)
    m0 = sorted(tuple(r) for r in store.model().collect())
    n0 = store.n_train_docs()
    # same batch_id: short-circuit
    assert store.update_batch(train, batch_id=0) == 0
    # re-crawl under a NEW batch_id: the doc-level guard absorbs it
    assert store.update_batch(train, batch_id=1) == 0
    assert sorted(tuple(r) for r in store.model().collect()) == m0
    assert store.n_train_docs() == n0


def test_torn_batch_inert_then_replay_converges(spark, store):
    """Counts appended, commit record missing: invisible to the model;
    the replay's byte-identical duplicates collapse via max-per-batch
    and the final state equals a clean single ingest."""
    train = _train(spark)
    a = train.filter(F.col("doc_id") % 2 == 0)
    b = train.filter(F.col("doc_id") % 2 == 1)
    store.update_batch(a, batch_id=0)
    baseline = sorted(tuple(r) for r in store.model().collect())

    # simulate the torn append for batch 1: count rows, NO commit
    from dod_etl_spark.streaming.lm_store import _doc_bigrams
    from dod_etl_spark.streaming.maintenance import bucket_align

    torn = (
        _doc_bigrams(b, "doc_id", "text")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .select(F.lit(1).cast("long").alias("batch_id"), "w1", "w2", "c2")
    )
    bucket_align(torn, "w1", store.n_buckets).write.insertInto(
        store.table, overwrite=False
    )
    # ... and the torn DOC rows that precede the (never-written) commit
    torn_docs = b.select(
        F.lit(1).cast("long").alias("batch_id"), "doc_id"
    )
    bucket_align(torn_docs, "doc_id", store.n_buckets).write.insertInto(
        store.docs_table, overwrite=False
    )
    spark.catalog.refreshTable(store.table)
    spark.catalog.refreshTable(store.docs_table)
    assert sorted(tuple(r) for r in store.model().collect()) == baseline
    n_docs_before = store.n_train_docs()

    # replay through the normal path; duplicates must be inert
    store.update_batch(b, batch_id=1)
    # the replay re-appended the same (batch_id, doc_id) rows; the
    # distinct in n_train_docs keeps the count exact, and a merge must
    # not bake the duplicates in either
    assert store.n_train_docs() == train.count()
    store.merge_batches()
    assert store.n_train_docs() == train.count()
    assert n_docs_before == a.count()
    replayed = _scores(store.score(_docs(spark)))
    want = _scores(QUERIES["kn_lm_score_docs"](spark, SF_SMOKE))
    assert replayed == want


def test_merge_batches_preserves_model_and_guard(spark, store):
    train = _train(spark)
    for i in range(3):
        store.update_batch(train.filter(F.col("doc_id") % 3 == i), batch_id=i)
    baseline = _scores(store.score(_docs(spark)))
    removed = store.merge_batches()
    assert removed >= 0
    assert _scores(store.score(_docs(spark))) == baseline
    # the replay guard survives the merge: an old batch re-delivered
    # after its commit record was collapsed still adds nothing
    assert store.update_batch(train.filter(F.col("doc_id") % 3 == 0), batch_id=0) == 0
    assert _scores(store.score(_docs(spark))) == baseline
    stats = store.compact()[store.table]
    assert stats["files_after"] <= store.n_buckets
    assert _scores(store.score(_docs(spark))) == baseline


def test_model_plan_aggregates_in_bucket_layout(spark, store):
    store.update_batch(_train(spark), batch_id=0)
    plan = store.model()._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert not re.search(r"Exchange hashpartitioning\(w1", plan), plan


def test_as_of_batch_time_travel(spark, store):
    """model(as_of_batch=k) / score(as_of_batch=k) equal a fresh store
    fed only batches 0..k — the commit log doubles as a version
    history, so historical filter decisions replay exactly."""
    train = _train(spark)
    parts = [train.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, p in enumerate(parts):
        store.update_batch(p, batch_id=i)

    import uuid
    from urllib.parse import urlparse
    import shutil

    tag = uuid.uuid4().hex[:8]
    fresh = NgramLmStore(
        spark,
        table=f"lmb_{tag}",
        docs_table=f"lmd_{tag}",
        commits_table=f"lmc_{tag}",
        n_buckets=4,
    )
    try:
        fresh.update_batch(parts[0], batch_id=0)
        fresh.update_batch(parts[1], batch_id=1)
        want_m = sorted(tuple(r) for r in fresh.model().collect())
        got_m = sorted(tuple(r) for r in store.model(as_of_batch=1).collect())
        assert got_m == want_m
        got_s = _scores(store.score(_docs(spark), as_of_batch=1))
        want_s = _scores(fresh.score(_docs(spark)))
        assert got_s == want_s
        assert store.n_train_docs(as_of_batch=1) == fresh.n_train_docs()
        # before anything committed: empty model
        assert store.model(as_of_batch=-5).count() == 0
    finally:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for n in (fresh.table, fresh.docs_table, fresh.commits_table):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            shutil.rmtree(f"{wh}/{n}", ignore_errors=True)


def test_streaming_drive_scores_equal_batch_plan(spark, store, tmp_path):
    """End-to-end through a real file stream: Structured Streaming's
    own batch_ids drive the commit protocol, and the served scores
    still equal the one-shot batch plan."""
    src = tmp_path / "lm_src"
    _train(spark).repartition(3).write.parquet(str(src))
    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(
            lambda df, bid: store.update_batch(df, batch_id=bid)
        )
        .option("checkpointLocation", str(tmp_path / "lm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert store.n_train_docs() == _train(spark).count()
    got = _scores(store.score(_docs(spark)))
    want = _scores(QUERIES["kn_lm_score_docs"](spark, SF_SMOKE))
    assert got == want
