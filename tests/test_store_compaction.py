"""Small-file compaction for the append-only bucketed stores
(streaming/maintenance.py): file counts collapse to ~one per bucket,
results are bit-identical before/after, the bucket layout (and thus the
no-store-side-exchange serve plan) survives, appends keep working, and
an interrupted swap recovers on the next call."""

from __future__ import annotations

import shutil
import uuid
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.streaming.dedup_store import FingerprintStore
from dod_etl_spark.streaming.maintenance import (
    _staging_name,
    compact_bucketed_table,
    recover_compaction,
)
from dod_etl_spark.streaming.posting_store import PostingStore


def _cleanup(spark, *tables):
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in tables:
        for name in (t, _staging_name(t)):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(f"{wh}/{name}", ignore_errors=True)


@pytest.fixture()
def fp_store(spark):
    s = FingerprintStore(spark, table=f"cmp_fp_{uuid.uuid4().hex[:8]}", n_buckets=4)
    yield s
    _cleanup(spark, s.table)


@pytest.fixture()
def posting_store(spark):
    tag = uuid.uuid4().hex[:8]
    s = PostingStore(
        spark, table=f"cmp_tok_{tag}", docs_table=f"cmp_doc_{tag}", n_buckets=4
    )
    yield s
    _cleanup(spark, s.table, s.docs_table)


def _doc_batch(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"document number {i} with shared vocabulary tokens") for i in range(lo, hi)],
        "doc_id long, text string",
    )


def test_fingerprint_store_compacts_and_still_dedups(spark, fp_store):
    for b in range(6):
        fp_store.dedup_batch(_doc_batch(spark, b * 10, b * 10 + 10))
    files_before = len(spark.table(fp_store.table).inputFiles())
    assert files_before > fp_store.n_buckets  # one fileset per batch

    stats = fp_store.compact()[fp_store.table]
    assert stats["files_before"] == files_before
    assert stats["files_after"] <= fp_store.n_buckets
    assert stats["rows"] == 60
    assert fp_store.seen_count() == 60

    # history still bites and appends still work
    replay = _doc_batch(spark, 0, 10)
    assert fp_store.dedup_batch(replay).count() == 0
    fresh = _doc_batch(spark, 100, 105)
    assert fp_store.dedup_batch(fresh).count() == 5
    assert fp_store.seen_count() == 65


def test_fingerprint_store_bucket_layout_survives(spark, fp_store):
    fp_store.dedup_batch(_doc_batch(spark, 0, 20))
    fp_store.dedup_batch(_doc_batch(spark, 20, 40))
    fp_store.compact()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        probe = spark.createDataFrame([("x",)], "fp string")
        plan = (
            probe.join(spark.table(fp_store.table), "fp", "left_anti")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_posting_store_rankings_identical_after_compact(spark, posting_store):
    for b in range(5):
        posting_store.index_batch(_doc_batch(spark, b * 20, b * 20 + 20))
    queries = spark.createDataFrame(
        [(1, "shared vocabulary"), (2, "document number")],
        "query_id long, query_text string",
    )
    before = sorted(
        (r["query_id"], r["doc_id"], r["rank"], str(r["score"]))
        for r in posting_store.search(queries, k=10).collect()
    )
    stats = posting_store.compact()
    assert stats[posting_store.table]["files_after"] <= posting_store.n_buckets
    assert stats[posting_store.docs_table]["files_after"] <= posting_store.n_buckets
    after = sorted(
        (r["query_id"], r["doc_id"], r["rank"], str(r["score"]))
        for r in posting_store.search(queries, k=10).collect()
    )
    assert before == after and before

    # replay guard intact post-compact
    assert posting_store.index_batch(_doc_batch(spark, 0, 20)) == 0
    assert posting_store.n_docs() == 100


def test_interrupted_swap_recovers(spark):
    """Both crash windows: staging-beside-live (pre-DROP) is discarded;
    staging-only (post-DROP) is adopted."""
    table = f"cmp_swap_{uuid.uuid4().hex[:8]}"
    try:
        df = spark.createDataFrame([(i,) for i in range(40)], "fp bigint")
        (
            df.write.format("parquet")
            .bucketBy(4, "fp")
            .sortBy("fp")
            .saveAsTable(table)
        )
        # window 1: a stale staging table beside the live one
        df.limit(3).write.format("parquet").bucketBy(4, "fp").sortBy(
            "fp"
        ).saveAsTable(_staging_name(table))
        stats = compact_bucketed_table(spark, table, "fp", 4)
        assert stats["rows"] == 40  # stale staging discarded, not adopted
        assert not spark.catalog.tableExists(_staging_name(table))

        # window 2: crash between DROP and RENAME — only staging exists
        spark.sql(f"ALTER TABLE {table} RENAME TO {_staging_name(table)}")
        assert recover_compaction(spark, table) is True
        assert spark.catalog.tableExists(table)
        assert spark.table(table).count() == 40
        assert recover_compaction(spark, table) is False  # idempotent
    finally:
        _cleanup(spark, table)


def test_compact_empty_store_is_noop(spark, fp_store):
    assert fp_store.compact() == {}


def test_vector_store_search_and_plan_survive_compact(spark):
    import re

    from dod_etl_spark.catalog import load_table
    from dod_etl_spark.streaming.vector_store import VectorIndexStore
    from tests.conftest import SF_SMOKE

    tag = uuid.uuid4().hex[:8]
    store = VectorIndexStore(
        spark, table=f"cmp_vb_{tag}", vecs_table=f"cmp_vv_{tag}",
        n_bits=4, n_buckets=4,
    )
    try:
        emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
        for lo, hi in ((0, 40), (40, 80), (80, 120)):
            store.index_batch(
                emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            )
        q = emb.where(F.col("vec_id") < 5)
        before = sorted(
            (r["query_id"], r["neighbor_id"], r["rk"], r["cosine"])
            for r in store.search(q, k=5, probe_bits=2).collect()
        )
        stats = store.compact()
        assert stats[store.table]["files_after"] <= store.n_buckets
        after_df = store.search(q, k=5, probe_bits=2)
        after = sorted(
            (r["query_id"], r["neighbor_id"], r["rk"], r["cosine"])
            for r in after_df.collect()
        )
        assert before == after and before
        plan = after_df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert not re.search(r"Exchange hashpartitioning\(_?bucket", plan), plan
        # appends keep working post-compact
        assert store.index_batch(
            emb.where((F.col("vec_id") >= 120) & (F.col("vec_id") < 130))
        ) == 10
    finally:
        _cleanup(spark, store.table, store.vecs_table)


def test_appends_are_bucket_aligned(spark, posting_store):
    """Each micro-batch appends at most one file per bucket (the batch
    side repartitions into the bucket layout before insertInto) — not
    one per (task, bucket), which would multiply file growth by the
    cluster's task count."""
    wide = _doc_batch(spark, 0, 200).repartition(16)  # many write tasks
    posting_store.index_batch(wide)
    assert len(spark.table(posting_store.table).inputFiles()) <= posting_store.n_buckets
    assert (
        len(spark.table(posting_store.docs_table).inputFiles())
        <= posting_store.n_buckets
    )
    posting_store.index_batch(_doc_batch(spark, 200, 300).repartition(16))
    assert (
        len(spark.table(posting_store.table).inputFiles())
        <= 2 * posting_store.n_buckets
    )
