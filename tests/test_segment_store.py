"""Streaming segment dedup (streaming/segment_store.py): prefix
equality with the batch operator, cross-batch suppression, torn-batch
self-suppression safety, committed-replay re-emission, compaction, and
the file-stream drive."""

from __future__ import annotations

import shutil
import uuid
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.operators.segment_dedup import segment_dedup
from dod_etl_spark.streaming.segment_store import SegmentStore


@pytest.fixture()
def store(spark):
    tag = uuid.uuid4().hex[:8]
    s = SegmentStore(
        spark,
        table=f"segfp_{tag}",
        commits_table=f"segc_{tag}",
        n_buckets=4,
        mode="words",
        seg_words=2,
    )
    yield s
    from dod_etl_spark.streaming.maintenance import _staging_name

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in (s.table, s.commits_table):
        for n in (name, _staging_name(name)):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            shutil.rmtree(f"{wh}/{n}", ignore_errors=True)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _out(df):
    return {
        r["doc_id"]: (r["n_segs"], r["n_kept"], r["text_dedup"])
        for r in df.collect()
    }


BATCH1 = [(1, "x y p q"), (2, "x y r s")]
BATCH2 = [(3, "r s x y"), (4, "p q fresh words")]
BATCH3 = [(5, "fresh words x y p q")]


def test_prefix_equality_with_batch_operator(spark, store):
    """Ordered ingest == the batch operator over the union, at every
    prefix."""
    batches = [BATCH1, BATCH2, BATCH3]
    emitted = {}
    for bid, rows in enumerate(batches):
        emitted.update(_out(store.scrub_batch(_docs(spark, rows), batch_id=bid)))
        union = [r for b in batches[: bid + 1] for r in b]
        want = _out(segment_dedup(_docs(spark, union), mode="words", seg_words=2))
        assert emitted == want, f"prefix {bid}"


def test_cross_batch_suppression(spark, store):
    store.scrub_batch(_docs(spark, [(1, "dup seg only")]), batch_id=0)
    got = _out(store.scrub_batch(_docs(spark, [(2, "dup seg only")]), batch_id=1))
    # "dup seg" seen in batch 0; "only" is a 1-word tail segment also
    # seen in batch 0 -> everything suppressed.
    assert got[2] == (2, 0, "")


def test_torn_batch_does_not_self_suppress(spark, store):
    """fps appended WITHOUT the commit record (crash window): the
    replay must re-emit the batch as if it never ran."""
    store.scrub_batch(_docs(spark, BATCH1), batch_id=0)
    baseline = _out(store.scrub_batch(_docs(spark, BATCH2), batch_id=1))

    # simulate the torn append for batch 2: fps present, no commit
    from dod_etl_spark.streaming.maintenance import bucket_align

    from dod_etl_spark.operators.segment_dedup import segment_docs

    segs = segment_docs(_docs(spark, BATCH3), mode="words", seg_words=2)
    fps = segs.select(
        F.lit(2).cast("long").alias("batch_id"),
        F.md5(F.col("seg").cast("binary")).alias("fp"),
    ).distinct()
    bucket_align(fps, "fp", store.n_buckets).write.insertInto(
        store.table, overwrite=False
    )
    spark.catalog.refreshTable(store.table)

    # replay through the normal path: orphans for batch_id=2 are
    # excluded from the probe, so the batch emits normally
    got = _out(store.scrub_batch(_docs(spark, BATCH3), batch_id=2))
    union = BATCH1 + BATCH2 + BATCH3
    want = _out(segment_dedup(_docs(spark, union), mode="words", seg_words=2))
    assert got[5] == want[5]
    assert baseline[3] == want[3] and baseline[4] == want[4]


def test_committed_replay_reemits_identically(spark, store):
    store.scrub_batch(_docs(spark, BATCH1), batch_id=0)
    first = _out(store.scrub_batch(_docs(spark, BATCH2), batch_id=1))
    again = _out(store.scrub_batch(_docs(spark, BATCH2), batch_id=1))
    assert first == again


def test_compaction_preserves_membership(spark, store):
    store.scrub_batch(_docs(spark, BATCH1), batch_id=0)
    store.scrub_batch(_docs(spark, BATCH2), batch_id=1)
    n = store.seen_count()
    stats = store.compact()[store.table]
    assert stats["files_after"] <= store.n_buckets
    assert store.seen_count() == n
    got = _out(store.scrub_batch(_docs(spark, BATCH3), batch_id=2))
    union = BATCH1 + BATCH2 + BATCH3
    want = _out(segment_dedup(_docs(spark, union), mode="words", seg_words=2))
    assert got[5] == want[5]


def test_streaming_drive(spark, store, tmp_path):
    src = tmp_path / "seg_src"
    _docs(spark, BATCH1 + BATCH2).write.parquet(str(src))
    emitted = []

    def body(df, bid):
        emitted.extend(store.scrub_batch(df, batch_id=bid).collect())

    q = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src))
        .writeStream.foreachBatch(body)
        .option("checkpointLocation", str(tmp_path / "seg_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(emitted) == 4
    assert store.seen_count() > 0
