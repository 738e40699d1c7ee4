"""Streaming NEAR-dup suppression (streaming/dedup_store.NearDupStore,
judge r6 item 4): a paraphrased (band-colliding, md5-distinct) document
is suppressed across micro-batches; semantics match the batch twin
incremental_dedup_docs; the store side never shuffles."""

from __future__ import annotations

import shutil
import uuid
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.catalog import load_table
from dod_etl_spark.operators.text_dedup import minhash_bands, minhash_signatures
from dod_etl_spark.streaming.dedup_store import NearDupStore
from tests.conftest import SF_SMOKE

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain in "
    "spain falls mainly on the plain and every good boy deserves "
    "fudge as the sun also rises over the river and into the trees"
)
PARAPHRASE = BASE + " indeed"  # distinct md5; min-shingles survive
NOVEL = (
    "completely different content about spark physical plans and "
    "bucketed storage layouts that shares no shingles with the base "
    "document whatsoever because every token here is new material"
)


@pytest.fixture()
def store(spark):
    tag = uuid.uuid4().hex[:8]
    s = NearDupStore(
        spark,
        fp_table=f"nd_fp_{tag}",
        band_table=f"nd_band_{tag}",
        commit_table=f"nd_cmt_{tag}",
        n_buckets=4,
    )
    yield s
    for t in (s.fp_table, s.band_table, s.commit_table):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def _bands_of(spark, rows, store):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["band"], r["band_hash"])
        for r in minhash_bands(
            minhash_signatures(
                df,
                num_hashes=store.num_hashes,
                shingle_len=store.shingle_len,
            ),
            band_size=store.band_size,
            num_hashes=store.num_hashes,
        ).collect()
    }


def test_fixture_is_a_true_paraphrase(spark, store):
    """Precondition the suite rests on: PARAPHRASE has a different md5
    but shares >= 1 LSH band with BASE, and NOVEL shares none."""
    b_base = _bands_of(spark, [(1, BASE)], store)
    b_para = _bands_of(spark, [(2, PARAPHRASE)], store)
    b_novel = _bands_of(spark, [(3, NOVEL)], store)
    assert BASE != PARAPHRASE
    assert b_base & b_para, "paraphrase must collide on a band"
    assert not (b_base & b_novel), "novel doc must not collide"


def test_paraphrase_suppressed_across_batches(spark, store):
    """The headline contract: batch 1 emits BASE; batch 2's PARAPHRASE
    (different md5!) is suppressed against history while a novel doc
    passes; batch 3's exact replay of the paraphrase stays suppressed."""
    b1 = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    out1 = {r["doc_id"] for r in store.dedup_batch(b1).collect()}
    assert out1 == {1}

    b2 = spark.createDataFrame(
        [(2, PARAPHRASE), (3, NOVEL)], "doc_id long, text string"
    )
    out2 = {r["doc_id"] for r in store.dedup_batch(b2).collect()}
    assert out2 == {3}

    b3 = spark.createDataFrame([(4, PARAPHRASE)], "doc_id long, text string")
    assert store.dedup_batch(b3).count() == 0
    assert store.seen_count() == 2  # BASE + NOVEL only


def _clone(spark, store, fp_table=None, commit_table=None):
    return NearDupStore(
        spark,
        fp_table=fp_table or store.fp_table,
        band_table=store.band_table,
        commit_table=commit_table or store.commit_table,
        n_buckets=store.n_buckets,
        num_hashes=store.num_hashes,
        band_size=store.band_size,
        shingle_len=store.shingle_len,
    )


def _drop(spark, *tables):
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def test_torn_batch_replay_recovers_documents(spark, store):
    """Advisor r7 (reworked to batch-granular commits): a crash between
    the band append and the batch commit used to make the replayed
    batch suppress ITSELF via its own orphan bands — documents
    permanently lost. Uncommitted bands are inert, so the replay emits
    the docs and commits; later paraphrases are still suppressed."""
    b0 = spark.createDataFrame([(1, NOVEL)], "doc_id long, text string")
    assert store.dedup_batch(b0, batch_id=0).count() == 1

    # Authentic torn state (crash BEFORE the commit): a clone sharing
    # the band table but committing elsewhere runs the full body —
    # bands land in store's band table, neither the commit record nor
    # the fps land in store's tables.
    clone = _clone(
        spark, store,
        fp_table=f"{store.fp_table}_torn",
        commit_table=f"{store.commit_table}_torn",
    )
    try:
        torn = spark.createDataFrame([(2, BASE)], "doc_id long, text string")
        assert clone.dedup_batch(torn, batch_id=1).count() == 1
        assert store.seen_count() == 1  # BASE's fp NOT committed here

        # The replay (same batch_id, the foreachBatch contract): must
        # emit BASE, not self-suppress on the orphan bands.
        out = {r["doc_id"] for r in store.dedup_batch(torn, batch_id=1).collect()}
        assert out == {2}, "torn batch's document was lost on replay"
        assert store.seen_count() == 2

        # History now bites: a paraphrase and an exact replay both drop.
        b2 = spark.createDataFrame(
            [(3, PARAPHRASE), (4, BASE)], "doc_id long, text string"
        )
        assert store.dedup_batch(b2, batch_id=2).count() == 0
    finally:
        _drop(spark, clone.fp_table, clone.commit_table)


def test_torn_after_commit_replay_reemits(spark, store):
    """The OTHER crash window (bands + commit landed, fps did not):
    the batch's own bands are committed on replay, but the
    own-batch_id exclusion keeps them from self-suppressing — the
    docs re-emit (at-least-once) and their fps finally land; other
    batches see the bands as live history throughout (no paraphrase
    leak)."""
    clone = _clone(spark, store, fp_table=f"{store.fp_table}_torn2")
    try:
        torn = spark.createDataFrame([(2, BASE)], "doc_id long, text string")
        assert clone.dedup_batch(torn, batch_id=5).count() == 1
        assert store.seen_count() == 0  # fps went to the clone table

        # live for OTHER batches even before the replay:
        para = spark.createDataFrame([(7, PARAPHRASE)], "doc_id long, text string")
        assert store.dedup_batch(para, batch_id=6).count() == 0

        # the replay itself re-emits and completes the fp append
        out = {r["doc_id"] for r in store.dedup_batch(torn, batch_id=5).collect()}
        assert out == {2}
        assert store.seen_count() == 1
    finally:
        _drop(spark, clone.fp_table)


def test_streaming_drive_suppresses_paraphrase(spark, store, tmp_path):
    """File-stream wiring (maxFilesPerTrigger=1 so the two files are
    separate micro-batches): the paraphrase in the SECOND micro-batch
    is dropped against the band history the FIRST one recorded."""
    src = tmp_path / "nd_src"
    src.mkdir()
    out = tmp_path / "nd_out"
    spark.createDataFrame([(1, BASE)], "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [(2, PARAPHRASE), (3, NOVEL)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "f2"))

    emitted = []

    def body(df, bid):
        emitted.extend(
            r["doc_id"] for r in store.dedup_batch(df, batch_id=bid).collect()
        )

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
        .writeStream.foreachBatch(body)
        .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert sorted(emitted) == [1, 3]


def test_matches_batch_incremental_dedup(spark, store):
    """Semantics pin against the batch twin: ingest the corpus carve
    (doc_id%5==0) as micro-batch 1 and the incoming carve as
    micro-batch 2 — the second batch's emissions must be exactly
    incremental_dedup_docs' survivors (same minhash parameters, same
    exact+band anti-join logic)."""
    from dod_etl_spark.queries import QUERIES

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 5 == 0)
    incoming = docs.where(F.col("doc_id") % 5 != 0)

    emitted_corpus = store.dedup_batch(corpus)
    assert emitted_corpus.count() == corpus.count()  # no within-corpus dups

    got = {r["doc_id"] for r in store.dedup_batch(incoming).collect()}
    want = {
        r["doc_id"] for r in QUERIES["incremental_dedup_docs"](spark, SF_SMOKE).collect()
    }
    assert got == want


def test_store_side_scans_are_bucketed(spark, store):
    """Both membership probes read the store through its bucket layout
    (Bucketed: true under a disabled broadcast threshold) — the
    corpus-sized seen-set never shuffles per micro-batch."""
    store.dedup_batch(
        spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        batch = spark.createDataFrame(
            [(9, NOVEL)], "doc_id long, text string"
        ).withColumn("fp", F.md5(F.col("text").cast("binary")))
        fp_plan = (
            batch.join(spark.table(store.fp_table), "fp", "left_anti")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Bucketed: true" in fp_plan

        bands = minhash_bands(
            minhash_signatures(
                batch.drop("fp"),
                num_hashes=store.num_hashes,
                shingle_len=store.shingle_len,
            ),
            band_size=store.band_size,
            num_hashes=store.num_hashes,
        ).select(F.concat_ws(":", F.col("band"), F.col("band_hash")).alias("bh"))
        # mirror the real probe: committed-batch broadcast filter ON
        # THE SCAN, then the bh semi-join — the band table must still
        # read through its bucket layout (the broadcast semi adds no
        # exchange), and the probe must stay a semi-join (zero fan-out
        # even for a degenerate band shared by the whole corpus).
        committed = F.broadcast(spark.table(store.commit_table))
        seen = spark.table(store.band_table).join(
            committed, "batch_id", "left_semi"
        )
        band_plan = (
            bands.join(seen, "bh", "left_semi")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Bucketed: true" in band_plan
        assert "CartesianProduct" not in band_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
