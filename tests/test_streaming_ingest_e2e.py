"""The full streaming-ingest story in one pipeline: per micro-batch,
NearDupStore suppression (exact + paraphrase vs ALL history) -> quality
gate -> PostingStore incremental indexing + HllSketchStore profile
update. Pins that the four maintain-don't-rebuild stores compose in one
foreachBatch body, that a paraphrase arriving batches later never
reaches the index, and that the served BM25 ranking equals a
from-scratch batch index over exactly the surviving corpus."""

from __future__ import annotations

import shutil
import uuid
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.streaming.dedup_store import NearDupStore
from dod_etl_spark.streaming.posting_store import PostingStore
from dod_etl_spark.streaming.sketch_store import HllSketchStore

GOOD = [
    "the quick brown fox jumps over the lazy dog while the rain in "
    "spain falls mainly on the plain and every good boy deserves fudge",
    "completely different content about spark physical plans and "
    "bucketed storage layouts that shares no shingles with anything",
    "a third document about incremental posting stores and replay "
    "guarded appends that serves rankings identical to batch builds",
]
PARA = GOOD[0] + " indeed"  # band-colliding paraphrase of GOOD[0]
JUNK = "x"  # fails the quality gate (too short)


@pytest.fixture()
def stores(spark):
    tag = uuid.uuid4().hex[:8]
    nd = NearDupStore(
        spark,
        fp_table=f"ing_fp_{tag}",
        band_table=f"ing_band_{tag}",
        commit_table=f"ing_cmt_{tag}",
        n_buckets=4,
    )
    ps = PostingStore(
        spark, table=f"ing_tok_{tag}", docs_table=f"ing_doc_{tag}", n_buckets=4
    )
    hs = HllSketchStore(spark, table=f"ing_hll_{tag}", n_buckets=4)
    yield nd, ps, hs
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (
        nd.fp_table, nd.band_table, nd.commit_table,
        ps.table, ps.docs_table, hs.table,
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def _ingest(spark, stores, rows, batch_id):
    """One foreachBatch body: dedup -> gate -> index + profile."""
    nd, ps, hs = stores
    batch = spark.createDataFrame(rows, "doc_id long, source string, text string")
    fresh = nd.dedup_batch(batch, batch_id=batch_id)
    gated = fresh.where(
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")) >= 5
    ).localCheckpoint(eager=True)
    ps.index_batch(gated)
    hs.update_batch(
        gated.select("source", F.col("doc_id").alias("value")),
        key_col="source",
        value_col="value",
    )
    return {r["doc_id"] for r in gated.collect()}


def test_ingest_pipeline_end_to_end(spark, stores):
    nd, ps, hs = stores

    # batch 0: two good docs + junk (gated out AFTER dedup recording)
    out0 = _ingest(
        spark, stores,
        [(1, "crawl_a", GOOD[0]), (2, "crawl_b", GOOD[1]), (3, "crawl_a", JUNK)],
        batch_id=0,
    )
    assert out0 == {1, 2}

    # batch 1: paraphrase of doc 1 (suppressed), exact dup of doc 2
    # (suppressed), one new good doc
    out1 = _ingest(
        spark, stores,
        [(10, "crawl_b", PARA), (11, "crawl_a", GOOD[1]), (12, "crawl_b", GOOD[2])],
        batch_id=1,
    )
    assert out1 == {12}

    # the index saw exactly the gated survivors
    assert ps.n_docs() == 3

    # served ranking == from-scratch batch index over the survivors
    survivors = spark.createDataFrame(
        [(1, GOOD[0]), (2, GOOD[1]), (12, GOOD[2])], "doc_id long, text string"
    )
    scratch = PostingStore(
        spark,
        table=f"ing_scr_{uuid.uuid4().hex[:8]}",
        docs_table=f"ing_scrd_{uuid.uuid4().hex[:8]}",
        n_buckets=4,
    )
    try:
        scratch.index_batch(survivors)
        queries = spark.createDataFrame(
            [(1, "posting stores replay"), (2, "quick brown fox")],
            "query_id long, query_text string",
        )
        served = sorted(
            (r["query_id"], r["doc_id"], r["rank"], str(r["score"]))
            for r in ps.search(queries, k=5).collect()
        )
        batch_built = sorted(
            (r["query_id"], r["doc_id"], r["rank"], str(r["score"]))
            for r in scratch.search(queries, k=5).collect()
        )
        assert served == batch_built and served
    finally:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for t in (scratch.table, scratch.docs_table):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)

    # profile: per-source distinct doc counts over the gated stream
    est = {r["key"]: r["n_distinct"] for r in hs.estimates().collect()}
    assert est == {"crawl_a": 1, "crawl_b": 2}

    # junk doc's fingerprint WAS recorded (dedup before gate): an exact
    # replay of junk in a later batch stays suppressed
    out2 = _ingest(spark, stores, [(20, "crawl_a", JUNK)], batch_id=2)
    assert out2 == set()

    # maintenance composes across all stores
    assert nd.compact()[nd.band_table]["files_after"] <= nd.n_buckets
    assert ps.compact()[ps.table]["files_after"] <= ps.n_buckets
    assert hs.merge_rows() >= 0
    est2 = {r["key"]: r["n_distinct"] for r in hs.estimates().collect()}
    assert est2 == est
