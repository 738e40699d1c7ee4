"""Chunk-key encoding for bm25_chunks_topk (advisor r7, low): the cid
span is 2^20 with a raise_error overflow guard — the old *1000 silently
collided a >=1000-chunk document with the next doc_id's chunk 0."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from dod_etl_spark.queries.evals import _CHUNK_KEY_SPAN, _encode_cid


def test_encode_decode_roundtrip(spark):
    df = spark.createDataFrame(
        [(7, 0), (7, 999), (7, 1500), (8, 0), (8, _CHUNK_KEY_SPAN - 1)],
        "doc_id long, chunk_id long",
    )
    out = (
        df.select(_encode_cid(F.col("doc_id"), F.col("chunk_id")).alias("cid"))
        .select(
            F.shiftright("cid", 20).alias("doc_id"),
            F.col("cid").bitwiseAND(F.lit(_CHUNK_KEY_SPAN - 1)).alias("chunk_id"),
        )
        .collect()
    )
    assert sorted((r.doc_id, r.chunk_id) for r in out) == [
        (7, 0), (7, 999), (7, 1500), (8, 0), (8, _CHUNK_KEY_SPAN - 1),
    ]


def test_old_span_would_collide_new_span_does_not(spark):
    """doc 7 chunk 1500 vs doc 8 chunk 0: under *1000 both encoded to
    8500 <-> (8, 500)-adjacent keyspace; under 2^20 they stay distinct
    and decode losslessly (covered by the roundtrip above). Pin the old
    collision explicitly so the regression is legible."""
    old = [(7 * 1000 + 1500), (8 * 1000 + 500)]
    assert old[0] == old[1], "the old encoding collided exactly here"


def test_encode_overflow_raises(spark):
    df = spark.createDataFrame([(1, 4)], "doc_id long, chunk_id long")
    with pytest.raises(Exception) as ei:
        df.select(_encode_cid(F.col("doc_id"), F.col("chunk_id"), span=4)).collect()
    assert "overflows" in str(ei.value)


def test_encode_guard_not_pruned_by_catalyst(spark):
    """The guard lives inside the key expression, so selecting the cid
    (as every consumer does) must evaluate it even when other columns
    are projected away."""
    df = spark.createDataFrame(
        [(1, 2, "keep"), (1, 9, "boom")], "doc_id long, chunk_id long, text string"
    )
    enc = df.select(
        _encode_cid(F.col("doc_id"), F.col("chunk_id"), span=4).alias("cid"), "text"
    )
    with pytest.raises(Exception):
        enc.select("cid").collect()
