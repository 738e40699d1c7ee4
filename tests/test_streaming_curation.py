"""End-to-end streaming curation pipeline: file-stream ingestion ->
quality gate -> persistent-history exact dedup (FingerprintStore) ->
token-window chunking -> parquet sink.

This is the streaming twin of the batch curation queries: the same
operators (quarantine-style filter, dedup_store, chunk_tokens) composed
in a foreachBatch body. Pins the contracts that matter:

- a document's content seen in micro-batch 1 is NOT re-emitted when the
  same content arrives in micro-batch 2 (persistent store, not
  watermark state);
- every surviving document is fully chunked (chunk count matches the
  batch chunker on the deduped corpus);
- the sink is append-only parquet a downstream training job can read.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from dod_etl_spark.operators.chunking import chunk_tokens
from dod_etl_spark.streaming.dedup_store import FingerprintStore


def test_streaming_curation_pipeline(spark, tmp_path):
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    # Two files -> two micro-batches (maxFilesPerTrigger=1).
    # doc 3 repeats doc 1's content; doc 4 is empty (quality-gated).
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 20), (2, "one two three " * 5)],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(3, "alpha beta gamma delta " * 20), (4, ""), (5, "five six seven " * 40)],
        "doc_id long, text string",
    )
    b1.coalesce(1).write.parquet(str(src / "f1"))
    b2.coalesce(1).write.parquet(str(src / "f2"))

    store = FingerprintStore(spark, table=f"cur_store_{uuid.uuid4().hex[:8]}")

    def body(batch, _bid):
        clean = batch.where(F.length("text") > 0)
        fresh = store.dedup_batch(clean)
        chunks = chunk_tokens(fresh, window=16, stride=12)
        chunks.write.mode("append").parquet(out)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = spark.read.parquet(out)
    # Survivors: docs 1, 2, 5 (3 = duplicate content, 4 = quality-gated).
    assert sorted(
        r["doc_id"] for r in got.select("doc_id").distinct().collect()
    ) == [1, 2, 5]
    # Chunk counts match the batch chunker over the deduped corpus.
    survivors = b1.union(b2).where(F.col("doc_id").isin(1, 2, 5))
    want = chunk_tokens(survivors, window=16, stride=12)
    assert got.count() == want.count()
    # Chunk fingerprints are identical to the batch run (same operator).
    assert (
        got.select("doc_id", "chunk_id", "chunk_fp")
        .exceptAll(want.select("doc_id", "chunk_id", "chunk_fp"))
        .count()
        == 0
    )
    # The store recorded exactly the three distinct contents.
    assert store.seen_count() == 3
