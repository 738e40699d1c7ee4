"""Persistent-history exact dedup for streaming ingestion.

`operators/dedup.dedup_stream_exact` (dropDuplicatesWithinWatermark)
bounds its state by the watermark — correct for at-least-once replay
suppression, blind to a duplicate arriving a week later. A training-data
ingest pipeline needs the stronger contract: a document content seen
ONCE is never emitted again, ever. That state cannot live in stream
state (unbounded); it belongs in storage.

FingerprintStore keeps the seen-set as a BUCKETED parquet table keyed
by content fingerprint:

- the store never rewrites: each batch APPENDS its new fingerprints
  (insertInto preserves the bucketing);
- membership is a left-anti join batch-vs-store ON the bucket key, so
  the store side never shuffles — only the (small) micro-batch hashes
  into the bucket layout. At a 10^11-document store that is the
  difference between a per-batch terabyte shuffle and none;
- within-batch duplicates collapse first (min_by arrival), so exactly
  one representative of brand-new content is emitted and recorded.

Reference parity: none (the reference has no dedup surface) —
LLM-pipeline extension per the brief; the shape mirrors how the
dimension snapshots treat storage as the durable state (dimensions.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class FingerprintStore:
    """Append-only seen-fingerprint set backed by a bucketed table.

    `n_buckets` sizes the bucket layout for the TARGET store (e.g.
    ~store_rows x 40B / 256MB); it is fixed at table creation."""

    spark: SparkSession
    table: str = "dedup_fingerprints"
    n_buckets: int = 64

    def _ensure_table(self, fps: DataFrame) -> bool:
        """Create the bucketed store on first use. Returns True if the
        table already existed."""
        if self.spark.catalog.tableExists(self.table):
            return True
        (
            fps.limit(0)
            .write.format("parquet")
            .bucketBy(self.n_buckets, "fp")
            .sortBy("fp")
            .saveAsTable(self.table)
        )
        return False

    def dedup_batch(
        self,
        batch: DataFrame,
        content_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """foreachBatch body: returns the never-seen-before rows of
        `batch` (one representative per content, min id_col wins) and
        records their fingerprints. Callable directly in batch tests."""
        fp = F.md5(F.col(content_col).cast("binary")).alias("fp")
        with_fp = batch.withColumn("fp", fp)
        # Collapse within-batch duplicates first: one survivor per fp.
        survivors = with_fp.groupBy("fp").agg(
            F.min_by(F.struct(*[c for c in with_fp.columns if c != "fp"]), F.col(id_col)).alias("r")
        ).select("fp", "r.*")

        self._ensure_table(survivors.select("fp"))
        seen = self.spark.table(self.table)
        fresh = survivors.join(seen, "fp", "left_anti")
        # Materialize ONCE: the emit and the store-append must see the
        # same rows even though the anti-join is lazily re-evaluated
        # (appending first would erase fresh on re-evaluation).
        fresh = fresh.localCheckpoint(eager=True)
        fresh.select("fp").write.insertInto(self.table, overwrite=False)
        # foreachBatch hands us a DataFrame bound to a CLONED session;
        # the append above commits through that clone, leaving the main
        # session's cached file listing for the table stale. Without the
        # refresh the next micro-batch anti-joins against yesterday's
        # seen-set and re-emits content it just recorded.
        self.spark.catalog.refreshTable(self.table)
        return fresh.drop("fp")

    def seen_count(self) -> int:
        if not self.spark.catalog.tableExists(self.table):
            return 0
        return self.spark.table(self.table).count()
