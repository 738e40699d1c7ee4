"""Persistent per-key approximate-distinct: an HLL sketch store
maintained per micro-batch.

The batch side already profiles cardinalities with one-shot sketches
(`sketch_events_profile`); a streaming ingest pipeline needs the same
answer CONTINUOUSLY — "distinct users per event type so far", "distinct
shingles per source so far" — without recounting history every batch
(exact distinct over all history re-shuffles the full corpus per
micro-batch) and without unbounded stream state (the exact seen-set per
key IS the corpus). Datasketches HLL is the textbook fit because union
is register-wise max:

- APPEND-ONLY: each batch aggregates to one (key, sketch) row per key
  it touches and appends — history files are never rewritten on the
  hot path (the FingerprintStore discipline, dedup_store.py);
- serve-time `estimates()` is hll_union_agg over each key's sketch
  rows, a single groupBy ON THE BUCKET KEY — the store scan feeds the
  aggregate through its bucket layout with no exchange (pinned in
  tests/test_sketch_store.py);
- REPLAY-IDEMPOTENT BY ALGEBRA: union takes the register-wise max, so
  re-appending a replayed batch's sketches cannot change any estimate
  (max is idempotent) — exactly-once needs no commit-record table
  here, a torn or replayed batch costs duplicate rows only, and
  `merge_rows()` (maintenance) collapses each key back to one row with
  the identical sketch.

Error posture: lg_config_k=12 gives ~1.6% relative STANDARD error
(mean observed 1.5% at 200k/key), 2-3 KB per key — but the max over
many keys rides the sketch's error tail (observed up to ~6-8% worst
key of 32 at 200k cardinality; measured, not gaussian-extrapolated).
The union path adds exactly zero: a 64-slice union was verified
bit-equal to the single-shot sketch per key. The per-key floor is
pinned against exact distinct in tests. Estimates are DETERMINISTIC functions of the input
SET (hashing is seedless), so split-invariance holds exactly: any
batch partitioning of the same rows yields bit-identical estimates.

Reference posture: imtu/InMemoryTableUpdater.scala:59-88's
maintain-don't-rebuild, applied to profile state.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class HllSketchStore:
    """Append-only (key, sketch) store bucketed by key. `lg_config_k`
    is a build-time commitment (sketches of different precision union
    only with allowDifferentLgConfigK, losing precision); serve calls
    are free."""

    spark: SparkSession
    table: str = "hll_sketches"
    n_buckets: int = 16
    lg_config_k: int = 12

    def _ensure_table(self) -> None:
        if not self.spark.catalog.tableExists(self.table):
            (
                self.spark.createDataFrame([], "key string, sketch binary")
                .write.format("parquet")
                .bucketBy(self.n_buckets, "key")
                .sortBy("key")
                .saveAsTable(self.table)
            )

    def update_batch(
        self, batch: DataFrame, key_col: str = "key", value_col: str = "value"
    ) -> int:
        """foreachBatch body: append one sketch row per key present in
        `batch` over its values. Returns keys touched. Replays are
        estimate-neutral (union is idempotent) — no replay guard
        needed, unlike the count-exact stores."""
        self._ensure_table()
        rows = (
            batch.select(
                F.col(key_col).cast("string").alias("key"),
                F.col(value_col).alias("_v"),
            )
            .groupBy("key")
            .agg(F.hll_sketch_agg("_v", F.lit(self.lg_config_k)).alias("sketch"))
        )
        from dod_etl_spark.streaming.maintenance import bucket_align

        # ≤ one file per bucket per batch (see maintenance.bucket_align)
        rows = bucket_align(rows, "key", self.n_buckets)
        rows.write.insertInto(self.table, overwrite=False)
        self.spark.catalog.refreshTable(self.table)
        return rows.count()

    def estimates(self) -> DataFrame:
        """(key, n_distinct) over ALL history: union each key's sketch
        rows and estimate. The groupBy runs on the bucket key, so the
        store scan aggregates in place — no exchange."""
        if not self.spark.catalog.tableExists(self.table):
            return self.spark.createDataFrame([], "key string, n_distinct long")
        return (
            self.spark.table(self.table)
            .groupBy("key")
            .agg(
                F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_distinct")
            )
        )

    def merge_rows(self) -> int:
        """Maintenance: collapse each key to ONE unioned sketch row
        (bounds storage after many batches/replays at exactly the
        estimate the multi-row form serves). Returns rows removed.
        Combine with compact() for file-count hygiene."""
        if not self.spark.catalog.tableExists(self.table):
            return 0
        rows = self.spark.table(self.table)
        merged = rows.groupBy("key").agg(
            F.hll_union_agg("sketch").alias("sketch")
        )
        before = rows.count()
        merged = merged.localCheckpoint(eager=True)
        after = merged.count()
        if after != before:
            merged.write.insertInto(self.table, overwrite=True)
            self.spark.catalog.refreshTable(self.table)
        return before - after

    def compact(self) -> dict:
        from dod_etl_spark.streaming.maintenance import compact_store

        return compact_store(self.spark, {self.table: "key"}, self.n_buckets)

    def n_rows(self) -> int:
        if not self.spark.catalog.tableExists(self.table):
            return 0
        return self.spark.table(self.table).count()
