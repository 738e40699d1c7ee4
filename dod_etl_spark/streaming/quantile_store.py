"""Persistent per-key quantiles: a log-binned histogram store
maintained per micro-batch.

The batch side answers "p50/p95/p99 value per event type" with one-shot
percentile aggregates; a streaming ingest needs the same answer
CONTINUOUSLY without re-scanning history each batch. The mergeable
summary here is the fixed LOG-BINNED HISTOGRAM — bin(v) =
floor(ln v / ln(1+eps)) — because histogram merge is exact integer
addition (unlike GK/t-digest merges, whose results depend on merge
order) and the quantile error is a DESIGN CONSTANT, not a data
property: the ceil(q*n)-th value lies in the bin the cumulative counts
say it does (an EXACT statement, pinned in tests against per-element
rank math), and the served point estimate — the bin's geometric
midpoint — is within a factor sqrt(1+eps) of any value in that bin
(~0.5% at the default eps=0.01).

Storage: one bucketed-by-key table of (batch_id, key, bin, n) rows plus
a one-row-per-batch commit table (the NearDupStore batch-granular
posture):

- APPEND-ONLY hot path: each batch aggregates to its touched
  (key, bin) cells and appends; history files are never rewritten.
- COMMIT-GATED VISIBILITY: serve() semi-filters the histogram scan to
  committed batch_ids (broadcast — the commit table is one row per
  batch). A crash between the histogram append and the commit leaves
  orphan rows that serve IGNORES.
- REPLAY-SAFE WITHOUT repair(): a replayed batch recomputes the SAME
  (batch_id, key, bin, n) cells (the aggregation is deterministic), so
  duplicate appended copies are INERT — serve takes max(n) per
  (batch_id, key, bin) before summing across batches (max of equal
  values; the VectorIndexStore inert-duplicate posture). An
  already-committed batch_id short-circuits to a no-op.
- SPLIT-INVARIANCE IS EXACT: counts add, so any partitioning of the
  same rows into batches serves bit-identical histograms (pinned as
  equality, the HllSketchStore convention).

Serve shape: both aggregations group by (key, ...) supersets of the
bucket key, so the store scan feeds them through its bucket layout with
no store-side exchange (pinned in tests/test_quantile_store.py).

Reference posture: imtu/InMemoryTableUpdater.scala:59-88's
maintain-don't-rebuild discipline, applied to distribution state.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Integer sentinels ordering negative < zero < positive bins. With
# eps >= 1e-4, |floorlog| <= ~7e6 over the double range, far inside
# the 1e8 / 1e9 sentinel gaps.
_ZERO_BIN = -(10**8)
_NEG_BASE = -(10**9)


def value_bin(v: Column, eps: float) -> Column:
    """Sign-aware log bin: order-preserving BIGINT with relative width
    (1+eps) per bin on each side of zero."""
    w = math.log1p(eps)
    pos = F.floor(F.log(v) / F.lit(w))
    neg = F.lit(_NEG_BASE) - F.floor(F.log(-v) / F.lit(w))
    return (
        F.when(v > 0, pos)
        .when(v < 0, neg)
        .otherwise(F.lit(_ZERO_BIN))
        .cast("long")
    )


def bin_midpoint(bin_col: Column, eps: float) -> Column:
    """Deterministic point estimate for a bin: geometric midpoint
    (1+eps)^(b+0.5), mirrored for negative bins, 0 for the zero bin —
    within a factor sqrt(1+eps) of every value the bin holds."""
    w = math.log1p(eps)
    pos = F.exp((bin_col.cast("double") + F.lit(0.5)) * F.lit(w))
    neglog = (F.lit(_NEG_BASE) - bin_col).cast("double")
    neg = -F.exp((neglog + F.lit(0.5)) * F.lit(w))
    return (
        F.when(bin_col == _ZERO_BIN, F.lit(0.0))
        .when(bin_col > _ZERO_BIN, pos)
        .otherwise(neg)
    )


@dataclass
class QuantileStore:
    """Append-only per-key log-binned histogram, bucketed by key.
    `eps` is a build-time commitment (bins of different widths don't
    merge); serve calls are free to vary their probes."""

    spark: SparkSession
    table: str = "quantile_hist"
    commits_table: str = "quantile_commits"
    n_buckets: int = 16
    eps: float = 0.01

    def _ensure_tables(self) -> None:
        if not self.spark.catalog.tableExists(self.table):
            (
                self.spark.createDataFrame(
                    [], "batch_id long, key string, bin long, n long"
                )
                .write.format("parquet")
                .bucketBy(self.n_buckets, "key")
                .sortBy("key")
                .saveAsTable(self.table)
            )
        if not self.spark.catalog.tableExists(self.commits_table):
            self.spark.createDataFrame([], "batch_id long").write.format(
                "parquet"
            ).saveAsTable(self.commits_table)

    def _committed(self, as_of_batch: int | None = None) -> DataFrame:
        """Committed batch_ids; with `as_of_batch`, only batches <= it —
        the time-travel window (the commit log IS a version history,
        so serving any historical prefix is a filter, not a rebuild).
        merge_rows() collapses history to sentinel -1 and forfeits
        pre-merge granularity: the storage-bound trade."""
        out = self.spark.table(self.commits_table).select("batch_id").distinct()
        if as_of_batch is not None:
            out = out.filter(F.col("batch_id") <= as_of_batch)
        return out

    def update_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        key_col: str = "key",
        value_col: str = "value",
    ) -> int:
        """foreachBatch body: histogram `batch` per key and append its
        cells under `batch_id` (the replay-stable foreachBatch id),
        then commit. Returns cells appended (0 on a committed replay).

        Append order cells -> commit closes both crash windows:
        pre-commit orphans are invisible to serve() and a replay's
        duplicate copies are inert (max-per-cell); post-commit replays
        short-circuit here."""
        self._ensure_tables()
        already = (
            self._committed().filter(F.col("batch_id") == batch_id).count() > 0
        )
        if already:
            return 0
        cells = (
            batch.select(
                F.col(key_col).cast("string").alias("key"),
                value_bin(F.col(value_col).cast("double"), self.eps).alias("bin"),
            )
            .filter(F.col("key").isNotNull())
            .groupBy("key", "bin")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(batch_id).cast("long").alias("batch_id"), "key", "bin", "n")
        )
        from dod_etl_spark.streaming.maintenance import bucket_align

        n_cells = cells.count()
        bucket_align(cells, "key", self.n_buckets).write.insertInto(
            self.table, overwrite=False
        )
        self.spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).write.insertInto(self.commits_table, overwrite=False)
        self.spark.catalog.refreshTable(self.table)
        self.spark.catalog.refreshTable(self.commits_table)
        return n_cells

    def histogram(self, as_of_batch: int | None = None) -> DataFrame:
        """(key, bin, n) over all COMMITTED batches: semi-filter to the
        broadcast commit set, collapse replay duplicates with max, sum
        across batches — both grouped on bucket-key supersets, so the
        store scan never exchanges. `as_of_batch` time-travels to the
        state after that batch committed (pinned equal to a fresh
        store fed the same prefix)."""
        self._ensure_tables()
        rows = self.spark.table(self.table).join(
            F.broadcast(self._committed(as_of_batch)), "batch_id", "left_semi"
        )
        return (
            rows.groupBy("key", "bin", "batch_id")
            .agg(F.max("n").alias("n"))
            .groupBy("key", "bin")
            .agg(F.sum("n").alias("n"))
        )

    def quantiles(
        self, probs: list[float], as_of_batch: int | None = None
    ) -> DataFrame:
        """(key, p, n_total, bin, estimate) per requested probability:
        the bin holding the ceil(p*n)-th smallest value (exact integer
        rank walk over the sorted cells) and its geometric-midpoint
        estimate. Cells-per-key is bounded by the bin count (a design
        constant), so the per-key collect_list is metadata-sized."""
        hist = self.histogram(as_of_batch)
        packed = hist.groupBy("key").agg(
            F.array_sort(F.collect_list(F.struct("bin", "n"))).alias("cells"),
            F.sum("n").alias("n_total"),
        )
        out = packed.select(
            "key",
            "n_total",
            "cells",
            F.explode(
                F.array(*[F.lit(float(p)) for p in probs])
            ).alias("p"),
        )
        target = F.greatest(
            F.ceil(F.col("p") * F.col("n_total")).cast("long"), F.lit(1)
        )
        found = F.aggregate(
            F.col("cells"),
            F.struct(
                F.lit(0).cast("long").alias("cum"),
                F.lit(None).cast("long").alias("bin"),
            ),
            lambda acc, c: F.struct(
                (acc["cum"] + c["n"]).alias("cum"),
                F.when(
                    acc["bin"].isNull() & (acc["cum"] + c["n"] >= target), c["bin"]
                )
                .otherwise(acc["bin"])
                .alias("bin"),
            ),
        )["bin"]
        return out.select(
            "key",
            "p",
            "n_total",
            found.alias("bin"),
            bin_midpoint(found, self.eps).alias("estimate"),
        )

    def merge_rows(self) -> int:
        """Maintenance: collapse history to ONE row per (key, bin)
        under a single synthetic committed batch — serves identically
        (counts are already the committed max-then-sum). The ORIGINAL
        commit records are kept: an old batch_id replayed after a
        checkpoint loss still short-circuits as already-committed
        instead of re-appending into the merged history (its rows are
        gone, but a committed id with zero rows is harmless). Returns
        rows removed. Combine with compact() for file hygiene."""
        self._ensure_tables()
        hist = self.histogram().localCheckpoint(eager=True)
        before = self.spark.table(self.table).count()
        merged = hist.select(
            F.lit(-1).cast("long").alias("batch_id"), "key", "bin", "n"
        ).localCheckpoint(eager=True)
        from dod_etl_spark.streaming.maintenance import bucket_align

        # merged/checkpointed first, so the overwrite never reads the
        # table it truncates; insertInto(overwrite=True) is the
        # truncate-and-swap in one statement. The -1 commit record is
        # appended BEFORE the overwrite: an early -1 with zero rows is
        # harmless, while the reverse order loses the whole history if
        # we crash between overwrite and commit (only uncommitted -1
        # rows would remain).
        if (
            self._committed().filter(F.col("batch_id") == -1).count() == 0
        ):
            self.spark.createDataFrame(
                [(-1,)], "batch_id long"
            ).write.insertInto(self.commits_table, overwrite=False)
        bucket_align(merged, "key", self.n_buckets).write.insertInto(
            self.table, overwrite=True
        )
        self.spark.catalog.refreshTable(self.table)
        self.spark.catalog.refreshTable(self.commits_table)
        return before - merged.count()

    def compact(self) -> dict:
        from dod_etl_spark.streaming.maintenance import compact_store

        return compact_store(
            self.spark,
            {self.table: "key", self.commits_table: None},
            self.n_buckets,
        )
