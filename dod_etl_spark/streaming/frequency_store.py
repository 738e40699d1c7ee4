"""Persistent per-key heavy hitters: a Count-Min + candidate store
maintained per micro-batch.

Completes the profile-store triad — HllSketchStore answers "how many
DISTINCT values per key", QuantileStore "how are numeric values
DISTRIBUTED", this store "WHICH values dominate" — with the same
append-only, commit-gated, maintain-don't-rebuild posture.

Two mergeable structures per batch (both exact-merge, both bounded):

- CM CELLS (batch_id, key, depth, bucket, n): the deterministic
  Count-Min sketch of functions/sketches.py (md5-prefix hashing — the
  oracle-checkable construction), built from the batch's per-(key,
  value) EXACT counts so the depth-fanout explodes distinct values,
  not occurrences. Counter merge is integer addition: split invariance
  of the summed sketch is an EQUALITY.
- CANDIDATES (batch_id, key, value, n): each batch's exact top-m
  values per key. CM alone cannot enumerate values; the candidate
  union is the standard companion heap, distributed. A value that is
  globally heavy but never makes any single batch's top-m is missed —
  that is the documented CM+heap recall bound (the classic trade; the
  tests pin that a persistent heavy hitter IS caught), while served
  COUNTS are CM upper bounds (exact when the key's value set doesn't
  collide, overcount otherwise — never undercount).

Replay/crash posture is QuantileStore's, shared machinery included:
batch-granular commit records gate visibility; a replayed batch
recomputes identical rows, so duplicates are inert (max-per-cell
before the cross-batch sum); an already-committed batch_id is a no-op.

Serve shape: CM aggregation groups on bucket-key supersets (store scan
feeds it through the bucket layout, no store-side exchange — pinned);
the candidate probe set is (keys x top_m) rows and broadcasts into the
CM frame.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dod_etl_spark.functions.sketches import cm_bucket


@dataclass
class FrequencyStore:
    """Append-only per-key CM + candidate tables, bucketed by key.
    `depth`/`width`/`top_m` are build-time commitments (cells of
    different geometry don't merge)."""

    spark: SparkSession
    cm_table: str = "freq_cm"
    cand_table: str = "freq_cand"
    commits_table: str = "freq_commits"
    n_buckets: int = 16
    depth: int = 4
    width: int = 1024
    top_m: int = 32

    def _ensure_tables(self) -> None:
        if not self.spark.catalog.tableExists(self.cm_table):
            (
                self.spark.createDataFrame(
                    [], "batch_id long, key string, depth int, bucket long, n long"
                )
                .write.format("parquet")
                .bucketBy(self.n_buckets, "key")
                .sortBy("key")
                .saveAsTable(self.cm_table)
            )
        if not self.spark.catalog.tableExists(self.cand_table):
            (
                self.spark.createDataFrame(
                    [], "batch_id long, key string, value string, n long"
                )
                .write.format("parquet")
                .bucketBy(self.n_buckets, "key")
                .sortBy("key")
                .saveAsTable(self.cand_table)
            )
        if not self.spark.catalog.tableExists(self.commits_table):
            self.spark.createDataFrame([], "batch_id long").write.format(
                "parquet"
            ).saveAsTable(self.commits_table)

    def _committed(self, as_of_batch: int | None = None) -> DataFrame:
        """Committed batch_ids; `as_of_batch` time-travels to batches
        <= it (merge_rows() collapses history to sentinel -1 and
        forfeits pre-merge granularity)."""
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
        """foreachBatch body: exact per-(key, value) counts once, then
        CM cells (depth-fanout over DISTINCT values) and the exact
        per-key top-m candidates, appended under `batch_id`, then the
        commit. Returns candidate rows appended (0 on a committed
        replay)."""
        self._ensure_tables()
        if self._committed().filter(F.col("batch_id") == batch_id).count() > 0:
            return 0
        counted = (
            batch.select(
                F.col(key_col).cast("string").alias("key"),
                F.col(value_col).cast("string").alias("value"),
            )
            .filter(F.col("key").isNotNull() & F.col("value").isNotNull())
            .groupBy("key", "value")
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        cells = (
            counted.select(
                "key",
                "n",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(j).alias("depth"),
                                cm_bucket("value", j, self.width).alias("bucket"),
                            )
                            for j in range(self.depth)
                        ]
                    )
                ).alias("p"),
            )
            .groupBy("key", F.col("p.depth").alias("depth"), F.col("p.bucket").alias("bucket"))
            .agg(F.sum("n").alias("n"))
            .select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                "key", "depth", "bucket", "n",
            )
        )
        w = Window.partitionBy("key").orderBy(F.desc("n"), F.asc("value"))
        cands = (
            counted.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= self.top_m)
            .select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                "key", "value", "n",
            )
        )
        from dod_etl_spark.streaming.maintenance import bucket_align

        n_cands = cands.count()
        bucket_align(cells, "key", self.n_buckets).write.insertInto(
            self.cm_table, overwrite=False
        )
        bucket_align(cands, "key", self.n_buckets).write.insertInto(
            self.cand_table, overwrite=False
        )
        self.spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).write.insertInto(self.commits_table, overwrite=False)
        for t in (self.cm_table, self.cand_table, self.commits_table):
            self.spark.catalog.refreshTable(t)
        return n_cands

    def cm_cells(self, as_of_batch: int | None = None) -> DataFrame:
        """(key, depth, bucket, n) over all COMMITTED batches —
        max-per-batch (replay-duplicate collapse) then cross-batch sum,
        both through the bucket layout. `as_of_batch` time-travels."""
        self._ensure_tables()
        rows = self.spark.table(self.cm_table).join(
            F.broadcast(self._committed(as_of_batch)), "batch_id", "left_semi"
        )
        return (
            rows.groupBy("key", "depth", "bucket", "batch_id")
            .agg(F.max("n").alias("n"))
            .groupBy("key", "depth", "bucket")
            .agg(F.sum("n").alias("n"))
        )

    def candidates(self, as_of_batch: int | None = None) -> DataFrame:
        """(key, value) committed candidate union (distinct)."""
        self._ensure_tables()
        rows = self.spark.table(self.cand_table).join(
            F.broadcast(self._committed(as_of_batch)), "batch_id", "left_semi"
        )
        return rows.select("key", "value").distinct()

    def heavy_hitters(
        self, k: int = 10, as_of_batch: int | None = None
    ) -> DataFrame:
        """(key, value, est, rank): top-k candidate values per key by
        CM estimate (min across depth rows — an upper bound on the true
        count, exact when the key's values don't collide in any row).
        The probe set is (keys x top_m) rows — broadcast into the CM
        frame; ties break on value for determinism."""
        cm = self.cm_cells(as_of_batch)
        probes = self.candidates(as_of_batch).select(
            "key",
            "value",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("depth"),
                            cm_bucket("value", j, self.width).alias("bucket"),
                        )
                        for j in range(self.depth)
                    ]
                )
            ).alias("p"),
        ).select("key", "value", F.col("p.depth").alias("depth"), F.col("p.bucket").alias("bucket"))
        est = (
            cm.join(F.broadcast(probes), ["key", "depth", "bucket"])
            .groupBy("key", "value")
            .agg(F.min("n").alias("est"))
        )
        w = Window.partitionBy("key").orderBy(F.desc("est"), F.asc("value"))
        return (
            est.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("key", "value", "est", F.col("rank").cast("long").alias("rank"))
        )

    def merge_rows(self) -> int:
        """Maintenance: collapse both tables to the committed aggregate
        under one synthetic batch; serves identically. Original commit
        records are kept (the QuantileStore posture): an old batch_id
        replayed after checkpoint loss still short-circuits instead of
        re-appending into merged history. Returns rows removed."""
        self._ensure_tables()
        cm = self.cm_cells().localCheckpoint(eager=True)
        cand = self.candidates().localCheckpoint(eager=True)
        before = (
            self.spark.table(self.cm_table).count()
            + self.spark.table(self.cand_table).count()
        )
        from dod_etl_spark.streaming.maintenance import bucket_align

        merged_cm = cm.select(
            F.lit(-1).cast("long").alias("batch_id"), "key", "depth", "bucket", "n"
        )
        # candidate counts are per-batch artifacts; the merged row
        # keeps the value with n=0 (serve re-estimates from CM anyway).
        merged_cand = cand.select(
            F.lit(-1).cast("long").alias("batch_id"),
            "key", "value", F.lit(0).cast("long").alias("n"),
        )
        # -1 commit record FIRST (guarded against replayed merges): an
        # early sentinel with zero rows is harmless, while committing
        # last loses the whole history on a crash between the
        # overwrites and the commit (only uncommitted -1 rows remain).
        if (
            self._committed().filter(F.col("batch_id") == -1).count() == 0
        ):
            self.spark.createDataFrame(
                [(-1,)], "batch_id long"
            ).write.insertInto(self.commits_table, overwrite=False)
        bucket_align(merged_cm, "key", self.n_buckets).write.insertInto(
            self.cm_table, overwrite=True
        )
        bucket_align(merged_cand, "key", self.n_buckets).write.insertInto(
            self.cand_table, overwrite=True
        )
        for t in (self.cm_table, self.cand_table, self.commits_table):
            self.spark.catalog.refreshTable(t)
        after = merged_cm.count() + merged_cand.count()
        return before - after

    def compact(self) -> dict:
        from dod_etl_spark.streaming.maintenance import compact_store

        return compact_store(
            self.spark,
            {
                self.cm_table: "key",
                self.cand_table: "key",
                self.commits_table: None,
            },
            self.n_buckets,
        )
