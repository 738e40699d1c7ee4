"""Streaming C4 line/segment dedup: corpus-wide first-occurrence
segment suppression maintained across micro-batches.

The batch operator (operators/segment_dedup.py) keeps one global copy
of every duplicated segment and rebuilds documents from survivors; a
streaming ingest needs the same contract ACROSS batches — a license
paragraph that arrived last week must not survive in today's crawl —
without rescanning history. SegmentStore keeps the seen-segment
fingerprint set as an append-only bucketed table (the FingerprintStore
posture at segment granularity) and scrubs each micro-batch against it:

- within the batch, the batch operator's exact winner rule applies
  (min (doc_id, pos) per segment — one aggregation, no join back onto
  the segment stream);
- against history, winners anti-join the committed fingerprint set on
  the bucket key (store side never shuffles);
- fresh fingerprints append under the batch's replay-stable batch_id,
  then a one-row commit record lands (the NearDupStore batch-granular
  posture): probing EXCLUDES uncommitted batches AND the current
  batch_id, which closes both crash windows — pre-commit orphans are
  inert, and a post-commit replay re-emits instead of suppressing
  itself. Duplicate fp rows are membership rows: inert.

Prefix equality: over batches ingested in increasing doc_id order, the
emitted scrub of everything so far is bit-identical to the BATCH
operator over the union (first-committed-batch wins == global
min(doc_id, pos)); pinned in tests/test_segment_store.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dod_etl_spark.operators.segment_dedup import segment_docs


@dataclass
class SegmentStore:
    """Append-only seen-segment set, bucketed by fingerprint. The
    segmenter geometry is a build-time commitment."""

    spark: SparkSession
    table: str = "segment_fps"
    commits_table: str = "segment_commits"
    n_buckets: int = 64
    mode: str = "words"
    seg_words: int = 10
    line_sep: str = "\n"

    def _ensure_tables(self) -> None:
        if not self.spark.catalog.tableExists(self.table):
            (
                self.spark.createDataFrame([], "batch_id long, fp string")
                .write.format("parquet")
                .bucketBy(self.n_buckets, "fp")
                .sortBy("fp")
                .saveAsTable(self.table)
            )
        if not self.spark.catalog.tableExists(self.commits_table):
            self.spark.createDataFrame([], "batch_id long").write.format(
                "parquet"
            ).saveAsTable(self.commits_table)

    def scrub_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """foreachBatch body: (doc_id, n_segs, n_kept, text_dedup) for
        every document of `batch`, keeping only segments seen neither
        in committed history nor earlier in this batch; records the
        fresh fingerprints. Replays re-emit identically (the current
        batch_id is excluded from the probe set)."""
        self._ensure_tables()
        joiner = " " if self.mode == "words" else self.line_sep
        segs = segment_docs(
            batch, id_col, text_col,
            mode=self.mode, seg_words=self.seg_words, line_sep=self.line_sep,
        ).withColumn("fp", F.md5(F.col("seg").cast("binary")))
        winners = segs.groupBy("fp").agg(
            F.min(F.struct("id", "pos", "seg")).alias("w")
        )
        committed = (
            self.spark.table(self.commits_table)
            .select("batch_id")
            .filter(F.col("batch_id") != batch_id)
            .distinct()
        )
        seen = self.spark.table(self.table).join(
            F.broadcast(committed), "batch_id", "left_semi"
        ).select("fp")
        fresh = winners.join(seen, "fp", "left_anti").localCheckpoint(eager=True)

        from dod_etl_spark.streaming.maintenance import bucket_align

        bucket_align(
            fresh.select(F.lit(batch_id).cast("long").alias("batch_id"), "fp"),
            "fp",
            self.n_buckets,
        ).write.insertInto(self.table, overwrite=False)
        self.spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).write.insertInto(self.commits_table, overwrite=False)
        self.spark.catalog.refreshTable(self.table)
        self.spark.catalog.refreshTable(self.commits_table)

        if self.mode == "lines":
            n_segs = F.size(F.split(F.col(text_col), F.lit(self.line_sep), -1))
        else:
            w = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
            n_segs = F.ceil(F.size(w) / F.lit(float(self.seg_words)))
        counts = batch.select(
            F.col(id_col).alias("id"), n_segs.cast("long").alias("n_segs")
        )
        rebuilt = (
            fresh.select(
                F.col("w.id").alias("id"),
                F.col("w.pos").alias("pos"),
                F.col("w.seg").alias("seg"),
            )
            .groupBy("id")
            .agg(
                F.count(F.lit(1)).alias("n_kept"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                        lambda x: x["seg"],
                    ),
                    joiner,
                ).alias("text_dedup"),
            )
        )
        return counts.join(rebuilt, "id", "left").select(
            F.col("id").alias(id_col),
            F.col("n_segs"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
        )

    def seen_count(self) -> int:
        if not self.spark.catalog.tableExists(self.table):
            return 0
        committed = self.spark.table(self.commits_table).select("batch_id").distinct()
        return (
            self.spark.table(self.table)
            .join(F.broadcast(committed), "batch_id", "left_semi")
            .select("fp")
            .distinct()
            .count()
        )

    def compact(self) -> dict:
        from dod_etl_spark.streaming.maintenance import compact_store

        return compact_store(
            self.spark,
            {self.table: "fp", self.commits_table: None},
            self.n_buckets,
        )
