"""Incremental n-gram language model: a persistent bigram-count store
maintained per micro-batch, serving Kneser-Ney scoring.

The batch side trains and scores in one plan (`kn_lm_score_docs`,
queries/quality.py) — the CCNet-style fluency filter. A streaming
ingest pipeline needs the same scores CONTINUOUSLY as training text
accumulates, without re-counting the full history per micro-batch
(re-tokenizing 100 TB of train text to absorb a day's crawl is the
anti-pattern every store in this package exists to avoid). This store
applies the maintain-don't-rebuild posture (reference:
imtu/InMemoryTableUpdater.scala:59-88) to the MODEL STATE itself:

- bigram counts are ADDITIVE, so history is an append-only table of
  per-batch pre-aggregated (batch_id, w1, w2, c2) rows bucketed by w1;
  serving sums across batches ON the bucket layout (no store-side
  exchange — grouping keys always contain the bucket key);
- exactly-once under at-least-once delivery is the QuantileStore
  protocol: counts append -> doc commit rows append -> one-row batch
  commit record LAST. Pre-commit orphans are invisible (serve
  semi-joins committed batch_ids); a committed replay short-circuits;
  a TORN replay re-appends byte-identical rows under the same
  batch_id, which the serve-side max-per-(key,batch) collapse makes
  inert — counts stay exact, not approximately-once;
- a doc-level replay guard (committed doc_ids, broadcast-anti-join)
  keeps a document's bigrams from training twice even when a re-crawl
  delivers it under a NEW batch_id.

KN model derivation at serve time is three map-combined aggregations
off the summed c2 frame plus one broadcast scalar — identical
arithmetic to the batch query (exact integer millionths, discount 3/4;
see the derivation comment in queries/quality.py), pinned bit-identical
in tests/test_lm_store.py: a store fed ANY batch split of the train
corpus scores every document exactly as the from-scratch batch plan.

Tombstone scope note: per the documented rule (streaming/tombstones.py
+ round-8 scope decision), compliance deletes apply to SERVING indexes;
model statistics are aggregate corpus state — removing one document's
counts requires re-aggregating its batch, which is `retrain without
it`, not an index delete. Deliberately NOT tombstone-aware.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MICRO = 1_000_000


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per bigram OCCURRENCE, the exact
    tokenizer of kn_lm_score_docs (lower, split on single space, drop
    empties, docs with >= 2 tokens)."""
    tk = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    toks = df.select(F.col(id_col).alias("doc_id"), tk.alias("tk")).filter(
        F.size("tk") >= 2
    )
    bigram = F.transform(
        F.sequence(F.lit(1), F.size("tk") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("tk"), i), F.element_at(F.col("tk"), i + 1)
        ),
    )
    return toks.select("doc_id", F.explode(bigram).alias("bigram")).select(
        "doc_id",
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w2"),
    )


def kn_score_frame(bg: DataFrame, c2: DataFrame) -> DataFrame:
    """Score a (doc_id, w1, w2) bigram stream against a (w1, w2, c2)
    count model — the exact-integer interpolated-KN core shared by the
    batch query and the store (same expressions, same joins; parity is
    pinned bit-identical in tests/test_lm_store.py)."""
    c2 = c2.localCheckpoint(eager=True)
    ctx = c2.groupBy("w1").agg(
        F.sum("c2").cast("long").alias("c1"), F.count(F.lit(1)).alias("n1")
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("nc"))
    nbb = F.broadcast(c2.agg(F.count(F.lit(1)).alias("nbb")))
    return (
        bg.join(c2, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(nbb)
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN c1 IS NOT NULL THEN "
                f"((greatest(4 * coalesce(c2, 0) - 3, 0) * nbb "
                f"  + 3 * n1 * coalesce(nc, 0)) * {_MICRO}) "
                "div (4 * c1 * nbb) "
                f"ELSE (coalesce(nc, 0) * {_MICRO}) div nbb END"
            ).alias("micro"),
            F.expr("CASE WHEN c1 IS NULL THEN 1 ELSE 0 END").alias("oov_ctx"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("oov_ctx").cast("long").alias("n_oov_ctx"),
            F.expr("sum(micro) div count(1)").cast("long").alias("avg_microprob"),
        )
    )


@dataclass
class NgramLmStore:
    """Append-only bigram-count store backed by three tables: counts
    (bucketed by w1), doc commit records (bucketed by doc_id), and the
    batch commit log."""

    spark: SparkSession
    table: str = "lm_bigrams"
    docs_table: str = "lm_docs"
    commits_table: str = "lm_commits"
    n_buckets: int = 16

    def _ensure_tables(self) -> None:
        if not self.spark.catalog.tableExists(self.table):
            (
                self.spark.createDataFrame(
                    [], "batch_id long, w1 string, w2 string, c2 long"
                )
                .write.format("parquet")
                .bucketBy(self.n_buckets, "w1")
                .sortBy("w1")
                .saveAsTable(self.table)
            )
        if not self.spark.catalog.tableExists(self.docs_table):
            (
                self.spark.createDataFrame([], "batch_id long, doc_id long")
                .write.format("parquet")
                .bucketBy(self.n_buckets, "doc_id")
                .sortBy("doc_id")
                .saveAsTable(self.docs_table)
            )
        if not self.spark.catalog.tableExists(self.commits_table):
            self.spark.createDataFrame([], "batch_id long").write.format(
                "parquet"
            ).saveAsTable(self.commits_table)

    def _committed(self, as_of_batch: int | None = None) -> DataFrame:
        """Committed batch_ids; `as_of_batch` time-travels to batches
        <= it — "score with yesterday's model" is a filter on the
        commit log, not a rebuild. merge_batches() collapses history
        to sentinel -1 and forfeits pre-merge granularity."""
        out = self.spark.table(self.commits_table).select("batch_id").distinct()
        if as_of_batch is not None:
            out = out.filter(F.col("batch_id") <= as_of_batch)
        return out

    def _committed_docs(self, as_of_batch: int | None = None) -> DataFrame:
        return self.spark.table(self.docs_table).join(
            F.broadcast(self._committed(as_of_batch)), "batch_id", "left_semi"
        )

    def update_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> int:
        """foreachBatch body: fold the never-seen documents of `batch`
        into the model. Returns documents absorbed (0 on a committed
        replay). Append order counts -> docs -> commit closes both
        crash windows (see module docstring)."""
        self._ensure_tables()
        if self._committed().filter(F.col("batch_id") == batch_id).count() > 0:
            return 0
        deduped = (
            batch.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
            .groupBy("doc_id")
            .agg(F.min("_t").alias("_t"))
        )
        fresh = deduped.join(
            self._committed_docs().select("doc_id"), "doc_id", "left_anti"
        ).localCheckpoint(eager=True)
        n_docs = fresh.count()
        counts = (
            _doc_bigrams(fresh, "doc_id", "_t")
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("c2"))
            .select(
                F.lit(batch_id).cast("long").alias("batch_id"), "w1", "w2", "c2"
            )
        )
        from dod_etl_spark.streaming.maintenance import bucket_align

        bucket_align(counts, "w1", self.n_buckets).write.insertInto(
            self.table, overwrite=False
        )
        bucket_align(
            fresh.select(
                F.lit(batch_id).cast("long").alias("batch_id"), "doc_id"
            ),
            "doc_id",
            self.n_buckets,
        ).write.insertInto(self.docs_table, overwrite=False)
        self.spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).write.insertInto(self.commits_table, overwrite=False)
        for t in (self.table, self.docs_table, self.commits_table):
            self.spark.catalog.refreshTable(t)
        return n_docs

    def model(self, as_of_batch: int | None = None) -> DataFrame:
        """(w1, w2, c2) over all COMMITTED batches: semi-filter to the
        broadcast commit set, collapse torn-replay duplicates with max
        per (key, batch), sum across batches — every grouping contains
        the bucket key, so the store scan never exchanges.
        `as_of_batch` serves the model as of that batch's commit
        (pinned equal to a fresh store fed the same prefix)."""
        self._ensure_tables()
        rows = self.spark.table(self.table).join(
            F.broadcast(self._committed(as_of_batch)), "batch_id", "left_semi"
        )
        return (
            rows.groupBy("w1", "w2", "batch_id")
            .agg(F.max("c2").alias("c2"))
            .groupBy("w1", "w2")
            .agg(F.sum("c2").cast("long").alias("c2"))
        )

    def score(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        as_of_batch: int | None = None,
    ) -> DataFrame:
        """(doc_id, n_bigrams, n_oov_ctx, avg_microprob) for `docs`
        against the current model (or the model as of `as_of_batch` —
        reproducing a historical filter decision exactly) —
        bit-identical to the batch kn_lm_score_docs plan trained on
        the same ingested corpus."""
        return kn_score_frame(
            _doc_bigrams(docs, id_col, text_col), self.model(as_of_batch)
        )

    def n_train_docs(self, as_of_batch: int | None = None) -> int:
        """Distinct committed doc_ids — distinct because a TORN replay
        re-appends the same (batch_id, doc_id) rows before committing;
        the count collapse that makes torn counts inert (max per
        key+batch) has this distinct as its doc-side twin."""
        self._ensure_tables()
        return (
            self._committed_docs(as_of_batch)
            .select("doc_id")
            .distinct()
            .count()
        )

    def stats(self) -> DataFrame:
        """1-row model-size summary (distinct bigrams, contexts,
        continuations, total occurrences)."""
        m = self.model()
        return m.agg(
            F.count(F.lit(1)).alias("n_bigram_types"),
            F.countDistinct("w1").alias("n_contexts"),
            F.countDistinct("w2").alias("n_continuations"),
            F.sum("c2").cast("long").alias("n_occurrences"),
        )

    def compact(self) -> dict:
        """Rewrite all three tables to ~one file per bucket
        (streaming/maintenance.py); maintenance-window only. Served
        counts are unaffected (bucket specs preserved)."""
        from dod_etl_spark.streaming.maintenance import compact_store

        return compact_store(
            self.spark,
            {self.table: "w1", self.docs_table: "doc_id"},
            self.n_buckets,
        )

    def merge_batches(self) -> int:
        """Maintenance: collapse COMMITTED history to one row per
        (w1, w2) under sentinel batch_id -1 (kept committed), dropping
        per-batch attribution to bound storage at the model size.
        Returns rows removed. Serving is unchanged: the collapse is the
        exact sum the serve path computes. Doc commit records are kept
        (they are the replay guard, FingerprintStore's rule — history
        must outlive its attribution), deduped to one row per doc_id
        (torn replays may have appended duplicates).

        Crash-safety order (QuantileStore.merge_rows' rule): APPEND the
        sentinel -1 commit record FIRST — an early -1 with zero rows is
        harmless (the semi-join finds nothing under it) — then
        overwrite counts, then docs. The commit log itself is never
        overwritten, so at every crash point the union of committed
        rows still serves the exact model: before the counts overwrite
        the per-batch rows are intact and committed; after it the -1
        rows are already committed."""
        self._ensure_tables()
        merged = (
            self.model()
            .select(
                F.lit(-1).cast("long").alias("batch_id"), "w1", "w2", "c2"
            )
            .localCheckpoint(eager=True)
        )
        docs = (
            self._committed_docs()
            .select("doc_id")
            .distinct()
            .select(F.lit(-1).cast("long").alias("batch_id"), "doc_id")
            .localCheckpoint(eager=True)
        )
        before = self.spark.table(self.table).count()
        from dod_etl_spark.streaming.maintenance import bucket_align

        if (
            self._committed().filter(F.col("batch_id") == -1).count() == 0
        ):
            self.spark.createDataFrame(
                [(-1,)], "batch_id long"
            ).write.insertInto(self.commits_table, overwrite=False)
        bucket_align(merged, "w1", self.n_buckets).write.insertInto(
            self.table, overwrite=True
        )
        bucket_align(docs, "doc_id", self.n_buckets).write.insertInto(
            self.docs_table, overwrite=True
        )
        for t in (self.table, self.docs_table, self.commits_table):
            self.spark.catalog.refreshTable(t)
        return before - merged.count()
