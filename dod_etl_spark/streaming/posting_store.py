"""Incremental lexical index: a persistent BM25 posting store
maintained per micro-batch.

The reference's dimension-maintenance loop (InMemoryTableUpdater,
imtu/InMemoryTableUpdater.scala:106-127) treats durable storage as the
state a stream keeps current; FingerprintStore applies that posture to
the seen-fingerprint set. PostingStore applies it to the RETRIEVAL
index: documents stream in, the (tok, doc_id, tf, dl) posting table
and the doc-length table grow append-only, and BM25 search runs
against storage at any moment — no full-corpus re-index per batch
(re-tokenizing 100 TB to add a day's crawl is the anti-pattern this
module exists to avoid).

Storage layout (both append-only, never rewritten on the hot path):

- `postings` bucketed by tok: search prunes to the query vocabulary's
  posting lists and computes document frequency with a window ON the
  bucket layout — the store side never shuffles at serve time;
- `docs` (doc_id, dl) bucketed by doc_id: the replay guard (new-batch
  anti-join, store side never shuffles — FingerprintStore's contract)
  AND the corpus-stats source (n_docs, avgdl), AND the commit record.

Exactly-once: a replayed batch anti-joins to empty against `docs`, so
at-least-once sources cannot double-index (same mechanism as
FingerprintStore). Within one batch, postings append BEFORE the docs
commit record; a crash in between leaves orphan postings that a replay
would duplicate — `repair()` reconciles (one semi-join rewrite) and
belongs in the restart path after an unclean shutdown, mirroring how
the retry buffer recovers via parquet generations.

Search scores through operators/retrieval.bm25_score_and_rank — the
SAME decimal-exact core the batch operator uses, so an incrementally
built index returns bit-identical rankings to a from-scratch batch
index over the same corpus (pinned in tests/test_posting_store.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dod_etl_spark.operators.retrieval import (
    bm25_score_and_rank,
    doc_tokens,
    query_terms,
)


@dataclass
class PostingStore:
    """Append-only BM25 index backed by two bucketed tables."""

    spark: SparkSession
    table: str = "lexical_postings"
    docs_table: str = "lexical_docs"
    n_buckets: int = 64

    def _ensure_tables(self, postings: DataFrame, docs: DataFrame) -> None:
        if not self.spark.catalog.tableExists(self.table):
            (
                postings.limit(0)
                .write.format("parquet")
                .bucketBy(self.n_buckets, "tok")
                .sortBy("tok")
                .saveAsTable(self.table)
            )
        if not self.spark.catalog.tableExists(self.docs_table):
            (
                docs.limit(0)
                .write.format("parquet")
                .bucketBy(self.n_buckets, "doc_id")
                .sortBy("doc_id")
                .saveAsTable(self.docs_table)
            )

    def index_batch(
        self,
        batch: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> int:
        """foreachBatch body: index the never-seen documents of `batch`
        (within-batch duplicate ids collapse to min(text) — one
        deterministic representative); returns how many documents were
        added. Replays add zero."""
        deduped = (
            batch.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
            .groupBy("doc_id")
            .agg(F.min("_t").alias("_t"))
            .select(
                "doc_id",
                F.col("_t").alias("_text"),
                F.size(doc_tokens("_t")).cast("long").alias("dl"),
            )
        )

        self._ensure_tables(
            self.spark.createDataFrame([], "tok string, doc_id long, tf long, dl long"),
            deduped.select("doc_id", "dl").limit(0),
        )
        from dod_etl_spark.streaming.tombstones import exclude_tombstoned

        seen = self.spark.table(self.docs_table)
        # The tombstone anti-join closes the resurrection window: a
        # replayed (or re-crawled) batch cannot re-admit a deleted
        # doc_id even after purge_deleted() removed its commit record.
        fresh = exclude_tombstoned(
            self.spark,
            deduped.join(seen, "doc_id", "left_anti"),
            self.table,
            "doc_id",
        ).localCheckpoint(eager=True)

        postings = (
            fresh.select(
                "doc_id",
                "dl",
                F.explode(doc_tokens("_text")).alias("tok"),
            )
            .groupBy("doc_id", "tok")
            .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
            .select("tok", "doc_id", "tf", "dl")
        )
        # postings first, docs commit record last: a replay after a
        # crash in between re-runs the anti-join against the OLD docs
        # table and would re-append — repair() reconciles that window.
        from dod_etl_spark.streaming.maintenance import bucket_align

        # bucket-aligned appends: ≤ one file per bucket per batch
        # instead of one per (task, bucket)
        bucket_align(postings, "tok", self.n_buckets).write.insertInto(
            self.table, overwrite=False
        )
        bucket_align(
            fresh.select("doc_id", "dl"), "doc_id", self.n_buckets
        ).write.insertInto(self.docs_table, overwrite=False)
        self.spark.catalog.refreshTable(self.table)
        self.spark.catalog.refreshTable(self.docs_table)
        return fresh.count()

    def stats(self) -> DataFrame:
        """1-row (n_docs, avgdl) over the committed, non-deleted corpus
        — identical arithmetic to the batch operator's stats frame
        (tombstoned docs excluded so idf/avgdl match a fresh index over
        the retained corpus exactly)."""
        from dod_etl_spark.streaming.tombstones import exclude_tombstoned

        if not self.spark.catalog.tableExists(self.docs_table):
            return self.spark.createDataFrame([(0, None)], "n_docs long, avgdl double")
        return exclude_tombstoned(
            self.spark, self.spark.table(self.docs_table), self.table, "doc_id"
        ).select(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (
                F.sum(F.col("dl")).cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avgdl"),
        )

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        rational_idf: bool = False,
        query_id_col: str = "query_id",
        query_text_col: str = "query_text",
        exclude_self: bool = False,
    ) -> DataFrame:
        """BM25 top-k against the stored index. Serve cost is bounded
        by the query vocabulary's posting lists: the store prunes
        through a broadcast semi-join on tok, document frequency is a
        window ON the pruned frame (counting committed docs only —
        orphan postings from an unrepaired crash are excluded by the
        docs semi-join), and the bucket layout feeds the tok window
        without a store-side exchange."""
        if not self.spark.catalog.tableExists(self.table):
            # Never-indexed store: no matches, stable schema.
            return self.spark.createDataFrame(
                [], "query_id long, doc_id long, rank long, score double"
            )
        from dod_etl_spark.streaming.tombstones import exclude_tombstoned

        terms = query_terms(queries, query_id_col, query_text_col)
        toks_only = terms.select("tok").distinct()
        # Deleted docs leave the committed set BEFORE the df window, so
        # document frequency (hence idf) reflects the retained corpus.
        committed = exclude_tombstoned(
            self.spark,
            self.spark.table(self.docs_table).select("doc_id"),
            self.table,
            "doc_id",
        )
        plists = (
            self.spark.table(self.table)
            .join(F.broadcast(toks_only), "tok", "left_semi")
            .join(committed, "doc_id", "left_semi")
            .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("tok")))
        )
        joined = plists.join(F.broadcast(terms), "tok")
        return bm25_score_and_rank(
            joined, self.stats(), k, k1, b, rational_idf, exclude_self
        )

    def repair(self) -> int:
        """Remove orphan postings (doc_id absent from the commit
        record) left by a crash between the two appends. One semi-join
        rewrite of the posting table; returns rows removed. Run on
        restart after an unclean shutdown, BEFORE new batches."""
        if not self.spark.catalog.tableExists(self.table):
            return 0
        postings = self.spark.table(self.table)
        docs = self.spark.table(self.docs_table).select("doc_id")
        clean = postings.join(docs, "doc_id", "left_semi").select(
            "tok", "doc_id", "tf", "dl"
        )
        before = postings.count()
        after = clean.count()
        if after != before:
            clean = clean.localCheckpoint(eager=True)
            clean.write.insertInto(self.table, overwrite=True)
            self.spark.catalog.refreshTable(self.table)
        return before - after

    def delete_docs(self, doc_ids) -> int:
        """Compliance delete (right-to-be-forgotten): tombstone the
        given doc_ids (DataFrame with `doc_id`, or an iterable of
        ints). Serving excludes them immediately — rankings, df/idf and
        avgdl all match a fresh index built without them (pinned in
        tests/test_tombstones.py); storage is reclaimed later by
        purge_deleted(). Idempotent; a tombstoned id can never be
        re-indexed, even by an at-least-once replay after purge."""
        from dod_etl_spark.streaming.tombstones import add_tombstones

        return add_tombstones(self.spark, self.table, doc_ids, "doc_id")

    def purge_deleted(self) -> dict:
        """Maintenance-window physical removal of tombstoned docs from
        both tables (checkpoint-then-overwrite, bucket layout
        preserved). The tombstone table is deliberately RETAINED — it
        is the re-admission guard for replayed source batches."""
        from dod_etl_spark.streaming.tombstones import purge_table

        return {
            "postings_removed": purge_table(
                self.spark, self.table, self.table, "doc_id"
            ),
            "docs_removed": purge_table(
                self.spark, self.docs_table, self.table, "doc_id"
            ),
        }

    def n_docs(self) -> int:
        """Serving-corpus size: commit records minus tombstones, so the
        number agrees with search()/stats() even in the delete-to-purge
        window (a tombstoned doc is already out of BM25's df/avgdl).
        Physical pre-purge row counts are a storage detail; read the
        docs table directly if that's what you need."""
        from dod_etl_spark.streaming.tombstones import exclude_tombstoned

        if not self.spark.catalog.tableExists(self.docs_table):
            return 0
        docs = self.spark.table(self.docs_table)
        return exclude_tombstoned(self.spark, docs, self.table, "doc_id").count()

    def compact(self) -> dict:
        """Rewrite postings and commit records to ~one file per bucket
        (streaming/maintenance.py); maintenance-window only. Rankings
        are unaffected — the bucket spec, and therefore the serve
        plan, is preserved (pinned in tests/test_store_compaction.py)."""
        from dod_etl_spark.streaming.maintenance import compact_store

        return compact_store(
            self.spark,
            {self.table: "tok", self.docs_table: "doc_id"},
            self.n_buckets,
        )


@dataclass
class PositionalPostingStore:
    """Append-only POSITIONAL index: the phrase-search serve path
    (queries/lexicon.py phrase_match_docs names this as its
    serve-time twin — batch form is a corpus scan; ad-hoc phrases over
    a standing corpus want posting-list intersection instead).

    Same two-table discipline as PostingStore (postings bucketed by
    tok; (doc_id, dl) commit records bucketed by doc_id; postings
    append first, commit record last; replays anti-join to empty;
    tombstone deletes supported), but each posting row carries the
    token's SORTED 1-based position list. phrase_search() prunes to
    the phrase vocabulary's posting lists (a pushed tok IN (...)
    filter on the bucket layout), aligns each term's positions by
    subtracting its phrase offset, and intersects — the classic
    positional-postings phrase algorithm (Manning et al. IR ch. 2),
    with the intersection running inside one per-doc aggregate row.
    Results are pinned BIT-IDENTICAL to the batch scan
    (tests/test_positional_store.py), including overlapping matches
    and repeated-term phrases ("a a" in "a a a" matches at 1 and 2).

    Scale: serve cost is bounded by the phrase terms' posting lists
    (never the corpus); the one exchange per phrase is the per-doc
    group of those pruned lists. A stop-word phrase term costs its
    full posting list — the standard positional-index caveat; cap or
    reorder rare-term-first at the application layer."""

    spark: SparkSession
    table: str = "positional_postings"
    docs_table: str = "positional_docs"
    n_buckets: int = 64

    def _ensure_tables(self) -> None:
        if not self.spark.catalog.tableExists(self.table):
            (
                self.spark.createDataFrame(
                    [], "tok string, doc_id long, positions array<bigint>, dl long"
                )
                .write.format("parquet")
                .bucketBy(self.n_buckets, "tok")
                .sortBy("tok")
                .saveAsTable(self.table)
            )
        if not self.spark.catalog.tableExists(self.docs_table):
            (
                self.spark.createDataFrame([], "doc_id long, dl long")
                .write.format("parquet")
                .bucketBy(self.n_buckets, "doc_id")
                .sortBy("doc_id")
                .saveAsTable(self.docs_table)
            )

    def index_batch(
        self,
        batch: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> int:
        """foreachBatch body: index the never-seen, never-deleted
        documents of `batch`; returns how many were added."""
        from dod_etl_spark.streaming.maintenance import bucket_align
        from dod_etl_spark.streaming.tombstones import exclude_tombstoned

        self._ensure_tables()
        deduped = (
            batch.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
            .groupBy("doc_id")
            .agg(F.min("_t").alias("_t"))
            .select(
                "doc_id",
                F.col("_t").alias("_text"),
                F.size(doc_tokens("_t")).cast("long").alias("dl"),
            )
        )
        seen = self.spark.table(self.docs_table)
        fresh = exclude_tombstoned(
            self.spark,
            deduped.join(seen, "doc_id", "left_anti"),
            self.table,
            "doc_id",
        ).localCheckpoint(eager=True)

        postings = (
            fresh.select(
                "doc_id",
                "dl",
                F.posexplode(doc_tokens("_text")).alias("_p0", "tok"),
            )
            .groupBy("doc_id", "tok")
            .agg(
                F.sort_array(F.collect_list(F.col("_p0") + 1)).alias("positions"),
                F.max("dl").alias("dl"),
            )
            .select("tok", "doc_id", F.col("positions").cast("array<bigint>").alias("positions"), "dl")
        )
        bucket_align(postings, "tok", self.n_buckets).write.insertInto(
            self.table, overwrite=False
        )
        bucket_align(
            fresh.select("doc_id", "dl"), "doc_id", self.n_buckets
        ).write.insertInto(self.docs_table, overwrite=False)
        self.spark.catalog.refreshTable(self.table)
        self.spark.catalog.refreshTable(self.docs_table)
        return fresh.count()

    def phrase_search(self, phrases: list[str]) -> DataFrame:
        """(doc_id, phrase, n_matches, first_pos) for every committed,
        non-deleted document with at least one exact occurrence —
        bit-identical to the batch in-array scan over the same corpus.
        Per phrase: pruned posting scan -> offset-align -> per-doc
        intersection; a doc matches only if ALL k terms are present
        (count==k) and the aligned intersection is non-empty."""
        from dod_etl_spark.streaming.tombstones import exclude_tombstoned

        out_schema = "doc_id long, phrase string, n_matches long, first_pos long"
        if not self.spark.catalog.tableExists(self.table):
            return self.spark.createDataFrame([], out_schema)
        committed = exclude_tombstoned(
            self.spark,
            self.spark.table(self.docs_table).select("doc_id"),
            self.table,
            "doc_id",
        )
        store = self.spark.table(self.table)
        branches = []
        for phrase in phrases:
            terms = [w for w in phrase.lower().split(" ") if w]
            if not terms:
                # An empty / whitespace-only phrase matches nothing;
                # without this guard the per-term loop below never runs
                # and per_j stays None (AttributeError on groupBy).
                continue
            k = len(terms)
            pruned = (
                store.where(F.col("tok").isin(sorted(set(terms))))
                .join(committed, "doc_id", "left_semi")
            )
            def _shift_by(j: int):
                # NB: must be a ONE-argument lambda — pyspark passes
                # (element, index) to two-argument lambdas, so a
                # default-arg binding (lambda p, _j=j: ...) silently
                # receives the array index instead of the offset.
                return lambda p: p - F.lit(j)

            per_j = None
            for j, tok in enumerate(terms):
                b = pruned.where(F.col("tok") == tok).select(
                    "doc_id",
                    F.transform(F.col("positions"), _shift_by(j)).alias("shifted"),
                )
                per_j = b if per_j is None else per_j.unionByName(b)
            grouped = per_j.groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("_nterms"),
                F.collect_list("shifted").alias("_arrs"),
            )
            inter = F.expr(
                "aggregate(_arrs, _arrs[0], (acc, x) -> array_intersect(acc, x))"
            )
            branches.append(
                grouped.where(F.col("_nterms") == k)
                .select(
                    "doc_id",
                    F.lit(phrase).alias("phrase"),
                    F.size(inter).cast("long").alias("n_matches"),
                    F.array_min(inter).cast("long").alias("first_pos"),
                )
                .where(F.col("n_matches") > 0)
            )
        if not branches:
            return self.spark.createDataFrame([], out_schema)
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        return out

    def delete_docs(self, doc_ids) -> int:
        """Compliance delete — PostingStore.delete_docs semantics."""
        from dod_etl_spark.streaming.tombstones import add_tombstones

        return add_tombstones(self.spark, self.table, doc_ids, "doc_id")

    def purge_deleted(self) -> dict:
        from dod_etl_spark.streaming.tombstones import purge_table

        return {
            "postings_removed": purge_table(
                self.spark, self.table, self.table, "doc_id"
            ),
            "docs_removed": purge_table(
                self.spark, self.docs_table, self.table, "doc_id"
            ),
        }

    def repair(self) -> int:
        """Remove orphan postings left by a crash between the two
        appends (PostingStore.repair discipline)."""
        if not self.spark.catalog.tableExists(self.table):
            return 0
        postings = self.spark.table(self.table)
        docs = self.spark.table(self.docs_table).select("doc_id")
        clean = postings.join(docs, "doc_id", "left_semi").select(
            "tok", "doc_id", "positions", "dl"
        )
        before = postings.count()
        after = clean.count()
        if after != before:
            clean = clean.localCheckpoint(eager=True)
            clean.write.insertInto(self.table, overwrite=True)
            self.spark.catalog.refreshTable(self.table)
        return before - after

    def n_docs(self) -> int:
        """Serving-corpus size: commit records minus tombstones, so the
        number agrees with search()/stats() even in the delete-to-purge
        window (a tombstoned doc is already out of BM25's df/avgdl).
        Physical pre-purge row counts are a storage detail; read the
        docs table directly if that's what you need."""
        from dod_etl_spark.streaming.tombstones import exclude_tombstoned

        if not self.spark.catalog.tableExists(self.docs_table):
            return 0
        docs = self.spark.table(self.docs_table)
        return exclude_tombstoned(self.spark, docs, self.table, "doc_id").count()

    def compact(self) -> dict:
        from dod_etl_spark.streaming.maintenance import compact_store

        return compact_store(
            self.spark,
            {self.table: "tok", self.docs_table: "doc_id"},
            self.n_buckets,
        )
