"""Incremental connected-components store: persistent near-dup cluster
labels maintained per micro-batch.

The maintain-don't-rebuild family (FingerprintStore, NearDupStore,
PostingStore, VectorIndexStore — the posture of the reference's
dimension-maintenance loop, imtu/InMemoryTableUpdater.scala:59-88)
covers the exact, lexical, and dense arms; this store covers the GRAPH
arm. Batch pipelines get cluster ids from operators/graph.py by
re-running CC over the full edge list; a stream of near-dup edges
(band collisions, embedding near-pairs) cannot re-run CC over 100 TB
of history per micro-batch. ClusterStore keeps component labels
current instead: each batch touches only batch-sized state, and the
resolved labels equal a from-scratch min-label CC over the union of
all edges ever added (pinned per-prefix in tests/test_cluster_store.py).

Storage (all append-only on the hot path):

- `labels` bucketed by node: (node, comp, batch_id) — one row per
  node, written ONCE when the node first appears, with the component
  root resolved as of that batch;
- `remaps` plain: (old_comp, new_comp, batch_id) — written when a
  batch merges two existing components; old_comp was a CURRENT root
  when written, so rows chain (r1->r2 in batch i, r2->r3 in batch j)
  and resolution follows chains by pointer-doubling (log2(depth)
  self-joins on the merges-sized frame, never on labels);
- `commits` plain: (batch_id, n_new_nodes, n_merges) — the replay
  guard and torn-batch visibility gate.

Why labels-only is lossless: component membership is closed under
union, and min-label is preserved by resolving batch endpoints through
the store BEFORE contracting — the running root of any node is always
the minimum node id of its component so far, exactly what batch CC
produces.

Per-batch cost is batch-sized: the labels table is probed with a
BROADCAST of the batch's node set (store side never shuffles), the
contracted component graph has at most one vertex per batch endpoint,
and the merge mapping comes from star_components on that batch-sized
graph — no driver-side union-find, no collect.

Exactly-once: appends are anti-joined against ALL stored rows
(committed + orphaned), and the commit record is written LAST. A
replayed batch with a committed batch_id is a no-op; a replayed TORN
batch (crash between appends) recomputes the identical rows — the
resolution reads committed state only, which the torn batch did not
change — finds them suppressed by the orphans, and the commit record
finally makes the orphans visible. No repair() needed before replay
(the VectorIndexStore discipline). The restart contract matches
Structured Streaming's foreachBatch guarantee — the torn batch_id IS
what gets replayed first; if instead a torn batch will never be
replayed (ad-hoc use, skipped offsets), run repair() before new
batches, or its nodes stay orphaned.

Serve: `current_labels()` is one scan of `labels` plus a broadcast
join with the checkpointed resolved-remap frame — zero store-side
exchanges (plan pinned). `compact()` folds remaps into labels during
a maintenance window so the remap frame only ever holds
merges-since-last-compact.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dod_etl_spark.operators.graph import star_components
from dod_etl_spark.streaming.maintenance import bucket_align

_LABELS_SCHEMA = "node long, comp long, batch_id long"
_REMAPS_SCHEMA = "old_comp long, new_comp long, batch_id long"
_COMMITS_SCHEMA = "batch_id long, n_new_nodes long, n_merges long"


@dataclass
class ClusterStore:
    """Append-only incremental connected-components labels."""

    spark: SparkSession
    labels_table: str = "cc_labels"
    remaps_table: str = "cc_remaps"
    commits_table: str = "cc_commits"
    n_buckets: int = 64
    max_resolve_iters: int = 20

    # --- table plumbing ------------------------------------------------------

    def _ensure_tables(self) -> None:
        s = self.spark
        if not s.catalog.tableExists(self.labels_table):
            (
                s.createDataFrame([], _LABELS_SCHEMA)
                .write.format("parquet")
                .bucketBy(self.n_buckets, "node")
                .sortBy("node")
                .saveAsTable(self.labels_table)
            )
        if not s.catalog.tableExists(self.remaps_table):
            s.createDataFrame([], _REMAPS_SCHEMA).write.format("parquet").saveAsTable(
                self.remaps_table
            )
        if not s.catalog.tableExists(self.commits_table):
            s.createDataFrame([], _COMMITS_SCHEMA).write.format("parquet").saveAsTable(
                self.commits_table
            )

    def _refresh(self) -> None:
        for t in (self.labels_table, self.remaps_table, self.commits_table):
            self.spark.catalog.refreshTable(t)

    def _committed_ids(self) -> DataFrame:
        return self.spark.table(self.commits_table).select("batch_id")

    def _committed(self, table: str) -> DataFrame:
        """Rows of `table` whose batch committed (orphans invisible)."""
        return self.spark.table(table).join(
            F.broadcast(self._committed_ids()), "batch_id", "left_semi"
        )

    # --- remap resolution ----------------------------------------------------

    def _resolved_remaps(self) -> DataFrame:
        """(old_comp, new_comp) with every chain followed to its root,
        via pointer doubling on the merges-sized committed remap frame
        (log2(chain depth) rounds; depth grows at most 1 per batch and
        resets at compact()). Returned frame is eagerly checkpointed so
        serve plans join a materialized leaf."""
        r = self._committed(self.remaps_table).select("old_comp", "new_comp")
        r = r.localCheckpoint(eager=True)
        for _ in range(self.max_resolve_iters):
            nxt = r.select(
                F.col("old_comp").alias("_o2"), F.col("new_comp").alias("_n2")
            )
            joined = r.join(nxt, r.new_comp == nxt._o2, "left")
            unresolved = joined.filter(F.col("_n2").isNotNull())
            if unresolved.isEmpty():
                return r
            r = joined.select(
                "old_comp", F.coalesce("_n2", "new_comp").alias("new_comp")
            ).localCheckpoint(eager=True)
        raise RuntimeError(
            f"remap chains deeper than 2^{self.max_resolve_iters}; run compact()"
        )

    # --- serve ----------------------------------------------------------------

    def current_labels(self) -> DataFrame:
        """(node, comp) for every committed node, fully resolved. One
        labels scan + one broadcast join — no store-side exchange."""
        self._ensure_tables()
        remaps = self._resolved_remaps()
        labels = self._committed(self.labels_table)
        return labels.join(
            F.broadcast(remaps), labels.comp == remaps.old_comp, "left"
        ).select("node", F.coalesce("new_comp", "comp").alias("comp"))

    def component_of(self, nodes: DataFrame, node_col: str = "node") -> DataFrame:
        """(node, comp) for the requested nodes (null comp = never
        seen). The store side is pruned by a broadcast of the request."""
        req = nodes.select(F.col(node_col).cast("long").alias("node")).distinct()
        labels = self._committed(self.labels_table).join(
            F.broadcast(req), "node", "left_semi"
        )
        remaps = self._resolved_remaps()
        resolved = labels.join(
            F.broadcast(remaps), labels.comp == remaps.old_comp, "left"
        ).select("node", F.coalesce("new_comp", "comp").alias("comp"))
        return req.join(resolved, "node", "left")

    # --- ingest ---------------------------------------------------------------

    def add_edges(
        self,
        edges: DataFrame,
        batch_id: int,
        src_col: str = "src",
        dst_col: str = "dst",
    ) -> dict:
        """foreachBatch body: merge a batch of undirected edges into
        the stored components. Self-loops register singleton nodes.
        Returns {'new_nodes', 'merges', 'replay'}. Replays add zero."""
        self._ensure_tables()
        if (
            self._committed_ids()
            .filter(F.col("batch_id") == batch_id)
            .limit(1)
            .count()
            > 0
        ):
            return {"new_nodes": 0, "merges": 0, "replay": True}

        e = (
            edges.select(
                F.col(src_col).cast("long").alias("s"),
                F.col(dst_col).cast("long").alias("d"),
            )
            .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
            .distinct()
            .localCheckpoint(eager=True)
        )
        nodes_b = (
            e.select(F.col("s").alias("node"))
            .union(e.select(F.col("d").alias("node")))
            .distinct()
        )

        # Resolve each batch endpoint to its current root. The labels
        # table is pruned by a broadcast of the batch node set, so this
        # reads batch-sized state no matter how big the store is.
        known = self._committed(self.labels_table).join(
            F.broadcast(nodes_b), "node", "left_semi"
        )
        remaps = self._resolved_remaps()
        known = known.join(
            F.broadcast(remaps), known.comp == remaps.old_comp, "left"
        ).select(
            "node",
            F.coalesce("new_comp", "comp").alias("_r"),
            F.lit(True).alias("_stored"),
        )
        node_roots = (
            nodes_b.join(known, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("_r"), F.col("node")).alias("root"),
                F.coalesce(F.col("_stored"), F.lit(False)).alias("stored"),
            )
            .localCheckpoint(eager=True)
        )

        # Contract to the component graph (batch-sized) and solve it.
        nr = node_roots.select("node", "root")
        pairs = (
            e.join(F.broadcast(nr.withColumnRenamed("node", "s")), "s")
            .withColumnRenamed("root", "ra")
            .join(
                F.broadcast(
                    nr.withColumnRenamed("node", "d").withColumnRenamed(
                        "root", "rb"
                    )
                ),
                "d",
            )
            .filter(F.col("ra") != F.col("rb"))
            .select("ra", "rb")
            .distinct()
        )
        if pairs.isEmpty():
            mapping = self.spark.createDataFrame([], "node long, label long")
        else:
            mapping, _ = star_components(pairs, "ra", "rb")
        mapping = mapping.select(
            F.col("node").alias("_mr"), F.col("label").alias("_ml")
        ).localCheckpoint(eager=True)

        final_roots = node_roots.join(
            F.broadcast(mapping), node_roots.root == F.col("_mr"), "left"
        ).select(
            "node",
            F.coalesce("_ml", "root").alias("comp"),
            "root",
            "stored",
        )

        # Fresh label rows: nodes absent from ALL stored rows (orphans
        # included — torn-batch idempotence; see module docstring).
        fresh = (
            final_roots.filter(~F.col("stored"))
            .join(
                self.spark.table(self.labels_table).select("node"),
                "node",
                "left_anti",
            )
            .select("node", "comp", F.lit(batch_id).cast("long").alias("batch_id"))
            .localCheckpoint(eager=True)
        )

        # Remap rows: stored roots whose root changed this batch.
        changed = (
            final_roots.filter(F.col("stored"))
            .select(F.col("root").alias("old_comp"), F.col("comp").alias("new_comp"))
            .filter(F.col("old_comp") != F.col("new_comp"))
            .distinct()
            .join(
                self.spark.table(self.remaps_table).select("old_comp"),
                "old_comp",
                "left_anti",
            )
            .select(
                "old_comp",
                "new_comp",
                F.lit(batch_id).cast("long").alias("batch_id"),
            )
            .localCheckpoint(eager=True)
        )

        n_new, n_merges = fresh.count(), changed.count()
        # labels, remaps, commit record — commit strictly last.
        bucket_align(fresh, "node", self.n_buckets).write.insertInto(
            self.labels_table, overwrite=False
        )
        changed.write.insertInto(self.remaps_table, overwrite=False)
        self._write_commit(batch_id, n_new, n_merges)
        self._refresh()
        return {"new_nodes": n_new, "merges": n_merges, "replay": False}

    def _write_commit(self, batch_id: int, n_new: int, n_merges: int) -> None:
        """The visibility flip — strictly after the data appends, so a
        crash anywhere earlier leaves only invisible orphans."""
        self.spark.createDataFrame(
            [(int(batch_id), int(n_new), int(n_merges))], _COMMITS_SCHEMA
        ).write.insertInto(self.commits_table, overwrite=False)

    # --- maintenance ----------------------------------------------------------

    def repair(self) -> dict:
        """Drop orphan rows (batch never committed). Only needed when a
        torn batch will NEVER be replayed — replays are safe without it."""
        self._ensure_tables()
        removed = {}
        for table in (self.labels_table, self.remaps_table):
            all_rows = self.spark.table(table)
            clean = all_rows.join(
                F.broadcast(self._committed_ids()), "batch_id", "left_semi"
            ).select(*all_rows.columns)
            before, after = all_rows.count(), clean.count()
            if after != before:
                clean = clean.localCheckpoint(eager=True)
                clean.write.insertInto(table, overwrite=True)
            removed[table] = before - after
        self._refresh()
        return removed

    def fold_remaps(self) -> int:
        """Maintenance window: rewrite labels with every remap applied
        (staging-swap, same crash discipline as compact_bucketed_table),
        then truncate remaps. Idempotent under a crash anywhere: a
        remap whose old_comp no longer appears in labels is a no-op
        join miss on the next fold. Also leaves labels at ~one file
        per bucket. Returns remaps folded."""
        from dod_etl_spark.streaming.maintenance import (
            _staging_name,
            recover_compaction,
        )

        self._ensure_tables()
        remaps = self._resolved_remaps()
        n = remaps.count()
        if n == 0:
            return 0
        recover_compaction(self.spark, self.labels_table)
        tmp = _staging_name(self.labels_table)
        # Bucketed reading off for the rewrite scan (see
        # compact_bucketed_table): with it on the optimizer elides the
        # repartition and the write fans out to (tasks x buckets) files.
        prev = self.spark.conf.get("spark.sql.sources.bucketing.enabled")
        try:
            self.spark.conf.set("spark.sql.sources.bucketing.enabled", "false")
            labels = self.spark.table(self.labels_table)
            folded = labels.join(
                F.broadcast(remaps), labels.comp == remaps.old_comp, "left"
            ).select(
                "node", F.coalesce("new_comp", "comp").alias("comp"), "batch_id"
            )
            (
                folded.repartition(self.n_buckets, F.col("node"))
                .write.format("parquet")
                .bucketBy(self.n_buckets, "node")
                .sortBy("node")
                .saveAsTable(tmp)
            )
        finally:
            self.spark.conf.set("spark.sql.sources.bucketing.enabled", prev)
        self.spark.sql(f"DROP TABLE {self.labels_table}")
        self.spark.sql(f"ALTER TABLE {tmp} RENAME TO {self.labels_table}")
        self.spark.createDataFrame([], _REMAPS_SCHEMA).write.insertInto(
            self.remaps_table, overwrite=True
        )
        self._refresh()
        return n

    def compact(self) -> dict:
        """fold_remaps (which rewrites labels to ~one file per bucket)
        + commit-record compaction. Serve plans keep their shape: the
        bucket spec is preserved across the swap."""
        from dod_etl_spark.streaming.maintenance import (
            compact_plain_table,
            compact_store,
        )

        folded = self.fold_remaps()
        out = {"remaps_folded": folded}
        if folded == 0:
            # nothing folded: labels files untouched — compact them.
            out.update(
                compact_store(
                    self.spark, {self.labels_table: "node"}, self.n_buckets
                )
            )
        out["commits"] = compact_plain_table(self.spark, self.commits_table)
        return out

    # --- introspection --------------------------------------------------------

    def n_nodes(self) -> int:
        self._ensure_tables()
        return self._committed(self.labels_table).count()

    def n_components(self) -> int:
        return self.current_labels().select("comp").distinct().count()
