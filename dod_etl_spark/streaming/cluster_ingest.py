"""Streaming corpus clustering: near-dup suppression WITH stable
cluster attribution, maintained per micro-batch.

NearDupStore answers "have I emitted a paraphrase of this before?"
with a yes/no; real curation pipelines also need the WHICH — every
ingested document assigned to a stable near-dup cluster, so survivor
selection, cluster-size capping, and contamination audits can run over
a live stream. ClusteredIngest composes the band-collision probe with
ClusterStore (streaming/cluster_store.py) and keeps doc ids on the
band rows, so the incremental labels are provably the SAME clustering
a batch pipeline computes from scratch:

    after any prefix of batches,
    labels == dedup_cluster_assignments(corpus-so-far,
              minhash_cluster_edges(corpus-so-far))      [pinned]

Connectivity argument: a batch doc sharing band bh with committed
history gets ONE edge to the minimum committed holder of bh — any one
holder suffices, because every earlier pair of docs sharing bh was
already connected when the later of them arrived (induction); within
a batch, docs sharing bh are connected by a min-doc star, exactly
minhash_cluster_edges' contraction. Unlike NearDupStore (which
records only survivors' bands), ALL non-exact-duplicate docs' bands
are recorded — that is what makes suppression TRANSITIVE (a
paraphrase-of-a-paraphrase sharing no band with the original is still
caught) and the equality above exact.

Storage: `bands` (bh, doc_id, batch_id) bucketed by bh and `fps`
(fp, doc_id, batch_id) bucketed by fp, both append-only; the
ClusterStore's commit ledger is THE commit record for all five tables
(one visibility flip per batch, written last). Probes semi-join the
committed ledger EXCLUDING the current batch_id, so a replay after a
post-commit crash re-emits the same documents instead of suppressing
them against their own rows (the NearDupStore own-batch rule). A torn
batch's replay re-appends bit-identical band/fp rows rather than
anti-joining the corpus-sized tables (the VectorIndexStore posture) —
every consumer is a semi-join or min-aggregation, so duplicates are
inert; the node-granular state (labels/remaps) stays exactly-once via
ClusterStore's own guards.

Emission contract: exact duplicates (within batch or vs committed
history) are dropped unregistered — identical content adds no
connectivity. Near-duplicates of committed history are suppressed
from the RETURN value but registered as cluster members. Within-batch
near-dup groups are all emitted (the incremental_dedup_docs batch
contract) and share a cluster.

Scale: everything corpus-sized is probed through its bucket layout or
a broadcast of batch-derived frames; per-batch cluster work is
batch-sized (see cluster_store.py and docs/SCALE.md).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dod_etl_spark.operators.text_dedup import minhash_bands, minhash_signatures
from dod_etl_spark.streaming.cluster_store import ClusterStore
from dod_etl_spark.streaming.maintenance import bucket_align

_BANDS_SCHEMA = "bh string, doc_id long, batch_id long"
_FPS_SCHEMA = "fp string, doc_id long, batch_id long"


@dataclass
class ClusteredIngest:
    """Streaming near-dup suppression with incremental cluster labels."""

    spark: SparkSession
    prefix: str = "ci"
    n_buckets: int = 64
    num_hashes: int = 8
    band_size: int = 2
    shingle_len: int = 5
    hash_fn: str = "md5"
    cluster: ClusterStore = field(init=False)

    def __post_init__(self) -> None:
        self.bands_table = f"{self.prefix}_bands"
        self.fps_table = f"{self.prefix}_fps"
        self.cluster = ClusterStore(
            self.spark,
            labels_table=f"{self.prefix}_labels",
            remaps_table=f"{self.prefix}_remaps",
            commits_table=f"{self.prefix}_commits",
            n_buckets=self.n_buckets,
        )

    def _ensure_tables(self) -> None:
        s = self.spark
        if not s.catalog.tableExists(self.bands_table):
            (
                s.createDataFrame([], _BANDS_SCHEMA)
                .write.format("parquet")
                .bucketBy(self.n_buckets, "bh")
                .sortBy("bh")
                .saveAsTable(self.bands_table)
            )
        if not s.catalog.tableExists(self.fps_table):
            (
                s.createDataFrame([], _FPS_SCHEMA)
                .write.format("parquet")
                .bucketBy(self.n_buckets, "fp")
                .sortBy("fp")
                .saveAsTable(self.fps_table)
            )
        self.cluster._ensure_tables()

    def _committed_except(self, batch_id: int) -> DataFrame:
        """The shared ledger, minus the current batch (own-batch rule)."""
        return self.cluster._committed_ids().where(
            F.col("batch_id") != F.lit(int(batch_id))
        )

    def ingest_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        id_col: str = "doc_id",
        content_col: str = "text",
    ) -> DataFrame:
        """foreachBatch body: returns the emitted (non-duplicate) rows
        and folds the batch into bands/fps/cluster state. Pass the
        foreachBatch batch_id — replay stability is the crash
        contract. Emission recomputes identically on any replay."""
        self._ensure_tables()
        committed = F.broadcast(self._committed_except(batch_id))

        # Within-batch exact collapse (min-id representative), then
        # drop exact duplicates of committed history — unregistered:
        # identical content adds no connectivity.
        with_fp = batch.withColumn(
            "fp", F.md5(F.col(content_col).cast("binary"))
        )
        survivors = (
            with_fp.groupBy("fp")
            .agg(
                F.min_by(
                    F.struct(*[c for c in with_fp.columns if c != "fp"]),
                    F.col(id_col),
                ).alias("r")
            )
            .select("fp", "r.*")
        )
        seen_fps = self.spark.table(self.fps_table).join(
            committed, "batch_id", "left_semi"
        )
        exact_fresh = survivors.join(
            seen_fps.select("fp"), "fp", "left_anti"
        ).localCheckpoint(eager=True)

        bands_b = (
            minhash_bands(
                minhash_signatures(
                    exact_fresh,
                    id_col=id_col,
                    text_col=content_col,
                    num_hashes=self.num_hashes,
                    shingle_len=self.shingle_len,
                    hash_fn=self.hash_fn,
                ),
                id_col=id_col,
                band_size=self.band_size,
                num_hashes=self.num_hashes,
            )
            .select(
                F.col(id_col).alias("doc_id"),
                F.concat_ws(":", F.col("band"), F.col("band_hash")).alias("bh"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )

        # History edges: one edge per (batch doc, matched band) to the
        # MIN committed holder — connectivity-complete (module note).
        # The corpus-sized band table is pruned by a broadcast of the
        # batch's bands before the min-holder aggregation.
        history = self.spark.table(self.bands_table).join(
            committed, "batch_id", "left_semi"
        )
        hist_hits = history.join(
            F.broadcast(bands_b.select("bh").distinct()), "bh", "left_semi"
        )
        hist_min = hist_hits.groupBy("bh").agg(F.min("doc_id").alias("_anchor"))
        hist_edges = (
            bands_b.join(F.broadcast(hist_min), "bh")
            .select(F.col("doc_id").alias("src"), F.col("_anchor").alias("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )

        # Within-batch star edges per band (minhash_cluster_edges'
        # contraction) + self-loops registering every fresh doc.
        batch_min = bands_b.groupBy("bh").agg(F.min("doc_id").alias("_anchor"))
        batch_edges = (
            bands_b.join(batch_min, "bh")
            .where(F.col("doc_id") != F.col("_anchor"))
            .select(F.col("doc_id").alias("src"), F.col("_anchor").alias("dst"))
        )
        self_loops = exact_fresh.select(
            F.col(id_col).alias("src"), F.col(id_col).alias("dst")
        )
        edges = hist_edges.unionByName(batch_edges).unionByName(self_loops)

        # Emission: suppress near-duplicates of committed history.
        near_ids = hist_edges.select(F.col("src").alias(id_col)).distinct()
        fresh = exact_fresh.join(near_ids, id_col, "left_anti").localCheckpoint(
            eager=True
        )

        # Appends: bands, fps, then the cluster update whose commit
        # record is the visibility flip for everything. A torn batch's
        # replay re-appends bit-identical band/fp rows (the
        # VectorIndexStore posture): every consumer of these tables is
        # a semi-join or a min-aggregation, so duplicate rows are
        # semantically inert — cheaper at scale than anti-joining the
        # corpus-sized tables per batch, and compact() can drop the
        # rare extra copies.
        new_bands = bands_b.select(
            "bh", "doc_id", F.lit(int(batch_id)).alias("batch_id")
        )
        bucket_align(new_bands, "bh", self.n_buckets).write.insertInto(
            self.bands_table, overwrite=False
        )
        new_fps = exact_fresh.select(
            "fp",
            F.col(id_col).alias("doc_id"),
            F.lit(int(batch_id)).alias("batch_id"),
        )
        bucket_align(new_fps, "fp", self.n_buckets).write.insertInto(
            self.fps_table, overwrite=False
        )
        for t in (self.bands_table, self.fps_table):
            self.spark.catalog.refreshTable(t)

        self.cluster.add_edges(edges, batch_id=batch_id)
        return fresh.drop("fp")

    # --- serve ----------------------------------------------------------------

    def labels(self) -> DataFrame:
        """(node, comp): every registered doc's cluster id — equal to
        the batch clustering over everything ingested so far."""
        return self.cluster.current_labels()

    def cluster_sizes(self) -> DataFrame:
        return self.labels().groupBy("comp").agg(
            F.count(F.lit(1)).cast("long").alias("n_members")
        )

    def compact(self) -> dict:
        """Maintenance window: fold cluster remaps + compact all five
        tables."""
        from dod_etl_spark.streaming.maintenance import compact_store

        out = self.cluster.compact()
        out["ingest"] = compact_store(
            self.spark,
            {self.bands_table: "bh", self.fps_table: "fp"},
            self.n_buckets,
        )
        return out
