"""Streaming SemDeDup: greedy cluster-scoped semantic dedup over an
embedding stream, with the dedup-store family's exactly-once contract.

The batch operator (operators/similarity.py `semdedup`) answers "which
vectors survive over THIS corpus". A training-data ingest needs the
same decision CONTINUOUSLY — a crawl's embeddings arrive in
micro-batches and each document must be kept or dropped ONCE, without
re-scoring history (the maintain-don't-rebuild posture; reference:
imtu/InMemoryTableUpdater.scala:59-88 applied to dedup state, the
NearDupStore's charter extended from MinHash bands to embedding
cosine).

Semantics are GREEDY-PREFIX SemDeDup (the paper's sequential
keep-one-per-ball): a vector is kept iff no ALREADY-KEPT vector in its
coarse cell has cosine >= threshold to it. Greedy is the right
streaming contract because it is prefix-stable — a kept vector is
never retroactively dropped — and it is split-invariant: any
micro-batch partitioning of an id-ordered stream yields the IDENTICAL
kept set (pinned in tests/test_semdedup_store.py against a pure-Python
reference). It deliberately differs from the batch operator's
pair-rule (dominated-by-any-lower-id, chains drop whole balls); the
batch twin exists for relational oracle replay, the store for ingest.

Scale shape:
- cell assignment is the zero-shuffle literal-centroid projection
  (ivf_topk's quantizer; centroids are a build-time commitment
  persisted like IvfPqVectorStore's — drifted cells are the
  cell_balance()/rebuild story);
- the within-cell greedy runs per cell via cogrouped applyInPandas:
  cells are the parallel unit, each task sees one cell's history
  matrix + the batch's newcomers and runs a vectorized
  numpy cosine-against-kept loop — exactly SemDeDup's per-cluster
  O(|cell| * batch) work, Arrow-batched, never row-at-a-time Python;
- per-cell history size is the design bound: n_cells ~ sqrt(N) keeps
  |cell| ~ sqrt(N) in expectation (auto_ivf_cells), and the kept set
  a cell holds is itself thinned by the dedup;
- exactly-once is the QuantileStore protocol: kept rows append ->
  seen ids append -> one commit record LAST; probes semi-join
  committed batches (broadcast), so torn appends are invisible and a
  torn replay's byte-identical rows collapse via distinct.

Cosine here is float64 numpy (matrix form), NOT the SQL fold — the
store's contract is pinned against a same-arithmetic Python reference,
not a DuckDB hash (greedy needs recursion SQL can't replay cheaply);
that is the `minhash_lsh_prod` production-twin convention.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _greedy_keep(history, newcomers, threshold: float):
    """Pure greedy core, shared by the executor UDF and the test
    reference: `history` is an (n, d) float64 matrix of already-kept
    vectors, `newcomers` an id-sorted list of (vec_id, vector); returns
    the kept vec_ids. A newcomer joins iff its max cosine against every
    kept-so-far vector (history + earlier kept newcomers) is below the
    threshold."""
    import numpy as np

    kept_rows = [np.asarray(v, dtype=np.float64) for v in history]
    kept_ids: list[int] = []
    mat = np.stack(kept_rows) if kept_rows else None
    norms = (
        np.sqrt((mat * mat).sum(axis=1)) if mat is not None else None
    )
    for vid, vec in newcomers:
        v = np.asarray(vec, dtype=np.float64)
        vn = float(np.sqrt((v * v).sum()))
        if mat is not None and len(mat) and vn > 0:
            denom = norms * vn
            sims = np.where(denom > 0, (mat @ v) / np.where(denom > 0, denom, 1.0), 0.0)
            if float(sims.max()) >= threshold:
                continue
        kept_ids.append(vid)
        mat = v[None, :] if mat is None else np.vstack([mat, v])
        norms = (
            np.array([vn]) if norms is None else np.append(norms, vn)
        )
    return kept_ids


@dataclass
class SemDedupStore:
    """Append-only greedy-SemDeDup state: kept vectors bucketed by
    cell_id (the probe side), seen ids bucketed by vec_id (the replay
    guard), and the batch commit log."""

    spark: SparkSession
    table: str = "semdedup_kept"
    seen_table: str = "semdedup_seen"
    commits_table: str = "semdedup_commits"
    cent_table: str = "semdedup_centroids"
    n_buckets: int = 16
    threshold: float = 0.35
    centroids: list | None = None  # [(cid, [float, ...])] at creation

    def _ensure_tables(self) -> None:
        if not self.spark.catalog.tableExists(self.cent_table):
            if not self.centroids:
                raise ValueError("SemDedupStore needs `centroids` on first use")
            self.spark.createDataFrame(
                [(int(c), [float(x) for x in v]) for c, v in self.centroids],
                "cid long, v array<double>",
            ).coalesce(1).write.format("parquet").saveAsTable(self.cent_table)
        if not self.spark.catalog.tableExists(self.table):
            (
                self.spark.createDataFrame(
                    [],
                    "cell_id long, vec_id long, embedding array<float>, batch_id long",
                )
                .write.format("parquet")
                .bucketBy(self.n_buckets, "cell_id")
                .sortBy("cell_id")
                .saveAsTable(self.table)
            )
        if not self.spark.catalog.tableExists(self.seen_table):
            (
                self.spark.createDataFrame([], "vec_id long, batch_id long")
                .write.format("parquet")
                .bucketBy(self.n_buckets, "vec_id")
                .sortBy("vec_id")
                .saveAsTable(self.seen_table)
            )
        if not self.spark.catalog.tableExists(self.commits_table):
            self.spark.createDataFrame([], "batch_id long").write.format(
                "parquet"
            ).saveAsTable(self.commits_table)

    def _cents(self) -> list:
        if self.centroids is None:
            self.centroids = [
                (int(r["cid"]), [float(x) for x in r["v"]])
                for r in self.spark.table(self.cent_table).orderBy("cid").collect()
            ]
        return self.centroids

    def _committed(self) -> DataFrame:
        return self.spark.table(self.commits_table).select("batch_id").distinct()

    def kept(self) -> DataFrame:
        """(vec_id, cell_id) of every committed survivor; torn-replay
        duplicates collapse via distinct (byte-identical rows)."""
        self._ensure_tables()
        return (
            self.spark.table(self.table)
            .join(F.broadcast(self._committed()), "batch_id", "left_semi")
            .select("vec_id", "cell_id")
            .distinct()
        )

    def seen_count(self) -> int:
        self._ensure_tables()
        return (
            self.spark.table(self.seen_table)
            .join(F.broadcast(self._committed()), "batch_id", "left_semi")
            .select("vec_id")
            .distinct()
            .count()
        )

    def dedup_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """foreachBatch body: returns the batch rows that SURVIVE
        greedy SemDeDup against committed history and each other
        (as (vec_id, cell_id)), and records both survivors and the
        full seen-set. A committed replay returns empty; a torn replay
        re-appends byte-identical rows (inert)."""
        from dod_etl_spark.operators.similarity import _cell_assigner, _probe_dim

        self._ensure_tables()
        out_schema = "vec_id long, cell_id long"
        if self._committed().filter(F.col("batch_id") == batch_id).count() > 0:
            return self.spark.createDataFrame([], out_schema)
        deduped = (
            batch.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).cast("array<float>").alias("embedding"),
            )
            .groupBy("vec_id")
            .agg(F.min("embedding").alias("embedding"))
        )
        seen = self.spark.table(self.seen_table).join(
            F.broadcast(self._committed()), "batch_id", "left_semi"
        )
        fresh = deduped.join(seen, "vec_id", "left_anti")
        dim = _probe_dim(fresh, "embedding")
        if dim is None:
            # empty or fully-seen batch: nothing to dedup, but the
            # batch_id still gets its commit record so a replay
            # short-circuits on the cheap committed guard instead of
            # re-running the seen anti-join (NgramLmStore's rule).
            self.spark.createDataFrame(
                [(int(batch_id),)], "batch_id long"
            ).write.insertInto(self.commits_table, overwrite=False)
            self.spark.catalog.refreshTable(self.commits_table)
            return self.spark.createDataFrame([], out_schema)
        assigned = (
            _cell_assigner(self._cents(), dim, "vec_id", "embedding")(
                fresh, "vec_id", "embedding", "_vn", 1
            )
            # the assigner emits INT cell ids; the store tables carry
            # LONG — align BEFORE the cogroup, whose key matching is
            # type-sensitive (int-keyed left groups would never meet
            # the long-keyed history and dedup silently against
            # nothing)
            .select(
                F.col("cell_id").cast("long").alias("cell_id"),
                "vec_id",
                "embedding",
            )
            .localCheckpoint(eager=True)
        )

        history = (
            self.spark.table(self.table)
            .join(F.broadcast(self._committed()), "batch_id", "left_semi")
            .groupBy("cell_id", "vec_id")
            .agg(F.min("embedding").alias("embedding"))
        )
        threshold = self.threshold

        def per_cell(left, right):
            import pandas as pd

            if left.empty:
                return pd.DataFrame({"vec_id": [], "cell_id": []}).astype(
                    {"vec_id": "int64", "cell_id": "int64"}
                )
            cell = int(left["cell_id"].iloc[0])
            newcomers = sorted(
                zip(left["vec_id"].astype("int64"), left["embedding"]),
                key=lambda t: t[0],
            )
            kept_ids = _greedy_keep(
                list(right["embedding"]), newcomers, threshold
            )
            return pd.DataFrame(
                {"vec_id": kept_ids, "cell_id": [cell] * len(kept_ids)}
            ).astype({"vec_id": "int64", "cell_id": "int64"})

        kept_new = (
            assigned.groupBy("cell_id")
            .cogroup(history.groupBy("cell_id"))
            .applyInPandas(per_cell, out_schema)
            .localCheckpoint(eager=True)
        )

        from dod_etl_spark.streaming.maintenance import bucket_align

        kept_rows = (
            kept_new.join(assigned, ["cell_id", "vec_id"])
            .select(
                "cell_id", "vec_id", "embedding",
                F.lit(batch_id).cast("long").alias("batch_id"),
            )
        )
        bucket_align(kept_rows, "cell_id", self.n_buckets).write.insertInto(
            self.table, overwrite=False
        )
        bucket_align(
            assigned.select(
                "vec_id", F.lit(batch_id).cast("long").alias("batch_id")
            ),
            "vec_id",
            self.n_buckets,
        ).write.insertInto(self.seen_table, overwrite=False)
        self.spark.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).write.insertInto(self.commits_table, overwrite=False)
        for t in (self.table, self.seen_table, self.commits_table):
            self.spark.catalog.refreshTable(t)
        return kept_new

    def cell_balance(self) -> dict:
        """The IvfPqVectorStore monitor over the kept set: a cell
        hoarding the corpus means the greedy's per-cell work (and the
        semantic blocking quality) degrades — rebuild-into-twin with
        refreshed centroids is the documented response."""
        kept = self.kept()
        counts = [
            int(r["c"])
            for r in kept.groupBy("cell_id").agg(F.count(F.lit(1)).alias("c")).collect()
        ]
        n = sum(counts)
        if not n:
            return {"n_vecs": 0, "n_cells_used": 0}
        return {
            "n_vecs": n,
            "n_cells_total": len(self._cents()),
            "n_cells_used": len(counts),
            "max_cell_frac": round(max(counts) / n, 4),
        }

    def compact(self) -> dict:
        from dod_etl_spark.streaming.maintenance import compact_store

        return compact_store(
            self.spark,
            {self.table: "cell_id", self.seen_table: "vec_id"},
            self.n_buckets,
        )
