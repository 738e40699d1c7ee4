"""Small-file compaction for the append-only bucketed store tables.

Every store in the maintain-don't-rebuild family (FingerprintStore,
NearDupStore, PostingStore, VectorIndexStore, IvfVectorStore) appends
one fileset per micro-batch — `insertInto` preserves the bucket LAYOUT
but not the file COUNT, so a store fed by a long-running stream ends up
with (micro-batches x buckets-touched) tiny parquet files: at one batch
a minute that is ~1,440 filesets/day, and every serve-time scan pays
the per-file open cost. Compaction rewrites the table to ~one file per
bucket while preserving the bucket spec, so serve plans keep their
no-store-side-exchange shape (pinned in tests/test_store_compaction.py).

Scale posture: the rewrite streams through a staging TABLE (read old
files -> shuffle into exactly `n_buckets` tasks -> write), never
through a driver-side materialization — unlike `repair()`'s
localCheckpoint path (acceptable there: crash repair is rare and
usually small), compaction is ROUTINE maintenance and must work at
10^11 rows. The swap is drop-then-rename with a deterministic staging
name, so a crash anywhere is recoverable on the next call:

  - crash before the DROP: a stale `<table>__compacting` exists next
    to the live table -> dropped and rebuilt;
  - crash between DROP and RENAME: only the staging table exists ->
    adopted (renamed into place) before compacting again.

Like repair(), compact() assumes the maintenance window: no concurrent
index_batch/dedup_batch appends (an append racing the swap would land
in the dropped table's directory and be lost). foreachBatch pipelines
get this for free by calling it from the same single-threaded loop.

Reference posture: imtu/InMemoryTableUpdater.scala:59-88 maintains a
long-lived table instead of rebuilding it; this module is the missing
operational half of that discipline — the table must also stay
SERVABLE after a million maintenance cycles.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _staging_name(table: str) -> str:
    return f"{table}__compacting"


def recover_compaction(spark: SparkSession, table: str) -> bool:
    """Finish an interrupted compact() swap. Returns True if a
    recovery action was taken."""
    tmp = _staging_name(table)
    has_tmp = spark.catalog.tableExists(tmp)
    has_table = spark.catalog.tableExists(table)
    if has_tmp and not has_table:
        # crashed between DROP and RENAME: the staging table IS the
        # compacted store — adopt it.
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
        return True
    if has_tmp and has_table:
        # crashed before the DROP: staging is stale (the live table may
        # have taken appends since) — discard it.
        spark.sql(f"DROP TABLE {tmp}")
        return True
    return False


def compact_bucketed_table(
    spark: SparkSession,
    table: str,
    key: str,
    n_buckets: int,
) -> dict:
    """Rewrite `table` (bucketed by `key` into `n_buckets`) to ~one
    file per bucket. Returns {files_before, files_after, rows}.

    The repartition matches the bucket hash (Murmur3 pmod n_buckets on
    the bucket column is exactly HashPartitioning on that column), so
    each write task holds one bucket's rows and emits one file; the
    recreated table carries the same bucketBy/sortBy spec, keeping
    every downstream bucketed-scan plan identical.

    Bucketed READING is disabled for the rewrite scan: with it on, the
    scan advertises hash partitioning on the bucket column and the
    optimizer eliminates the repartition as redundant — but the scan's
    physical layout is one partition per FILE GROUP, so the write then
    emits (tasks x buckets) files and compaction compacts nothing."""
    recover_compaction(spark, table)
    tmp = _staging_name(table)
    files_before = len(spark.table(table).inputFiles())
    prev = spark.conf.get("spark.sql.sources.bucketing.enabled")
    try:
        spark.conf.set("spark.sql.sources.bucketing.enabled", "false")
        (
            spark.table(table)
            .repartition(n_buckets, F.col(key))
            .write.format("parquet")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(tmp)
        )
    finally:
        spark.conf.set("spark.sql.sources.bucketing.enabled", prev)
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
    spark.catalog.refreshTable(table)
    out = spark.table(table)
    return {
        "files_before": files_before,
        "files_after": len(out.inputFiles()),
        "rows": out.count(),
    }


def compact_plain_table(spark: SparkSession, table: str) -> dict:
    """Compact an UNBUCKETED metadata-sized table (e.g. a commit-record
    table that gains one file per batch) to a single file. Same
    staging-swap crash discipline as the bucketed path."""
    recover_compaction(spark, table)
    tmp = _staging_name(table)
    files_before = len(spark.table(table).inputFiles())
    spark.table(table).coalesce(1).write.format("parquet").saveAsTable(tmp)
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
    spark.catalog.refreshTable(table)
    out = spark.table(table)
    return {
        "files_before": files_before,
        "files_after": len(out.inputFiles()),
        "rows": out.count(),
    }


def compact_store(spark: SparkSession, tables: dict[str, str], n_buckets: int) -> dict:
    """Compact several {table: bucket_key} tables of one store; a None
    key means an unbucketed metadata table (single-file rewrite).
    Skips tables that do not exist yet. Returns per-table stats."""
    out = {}
    for t, k in tables.items():
        if not (
            spark.catalog.tableExists(t)
            or spark.catalog.tableExists(_staging_name(t))
        ):
            continue
        out[t] = (
            compact_plain_table(spark, t)
            if k is None
            else compact_bucketed_table(spark, t, k, n_buckets)
        )
    return out


def bucket_align(df, key: str, n_buckets: int):
    """Repartition a (batch-sized, computed) frame to match a bucketed
    table's layout before insertInto. Without this, every write task
    emits one file per bucket it holds — up to tasks x buckets files
    PER MICRO-BATCH; aligned, each batch appends at most one file per
    bucket, cutting steady-state file growth by the task count and
    stretching the compact() cadence by the same factor. The exchange
    this adds is batch-sized (the frames being appended are
    micro-batch outputs, never corpus-sized). Matching works because
    repartition(n, col) IS the bucket hash (Murmur3 pmod n); it is not
    elided here because the input is a computed frame, not a bucketed
    scan."""
    from pyspark.sql import functions as F

    return df.repartition(n_buckets, F.col(key))
