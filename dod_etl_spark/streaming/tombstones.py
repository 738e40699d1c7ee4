"""Compliance deletes (right-to-be-forgotten) for the
maintain-don't-rebuild stores.

A 100 TB training-data pipeline must be able to remove a document (an
opt-out, a DMCA takedown, a PII incident) from its SERVING indexes
without rebuilding them — and the removal has to be durable against
the same at-least-once replays the stores already guard inserts
against. The append-only discipline the stores use for inserts extends
naturally: a delete is one appended row in a tombstone side-table, and

- SERVE-time exclusion is exact: the store's committed-ids frame
  anti-joins the broadcast tombstone set, so every derived statistic
  (BM25 document frequency, n_docs/avgdl, ANN candidate sets) reflects
  the retained corpus — post-delete serving is bit-identical to an
  index freshly built without the deleted ids (pinned in
  tests/test_tombstones.py);
- INGEST-time exclusion closes the resurrection window: index_batch
  anti-joins tombstones too, so a replayed old batch (or a re-crawl of
  the same id) cannot re-admit a deleted document even after the purge
  below has removed its commit record. A tombstoned id is permanently
  dead to the store;
- PURGE is maintenance-window physical removal (the repair() posture:
  checkpoint-then-overwrite, bucket layout preserved): storage shrinks,
  serving is unchanged. Tombstones are RETAINED after purge by default
  — they are the only remaining record that the id must stay out; drop
  them only when the upstream source's replay window has provably
  passed.

Tombstone tables are plain append-only parquet keyed by the store's id
column. They stay broadcast-sized by construction: deletes are rare
events relative to corpus growth, and each purge makes prior
tombstones non-load-bearing for storage (kept only as the re-admission
guard, one BIGINT per deleted id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tombstone_table_name(store_table: str) -> str:
    return f"{store_table}_tombstones"


def _ensure(spark: SparkSession, name: str, id_col: str) -> None:
    if not spark.catalog.tableExists(name):
        spark.createDataFrame([], f"{id_col} long").write.format("parquet").saveAsTable(
            name
        )


def add_tombstones(
    spark: SparkSession, store_table: str, ids, id_col: str
) -> int:
    """Append the not-yet-tombstoned ids of `ids` (a DataFrame with
    `id_col`, or an iterable of ints) to the store's tombstone table;
    returns how many were new. Idempotent: re-deleting adds zero."""
    name = tombstone_table_name(store_table)
    _ensure(spark, name, id_col)
    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame([(int(i),) for i in ids], f"{id_col} long")
    fresh = (
        ids.select(F.col(id_col).cast("long").alias(id_col))
        .distinct()
        .join(spark.table(name), id_col, "left_anti")
        .localCheckpoint(eager=True)
    )
    n = fresh.count()
    if n:
        fresh.coalesce(1).write.insertInto(name, overwrite=False)
        spark.catalog.refreshTable(name)
    return n


def tombstones(spark: SparkSession, store_table: str, id_col: str) -> DataFrame:
    """The tombstoned-id frame (empty if no deletes ever happened)."""
    name = tombstone_table_name(store_table)
    if not spark.catalog.tableExists(name):
        return spark.createDataFrame([], f"{id_col} long")
    return spark.table(name)


def exclude_tombstoned(
    spark: SparkSession, df: DataFrame, store_table: str, id_col: str
) -> DataFrame:
    """Anti-join `df` against the store's tombstones on `id_col`. The
    tombstone side is explicitly broadcast: the surviving plan adds no
    exchange to `df`'s side (serve plans keep their no-shuffle shape)."""
    name = tombstone_table_name(store_table)
    if not spark.catalog.tableExists(name):
        return df
    dead = spark.table(name).select(F.col(id_col))
    return df.join(F.broadcast(dead), id_col, "left_anti")


def purge_table(
    spark: SparkSession, table: str, store_table: str, id_col: str
) -> int:
    """Physically remove tombstoned rows from `table` (which may be the
    commit-record table itself): checkpoint-then-overwrite, preserving
    the bucket spec — the repair() discipline. Returns rows removed.
    Maintenance-window only."""
    name = tombstone_table_name(store_table)
    if not spark.catalog.tableExists(name) or not spark.catalog.tableExists(table):
        return 0
    rows = spark.table(table)
    dead = spark.table(name).select(F.col(id_col))
    clean = rows.join(F.broadcast(dead), id_col, "left_anti").select(*rows.columns)
    before = rows.count()
    after = clean.count()
    if after != before:
        clean = clean.localCheckpoint(eager=True)
        clean.write.insertInto(table, overwrite=True)
        spark.catalog.refreshTable(table)
    return before - after
