"""Snapshot backends for DimensionMaintainer: versioned parquet
(always available) and Delta Lake MERGE INTO (gated on delta-spark).

The reference maintains its dimension replica with an H2 ``MERGE INTO
<table> KEY(pk) VALUES(...)`` per record batch
(imtu/DatabaseManager.scala:52-62). The production Spark analog is a
lakehouse MERGE: one declarative statement per micro-batch that
upserts/deletes by key with version tie-breaking, giving concurrent
readers snapshot isolation and time travel. delta-spark is genuinely
not installable in this environment (verified round 5), so:

- `ParquetSnapshotBackend` is the default — the versioned-overwrite
  scheme dimensions.py has always used (write new version dir, repoint
  view, GC old versions). Identical read semantics, retention depth via
  `keep_versions`.
- `DeltaSnapshotBackend` is the written-but-gated MERGE path: it
  imports delta.tables lazily and raises ImportError otherwise;
  tests/test_delta_backend.py importorskips. Its MERGE clause
  construction (pure string builders below) is unit-tested WITHOUT
  delta, so the semantics are reviewable and pinned here even where the
  package is absent.

MERGE semantics mapped from the reference + apply_cdc
(operators/dedup.py): per key the highest `version_cols` tuple wins,
arriving changes beat the stored row at equal version (the reference
overwrites on replay, InMemoryTableUpdater.scala:152-157), and a
winning tombstone (op_col == delete_op) removes the key from the
SERVING view. Change batches must be pre-deduped to one row per key
(latest_per_key) — MERGE requires a unique source match, same as H2's
MERGE KEY().

Tombstones are SOFT deletes in the stored state, hard deletes only in
the serving view: both backends retain the tombstone row (with op_col)
so a later batch carrying a lower-version upsert for a deleted key
loses the version race instead of resurrecting the key — physical
DELETE would discard the version that must win that race (the r6
advisory's cross-batch composability hole). Tombstone GC (dropping
markers older than any possible replay) is a compaction concern, same
knob family as keep_versions.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from dod_etl_spark.streaming.dimensions import DimensionMaintainer


def merge_key_condition(key_cols: Sequence[str]) -> str:
    """ON clause: target/source equality over the upsert identity —
    the KEY(pk) of the reference's H2 MERGE."""
    return " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in key_cols)


def version_wins_condition(version_cols: Sequence[str]) -> str:
    """WHEN MATCHED gate: the arriving row wins at >= version
    (lexicographic struct compare over the version tuple) — replays
    overwrite, stale out-of-order changes are ignored."""
    cols = ", ".join(f"s.`{v}`" for v in version_cols)
    tcols = ", ".join(f"t.`{v}`" for v in version_cols)
    return f"struct({cols}) >= struct({tcols})"


class ParquetSnapshotBackend:
    """Versioned-overwrite publish: write the FULL merged snapshot
    (tombstones retained) to a new version directory, repoint the
    serving temp view at a tombstone-filtered read, GC old versions.
    Executors-only (no row touches the driver); the previous version is
    retained so a concurrently-executing plan never loses files."""

    def publish(self, m: "DimensionMaintainer", merged: DataFrame) -> None:
        version = m._version + 1
        path = os.path.join(m._root(), f"v{version:010d}")
        merged.write.mode("overwrite").parquet(path)
        served = m.spark.read.parquet(path)
        if m.op_col is not None and m.op_col in served.columns:
            served = served.filter(
                ~F.col(m.op_col).eqNullSafe(F.lit(m.delete_op))
            ).drop(m.op_col)
        served.createOrReplaceTempView(m.table_name)
        m._version = version
        m._gc_versions()

    def apply(self, m: "DimensionMaintainer", changes: DataFrame) -> None:
        self.publish(m, m._merge_full(changes))


class DeltaSnapshotBackend:
    """Delta Lake MERGE INTO publish — incremental: only the change
    rows move; the stored table never rewrites untouched files beyond
    Delta's own copy-on-write. Snapshot isolation and VACUUM-managed
    retention replace the keep_versions knob. Raises ImportError where
    delta-spark is absent (this environment), so callers/tests gate on
    construction, not on first batch.

    Tombstones are stored rows (soft delete, module docstring): a
    whenMatchedDelete would discard the winning version, letting a
    stale out-of-order upsert re-enter through whenNotMatchedInsert —
    which has no stored version left to gate on. One update clause +
    one insert clause, both version-gated, cover upserts AND deletes;
    the serving view filters op_col at read."""

    def __init__(self) -> None:
        from delta.tables import DeltaTable  # noqa: F401  (gate here)

        self._delta_table = DeltaTable

    def apply(self, m: "DimensionMaintainer", changes: DataFrame) -> None:
        path = os.path.join(m._root(), "delta")
        spark = m.spark
        on = merge_key_condition(m.key_cols)
        newer = version_wins_condition(m.version_cols)
        src = changes
        if m.op_col is not None:
            op = (
                F.col(m.op_col).cast("string")
                if m.op_col in src.columns
                else F.lit(None).cast("string")
            )
            # Normalize like apply_cdc: absent/null op means upsert.
            src = src.withColumn(m.op_col, F.coalesce(op, F.lit("U")))
        cols = {c: f"s.`{c}`" for c in src.columns}
        if not self._delta_table.isDeltaTable(spark, path):
            src.write.format("delta").mode("overwrite").save(path)
        else:
            dt = self._delta_table.forPath(spark, path)
            # A stale change (older version) matches but fires no
            # clause; a winning tombstone UPDATES the stored row to the
            # marker instead of deleting it.
            dt.alias("t").merge(src.alias("s"), on).whenMatchedUpdate(
                condition=newer, set=cols
            ).whenNotMatchedInsert(values=cols).execute()
        served = spark.read.format("delta").load(path)
        if m.op_col is not None and m.op_col in served.columns:
            served = served.filter(
                ~F.col(m.op_col).eqNullSafe(F.lit(m.delete_op))
            ).drop(m.op_col)
        served.createOrReplaceTempView(m.table_name)
        m._version += 1
