"""Declarative pipeline spec — the engine's "query language".

The reference's only user-facing surface is two JSON config files
(conf/tableConfig.json + conf/globalConfig.json parsed by
config/ConfigLoader.scala:11-32 into case classes GlobalConfig.scala:3-28
and TableConfig.scala:3-4). We keep the same JSON shape so a reference
user can bring their config unchanged, and compile it to a Spark plan
(plans/pipeline.py) instead of a hard-coded Beam graph.

On top of that shape we expose the real query surface: spark.sql() over
registered views — something the reference never had.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class TableSpec:
    """One table's wiring — mirror of reference TableConfig.scala:3-4
    plus conf/tableConfig.json fields (keys preserved verbatim)."""

    tableName: str
    metaTopicName: str | None = None
    opTopicName: str | None = None
    filterColumnName: str | None = None  # on-demand key column (P6)
    transactionTimeColumnName: str | None = None  # CDC ts column (A2/P7)
    isMetadata: bool = False
    isOperational: bool = False
    retentionPeriodInDays: int | None = None  # P7 retention window
    # Engine extensions (absent in reference): batch-mode paths.
    path: str | None = None  # parquet/csv/json location for batch dims
    format: str = "parquet"
    primaryKey: str = "ID"  # upsert key (J6; reference MERGE ... KEY(ID))
    # memTable=false (S4) JDBC scan parallelism: with bounds set, the dim
    # read is num_partitions parallel range queries on partitionColumn
    # (defaults to primaryKey); without, a single-connection scan.
    jdbcPartitionColumn: str | None = None
    jdbcLowerBound: int | None = None
    jdbcUpperBound: int | None = None
    jdbcNumPartitions: int = 8
    # Engine extension: at-least-once source dedup for the operational
    # stream (reference T6 is at-least-once and lets duplicates flow,
    # SURVEY §2.7). When set, the fact stream is deduplicated on these
    # keys within the watermark window (state bounded, executor-side).
    dedupKeys: list[str] | None = None
    eventTimeColumnName: str | None = None  # watermark column for dedup
    # Engine extension: declarative batch admission control — a list of
    # constraint dicts compiled by operators.dq.compile_spec and
    # evaluated in ONE aggregation pass before the table's data flows
    # downstream. "enforce" raises on any failure; "report" only
    # computes the report (caller reads it via builder.quality_report).
    qualityChecks: list[dict] | None = None
    qualityChecksMode: str = "enforce"  # "enforce" | "report"
    # Engine extension: Debezium-style op column in this table's CDC
    # feed — rows with opDeleteValue are tombstones and remove their
    # key from the maintained snapshot (the deletes the reference's
    # upsert-only H2 MERGE cannot express).
    opColumnName: str | None = None
    opDeleteValue: str = "D"


@dataclass(frozen=True)
class GlobalSpec:
    """Mirror of reference GlobalConfig.scala:3-28 (subset that affects
    semantics; deployment-only fields are carried opaquely in `extra`)."""

    kafkaServers: str | None = None
    offset: str = "earliest"  # -> startingOffsets
    memTable: bool = True  # True: broadcast replica; False: JDBC lookups
    jdbcUrl: str | None = None
    watermarkMinutes: int = 10  # reference intended watermark (T1)
    # Engine extension: shingle-hash implementation for the text-dedup
    # family. "md5" (default) is bit-identical across engines — the
    # oracle-checkable mode every correctness pairing pins. "xxhash64"
    # is the Spark-native codegen'd production mode (~1.5x end-to-end
    # on minhash at sf0.1, operators/text_dedup.py:50-66) for runs that
    # don't need cross-engine replay.
    hashFn: str = "md5"
    extra: dict = field(default_factory=dict)


@dataclass(frozen=True)
class PipelineSpec:
    global_spec: GlobalSpec
    tables: tuple[TableSpec, ...]

    @property
    def operational(self) -> TableSpec:
        """The fact stream table (reference DODETL.scala:23 takes the
        first isOperational table)."""
        ops = [t for t in self.tables if t.isOperational]
        if not ops:
            raise ValueError("pipeline spec has no operational table")
        return ops[0]

    @property
    def dimensions(self) -> tuple[TableSpec, ...]:
        """All metadata tables (a table may be both operational and
        metadata, like the reference's PRODUCT)."""
        return tuple(t for t in self.tables if t.isMetadata)


_TABLE_FIELDS = {f for f in TableSpec.__dataclass_fields__}
_GLOBAL_FIELDS = {f for f in GlobalSpec.__dataclass_fields__} - {"extra"}


def load_table_specs(path: str) -> tuple[TableSpec, ...]:
    with open(path) as fh:
        raw = json.load(fh)
    return tuple(TableSpec(**{k: v for k, v in t.items() if k in _TABLE_FIELDS}) for t in raw)


def load_global_spec(path: str) -> GlobalSpec:
    with open(path) as fh:
        raw = json.load(fh)
    known = {k: v for k, v in raw.items() if k in _GLOBAL_FIELDS}
    extra = {k: v for k, v in raw.items() if k not in _GLOBAL_FIELDS}
    return GlobalSpec(**known, extra=extra)


def load_pipeline_spec(conf_dir: str) -> PipelineSpec:
    """Resource-dir layout mirrors the reference's conf/ fallback
    (ConfigLoader.scala:11-21)."""
    return PipelineSpec(
        global_spec=load_global_spec(os.path.join(conf_dir, "globalConfig.json")),
        tables=load_table_specs(os.path.join(conf_dir, "tableConfig.json")),
    )
