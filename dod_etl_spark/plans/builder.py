"""Spec compiler: PipelineSpec (the reference-shaped JSON config) -> a
running Spark pipeline.

This is the analog of the reference's wiring entry point
(DODETL.scala:11-30): partition tables into one operational + N
metadata (:23-24), construct the processor, go. Differences are the
point: the output is a declarative Catalyst plan (batch) or a set of
Structured Streaming queries (streaming), not a hard-coded Beam graph.

Dimension sourcing honors the reference's mode switch
(stp/BeamStreamProcessor.scala:32-34): memTable=true replicates dims
in-memory (broadcast snapshot); memTable=false sources them from the
live database via JDBC (imtu/DatabaseManager.scala:22-28) — read ONCE
per plan as a (optionally partitioned) scan and joined set-based, never
one query per event.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from dod_etl_spark.config import GlobalSpec, PipelineSpec, TableSpec
from dod_etl_spark.operators.dedup import dedup_stream_exact, latest_per_key
from dod_etl_spark.plans.pipeline import OeeResult, run_oee_pipeline
from dod_etl_spark.sources.jdbc import read_jdbc
from dod_etl_spark.streaming.dimensions import DimensionMaintainer
from dod_etl_spark.streaming.pipeline import OeeStreamingPipeline, StrictReleasePipeline

# The MES role each configured table plays (reference hard-codes these
# table names in stp/BeamStreamProcessor.scala + DataTransformer.scala).
_DIM_ROLES = {
    "PRODUCTION_ORDER": "production_order",
    "PRODUCT_QUALITY": "product_quality",
    "EQUIPMENT_STATUS": "equipment_status",
    "PERIOD_SHIFT": "period_shift",
}


def _read_table(spark: SparkSession, t: TableSpec, g: GlobalSpec | None = None) -> DataFrame:
    """Source one table per the global mode switch: JDBC when
    memTable=false and a jdbcUrl is configured (S4), file path otherwise."""
    if g is not None and not g.memTable and g.jdbcUrl:
        part_col = t.jdbcPartitionColumn
        if part_col is None and t.jdbcLowerBound is not None:
            part_col = t.primaryKey
        return read_jdbc(
            spark,
            g.jdbcUrl,
            t.tableName,
            properties=dict(g.extra.get("jdbcProperties", {})),
            partition_column=part_col if t.jdbcLowerBound is not None else None,
            lower_bound=t.jdbcLowerBound,
            upper_bound=t.jdbcUpperBound,
            num_partitions=t.jdbcNumPartitions,
        )
    if t.path is None:
        raise ValueError(f"table {t.tableName} has no batch path configured")
    reader = spark.read.format(t.format)
    return reader.load(t.path)


def _compact(df: DataFrame, t: TableSpec) -> DataFrame:
    """CDC snapshot compaction (A1) keyed by the configured primary key,
    versioned by the transaction-time column when present."""
    if t.transactionTimeColumnName and t.transactionTimeColumnName in df.columns:
        return latest_per_key(df, [t.primaryKey], [t.transactionTimeColumnName])
    return df


def build_batch(spark: SparkSession, spec: PipelineSpec) -> OeeResult:
    """Batch mode: load every configured table from its source (path or
    JDBC per memTable), compact CDC dims, run the OEE plan. Unconfigured
    optional dims (PERIOD_SHIFT) are skipped exactly like the reference's
    TODO path."""
    g = spec.global_spec
    dims: dict[str, DataFrame] = {}
    for t in spec.dimensions:
        role = _DIM_ROLES.get(t.tableName.upper())
        if role is None:
            continue
        dims[role] = _compact(_read_table(spark, t, g), t)
    events = prepare_event_stream(spec, _read_table(spark, spec.operational, g))
    return run_oee_pipeline(
        events,
        dims["production_order"],
        dims["product_quality"],
        dims["equipment_status"],
    )


def prepare_event_stream(spec: PipelineSpec, events: DataFrame) -> DataFrame:
    """Pre-processing the spec asks for on the operational stream before
    it reaches a pipeline: watermark-windowed exact dedup when the table
    configures `dedupKeys` (+ `eventTimeColumnName`). Turns the
    reference's at-least-once Kafka consumption (T6) into
    effectively-once with executor-side, watermark-evicted state.

    `qualityChecks` (batch inputs only — a streaming frame cannot run
    the gate's aggregate eagerly; use `quality_gate(spec)` inside
    foreachBatch for the micro-batch twin): in "enforce" mode the whole
    load is rejected with the failed constraint names before any
    downstream work."""
    op = spec.operational
    if op.qualityChecks and not events.isStreaming and op.qualityChecksMode == "enforce":
        from dod_etl_spark.operators import dq

        events = dq.assert_checks(events, dq.compile_spec(op.qualityChecks))
    if op.dedupKeys:
        if not events.isStreaming:
            # Batch replay of the same config: plain key dedup (no
            # watermark state needed on a bounded input).
            return events.dropDuplicates(list(op.dedupKeys))
        if not op.eventTimeColumnName:
            raise ValueError(
                f"table {op.tableName}: dedupKeys requires eventTimeColumnName"
            )
        return dedup_stream_exact(
            events,
            list(op.dedupKeys),
            op.eventTimeColumnName,
            delay=f"{spec.global_spec.watermarkMinutes} minutes",
        )
    return events


def _make_maintainers(
    spark: SparkSession, spec: PipelineSpec, snapshot_root: str | None = None
) -> dict[str, DimensionMaintainer]:
    import os

    maintainers: dict[str, DimensionMaintainer] = {}
    for t in spec.dimensions:
        role = _DIM_ROLES.get(t.tableName.upper())
        if role is None:
            continue
        maintainers[role] = DimensionMaintainer(
            spark,
            table_name=f"dim_{role}",
            key_cols=[t.primaryKey],
            version_cols=[t.transactionTimeColumnName] if t.transactionTimeColumnName else [],
            filter_col=t.filterColumnName,
            retention_days=t.retentionPeriodInDays,
            retention_ts_col=t.transactionTimeColumnName,
            op_col=t.opColumnName,
            delete_op=t.opDeleteValue,
            snapshot_dir=os.path.join(snapshot_root, role) if snapshot_root else None,
        )
    return maintainers


def build_streaming(
    spark: SparkSession,
    spec: PipelineSpec,
    sink: Callable[[DataFrame, int], None],
    max_retry_batches: int | None = None,
) -> tuple[dict[str, DimensionMaintainer], OeeStreamingPipeline]:
    """TEST-SCALE streaming wiring: DimensionMaintainers + the
    driver-buffered retry pipeline (deterministic batch-drivable). For
    deployment use `build_streaming_strict` — its retry state lives in
    GroupState on executors."""
    maintainers = _make_maintainers(spark, spec)

    def dims_fn() -> dict[str, DataFrame]:
        return {role: spark.table(f"dim_{role}") for role in maintainers}

    pipeline = OeeStreamingPipeline(
        spark,
        dims_fn=dims_fn,
        sink=sink,
        max_retry_batches=max_retry_batches,
        pre=lambda ev: prepare_event_stream(spec, ev),
    )
    return maintainers, pipeline


def build_streaming_strict(
    spark: SparkSession,
    spec: PipelineSpec,
    sink: Callable[[DataFrame, int], None],
    missing_sink: Callable[[DataFrame, int], None] | None = None,
    dead_letter: Callable[[DataFrame, int], None] | None = None,
    n_buckets: int = 16,
    snapshot_root: str | None = None,
    required_roles: tuple[str, ...] = ("production_order", "product_quality", "equipment_status"),
    regate_dir: str | None = None,
) -> tuple[dict[str, DimensionMaintainer], StrictReleasePipeline]:
    """Streaming mode, STRICT default: one DimensionMaintainer per
    metadata table (the IMTU thread-per-table analog,
    InMemoryTableUpdaterManager.scala:32-38) + the stateful release
    pipeline. The caller attaches sources: each dim CDC stream feeds BOTH
    its maintainer (`maintainers[role].start(cdc, ckpt)`) and the gate's
    marker union (`pipeline.markers(cdc, f"dim_{role}", tx_col)`); the
    fact stream goes to `pipeline.start(events, marker_streams, ckpt)`.

    Gate timeout = the configured watermark (T1) — the reference's
    unbounded patience, bounded.

    `regate_dir` (auto-derived from snapshot_root when present) enables
    the lossless release/snapshot-race loop: a first post-gate miss
    re-enters the gate once instead of going straight to missing_sink."""
    import os

    maintainers = _make_maintainers(spark, spec, snapshot_root)
    if regate_dir is None and snapshot_root is not None:
        regate_dir = os.path.join(snapshot_root, "_regate")

    def dims_fn() -> dict[str, DataFrame]:
        return {role: spark.table(f"dim_{role}") for role in maintainers}

    # transactionTimeColumnName per snapshot, for the miss-routing
    # freshness check (racing the snapshot merge vs genuinely absent).
    dim_tx_cols = {
        f"dim_{_DIM_ROLES[t.tableName.upper()]}": t.transactionTimeColumnName
        for t in spec.dimensions
        if t.tableName.upper() in _DIM_ROLES and t.transactionTimeColumnName
    }

    pipeline = StrictReleasePipeline(
        spark,
        dims_fn=dims_fn,
        sink=sink,
        required_tables=[f"dim_{r}" for r in required_roles if r in maintainers],
        missing_sink=missing_sink,
        dead_letter=dead_letter,
        n_buckets=n_buckets,
        timeout_ms=spec.global_spec.watermarkMinutes * 60 * 1000,
        pre=lambda ev: prepare_event_stream(spec, ev),
        regate_dir=regate_dir,
        dim_tx_cols=dim_tx_cols,
    )
    return maintainers, pipeline


def build_dedup_candidates(docs: DataFrame, spec: PipelineSpec, **kwargs) -> DataFrame:
    """Spec-driven MinHash+LSH candidate pairs: the global `hashFn` knob
    selects the shingle hash (md5 = oracle-replayable default, xxhash64
    = production throughput mode; config.py GlobalSpec.hashFn). Keeps
    pipeline configs — not code — in charge of the speed/replayability
    trade, the same way memTable flips the dimension source."""
    from dod_etl_spark.operators.text_dedup import minhash_candidates

    return minhash_candidates(docs, hash_fn=spec.global_spec.hashFn, **kwargs)


def quality_report(spark: SparkSession, spec: PipelineSpec, events: DataFrame) -> DataFrame:
    """The operational table's configured constraint suite as a REPORT
    frame (constraint, metric, passed) — the "report" mode companion to
    the enforce gate in prepare_event_stream."""
    from dod_etl_spark.operators import dq

    op = spec.operational
    if not op.qualityChecks:
        raise ValueError(f"table {op.tableName} configures no qualityChecks")
    return dq.run_checks(events, dq.compile_spec(op.qualityChecks))


def quality_gate(spec: PipelineSpec):
    """foreachBatch-composable micro-batch gate from the spec's
    qualityChecks: returns fn(batch_df) -> batch_df that raises on a
    failing batch (enforce) or passes everything through (report —
    pair with quality_report on a sample for observability)."""
    from dod_etl_spark.operators import dq

    op = spec.operational
    suite = dq.compile_spec(op.qualityChecks or [])
    enforce = op.qualityChecksMode == "enforce"

    def gate(batch: DataFrame) -> DataFrame:
        if not suite or not enforce:
            return batch
        return dq.assert_checks(batch, suite)

    return gate
