"""Spec compiler: PipelineSpec (the reference-shaped JSON config) -> a
running Spark pipeline.

This is the analog of the reference's wiring entry point
(DODETL.scala:11-30): partition tables into one operational + N
metadata (:23-24), construct the processor, go. Differences are the
point: the output is a declarative Catalyst plan (batch) or a set of
Structured Streaming queries (streaming), not a hard-coded Beam graph.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from dod_etl_spark.config import PipelineSpec, TableSpec
from dod_etl_spark.operators.dedup import latest_per_key
from dod_etl_spark.plans.pipeline import OeeResult, run_oee_pipeline
from dod_etl_spark.streaming.dimensions import DimensionMaintainer
from dod_etl_spark.streaming.pipeline import OeeStreamingPipeline

# The MES role each configured table plays (reference hard-codes these
# table names in stp/BeamStreamProcessor.scala + DataTransformer.scala).
_DIM_ROLES = {
    "PRODUCTION_ORDER": "production_order",
    "PRODUCT_QUALITY": "product_quality",
    "EQUIPMENT_STATUS": "equipment_status",
    "PERIOD_SHIFT": "period_shift",
}


def _read_table(spark: SparkSession, t: TableSpec) -> DataFrame:
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
    """Batch mode: load every configured table from its path, compact
    CDC dims, run the OEE plan. Unconfigured optional dims (PERIOD_SHIFT)
    are skipped exactly like the reference's TODO path."""
    dims: dict[str, DataFrame] = {}
    for t in spec.dimensions:
        role = _DIM_ROLES.get(t.tableName.upper())
        if role is None:
            continue
        dims[role] = _compact(_read_table(spark, t), t)
    events = _read_table(spark, spec.operational)
    return run_oee_pipeline(
        events,
        dims["production_order"],
        dims["product_quality"],
        dims["equipment_status"],
    )


def build_streaming(
    spark: SparkSession,
    spec: PipelineSpec,
    sink: Callable[[DataFrame, int], None],
    max_retry_batches: int | None = None,
) -> tuple[dict[str, DimensionMaintainer], OeeStreamingPipeline]:
    """Streaming mode: one DimensionMaintainer per metadata table (the
    IMTU thread-per-table analog, InMemoryTableUpdaterManager.scala:32-38)
    + the strict hold-and-retry fact pipeline. The caller attaches
    sources (kafka/file streams) with .start(); tests drive apply_batch /
    process_batch directly."""
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
        )

    def dims_fn() -> dict[str, DataFrame]:
        return {role: spark.table(f"dim_{role}") for role in maintainers}

    pipeline = OeeStreamingPipeline(
        spark, dims_fn=dims_fn, sink=sink, max_retry_batches=max_retry_batches
    )
    return maintainers, pipeline
