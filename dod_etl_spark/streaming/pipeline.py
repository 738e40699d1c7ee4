"""Streaming OEE pipeline: the reference's Beam dataflow
(stp/BeamStreamProcessor.scala:37-121) as a Structured Streaming query
with hold-and-retry late-data semantics.

Two late-data modes (SURVEY §4.3.2):

- DEFAULT (watermark mode): `with_watermark` + stream-static left-outer
  enrichment. Events whose dimensions never arrive flow through
  null-enriched once the watermark expires — Spark-native, unbounded
  scale, documented deviation from the reference.

- STRICT (retry mode, the reference's exact behavior): events whose
  dimension lookups miss are buffered and re-injected ahead of the next
  micro-batch (BeamStreamProcessor.scala:56-64 + the missing-data list,
  InMemoryTableUpdaterManager.scala:19,67-78 — implemented for real; the
  reference's re-injection was dead code, SURVEY §2.10 item 2). Realized
  in foreachBatch: batch := new_events ∪ retry_buffer; enrich; split
  hits/misses; emit hits; persist misses as the next retry buffer. An
  optional `max_retry_batches` bounds state growth (the reference had
  unbounded patience).

Transformation logic is the SAME batch functions (plans/pipeline.py) —
batch/stream parity by construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dod_etl_spark.operators.enrich import (
    build_fact_grains,
    enrich_with_orders,
    normalize_events,
    split_missing_po,
)
from dod_etl_spark.operators.oee import compute_oee

WATERMARK = "10 minutes"  # reference constant, BeamStreamProcessor.scala:25-26 (T1)


def with_watermark(events: DataFrame, ts_col: str = "event_time", delay: str = WATERMARK) -> DataFrame:
    """T1: the reference declared a 10-minute watermark and never
    implemented it; we do."""
    return events.withWatermark(ts_col, delay)


@dataclass
class OeeStreamingPipeline:
    """STRICT-mode streaming pipeline with a retry buffer.

    `dims_fn` returns the *current* dimension snapshots each batch (the
    maintained temp views from streaming.dimensions) — so late dimension
    arrival between micro-batches is naturally picked up on retry.
    """

    spark: SparkSession
    dims_fn: Callable[[], dict[str, DataFrame]]
    sink: Callable[[DataFrame, int], None]
    max_retry_batches: int | None = None
    _retry_rows: list = field(default_factory=list)
    _retry_schema: object = None

    def _retry_df(self, like: DataFrame) -> DataFrame:
        if self._retry_rows:
            return self.spark.createDataFrame(self._retry_rows, schema=self._retry_schema)
        return like.limit(0)

    def process_batch(self, new_events: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch body; directly callable in batch tests."""
        ev = normalize_events(new_events)
        if "_retries" not in ev.columns:
            ev = ev.withColumn("_retries", F.lit(0))
        if self._retry_schema is None:
            self._retry_schema = ev.schema
        batch = ev.unionByName(self._retry_df(ev))

        dims = self.dims_fn()
        enriched = enrich_with_orders(
            batch, dims["production_order"], dims["product_quality"]
        )
        ok, missing = split_missing_po(enriched)

        grains = build_fact_grains(ok.drop("_retries"), dims["equipment_status"])
        self.sink(compute_oee(grains), batch_id)

        # Misses go back to the buffer with their ORIGINAL wire shape so
        # the next batch re-enriches them from scratch.
        miss_keys = missing.select("ID").distinct()
        retry = batch.join(F.broadcast(miss_keys), "ID", "left_semi").withColumn(
            "_retries", F.col("_retries") + 1
        )
        if self.max_retry_batches is not None:
            retry = retry.filter(F.col("_retries") <= self.max_retry_batches)
        self._retry_rows = retry.collect()

    @property
    def pending(self) -> int:
        """Events currently held in the retry buffer."""
        return len(self._retry_rows)

    def start(self, event_stream: DataFrame, checkpoint: str):
        return (
            event_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .start()
        )


def enrich_stream_default(
    events: DataFrame,
    production_order: DataFrame,
    product_quality: DataFrame,
    equipment_status: DataFrame,
    event_ts_col: str = "event_time",
) -> DataFrame:
    """DEFAULT (watermark) mode: pure declarative stream-static plan —
    watermarked events, broadcast left-outer dims, overlap join, OEE.
    Missing dims yield null-enriched rows (documented deviation)."""
    ev = with_watermark(normalize_events(events), event_ts_col)
    enriched = enrich_with_orders(ev, production_order, product_quality)
    ok, _missing = split_missing_po(enriched)
    grains = build_fact_grains(ok, equipment_status)
    return compute_oee(grains)
