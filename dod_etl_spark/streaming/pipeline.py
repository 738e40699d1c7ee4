"""Streaming OEE pipeline: the reference's Beam dataflow
(stp/BeamStreamProcessor.scala:37-121) as a Structured Streaming query
with hold-and-retry late-data semantics.

Two late-data modes (SURVEY §4.3.2):

- DEFAULT (watermark mode): `with_watermark` + stream-static left-outer
  enrichment. Spark-native, unbounded scale, documented deviation from
  the reference.

- STRICT (the reference's hold-until-dims-arrive behavior,
  BeamStreamProcessor.scala:56-64 + the missing-data list,
  InMemoryTableUpdaterManager.scala:19,67-78 — implemented for real; the
  reference's re-injection was dead code, SURVEY §2.10 item 2). The
  production path is `StrictReleasePipeline`: fact stream ∪ in-band
  dimension high-water markers -> applyInPandasWithState release gate
  (state on EXECUTORS, checkpointable; streaming/stateful.py) ->
  foreachBatch enrichment + OEE + sink. The driver never holds an event
  row.

- `OeeStreamingPipeline` below is the deterministic batch-drivable
  strict variant: a foreachBatch retry loop whose buffer spills to
  versioned parquet between batches (executors write and re-read it;
  the driver holds a path + count, never rows). Its cost model — the
  full enrichment re-planned for every held event each batch — is why
  `plans/builder.build_streaming_strict` wires the stateful gate
  pipeline as the production default.

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
class StrictReleasePipeline:
    """STRICT mode, production path: stateful release gate + enrichment.

    One streaming query: events_for_gate(facts) ∪ markers_for_gate(each
    dim CDC) -> strict_gate (per-bucket GroupState holds pending events
    until every required dimension's A2 high-water mark passes their
    timestamp) -> foreachBatch{ parse payload, enrich against the
    CURRENT dimension snapshots, route misses, OEE, sink }.

    Post-gate misses: release is gated on marks that ride the unioned
    stream, while enrichment reads the maintainer's snapshot view updated
    by a SEPARATE streaming query — so a released event can beat the
    snapshot merge by one micro-batch (the reference has the same window:
    marks published after the H2 MERGE, InMemoryTableUpdater.scala:
    173-215). With `regate_dir` set (the builder default), a miss that
    is actually RACING the snapshot merge re-enters the gate through a
    file-stream feedback loop — executors write the miss rows, the gate
    consumes them next micro-batch, by which time the snapshot merge has
    landed — making the race lossless.

    Racing vs genuinely absent is decided by SNAPSHOT FRESHNESS
    (`dim_tx_cols`): if every required dimension snapshot's own
    high-water mark (max tx-col) already covers the event's timestamp,
    the snapshot the enrichment just read was complete up to the event —
    the dim row is genuinely absent and routes straight to
    `missing_sink` (J5), with no wasted feedback hop. Only events whose
    snapshot was still behind re-gate, and the `_regate` counter in the
    payload bounds that loop (`max_regate`) as a backstop when freshness
    can't be established. Gate-expired events (patience exceeded) arrive
    released=false -> `dead_letter`.
    """

    spark: SparkSession
    dims_fn: Callable[[], dict[str, DataFrame]]
    sink: Callable[[DataFrame, int], None]
    required_tables: list[str] = field(default_factory=list)
    missing_sink: Callable[[DataFrame, int], None] | None = None
    dead_letter: Callable[[DataFrame, int], None] | None = None
    n_buckets: int = 16
    timeout_ms: int = 10 * 60 * 1000  # reference watermark T1
    # Applied to the raw event stream in start() BEFORE the gate — the
    # spec compiler wires prepare_event_stream here so configured
    # dedupKeys take effect without the caller remembering to apply them.
    pre: Callable[[DataFrame], DataFrame] | None = None
    # Feedback directory for the lossless re-gate loop (None disables:
    # every miss routes straight to missing_sink).
    regate_dir: str | None = None
    max_regate: int = 1
    # snapshot-table name -> CDC transaction-time column, used for the
    # freshness check (builder wires transactionTimeColumnName here).
    dim_tx_cols: dict[str, str] | None = None
    _event_schema: object = None

    def _snapshot_high_water_ms(self, dims: dict[str, DataFrame]) -> int | None:
        """Min over required dims of max(tx_col) in the CURRENT snapshot,
        as epoch ms — events at or below this instant cannot be racing
        the snapshot merge (the snapshot they were enriched against was
        complete past their timestamp). None = freshness unknowable
        (missing tx col / empty snapshot) -> caller falls back to the
        bounded regate counter. One tiny max() agg per required dim per
        batch; scalar result, no data to the driver beyond it."""
        if not self.dim_tx_cols:
            return None
        hws = []
        for table in self.required_tables:
            role = table.removeprefix("dim_")
            tx = self.dim_tx_cols.get(table) or self.dim_tx_cols.get(role)
            df = dims.get(role)
            if tx is None or df is None or tx not in df.columns:
                return None
            v = df.agg(
                F.unix_millis(F.max(F.col(tx).cast("timestamp"))).alias("hw")
            ).first()["hw"]
            if v is None:
                return None
            hws.append(v)
        return min(hws) if hws else None

    def _route_misses(
        self,
        released_rows: DataFrame,
        missing: DataFrame,
        batch_id: int,
        dims: dict[str, DataFrame] | None = None,
    ) -> None:
        """Misses re-enter the gate only while plausibly racing the
        snapshot merge (snapshot high-water < event_ts, bounded by
        `max_regate`); otherwise the dim row is genuinely absent and they
        go to missing_sink."""
        if self.regate_dir is None:
            if self.missing_sink is not None:
                self.missing_sink(missing, batch_id)
            return
        regate_n = F.coalesce(
            F.get_json_object(F.col("payload"), "$._regate").cast("int"), F.lit(0)
        )
        miss_rows = released_rows.join(
            F.broadcast(missing.select("ID").distinct()), "ID", "left_semi"
        ).withColumn("_rg", regate_n)
        hw_ms = self._snapshot_high_water_ms(dims or {})
        # racing = the snapshot this batch enriched against did not yet
        # cover the event's instant. Unknown freshness -> assume racing
        # (the _rg counter still bounds the loop).
        racing = F.lit(True) if hw_ms is None else F.col("event_ts") > F.lit(hw_ms)
        if self.missing_sink is not None:
            settled_ids = miss_rows.filter(
                (F.col("_rg") >= self.max_regate) | ~racing
            ).select("ID")
            self.missing_sink(
                missing.join(F.broadcast(settled_ids), "ID", "left_semi"),
                batch_id,
            )
        retry = miss_rows.filter((F.col("_rg") < self.max_regate) & racing)
        parsed = F.from_json("payload", self._event_schema)
        fields = [f.name for f in self._event_schema.fields]
        new_payload = F.to_json(
            F.struct(
                *[parsed.getField(n).alias(n) for n in fields],
                (F.col("_rg") + 1).alias("_regate"),
            )
        )
        out = retry.select(
            "COD_EQUIPMENT", "ID", "event_ts", new_payload.alias("payload")
        )
        # Idempotent under micro-batch replay (foreachBatch is at-least-
        # once): each batch writes to its OWN subdirectory, committed by
        # atomic rename — a replayed batch sees the directory and skips,
        # so a miss row never re-enters the gate twice for one failure.
        # Underscore-prefixed staging dirs are invisible to Spark readers.
        import os
        import shutil

        batch_dir = os.path.join(self.regate_dir, f"b{batch_id:012d}")
        if os.path.exists(batch_dir):
            return
        # One materialization: cache, count from cache, write from cache
        # (the old limit(1).count() + write ran the miss-join/JSON-rebuild
        # plan twice per batch with misses).
        out = out.persist()
        try:
            if out.count() > 0:
                staging = os.path.join(self.regate_dir, f"_staging-b{batch_id:012d}")
                shutil.rmtree(staging, ignore_errors=True)
                out.write.mode("overwrite").parquet(staging)
                os.rename(staging, batch_dir)
        finally:
            out.unpersist()

    def release_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch body over the gate's output; directly callable in
        batch tests with GATE_OUTPUT_SCHEMA rows."""
        expired = batch.filter(~F.col("released"))
        if self.dead_letter is not None:
            self.dead_letter(expired, batch_id)

        released_rows = batch.filter(F.col("released"))
        ev = released_rows.select(
            F.from_json("payload", self._event_schema).alias("e")
        ).select("e.*")
        ev = normalize_events(ev)
        dims = self.dims_fn()
        enriched = enrich_with_orders(
            ev, dims["production_order"], dims["product_quality"]
        )
        ok, missing = split_missing_po(enriched)
        self._route_misses(released_rows, missing, batch_id, dims)
        grains = build_fact_grains(ok, dims["equipment_status"])
        self.sink(compute_oee(grains), batch_id)

    def gate_plan(
        self,
        event_stream: DataFrame,
        marker_streams: list[DataFrame],
        ts_col: str = "timestamp",
    ) -> DataFrame:
        """The declarative half: union shape -> stateful gate."""
        from dod_etl_spark.streaming.stateful import (
            FEEDBACK_SCHEMA,
            events_for_gate,
            regated_for_gate,
            strict_gate,
        )

        self._event_schema = event_stream.schema
        un = events_for_gate(event_stream, self.n_buckets, ts_col=ts_col)
        for m in marker_streams:
            un = un.unionByName(m)
        if self.regate_dir is not None:
            import os

            os.makedirs(self.regate_dir, exist_ok=True)
            # recursiveFileLookup: _route_misses commits each batch's
            # feedback into its own b<batch_id> subdirectory (atomic
            # rename = replay idempotency); the stream must descend into
            # them — a flat listing would silently never re-gate.
            fb = (
                self.spark.readStream.schema(FEEDBACK_SCHEMA)
                .option("recursiveFileLookup", "true")
                .parquet(self.regate_dir)
            )
            un = un.unionByName(regated_for_gate(fb, self.n_buckets))
        return strict_gate(un, self.required_tables, self.timeout_ms)

    def markers(self, cdc_stream: DataFrame, table_name: str, tx_col: str) -> DataFrame:
        from dod_etl_spark.streaming.stateful import markers_for_gate

        return markers_for_gate(cdc_stream, table_name, tx_col, self.n_buckets)

    def start(
        self,
        event_stream: DataFrame,
        marker_streams: list[DataFrame],
        checkpoint: str,
        ts_col: str = "timestamp",
        trigger: dict | None = None,
    ):
        if self.pre is not None:
            event_stream = self.pre(event_stream)
        gated = self.gate_plan(event_stream, marker_streams, ts_col=ts_col)
        writer = (
            gated.writeStream.foreachBatch(self.release_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
        )
        if trigger:
            writer = writer.trigger(**trigger)
        return writer.start()


@dataclass
class OeeStreamingPipeline:
    """STRICT-mode streaming pipeline with a retry buffer, spilled to
    versioned parquet between micro-batches — deterministic and
    batch-drivable (tests), with NO driver-resident rows: the buffer
    lives on storage, written and re-read by executors; the driver holds
    a path and a count. The default production path is still
    StrictReleasePipeline (GroupState gate; this variant re-plans the
    whole enrichment for held events every batch, which the gate
    avoids).

    `dims_fn` returns the *current* dimension snapshots each batch (the
    maintained temp views from streaming.dimensions) — so late dimension
    arrival between micro-batches is naturally picked up on retry.
    """

    spark: SparkSession
    dims_fn: Callable[[], dict[str, DataFrame]]
    sink: Callable[[DataFrame, int], None]
    max_retry_batches: int | None = None
    pre: Callable[[DataFrame], DataFrame] | None = None
    buffer_dir: str | None = None  # spill root; a mkdtemp if unset
    _retry_path: str | None = None
    _pending: int = 0
    _gen: int = 0

    def _buffer_root(self) -> str:
        if self.buffer_dir is None:
            import tempfile

            self.buffer_dir = tempfile.mkdtemp(prefix="oee_retry_")
        return self.buffer_dir

    def _retry_df(self, like: DataFrame) -> DataFrame:
        if self._retry_path is None:
            return like.limit(0)
        return self.spark.read.parquet(self._retry_path)

    def process_batch(self, new_events: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch body; directly callable in batch tests."""
        ev = normalize_events(new_events)
        if "_retries" not in ev.columns:
            ev = ev.withColumn("_retries", F.lit(0))
        batch = ev.unionByName(self._retry_df(ev))

        dims = self.dims_fn()
        enriched = enrich_with_orders(
            batch, dims["production_order"], dims["product_quality"]
        )
        ok, missing = split_missing_po(enriched)

        grains = build_fact_grains(ok.drop("_retries"), dims["equipment_status"])
        self.sink(compute_oee(grains), batch_id)

        # Misses go back to the buffer with their ORIGINAL wire shape so
        # the next batch re-enriches them from scratch. Write-then-
        # repoint (a fresh generation directory per batch): executors
        # write, the next batch's scan reads — row data never transits
        # the driver. Keep current+previous generations (dimensions.py
        # versioning discipline), GC older.
        import os
        import shutil

        miss_keys = missing.select("ID").distinct()
        retry = batch.join(F.broadcast(miss_keys), "ID", "left_semi").withColumn(
            "_retries", F.col("_retries") + 1
        )
        if self.max_retry_batches is not None:
            retry = retry.filter(F.col("_retries") <= self.max_retry_batches)
        path = os.path.join(self._buffer_root(), f"g{self._gen:010d}")
        self._gen += 1
        retry.write.mode("overwrite").parquet(path)
        n = self.spark.read.parquet(path).count()
        self._retry_path = path if n else None
        self._pending = int(n)
        for d in sorted(os.listdir(self.buffer_dir))[:-2]:
            shutil.rmtree(os.path.join(self.buffer_dir, d), ignore_errors=True)

    @property
    def pending(self) -> int:
        """Events currently held in the retry buffer."""
        return self._pending

    def start(self, event_stream: DataFrame, checkpoint: str):
        if self.pre is not None:
            event_stream = self.pre(event_stream)
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

    Events whose production-order lookup misses are DROPPED in this mode
    (split_missing_po routes them out and this plan discards the branch;
    stream-static joins have no watermark-expiry re-emission). Use
    StrictReleasePipeline when misses must be held for late dimensions,
    or route the missing branch yourself via run_oee_pipeline's split."""
    ev = with_watermark(normalize_events(events), event_ts_col)
    enriched = enrich_with_orders(ev, production_order, product_quality)
    ok, _missing = split_missing_po(enriched)
    grains = build_fact_grains(ok, equipment_status)
    return compute_oee(grains)
