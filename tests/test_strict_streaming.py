"""Strict-mode production path (round-2 de-driverization):

- the full-payload release gate (events ∪ in-band dim high-water
  markers -> per-bucket GroupState) across real micro-batches,
- the builder-wired StrictReleasePipeline end-to-end on file streams,
- the executors-only versioned-parquet dimension snapshot,
- memTable=false JDBC dim sourcing (mocked reader — no DB in sandbox).
"""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.config import load_pipeline_spec
from dod_etl_spark.plans.builder import build_batch, build_streaming_strict
from dod_etl_spark.plans.pipeline import run_oee_pipeline
from dod_etl_spark.streaming.sinks import MemorySink
from dod_etl_spark.testing.fixtures import mes_fixture


def _write_conf(spark, tmp_path, global_overrides=None):
    fx = mes_fixture(spark)
    paths = {}
    for name, key in [
        ("PRODUCT", "product_events"),
        ("PRODUCTION_ORDER", "production_order"),
        ("PRODUCT_QUALITY", "product_quality"),
        ("EQUIPMENT_STATUS", "equipment_status"),
    ]:
        p = str(tmp_path / name.lower())
        fx[key].write.mode("overwrite").parquet(p)
        paths[name] = p
    tables = [
        {
            "tableName": "PRODUCT",
            "isMetadata": False,
            "isOperational": True,
            "path": paths["PRODUCT"],
        },
        {
            "tableName": "PRODUCTION_ORDER",
            "transactionTimeColumnName": "DT_LAST_MODIFICATION",
            "isMetadata": True,
            "path": paths["PRODUCTION_ORDER"],
        },
        {
            "tableName": "PRODUCT_QUALITY",
            "transactionTimeColumnName": "DT_LAST_MODIFICATION",
            "isMetadata": True,
            "path": paths["PRODUCT_QUALITY"],
        },
        {
            "tableName": "EQUIPMENT_STATUS",
            "transactionTimeColumnName": "DT_LAST_MODIFICATION",
            "isMetadata": True,
            "path": paths["EQUIPMENT_STATUS"],
        },
    ]
    g = {"memTable": True}
    g.update(global_overrides or {})
    (tmp_path / "tableConfig.json").write_text(json.dumps(tables))
    (tmp_path / "globalConfig.json").write_text(json.dumps(g))
    return str(tmp_path), fx


def test_full_gate_payload_roundtrip_across_microbatches(spark, tmp_path):
    """Events held in GroupState release with their payload intact once a
    later micro-batch's markers advance the required marks."""
    from dod_etl_spark.streaming.stateful import (
        events_for_gate,
        markers_for_gate,
        strict_gate,
    )

    fx = mes_fixture(spark)
    ev = fx["product_events"]
    gate_events = events_for_gate(ev, n_buckets=4)

    # Marker rows claiming dim progress at BASE+10h for both tables.
    late_po = fx["production_order"].withColumn(
        "DT_LAST_MODIFICATION", F.col("DT_LAST_MODIFICATION") + F.expr("INTERVAL 10 HOURS")
    )
    gate_markers = markers_for_gate(late_po, "dim_po", "DT_LAST_MODIFICATION", 4)

    src = tmp_path / "gate_src"
    src.mkdir()
    gate_events.coalesce(1).write.parquet(str(src / "b1"))
    time.sleep(1.1)  # file-source ordering is by modification time
    gate_markers.coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(gate_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        strict_gate(stream, required_tables=["dim_po"])
        .writeStream.format("memory")
        .queryName("gate_full")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM gate_full").collect()
    assert {r["ID"] for r in rows} == {1, 2, 3, 4, 5}
    assert all(r["released"] for r in rows)
    # Payload reconstructs the original wire row.
    payloads = {r["ID"]: json.loads(r["payload"]) for r in rows}
    orig = {r["ID"]: r.asDict() for r in fx["product_events"].collect()}
    assert payloads[1]["QUANTITY"] == orig[1]["QUANTITY"]
    assert payloads[2]["START_TIME"] == orig[2]["START_TIME"]


def test_build_streaming_strict_end_to_end(spark, tmp_path):
    """Full builder path on real file streams: maintainers populate the
    snapshots, the gate releases on in-band markers, foreachBatch
    enriches + sinks. Driver holds zero event state (no retry buffer
    attribute exists on the pipeline at all)."""
    conf_dir, fx = _write_conf(spark, tmp_path)
    spec = load_pipeline_spec(conf_dir)

    sink, missing, dead = MemorySink(), MemorySink(), MemorySink()
    maintainers, pipeline = build_streaming_strict(
        spark,
        spec,
        sink,
        missing_sink=missing,
        dead_letter=dead,
        n_buckets=4,
        snapshot_root=str(tmp_path / "snapshots"),
    )
    assert not hasattr(pipeline, "_retry_rows")

    # Dim CDC with DT_LAST_MODIFICATION = BASE+10h so every event
    # (max ts BASE+4.5h) becomes releasable.
    late = {
        role: fx[role].withColumn(
            "DT_LAST_MODIFICATION",
            F.col("DT_LAST_MODIFICATION") + F.expr("INTERVAL 10 HOURS"),
        )
        for role in ["production_order", "product_quality", "equipment_status"]
    }

    # 1. Maintainers consume their CDC streams (file sources).
    for role, df in late.items():
        src = str(tmp_path / f"cdc_{role}")
        df.write.parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        q = maintainers[role].start(
            stream, str(tmp_path / f"ckpt_{role}"), trigger={"availableNow": True}
        )
        q.awaitTermination(120)
        assert spark.catalog.tableExists(f"dim_{role}")

    # 2. Fact stream + marker streams -> strict pipeline.
    ev_src = str(tmp_path / "events_src")
    fx["product_events"].write.parquet(ev_src)
    ev_stream = spark.readStream.schema(fx["product_events"].schema).parquet(ev_src)
    marker_streams = []
    for role, df in late.items():
        src = str(tmp_path / f"cdc_{role}")
        cdc_stream = spark.readStream.schema(df.schema).parquet(src)
        marker_streams.append(
            pipeline.markers(cdc_stream, f"dim_{role}", "DT_LAST_MODIFICATION")
        )
    q = pipeline.start(
        ev_stream,
        marker_streams,
        str(tmp_path / "ckpt_gate"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)

    # Same grains as the batch pipeline; event 5 (PO 999) -> missing sink.
    batch_oee = run_oee_pipeline(
        fx["product_events"],
        fx["production_order"],
        fx["product_quality"],
        fx["equipment_status"],
    ).oee
    got = sorted((r["ID"], r["ID_EQUIPMENT_STATUS"]) for r in sink.rows)
    want = sorted((r["ID"], r["ID_EQUIPMENT_STATUS"]) for r in batch_oee.collect())
    assert got == want
    assert {r["ID"] for r in missing.rows} == {5}
    assert dead.rows == []


def test_dimension_snapshot_is_file_backed(spark, tmp_path):
    """The published snapshot must read from parquet (executors-only
    path), not a driver-materialized LocalRelation, and old versions are
    GC'd down to current+previous."""
    import os

    from dod_etl_spark.streaming.dimensions import DimensionMaintainer

    m = DimensionMaintainer(
        spark,
        table_name="dim_snap_test",
        key_cols=["ID"],
        version_cols=["DT_LAST_MODIFICATION"],
        snapshot_dir=str(tmp_path / "snap"),
    )
    batch = spark.createDataFrame(
        [(1, "a", "EQ1")], "ID long, NAME string, COD_EQUIPMENT string"
    ).withColumn("DT_LAST_MODIFICATION", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    for i in range(3):
        m.apply_batch(batch, i)

    snap = spark.table("dim_snap_test")
    assert len(snap.inputFiles()) > 0  # parquet-backed, not LocalRelation
    assert snap.count() == 1
    versions = sorted(d for d in os.listdir(str(tmp_path / "snap")) if d.startswith("v"))
    assert versions == ["v0000000002", "v0000000003"]


def test_high_water_mark_is_engine_side_utc(spark):
    """A2 mark must be epoch millis of the UTC instant regardless of
    driver timezone (computed via unix_millis, not naive .timestamp())."""
    from dod_etl_spark.streaming.dimensions import DimensionMaintainer

    m = DimensionMaintainer(
        spark, table_name="dim_hw_test", key_cols=["ID"], version_cols=["DT_LAST_MODIFICATION"]
    )
    batch = spark.createDataFrame([(1, "x")], "ID long, NAME string").withColumn(
        "DT_LAST_MODIFICATION", F.timestamp_millis(F.lit(1704153600000))
    )
    m.apply_batch(batch, 0)
    assert m.high_water["dim_hw_test"] == 1704153600000


def test_build_batch_jdbc_mode(spark, tmp_path, monkeypatch):
    """memTable=false + jdbcUrl routes every table read through read_jdbc
    (reference mode switch, BeamStreamProcessor.scala:32-34). No DB in
    the sandbox, so the reader is mocked; the assertion is the WIRING:
    which source was chosen and with what url/table."""
    import dod_etl_spark.plans.builder as builder_mod

    conf_dir, fx = _write_conf(
        spark, tmp_path, {"memTable": False, "jdbcUrl": "jdbc:mysql://db:3306/mes"}
    )
    spec = load_pipeline_spec(conf_dir)

    table_map = {
        "PRODUCT": fx["product_events"],
        "PRODUCTION_ORDER": fx["production_order"],
        "PRODUCT_QUALITY": fx["product_quality"],
        "EQUIPMENT_STATUS": fx["equipment_status"],
    }
    calls = []

    def fake_read_jdbc(spark_, url, table, properties, **kw):
        calls.append((url, table, kw))
        return table_map[table]

    monkeypatch.setattr(builder_mod, "read_jdbc", fake_read_jdbc)
    result = build_batch(spark, spec)

    assert {c[1] for c in calls} == set(table_map)
    assert all(c[0] == "jdbc:mysql://db:3306/mes" for c in calls)
    direct = run_oee_pipeline(
        fx["product_events"],
        fx["production_order"],
        fx["product_quality"],
        fx["equipment_status"],
    )
    assert sorted((r["ID"], r["ID_EQUIPMENT_STATUS"]) for r in result.oee.collect()) == sorted(
        (r["ID"], r["ID_EQUIPMENT_STATUS"]) for r in direct.oee.collect()
    )


def test_keyset_filter_null_key_no_duplicates(spark):
    """P6 NULL edge (round-1 finding): a NULL inside the observed-key set
    must not double-count NULL-keyed dimension rows."""
    from dod_etl_spark.operators.filters import keyset_filter

    dim = spark.createDataFrame(
        [(1, "EQ1"), (2, "EQ2"), (3, None), (4, None)],
        "ID long, COD_EQUIPMENT string",
    )
    observed = spark.createDataFrame([("EQ1",), (None,)], "k string")
    out = keyset_filter(dim, "COD_EQUIPMENT", observed.select("k"))
    ids = sorted(r["ID"] for r in out.collect())
    # EQ1 row passes via the semi-join; both NULL rows pass exactly once.
    assert ids == [1, 3, 4]


def test_dedup_stream_exact(spark, tmp_path):
    """Streaming dedup drops same-key records that arrive within the
    watermark window, across real micro-batches (state survives the
    boundary; eviction is watermark-driven)."""
    import time as _time

    from dod_etl_spark.operators.dedup import dedup_stream_exact

    schema = "ID long, payload string, event_time string"
    src = tmp_path / "dedup_src"
    src.mkdir()
    b1 = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00"), (2, "b", "2024-01-01 00:00:10")], schema
    ).withColumn("event_time", F.col("event_time").cast("timestamp"))
    b1.coalesce(1).write.parquet(str(src / "b1"))
    _time.sleep(1.1)
    # Batch 2: duplicate of ID=1 inside the window + one new key.
    b2 = spark.createDataFrame(
        [(1, "a-dup", "2024-01-01 00:00:20"), (3, "c", "2024-01-01 00:00:30")], schema
    ).withColumn("event_time", F.col("event_time").cast("timestamp"))
    b2.coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        dedup_stream_exact(stream, ["ID"], "event_time", "10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM dedup_stream_t").collect()
    assert sorted(r["ID"] for r in rows) == [1, 2, 3]
    assert {r["payload"] for r in rows if r["ID"] == 1} == {"a"}  # first wins


def test_regate_race_lossless(spark, tmp_path):
    """The release/snapshot race, made lossless: the PO row for event 1
    lands in the maintainer's snapshot one cycle AFTER its in-band
    marker released the event. First pass: enrichment misses while the
    PO snapshot's high-water is still BEHIND the event (racing) -> the
    miss re-enters the gate via the feedback stream, NOT missing_sink.
    Second pass (snapshot merged): the regated event produces grains.
    """
    conf_dir, fx = _write_conf(spark, tmp_path)
    spec = load_pipeline_spec(conf_dir)

    # The session-scoped fixture leaks dim_* temp views from earlier
    # tests; a leftover PO snapshot would absorb this test's stale-v1
    # merge and erase the race. Start from no views.
    for role in ["production_order", "product_quality", "equipment_status"]:
        spark.catalog.dropTempView(f"dim_{role}")

    sink, missing, dead = MemorySink(), MemorySink(), MemorySink()
    maintainers, pipeline = build_streaming_strict(
        spark,
        spec,
        sink,
        missing_sink=missing,
        dead_letter=dead,
        n_buckets=4,
        snapshot_root=str(tmp_path / "snapshots"),
    )
    assert pipeline.regate_dir is not None
    assert pipeline.dim_tx_cols  # freshness check is wired by builder

    late = lambda df: df.withColumn(  # noqa: E731
        "DT_LAST_MODIFICATION",
        F.col("DT_LAST_MODIFICATION") + F.expr("INTERVAL 10 HOURS"),
    )
    # PQ + ES snapshots are fully maintained up front (hw = BASE+10h).
    for role in ["product_quality", "equipment_status"]:
        src = str(tmp_path / f"cdc_{role}")
        late(fx[role]).write.parquet(src)
        stream = spark.readStream.schema(late(fx[role]).schema).parquet(src)
        maintainers[role].start(
            stream, str(tmp_path / f"ckpt_{role}"), trigger={"availableNow": True}
        ).awaitTermination(120)

    # PO CDC arrives in two files: v1 = only PO 102 at BASE (stale hw),
    # v2 = PO 101 (event 1's order) at BASE+10h — the LATE row.
    po = fx["production_order"]
    po_src = str(tmp_path / "cdc_production_order")
    po_v1 = po.filter(F.col("ID") == 102)
    po_v2 = late(po.filter(F.col("ID") == 101))
    po_v1.coalesce(1).write.mode("append").parquet(po_src)
    po_ckpt = str(tmp_path / "ckpt_production_order")
    po_schema = po.schema

    def run_po_maintainer():
        stream = spark.readStream.schema(po_schema).parquet(po_src)
        maintainers["production_order"].start(
            stream, po_ckpt, trigger={"availableNow": True}
        ).awaitTermination(120)

    run_po_maintainer()  # snapshot: {PO 102 @ BASE}; event 1 needs PO 101

    # Markers claim PO progress at BASE+10h (the marker beats the merge).
    marker_src = str(tmp_path / "po_markers")
    po_v2.coalesce(1).write.parquet(marker_src)

    ev_src = str(tmp_path / "events_src")
    fx["product_events"].filter(F.col("ID") == 1).write.parquet(ev_src)

    def run_gate():
        ev_stream = spark.readStream.schema(fx["product_events"].schema).parquet(ev_src)
        marker_streams = [
            pipeline.markers(
                spark.readStream.schema(po_schema).parquet(marker_src),
                "dim_production_order",
                "DT_LAST_MODIFICATION",
            )
        ]
        for role in ["product_quality", "equipment_status"]:
            src = str(tmp_path / f"cdc_{role}")
            marker_streams.append(
                pipeline.markers(
                    spark.readStream.schema(late(fx[role]).schema).parquet(src),
                    f"dim_{role}",
                    "DT_LAST_MODIFICATION",
                )
            )
        pipeline.start(
            ev_stream,
            marker_streams,
            str(tmp_path / "ckpt_gate"),
            trigger={"availableNow": True},
        ).awaitTermination(180)

    run_gate()
    # Racing, not settled: nothing in missing_sink, feedback written.
    assert missing.rows == []
    assert sink.rows == []
    import os

    assert any(d.startswith("b") for d in os.listdir(pipeline.regate_dir))

    # The late PO row lands; the maintainer merges it.
    po_v2.coalesce(1).write.mode("append").parquet(po_src)
    run_po_maintainer()

    run_gate()  # drains the feedback stream through the same checkpoint

    # The regated event now produces the same grains as the batch plan.
    batch_oee = run_oee_pipeline(
        fx["product_events"].filter(F.col("ID") == 1),
        po,
        fx["product_quality"],
        fx["equipment_status"],
    ).oee
    got = sorted((r["ID"], r["ID_EQUIPMENT_STATUS"]) for r in sink.rows)
    want = sorted((r["ID"], r["ID_EQUIPMENT_STATUS"]) for r in batch_oee.collect())
    assert got == want and got
    assert missing.rows == []
    assert dead.rows == []


def test_snapshot_retention_depth_knob(spark, tmp_path):
    """keep_versions widens the GC window for readers that can lag more
    than one merge cycle (the stand-in for lakehouse time-travel
    retention)."""
    import os

    from dod_etl_spark.streaming.dimensions import DimensionMaintainer

    m = DimensionMaintainer(
        spark,
        table_name="dim_keep4",
        key_cols=["ID"],
        version_cols=["DT_LAST_MODIFICATION"],
        snapshot_dir=str(tmp_path / "snap"),
        keep_versions=4,
    )
    batch = spark.createDataFrame([(1, "a")], "ID long, NAME string").withColumn(
        "DT_LAST_MODIFICATION", F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    for i in range(6):
        m.apply_batch(batch, i)
    versions = sorted(d for d in os.listdir(str(tmp_path / "snap")) if d.startswith("v"))
    assert versions == [f"v{v:010d}" for v in (3, 4, 5, 6)]
    assert spark.table("dim_keep4").count() == 1
