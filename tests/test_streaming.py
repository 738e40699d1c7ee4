"""Streaming-layer tests: dimension maintenance (A1/J6/A2 in
foreachBatch), strict-mode late-data retry (T2), sinks, and a real
file-source streaming run.

Strategy per SURVEY §5.5: logic is tested in batch via the foreachBatch
bodies directly (deterministic), plus one end-to-end availableNow run to
prove the streaming plumbing."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from dod_etl_spark import schemas
from dod_etl_spark.streaming.dimensions import DimensionMaintainer
from dod_etl_spark.streaming.pipeline import OeeStreamingPipeline
from dod_etl_spark.streaming.sinks import MemorySink, oee_text_lines
from dod_etl_spark.testing.fixtures import mes_fixture


def _dim_batch(spark, rows):
    return spark.createDataFrame(
        rows, "ID long, NAME string, COD_EQUIPMENT string, DT_LAST_MODIFICATION timestamp"
    )


def test_dimension_maintainer_upsert_and_high_water(spark):
    m = DimensionMaintainer(
        spark,
        table_name="dim_test_t1",
        key_cols=["ID"],
        version_cols=["DT_LAST_MODIFICATION"],
    )
    b1 = _dim_batch(
        spark,
        [
            (1, "a", "EQ1", None),
            (2, "b", "EQ1", None),
        ],
    ).withColumn("DT_LAST_MODIFICATION", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    m.apply_batch(b1, 0)
    assert spark.table("dim_test_t1").count() == 2

    # Batch 2: update ID=1 (newer version), insert ID=3.
    b2 = _dim_batch(
        spark,
        [
            (1, "a2", "EQ1", None),
            (3, "c", "EQ2", None),
        ],
    ).withColumn("DT_LAST_MODIFICATION", F.lit("2024-01-02 00:00:00").cast("timestamp"))
    m.apply_batch(b2, 1)
    snap = {r["ID"]: r["NAME"] for r in spark.table("dim_test_t1").collect()}
    assert snap == {1: "a2", 2: "b", 3: "c"}
    # A2 high-water mark advanced to batch 2's max ts.
    assert m.high_water["dim_test_t1"] == 1704153600000


def test_dimension_maintainer_stale_update_loses(spark):
    m = DimensionMaintainer(
        spark, table_name="dim_test_t2", key_cols=["ID"], version_cols=["DT_LAST_MODIFICATION"]
    )
    newer = _dim_batch(spark, [(1, "new", "EQ1", None)]).withColumn(
        "DT_LAST_MODIFICATION", F.lit("2024-01-05 00:00:00").cast("timestamp")
    )
    stale = _dim_batch(spark, [(1, "old", "EQ1", None)]).withColumn(
        "DT_LAST_MODIFICATION", F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    m.apply_batch(newer, 0)
    m.apply_batch(stale, 1)  # CDC replay out of order
    assert spark.table("dim_test_t2").first()["NAME"] == "new"


def test_strict_retry_pipeline_holds_and_releases(spark):
    """T2: an event whose production order hasn't arrived is buffered and
    enriched once the dimension shows up in a later batch."""
    fx = mes_fixture(spark)
    po_full = fx["production_order"]
    pq = fx["product_quality"]
    es = fx["equipment_status"]

    state = {"po": po_full.filter(F.col("ID") != 101)}  # PO 101 not arrived yet
    sink = MemorySink()
    pipe = OeeStreamingPipeline(
        spark,
        dims_fn=lambda: {
            "production_order": state["po"],
            "product_quality": pq,
            "equipment_status": es,
        },
        sink=sink,
    )

    # Batch 0: events needing PO 101 (events 1,2,4) miss; event 3 (PO 102) hits.
    pipe.process_batch(fx["product_events"].filter(F.col("ID") != 5), 0)
    batch0_ids = {r["ID"] for r in sink.batches[0]}
    assert 3 in batch0_ids and 1 not in batch0_ids
    assert pipe.pending == 3  # events 1, 2, 4 held

    # Dimension arrives; batch 1 has no new events but retries release.
    state["po"] = po_full
    pipe.process_batch(fx["product_events"].limit(0), 1)
    batch1_ids = {r["ID"] for r in sink.batches[1]}
    assert {1, 2, 4} <= batch1_ids
    assert pipe.pending == 0


def test_strict_retry_bounded(spark):
    fx = mes_fixture(spark)
    sink = MemorySink()
    pipe = OeeStreamingPipeline(
        spark,
        dims_fn=lambda: {
            "production_order": fx["production_order"].limit(0),
            "product_quality": fx["product_quality"],
            "equipment_status": fx["equipment_status"],
        },
        sink=sink,
        max_retry_batches=2,
    )
    ev = fx["product_events"].filter(F.col("ID") == 1)
    pipe.process_batch(ev, 0)
    assert pipe.pending == 1
    pipe.process_batch(ev.limit(0), 1)
    pipe.process_batch(ev.limit(0), 2)
    assert pipe.pending == 0  # dropped after max_retry_batches


def test_streaming_end_to_end_file_source(spark, tmp_path):
    """Real Structured Streaming run: file source -> foreachBatch strict
    pipeline -> memory sink, availableNow trigger."""
    fx = mes_fixture(spark)
    src = str(tmp_path / "events_src")
    fx["product_events"].write.parquet(src)

    sink = MemorySink()
    pipe = OeeStreamingPipeline(
        spark,
        dims_fn=lambda: {
            "production_order": fx["production_order"],
            "product_quality": fx["product_quality"],
            "equipment_status": fx["equipment_status"],
        },
        sink=sink,
    )
    stream = (
        spark.readStream.schema(fx["product_events"].schema).parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(pipe.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # Same grains as the batch pipeline (parity by construction).
    from dod_etl_spark.plans.pipeline import run_oee_pipeline

    batch_oee = run_oee_pipeline(
        fx["product_events"], fx["production_order"], fx["product_quality"], fx["equipment_status"]
    ).oee
    stream_ids = sorted((r["ID"], r["ID_EQUIPMENT_STATUS"]) for r in sink.rows)
    batch_ids = sorted(
        (r["ID"], r["ID_EQUIPMENT_STATUS"]) for r in batch_oee.collect()
    )
    assert stream_ids == batch_ids


def test_oee_text_lines(spark):
    fx = mes_fixture(spark)
    from dod_etl_spark.plans.pipeline import run_oee_pipeline

    oee = run_oee_pipeline(
        fx["product_events"], fx["production_order"], fx["product_quality"], fx["equipment_status"]
    ).oee
    lines = oee_text_lines(oee).collect()
    assert all("," in r["value"] for r in lines)
    assert len(lines) == oee.count()


def test_sliding_window_stream(spark, tmp_path):
    """Streaming twin of the sliding_window_agg batch query (T7
    overlapping windows): window(ts, 10m, 5m) over a file stream fans
    each event into exactly window/hop = 2 windows, so the count mass
    doubles and each event's two window starts are the floor-to-hop
    and its predecessor."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "ev")
    rows = [
        (1, "2024-01-01 10:03:00", 1.0),
        (2, "2024-01-01 10:07:00", 2.0),
        (3, "2024-01-01 10:12:00", 3.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, value double")
    df.withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("event_id long, ts timestamp, value double").parquet(src)
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_millis(F.col("w.start")).alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("slide_t")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["ws"]: r["n"] for r in spark.sql("SELECT * FROM slide_t").collect()}
    assert sum(got.values()) == 2 * len(rows)  # every event in exactly 2 windows
    base = 1704103200000  # 2024-01-01 10:00:00 UTC
    m5 = 300_000
    assert got == {
        base - m5: 1,       # 09:55-10:05: 10:03
        base: 2,            # 10:00-10:10: 10:03, 10:07
        base + m5: 2,       # 10:05-10:15: 10:07, 10:12
        base + 2 * m5: 1,   # 10:10-10:20: 10:12
    }


def test_session_window_stream(spark, tmp_path):
    """Native session_window() streaming aggregation (the engine's
    sessionize_events batch twin): events within a 30-minute gap merge
    into one growing session; a larger gap opens a new one. Pins the
    merged session extents and per-session counts against the lag-gap
    definition on the same data (boundary semantics coincide away from
    the exact-gap edge, which microsecond event time never hits)."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "ev")
    rows = [
        # user 1: one session of 3 (gaps 10m, 20m), then a 40m gap ->
        # second session of 1.
        (1, "2024-01-01 10:00:00", 1),
        (2, "2024-01-01 10:10:00", 1),
        (3, "2024-01-01 10:30:00", 1),
        (4, "2024-01-01 11:10:00", 1),
        # user 2: single-event session.
        (5, "2024-01-01 10:05:00", 2),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long")
    df.withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long"
    ).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("ss"),
            F.unix_millis(F.col("w.end")).alias("se"),
            "n",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_t")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["ss"]): (r["se"], r["n"])
        for r in spark.sql("SELECT * FROM sess_t").collect()
    }
    t0 = 1704103200000  # 2024-01-01 10:00:00 UTC
    m = 60_000
    # session end = last event + gap (session_window extent semantics).
    assert got == {
        (1, t0): (t0 + 30 * m + 30 * m, 3),          # 10:00..(10:30+gap)
        (1, t0 + 70 * m): (t0 + 70 * m + 30 * m, 1),  # 11:10..(+gap)
        (2, t0 + 5 * m): (t0 + 5 * m + 30 * m, 1),
    }


# --- CDC apply with deletes (operators/dedup.apply_cdc) ----------------------


def test_apply_cdc_upserts_and_deletes(spark):
    from dod_etl_spark.operators.dedup import apply_cdc

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "id INT, v STRING, ver INT"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 20, "U"),   # update
            (3, None, 20, "D"),   # delete
            (4, "d", 20, "I"),    # insert
            (1, "stale", 5, "U"), # older than base: ignored
        ],
        "id INT, v STRING, ver INT, op STRING",
    )
    out = {
        r["id"]: r["v"]
        for r in apply_cdc(base, changes, ["id"], ["ver"]).collect()
    }
    assert out == {1: "a", 2: "b2", 4: "d"}  # 3 deleted, 1 kept (stale change)


def test_apply_cdc_batch_composition(spark):
    """Applying change batches one-at-a-time equals applying their
    union — the property that makes micro-batch CDC replay safe."""
    from dod_etl_spark.operators.dedup import apply_cdc

    base = spark.createDataFrame([(1, "a", 0)], "id INT, v STRING, ver INT")
    b1 = spark.createDataFrame(
        [(1, "a1", 1, "U"), (2, "b", 1, "I")], "id INT, v STRING, ver INT, op STRING"
    )
    b2 = spark.createDataFrame(
        [(1, None, 2, "D"), (2, "b2", 2, "U")], "id INT, v STRING, ver INT, op STRING"
    )
    stepped = apply_cdc(
        apply_cdc(base, b1, ["id"], ["ver"]), b2, ["id"], ["ver"]
    )
    at_once = apply_cdc(base, b1.unionByName(b2), ["id"], ["ver"])
    assert sorted(map(tuple, stepped.collect())) == sorted(map(tuple, at_once.collect()))
    assert {r["id"]: r["v"] for r in stepped.collect()} == {2: "b2"}


def test_apply_cdc_delete_then_reinsert(spark):
    from dod_etl_spark.operators.dedup import apply_cdc

    base = spark.createDataFrame([(1, "a", 0)], "id INT, v STRING, ver INT")
    ch = spark.createDataFrame(
        [(1, None, 1, "D"), (1, "reborn", 2, "I")],
        "id INT, v STRING, ver INT, op STRING",
    )
    out = apply_cdc(base, ch, ["id"], ["ver"]).collect()
    assert [(r["id"], r["v"]) for r in out] == [(1, "reborn")]


def test_dimension_maintainer_cdc_deletes(spark):
    """op_col wiring: a tombstone change removes its key from the
    published snapshot; a later re-insert brings it back."""
    from dod_etl_spark.streaming.dimensions import DimensionMaintainer

    m = DimensionMaintainer(
        spark,
        table_name="dim_test_cdc",
        key_cols=["ID"],
        version_cols=["VER"],
        op_col="OP",
    )

    def batch(rows):
        return spark.createDataFrame(rows, "ID INT, NAME STRING, VER INT, OP STRING")

    m.apply_batch(batch([(1, "a", 1, "I"), (2, "b", 1, "I")]), 0)
    snap = {r["ID"]: r["NAME"] for r in spark.table("dim_test_cdc").collect()}
    assert snap == {1: "a", 2: "b"}
    assert "OP" not in spark.table("dim_test_cdc").columns

    m.apply_batch(batch([(1, "a2", 2, "U"), (2, None, 2, "D")]), 1)
    snap = {r["ID"]: r["NAME"] for r in spark.table("dim_test_cdc").collect()}
    assert snap == {1: "a2"}

    m.apply_batch(batch([(2, "b-reborn", 3, "I")]), 2)
    snap = {r["ID"]: r["NAME"] for r in spark.table("dim_test_cdc").collect()}
    assert snap == {1: "a2", 2: "b-reborn"}


def test_builder_wires_op_column(spark):
    from dod_etl_spark.config import GlobalSpec, PipelineSpec, TableSpec
    from dod_etl_spark.plans.builder import _make_maintainers

    spec = PipelineSpec(
        global_spec=GlobalSpec(),
        tables=(
            TableSpec(
                tableName="PRODUCTION_ORDER",
                isMetadata=True,
                primaryKey="ID",
                opColumnName="__op",
                opDeleteValue="d",
            ),
        ),
    )
    ms = _make_maintainers(spark, spec)
    assert ms["production_order"].op_col == "__op"
    assert ms["production_order"].delete_op == "d"


def test_apply_cdc_keep_tombstones_blocks_resurrection(spark):
    """Round-5 ADVICE (dedup.py:170): with the default read-optimized
    mode, a later batch carrying a LOWER-version upsert for a deleted
    key resurrects it (the tombstone it lost to was dropped with the
    snapshot). keep_tombstones=True retains the tombstone in the stored
    state, so batch-at-a-time equals all-at-once for any per-key total
    version order — cross-batch monotonicity no longer required."""
    from pyspark.sql import functions as F

    from dod_etl_spark.operators.dedup import apply_cdc

    base = spark.createDataFrame([(1, "a", 0, "U")], "id INT, v STRING, ver INT, op STRING")
    b1 = spark.createDataFrame([(1, None, 9, "D")], "id INT, v STRING, ver INT, op STRING")
    # out-of-order delivery: version 5 upsert arrives AFTER the v9 delete
    b2 = spark.createDataFrame([(1, "zombie", 5, "U")], "id INT, v STRING, ver INT, op STRING")

    # read-optimized mode resurrects (documented contract limitation)
    leaky = apply_cdc(apply_cdc(base, b1, ["id"], ["ver"]), b2, ["id"], ["ver"])
    assert {r["v"] for r in leaky.collect()} == {"zombie"}

    # store-optimized mode composes exactly
    s1 = apply_cdc(base, b1, ["id"], ["ver"], keep_tombstones=True)
    s2 = apply_cdc(s1, b2, ["id"], ["ver"], keep_tombstones=True)
    readable = s2.filter(F.col("op") != "D")
    assert readable.count() == 0  # delete wins: key stays dead
    at_once = apply_cdc(base, b1.unionByName(b2), ["id"], ["ver"])
    assert at_once.count() == 0
