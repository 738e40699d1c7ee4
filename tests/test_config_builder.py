"""Config-driven pipeline: reference-shaped JSON -> batch plan /
streaming maintainers, end-to-end on the MES fixture."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.config import load_pipeline_spec
from dod_etl_spark.plans.builder import build_batch, build_streaming
from dod_etl_spark.plans.pipeline import run_oee_pipeline
from dod_etl_spark.streaming.sinks import MemorySink
from dod_etl_spark.testing.fixtures import mes_fixture


@pytest.fixture()
def conf_dir(spark, tmp_path):
    """Reference-shaped config (conf/tableConfig.json keys verbatim) with
    engine-extension batch paths pointing at fixture parquet."""
    fx = mes_fixture(spark)
    paths = {}
    for name, key in [
        ("PRODUCT", "product_events"),
        ("PRODUCTION_ORDER", "production_order"),
        ("PRODUCT_QUALITY", "product_quality"),
        ("EQUIPMENT_STATUS", "equipment_status"),
    ]:
        p = str(tmp_path / name.lower())
        fx[key].write.parquet(p)
        paths[name] = p

    tables = [
        {
            "tableName": "PRODUCT",
            "opTopicName": "PRODUCT_OP",
            "metaTopicName": "PRODUCT_META",
            "filterColumnName": "COD_EQUIPMENT",
            "isMetadata": False,
            "isOperational": True,
            "retentionPeriodInDays": 10,
            "path": paths["PRODUCT"],
        },
        {
            "tableName": "PRODUCTION_ORDER",
            "metaTopicName": "PRODUCTION_ORDER_META",
            "filterColumnName": "COD_EQUIPMENT",
            "transactionTimeColumnName": "DT_LAST_MODIFICATION",
            "isMetadata": True,
            "isOperational": False,
            "retentionPeriodInDays": 10,
            "path": paths["PRODUCTION_ORDER"],
        },
        {
            "tableName": "PRODUCT_QUALITY",
            "metaTopicName": "PRODUCT_QUALITY_META",
            "transactionTimeColumnName": "DT_LAST_MODIFICATION",
            "isMetadata": True,
            "isOperational": False,
            "path": paths["PRODUCT_QUALITY"],
        },
        {
            "tableName": "EQUIPMENT_STATUS",
            "metaTopicName": "EQUIPMENT_STATUS_META",
            "transactionTimeColumnName": "DT_LAST_MODIFICATION",
            "isMetadata": True,
            "isOperational": False,
            "path": paths["EQUIPMENT_STATUS"],
        },
    ]
    (tmp_path / "tableConfig.json").write_text(json.dumps(tables))
    (tmp_path / "globalConfig.json").write_text(
        json.dumps({"kafkaServers": "localhost:9092", "offset": "earliest", "memTable": True})
    )
    return str(tmp_path)


def test_spec_roundtrip(conf_dir):
    spec = load_pipeline_spec(conf_dir)
    assert spec.operational.tableName == "PRODUCT"
    assert {t.tableName for t in spec.dimensions} == {
        "PRODUCTION_ORDER",
        "PRODUCT_QUALITY",
        "EQUIPMENT_STATUS",
    }
    assert spec.global_spec.offset == "earliest"


def test_build_batch_matches_direct_pipeline(spark, conf_dir):
    spec = load_pipeline_spec(conf_dir)
    result = build_batch(spark, spec)
    fx = mes_fixture(spark)
    direct = run_oee_pipeline(
        fx["product_events"],
        fx["production_order"],
        fx["product_quality"],
        fx["equipment_status"],
    )
    got = sorted((r["ID"], r["ID_EQUIPMENT_STATUS"], r["OEE"]) for r in result.oee.collect())
    want = sorted((r["ID"], r["ID_EQUIPMENT_STATUS"], r["OEE"]) for r in direct.oee.collect())
    assert got == want


def test_build_streaming_wiring(spark, conf_dir):
    spec = load_pipeline_spec(conf_dir)
    sink = MemorySink()
    maintainers, pipeline = build_streaming(spark, spec, sink)
    assert set(maintainers) == {"production_order", "product_quality", "equipment_status"}

    fx = mes_fixture(spark)
    maintainers["production_order"].apply_batch(fx["production_order"], 0)
    maintainers["product_quality"].apply_batch(fx["product_quality"], 0)
    maintainers["equipment_status"].apply_batch(fx["equipment_status"], 0)
    pipeline.process_batch(fx["product_events"], 0)
    assert len(sink.rows) > 0
    assert pipeline.pending == 1  # event 5's PO 999 never arrives


def test_prepare_event_stream_dedup_knob(spark, tmp_path):
    """dedupKeys + eventTimeColumnName on the operational table inject a
    DeduplicateWithinWatermark node; without the knob the stream passes
    through untouched."""
    import json

    from dod_etl_spark.config import load_pipeline_spec
    from dod_etl_spark.plans.builder import prepare_event_stream

    conf = tmp_path / "conf"
    conf.mkdir()
    (conf / "globalConfig.json").write_text(json.dumps({"watermarkMinutes": 5}))
    (conf / "tableConfig.json").write_text(
        json.dumps(
            [
                {
                    "tableName": "EVENTS",
                    "isOperational": True,
                    "dedupKeys": ["ID"],
                    "eventTimeColumnName": "event_time",
                }
            ]
        )
    )
    spec = load_pipeline_spec(str(conf))
    assert spec.operational.dedupKeys == ["ID"]

    src = tmp_path / "events_src"
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "ID long, event_time string"
    ).withColumn("event_time", __import__("pyspark").sql.functions.col("event_time").cast("timestamp")).write.parquet(str(src))
    stream = spark.readStream.schema("ID long, event_time timestamp").parquet(str(src))
    out = prepare_event_stream(spec, stream)
    assert "dropDuplicatesWithinWatermark" in out._jdf.queryExecution().logical().toString() \
        or "DeduplicateWithinWatermark" in out._jdf.queryExecution().logical().toString()

    # no knob -> identity
    (conf / "tableConfig.json").write_text(
        json.dumps([{"tableName": "EVENTS", "isOperational": True}])
    )
    spec2 = load_pipeline_spec(str(conf))
    assert prepare_event_stream(spec2, stream) is stream


def test_prepare_event_stream_requires_ts(spark, tmp_path):
    import json

    import pytest as _pytest

    from dod_etl_spark.config import load_pipeline_spec
    from dod_etl_spark.plans.builder import prepare_event_stream

    conf = tmp_path / "conf"
    conf.mkdir()
    (conf / "globalConfig.json").write_text("{}")
    (conf / "tableConfig.json").write_text(
        json.dumps([{"tableName": "E", "isOperational": True, "dedupKeys": ["ID"]}])
    )
    spec = load_pipeline_spec(str(conf))
    # Streaming input without an event-time column is the error case;
    # a BATCH input with dedupKeys needs no watermark — plain dedup.
    stream = spark.readStream.format("rate").load()
    with _pytest.raises(ValueError, match="eventTimeColumnName"):
        prepare_event_stream(spec, stream)

    batch = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "ID long, v string")
    assert prepare_event_stream(spec, batch).count() == 2


def test_builder_wires_pre_dedup(spark, tmp_path):
    """build_streaming/build_streaming_strict attach prepare_event_stream
    as the pipeline `pre` hook, so configured dedupKeys take effect
    without the caller invoking it manually (ADVICE r2)."""
    import json

    from dod_etl_spark.config import load_pipeline_spec
    from dod_etl_spark.plans.builder import build_streaming, build_streaming_strict

    conf = tmp_path / "conf"
    conf.mkdir()
    (conf / "globalConfig.json").write_text(json.dumps({"watermarkMinutes": 5}))
    (conf / "tableConfig.json").write_text(
        json.dumps(
            [
                {
                    "tableName": "EVENTS",
                    "isOperational": True,
                    "dedupKeys": ["ID"],
                    "eventTimeColumnName": "event_time",
                }
            ]
        )
    )
    spec = load_pipeline_spec(str(conf))
    _, pipeline = build_streaming(spark, spec, MemorySink())
    _, strict = build_streaming_strict(spark, spec, MemorySink())
    dups = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "ID long, v string")
    assert pipeline.pre is not None and pipeline.pre(dups).count() == 2
    assert strict.pre is not None and strict.pre(dups).count() == 2


def test_cli_batch_end_to_end(spark, conf_dir, tmp_path):
    """python -m dod_etl_spark --mode batch: config in, OEE parquet out
    (runs in-process against the session fixture; the CLI builds its own
    session via getOrCreate, which reuses this one)."""
    from dod_etl_spark.__main__ import main

    out = str(tmp_path / "cli_out")
    rc = main(["--conf", conf_dir, "--output", out, "--mode", "batch"])
    assert rc == 0
    oee = spark.read.parquet(out + "/oee")
    assert oee.count() > 0
    assert "OEE" in oee.columns or len(oee.columns) > 3
    # retry branches persisted, not buffered
    assert spark.read.parquet(out + "/missing_po").columns


def test_cli_streaming_mode_refuses_without_broker(conf_dir, tmp_path):
    from dod_etl_spark.__main__ import main

    rc = main(["--conf", conf_dir, "--output", str(tmp_path / "x"), "--mode", "streaming"])
    assert rc == 2


def test_hashfn_knob_flows_to_minhash(spark, tmp_path):
    """GlobalSpec.hashFn selects the shingle hash for the spec-driven
    dedup path: md5 (default, oracle-replayable) vs xxhash64 (production
    throughput). The knob must survive JSON loading and show up in the
    compiled plan's expressions."""
    import json as _json

    from dod_etl_spark.config import load_global_spec
    from dod_etl_spark.plans.builder import build_dedup_candidates
    from dod_etl_spark.config import GlobalSpec, PipelineSpec, TableSpec

    p = tmp_path / "globalConfig.json"
    p.write_text(_json.dumps({"hashFn": "xxhash64", "memTable": True}))
    g = load_global_spec(str(p))
    assert g.hashFn == "xxhash64"
    # default stays the oracle-checkable md5
    assert GlobalSpec().hashFn == "md5"

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumped")],
        "doc_id long, text string",
    )
    spec = PipelineSpec(global_spec=g, tables=(TableSpec("D", isOperational=True),))
    # materialize=False: the production path localCheckpoints the banded
    # frame (truncating the logical plan to a LogicalRDD), which would
    # hide the hash expressions this test inspects.
    plan = (
        build_dedup_candidates(docs, spec, materialize=False)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "xxhash64" in plan and "md5" not in plan

    spec_md5 = PipelineSpec(
        global_spec=GlobalSpec(), tables=(TableSpec("D", isOperational=True),)
    )
    plan_md5 = (
        build_dedup_candidates(docs, spec_md5, materialize=False)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "md5" in plan_md5 and "xxhash64" not in plan_md5
    # Both modes produce the same candidate pair on this near-dup pair.
    assert build_dedup_candidates(docs, spec).count() == build_dedup_candidates(docs, spec_md5).count() == 1
