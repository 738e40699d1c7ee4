"""Kafka source surface (S1/S2/S3): plan-construction checks, the
schema-registry client against canned responses, and a real-broker
round-trip that self-skips in broker-less environments (this sandbox).
"""

from __future__ import annotations

import json
import os
import socket
import struct

import pytest

from dod_etl_spark.sources.schema_registry import (
    SchemaRegistryClient,
    parse_wire_header,
)

BROKER = os.environ.get("SPARK_GRAFT_KAFKA_BROKER", "localhost:9092")

AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "ProductionOrder",
        "fields": [
            {"name": "ID", "type": "long"},
            {"name": "NAME", "type": ["null", "string"], "default": None},
        ],
    }
)


def _broker_reachable(addr: str) -> bool:
    host, _, port = addr.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=1):
            return True
    except OSError:
        return False


# --- Schema registry (canned responses, no live registry needed) -------------


def _canned_fetcher(url: str) -> dict:
    if url.endswith("/schemas/ids/7"):
        return {"schema": AVRO_SCHEMA}
    if url.endswith("/subjects/PRODUCTION_ORDER_META-value/versions/latest"):
        return {"id": 7, "version": 3, "schema": AVRO_SCHEMA}
    raise AssertionError(f"unexpected registry url {url}")


def test_registry_schema_by_id_cached():
    calls = []

    def fetcher(url):
        calls.append(url)
        return _canned_fetcher(url)

    c = SchemaRegistryClient("http://registry:8081/", fetcher=fetcher)
    assert json.loads(c.schema_by_id(7))["name"] == "ProductionOrder"
    c.schema_by_id(7)
    assert len(calls) == 1  # cached


def test_registry_latest_schema():
    c = SchemaRegistryClient("http://registry:8081", fetcher=_canned_fetcher)
    sid, schema = c.latest_schema("PRODUCTION_ORDER_META-value")
    assert sid == 7
    assert json.loads(schema)["fields"][0]["name"] == "ID"


def test_parse_wire_header():
    payload = b"\x00" + struct.pack(">I", 7) + b"avrobytes"
    sid, body = parse_wire_header(payload)
    assert sid == 7 and body == b"avrobytes"
    with pytest.raises(ValueError):
        parse_wire_header(b"\x01xxxxzz")  # bad magic
    with pytest.raises(ValueError):
        parse_wire_header(b"\x00\x00")  # truncated


# --- Plan construction (no broker connection happens until start, but the
# spark-sql-kafka connector jar must be on the classpath) ---------------------


def _kafka_connector_available(spark) -> bool:
    try:
        (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", "none:1")
            .option("subscribe", "probe")
            .load()
        )
        return True
    except Exception as e:  # AnalysisException: Failed to find data source
        return "Failed to find data source" not in str(e)


@pytest.fixture(scope="module")
def kafka_connector(spark):
    if not _kafka_connector_available(spark):
        pytest.skip("spark-sql-kafka connector not on the classpath")


def test_fact_stream_plan(spark, kafka_connector):
    from dod_etl_spark import schemas
    from dod_etl_spark.sources.kafka import fact_stream

    df = fact_stream(spark, BROKER, "PRODUCT_OP", schemas.PRODUCT_EVENTS)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [f.name for f in schemas.PRODUCT_EVENTS.fields]


def test_cdc_stream_plan_with_registry(spark, kafka_connector):
    from dod_etl_spark.sources.kafka import cdc_stream

    client = SchemaRegistryClient("http://registry:8081", fetcher=_canned_fetcher)
    df = cdc_stream(
        spark,
        BROKER,
        "PRODUCTION_ORDER_META",
        subject="PRODUCTION_ORDER_META-value",
        registry_client=client,
    )
    assert df.isStreaming
    assert {"ID", "NAME", "offset"} <= set(df.columns)


def test_cdc_stream_requires_schema_or_registry(spark):
    from dod_etl_spark.sources.kafka import cdc_stream

    with pytest.raises(ValueError):
        cdc_stream(spark, BROKER, "T")


# --- Live-broker round-trip (skips cleanly without a broker) -----------------


@pytest.mark.skipif(
    not _broker_reachable(BROKER),
    reason=f"no Kafka broker at {BROKER} (set SPARK_GRAFT_KAFKA_BROKER)",
)
def test_kafka_round_trip_bounded_replay(spark, tmp_path):  # pragma: no cover
    """S1/S3 plumbing end-to-end where a broker exists: batch-write JSON
    events to a topic, bounded_replay them back, parse, compare."""
    from pyspark.sql import functions as F

    from dod_etl_spark import schemas
    from dod_etl_spark.sources.kafka import bounded_replay
    from dod_etl_spark.testing.fixtures import mes_fixture

    topic = f"sg_test_{os.getpid()}"
    fx = mes_fixture(spark)
    (
        fx["product_events"]
        .select(F.to_json(F.struct("*")).alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BROKER)
        .option("topic", topic)
        .save()
    )
    raw = bounded_replay(spark, BROKER, topic)
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), schemas.PRODUCT_EVENTS).alias("d")
    ).select("d.*")
    assert sorted(r["ID"] for r in parsed.collect()) == [1, 2, 3, 4, 5]
