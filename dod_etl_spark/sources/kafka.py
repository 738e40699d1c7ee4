"""Kafka sources (S1/S2/S3): config-driven stream builders.

Reference: KafkaIO fact stream (stp/BeamStreamProcessor.scala:43-51),
per-dimension Avro CDC consumers (imtu/InMemoryTableUpdaterManager.scala:
43-53), and the bounded full-topic replay (imtu/InMemoryTableUpdater.
scala:106-171).

No broker exists in CI: these builders are exercised by plan-construction
tests, and the streaming test-suite drives the same downstream logic from
file sources (the logic is source-agnostic by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

try:  # spark-avro is a separate artifact; gate it.
    from pyspark.sql.avro.functions import from_avro  # noqa: F401

    HAS_AVRO = True
except ImportError:  # pragma: no cover
    HAS_AVRO = False


def fact_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    event_schema: StructType,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1: JSON fact stream -> typed columns.

    The reference parsed into Map[String,Object] per event
    (UtilDODETL.scala:35-38); we declare the schema once (P1/F10 via
    from_json) so everything downstream is columnar."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), event_schema).alias("data")
    ).select("data.*")


def cdc_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    avro_schema_json: str | None = None,
    starting_offsets: str = "earliest",
    registry_url: str | None = None,
    subject: str | None = None,
    registry_client=None,
) -> DataFrame:
    """S2: Avro CDC dimension stream (Confluent wire format: the 5-byte
    magic+schema-id header is stripped before from_avro). The reader
    schema comes from either an explicit `avro_schema_json` literal or a
    Schema Registry lookup (`registry_url` + `subject`, or an injected
    `registry_client` for tests) — the registry path mirrors the
    reference's GenericRecord consumption
    (imtu/InMemoryTableUpdaterManager.scala:43-53); see
    sources/schema_registry.py for the evolution contract."""
    if not HAS_AVRO:
        raise NotImplementedError(
            "spark-avro not on the classpath; add org.apache.spark:spark-avro"
        )
    if avro_schema_json is None:
        if registry_client is None:
            if registry_url is None or subject is None:
                raise ValueError(
                    "cdc_stream needs avro_schema_json or registry_url+subject"
                )
            from dod_etl_spark.sources.schema_registry import SchemaRegistryClient

            registry_client = SchemaRegistryClient(registry_url)
        if subject is None:
            raise ValueError("registry path needs a subject")
        _, avro_schema_json = registry_client.latest_schema(subject)
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        from_avro(F.expr("substring(value, 6, length(value)-5)"), avro_schema_json).alias("r"),
        F.col("offset"),
    ).select("r.*", "offset")


def bounded_replay(
    spark: SparkSession,
    brokers: str,
    topic: str,
) -> DataFrame:
    """S3: bounded full-topic re-read — the reference's
    assign/seekToBeginning/endOffsets dance (InMemoryTableUpdater.scala:
    106-127) is two options on a batch Kafka read."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
    )
