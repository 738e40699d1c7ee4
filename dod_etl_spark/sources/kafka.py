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
    avro_schema_json: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S2: Avro CDC dimension stream. Requires the spark-avro package
    (from_avro); schema-registry wire format would strip the 5-byte
    header first (substring on the binary value)."""
    if not HAS_AVRO:
        raise NotImplementedError(
            "spark-avro not on the classpath; add org.apache.spark:spark-avro"
        )
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
