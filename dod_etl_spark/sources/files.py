"""File sources: Parquet/JSON/CSV, batch and streaming.

The reference had no file formats at all (Kafka-carried JSON/Avro only,
SURVEY §2.1) — Parquet batch + file-streams are the idiomatic Spark
additions (and what CI exercises instead of Kafka)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Explicit schema always — inference is a full extra pass at 100 TB
    and can mis-type sparse columns."""
    return spark.read.schema(schema).json(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", header).csv(path)


def stream_parquet_dir(
    spark: SparkSession, path: str, schema: StructType, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based stream: the CI twin of the Kafka sources — one file per
    micro-batch reproduces the poll-loop cadence deterministically."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
