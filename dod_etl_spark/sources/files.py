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


def read_jsonl_quarantined(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """JSONL ingest with a quarantine split instead of silent drops.

    Returns (good, quarantine): good rows carry the declared schema;
    quarantine rows are (raw_line) for every line Spark could not bind
    to it (malformed JSON, or JSON whose values violate the schema).
    PERMISSIVE + a _corrupt_record column is the Spark-native way to
    keep bad input VISIBLE — DROPMALFORMED silently shrinks the corpus
    and FAILFAST kills a 100 TB job for one bad shard. Same posture as
    operators/quarantine.parse_with_quarantine for Kafka-carried JSON.

    Scale shape: one scan; the corrupt filter is a scan-stage
    predicate on the projected column, so the split costs no extra
    pass and no shuffle."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    # StructType.add MUTATES the caller's schema object; build fresh.
    with_corrupt = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    raw = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Spark requires caching/materializing when filtering on the
    # corrupt column alone in one plan per the referenced-column rule;
    # a checkpoint keeps both halves consistent with ONE read.
    raw = raw.localCheckpoint(eager=True)
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, quarantine


def read_csv_quarantined(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    multi_line: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of read_jsonl_quarantined. `multi_line=True` is needed
    when quoted fields embed newlines (document text usually does) —
    it trades per-file splittability for correctness, so prefer JSONL
    for text-bearing corpora and CSV for flat metadata tables."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    # StructType.add MUTATES the caller's schema object; build fresh.
    with_corrupt = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    raw = (
        spark.read.schema(with_corrupt)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("multiLine", multi_line)
        .option("escape", '"')
        .csv(path)
    )
    raw = raw.localCheckpoint(eager=True)
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, quarantine


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
