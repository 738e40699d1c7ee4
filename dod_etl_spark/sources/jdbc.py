"""JDBC source/sink (S4/S7 fallback): the reference's memTable=false mode
ran every lookup against live MySQL (imtu/DatabaseManager.scala:22-28,
selected at stp/BeamStreamProcessor.scala:32-34).

Spark-first: read the dimension ONCE per micro-batch as a partitioned
JDBC scan and join set-based — not one query per event."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str],
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """S4. With partition_column set, Spark issues num_partitions range
    queries in parallel (the only way a JDBC scan isn't a single-threaded
    bottleneck)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in properties.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()
