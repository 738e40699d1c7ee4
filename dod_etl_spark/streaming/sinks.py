"""Sinks: the reference's S6 (text files) and S7 (JDBC) surfaces.

Reference: TextIO.write().to("oee") (stp/BeamStreamProcessor.scala:118)
and the row-at-a-time ForeachWriter[Double] JDBC sink
(utils/JDBCSink.scala:13-31; NaN -> 0.0 at :21).

Spark-first: both are foreachBatch set-based writes — the JDBC sink
batches one INSERT per partition instead of per row, and the NaN guard
is the nanvl column function (F9), applied before the write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import nan_to_zero


def oee_text_lines(oee: DataFrame) -> DataFrame:
    """S6 line shape: comma-joined CSV of the 9 OEE columns (the
    reference emitted bare doubles; we keep grain ids — SURVEY §2.10
    item 3)."""
    return oee.select(
        F.concat_ws(",", *[F.col(c).cast("string") for c in oee.columns]).alias("value")
    )


def write_text(oee: DataFrame, path: str) -> None:
    """S6 batch write; in streaming this is the foreachBatch body."""
    oee_text_lines(oee).write.mode("append").text(path)


def jdbc_batch_writer(url: str, table: str, properties: dict[str, str]):
    """S7: foreachBatch JDBC writer factory. NaN-scrubs double columns
    (JDBCSink.scala:21) and appends an ingest timestamp (NOW(3) analog).
    Gated: only usable where a JDBC driver is on the classpath."""

    def write(batch: DataFrame, batch_id: int) -> None:
        out = batch
        for f_ in batch.schema.fields:
            if f_.dataType.simpleString() == "double":
                out = out.withColumn(f_.name, nan_to_zero(F.col(f_.name)))
        out = out.withColumn("INGESTED_AT", F.current_timestamp())
        out.write.mode("append").jdbc(url, table, properties=properties)

    return write


class MemorySink:
    """Test sink: collects every batch's rows (MemorySink analog usable
    from foreachBatch)."""

    def __init__(self) -> None:
        self.batches: list[list] = []

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        self.batches.append(df.collect())

    @property
    def rows(self) -> list:
        return [r for b in self.batches for r in b]
