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


def jdbc_idempotent_writer(
    spark, url: str, table: str, properties: dict[str, str]
):
    """S7 with effective exactly-once: foreachBatch redelivers a
    micro-batch when a failure lands between the write and the
    checkpoint commit, so a bare append double-writes.  This variant
    stamps every row with its batch_id and makes the write a
    DELETE-batch-then-INSERT: a replayed batch first removes whatever
    the failed attempt managed to append, then writes the full batch —
    idempotent under any number of redeliveries, no distributed
    transaction needed.

    The DELETE is one driver-side JDBC statement (metadata-sized: it
    touches only the replayed batch's rows); the INSERT is the normal
    distributed per-partition append.  First-ever batch: the DELETE
    no-ops (or the table doesn't exist yet and the append creates it).
    """

    def write(batch: DataFrame, batch_id: int) -> None:
        jvm = spark._jvm
        try:
            if properties.get("driver"):
                jvm.java.lang.Class.forName(properties["driver"])
            conn = jvm.java.sql.DriverManager.getConnection(url)
            try:
                st = conn.createStatement()
                st.executeUpdate(
                    f"DELETE FROM {table} WHERE BATCH_ID = {int(batch_id)}"
                )
                st.close()
            finally:
                conn.close()
        except Exception:
            # table absent (first batch) — the append below creates it
            pass
        out = batch
        for f_ in batch.schema.fields:
            if f_.dataType.simpleString() == "double":
                out = out.withColumn(f_.name, nan_to_zero(F.col(f_.name)))
        out = out.withColumn("BATCH_ID", F.lit(int(batch_id)).cast("long"))
        out = out.withColumn("INGESTED_AT", F.current_timestamp())
        out.write.mode("append").jdbc(url, table, properties=properties)

    return write
