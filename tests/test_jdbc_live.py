"""Live JDBC round-trip for S4 (source) and S7 (sink) against embedded
Apache Derby — no server process, same trick as the reference's embedded
H2 (imtu/DatabaseManager.scala:22-28, utils/JDBCSink.scala:13-31).

The Derby jars ship inside pyspark/jars, so in this environment the
tests run for real; anywhere the driver class is absent they self-skip,
mirroring the self-skipping live-Kafka tests.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.sources.jdbc import read_jdbc
from dod_etl_spark.streaming.sinks import jdbc_batch_writer

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    try:
        spark._jvm.java.lang.Class.forName(DRIVER)
    except Exception:
        pytest.skip("Derby driver not on the Spark classpath")
    db = tmp_path_factory.mktemp("derby") / "db"
    return f"jdbc:derby:{db};create=true"


def _props():
    return {"driver": DRIVER}


def test_s7_jdbc_sink_roundtrip_nan_guard(spark, derby_url):
    """S7: foreachBatch writer appends batches; NaN doubles are scrubbed
    to 0.0 (JDBCSink.scala:21) and INGESTED_AT is stamped (NOW(3)
    analog). Verified by reading back through spark.read.jdbc."""
    batch = spark.createDataFrame(
        [(1, 0.5), (2, float("nan")), (3, 2.25)], "id int, oee double"
    )
    write = jdbc_batch_writer(derby_url, "OEE_OUT", _props())
    write(batch, 0)
    write(batch.filter(F.col("id") == 1), 1)  # second batch appends

    back = spark.read.format("jdbc").options(
        url=derby_url, dbtable="OEE_OUT", **_props()
    ).load()
    rows = {(r["id"], r["oee"]) for r in back.collect()}
    assert len(rows) == 3  # ids 1 (twice, same value), 2, 3
    assert back.count() == 4
    vals = {r["id"]: r["oee"] for r in back.collect()}
    assert vals[2] == 0.0  # NaN scrubbed, not propagated
    assert not any(math.isnan(v) for v in vals.values())
    assert "INGESTED_AT" in back.columns
    assert back.filter(F.col("INGESTED_AT").isNull()).count() == 0


def test_s4_jdbc_source_partitioned_scan(spark, derby_url):
    """S4: read_jdbc with partition bounds issues parallel range queries
    — the scan comes back as num_partitions tasks, rows complete and
    exactly-once across the ranges."""
    dim = spark.range(0, 1000).select(
        F.col("id").alias("pk"), (F.col("id") % 7).cast("int").alias("grp")
    )
    dim.write.mode("append").jdbc(derby_url, "DIM_SRC", properties=_props())

    got = read_jdbc(
        spark,
        derby_url,
        "DIM_SRC",
        _props(),
        partition_column="pk",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 1000
    assert got.select(F.sum("pk")).first()[0] == 999 * 1000 // 2
    # single-connection mode (no bounds) sees the same relation
    single = read_jdbc(spark, derby_url, "DIM_SRC", _props())
    assert single.count() == 1000


def test_s7_streaming_foreachbatch_into_jdbc(spark, derby_url, tmp_path):
    """End-to-end S7: a real writeStream.foreachBatch drains a file
    stream into Derby — the wiring the reference runs per-event through
    ForeachWriter, here set-based per micro-batch."""
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    spark.createDataFrame(
        [(10, 0.25), (11, float("nan"))], "id int, oee double"
    ).write.parquet(str(src))

    stream = spark.readStream.schema("id int, oee double").parquet(str(src))
    q = (
        stream.writeStream.foreachBatch(jdbc_batch_writer(derby_url, "OEE_STREAM", _props()))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    back = spark.read.format("jdbc").options(
        url=derby_url, dbtable="OEE_STREAM", **_props()
    ).load()
    vals = {r["id"]: r["oee"] for r in back.collect()}
    assert vals == {10: 0.25, 11: 0.0}


def test_s7_idempotent_sink_survives_batch_replay(spark, derby_url):
    """jdbc_idempotent_writer: redelivering a micro-batch (same
    batch_id) must leave the table EXACTLY as if it ran once — the
    retry first deletes the partial/previous attempt. Distinct
    batch_ids still append."""
    from dod_etl_spark.streaming.sinks import jdbc_idempotent_writer

    write = jdbc_idempotent_writer(spark, derby_url, "OEE_IDEM", _props())
    b0 = spark.createDataFrame([(1, 0.5), (2, 1.5)], "id int, oee double")
    write(b0, 0)
    # simulate a post-write pre-commit failure: the SAME batch replays,
    # possibly with recomputed (identical) content
    write(b0, 0)
    write(b0, 0)
    b1 = spark.createDataFrame([(3, 2.5)], "id int, oee double")
    write(b1, 1)

    back = spark.read.format("jdbc").options(
        url=derby_url, dbtable="OEE_IDEM", **_props()
    ).load()
    assert back.count() == 3  # 2 from batch 0 (once), 1 from batch 1
    assert {r["id"] for r in back.collect()} == {1, 2, 3}
    assert {r["BATCH_ID"] for r in back.collect()} == {0, 1}
