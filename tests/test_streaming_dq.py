"""Streaming admission control: the DQ constraint suite as a
foreachBatch gate — a failing micro-batch is quarantined (reported +
diverted), passing batches flow to the sink. The per-TABLE twin of the
per-row quarantine split, at micro-batch granularity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dod_etl_spark.operators import dq


def test_streaming_dq_gate(spark, tmp_path):
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    rej = str(tmp_path / "rejected")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    good = spark.createDataFrame(
        [(1, "click", 5.0), (2, "view", 7.0)], "event_id long, event_type string, value double"
    )
    bad = spark.createDataFrame(  # duplicate key + negative value
        [(3, "click", -1.0), (3, "view", 2.0)],
        "event_id long, event_type string, value double",
    )
    good.coalesce(1).write.parquet(str(src / "f1"))
    bad.coalesce(1).write.parquet(str(src / "f2"))

    suite = [
        dq.uniqueness("event_id"),
        dq.min_value("value", lo=0.0),
    ]
    reports = []

    def body(batch, bid):
        if batch.isEmpty():
            return
        report = dq.run_checks(batch, suite)
        rows = report.collect()
        reports.append((bid, rows))
        if all(r["passed"] == 1 for r in rows):
            batch.write.mode("append").parquet(out)
        else:
            batch.write.mode("append").parquet(rej)

    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    accepted = {r["event_id"] for r in spark.read.parquet(out).collect()}
    rejected = {r["event_id"] for r in spark.read.parquet(rej).collect()}
    assert accepted == {1, 2}
    assert rejected == {3}
    # Both batches produced reports; the failing one names its failures.
    assert len(reports) == 2
    failing = [rows for _bid, rows in reports if any(r["passed"] == 0 for r in rows)]
    assert len(failing) == 1
    failed_names = {r["constraint"] for r in failing[0] if r["passed"] == 0}
    assert failed_names == {"uniqueness(event_id)", "min(value)"}
