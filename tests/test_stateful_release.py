"""applyInPandasWithState strict late-data mode (T2): events are held in
per-equipment GroupState until the dimension high-water mark passes
them, across real micro-batches of ONE streaming query
(maxFilesPerTrigger=1 makes each file its own micro-batch)."""

from __future__ import annotations

import time

from dod_etl_spark.streaming.stateful import release_when_dims_arrive

SCHEMA = "COD_EQUIPMENT string, ID long, event_ts long, high_water long"


def test_hold_and_release_across_microbatches(spark, tmp_path):
    src = tmp_path / "batches"
    src.mkdir()

    # Micro-batch 1: EQ1 events 1 (ts 500) + 2 (ts 5000), hw 1000 ->
    # only 1 is releasable; EQ2 event 3 (ts 100), hw 50 -> held.
    b1 = spark.createDataFrame(
        [("EQ1", 1, 500, 1000), ("EQ1", 2, 5000, 1000), ("EQ2", 3, 100, 50)], SCHEMA
    )
    b1.coalesce(1).write.parquet(str(src / "b1"))
    time.sleep(1.1)  # file-source ordering is by modification time
    # Micro-batch 2: no new events; dimension progress ships as ID=-1
    # marker rows advancing the high-water to 10000 on both keys.
    b2 = spark.createDataFrame(
        [("EQ1", -1, -1, 10000), ("EQ2", -1, -1, 10000)], SCHEMA
    )
    b2.coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        release_when_dims_arrive(stream)
        .writeStream.format("memory")
        .queryName("released_t2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM released_t2").collect()
    out = {(r["ID"], r["released"]) for r in rows}
    # Event 1 released on hw 1000; events 2 and 3 only became releasable
    # after the batch-2 high-water advance — their presence proves the
    # GroupState survived the micro-batch boundary.
    assert (1, True) in out
    assert (2, True) in out
    assert (3, True) in out
    assert len(rows) == 3  # markers never emitted, no duplicates
