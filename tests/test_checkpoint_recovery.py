"""Checkpoint recovery (T6): a restarted query resumes from committed
offsets — already-processed input is never re-emitted, new input is."""

from pyspark.sql import functions as F


def _emit(spark, path, rows):
    spark.createDataFrame(rows, "ID long, v string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_restart_resumes_from_offsets(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _emit(spark, src, [(1, "a"), (2, "b")])

    seen: list = []

    def sink(batch, batch_id):
        seen.extend((r["ID"], r["v"]) for r in batch.collect())

    def run_once():
        stream = spark.readStream.schema("ID long, v string").parquet(src)
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(seen) == [(1, "a"), (2, "b")]

    # restart with NO new data: nothing re-emitted
    seen.clear()
    run_once()
    assert seen == []

    # new file arrives; restart processes ONLY it
    _emit(spark, src, [(3, "c")])
    seen.clear()
    run_once()
    assert sorted(seen) == [(3, "c")]
