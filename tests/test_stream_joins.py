"""Stream-stream interval join (streaming/joins.py): correctness across
micro-batches and the watermark state bound."""

from pyspark.sql import functions as F

from dod_etl_spark.streaming.joins import stream_interval_join


def _write_batch(spark, path, rows, schema):
    df = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.coalesce(1).write.mode("append").parquet(path)
    return df.schema


def test_stream_interval_join_matches_semantics(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    lschema = "k long, ts string, l_val string"
    rschema = "k long, ts string, r_val string"
    # left events at 10:00; right: one in-window (+30m), one out (+2h),
    # one wrong key.
    sch_l = _write_batch(
        spark, lsrc, [(1, "2024-01-01 10:00:00", "a"), (2, "2024-01-01 10:00:00", "b")], lschema
    )
    sch_r = _write_batch(
        spark,
        rsrc,
        [
            (1, "2024-01-01 10:30:00", "hit"),
            (1, "2024-01-01 12:30:00", "too_late"),
            (3, "2024-01-01 10:10:00", "wrong_key"),
        ],
        rschema,
    )
    ls = spark.readStream.schema(sch_l).parquet(lsrc)
    rs = (
        spark.readStream.schema(sch_r)
        .parquet(rsrc)
        .withColumnRenamed("ts", "r_ts")
        .withColumnRenamed("k", "r_k")
    )
    lw = ls.withWatermark("ts", "10 minutes")
    rw = rs.withWatermark("r_ts", "10 minutes")
    joined = lw.join(
        rw,
        (lw.k == rw.r_k)
        & (rw.r_ts >= lw.ts)
        & (rw.r_ts <= lw.ts + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM ssj_t").collect()
    assert [(r["k"], r["l_val"], r["r_val"]) for r in rows] == [(1, "a", "hit")]


def test_stream_interval_join_helper_plan_has_state_bound(spark, tmp_path):
    """The helper's range predicate must give Spark a state eviction
    horizon: the streaming plan contains the symmetric hash join with
    watermark-derived condition (no unbounded state)."""
    lsrc, rsrc = str(tmp_path / "l2"), str(tmp_path / "r2")
    sch = _write_batch(spark, lsrc, [(1, "2024-01-01 00:00:00", "x")], "k long, ts string, v string")
    _write_batch(spark, rsrc, [(1, "2024-01-01 00:10:00", "y")], "k long, ts string, v string")
    ls = spark.readStream.schema(sch).parquet(lsrc)
    rs = (
        spark.readStream.schema(sch)
        .parquet(rsrc)
        .withColumnRenamed("ts", "ts2")
        .withColumnRenamed("k", "k2")
        .withColumnRenamed("v", "v2")
    )
    out = stream_interval_join(
        ls, rs.withColumnRenamed("k2", "k"), "k", "ts", "ts2", max_lag="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_plan_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT * FROM ssj_plan_t").count() == 1
    prog = q.lastProgress
    # symmetric stream-stream join registers state store operators
    assert prog is not None and any(
        "symmetricHashJoin" in (op.get("operatorName") or "")
        for op in prog["stateOperators"]
    ), prog["stateOperators"]
