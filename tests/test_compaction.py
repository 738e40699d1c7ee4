"""Parquet compaction (catalog.compact_parquet)."""

import glob

from dod_etl_spark.catalog import compact_parquet, load_table

SF = "/root/testdata/sf0.001"


def test_compact_many_small_files(spark, tmp_path):
    src, dest = str(tmp_path / "frag"), str(tmp_path / "compact")
    li = load_table(spark, SF, "lineitem")
    li.repartition(40).write.parquet(src)  # simulate a fragmented sink
    assert len(glob.glob(src + "/part-*")) == 40
    n = compact_parquet(spark, src, dest, target_file_mb=256)
    files = glob.glob(dest + "/part-*")
    assert len(files) == n == 1  # tiny table -> one right-sized file
    assert spark.read.parquet(dest).count() == li.count()


def test_compact_sort_within_clusters_rows(spark, tmp_path):
    src, dest = str(tmp_path / "s"), str(tmp_path / "d")
    li = load_table(spark, SF, "lineitem")
    li.repartition(10).write.parquet(src)
    compact_parquet(spark, src, dest, sort_within_by=["l_shipdate"])
    out = spark.read.parquet(dest)
    assert out.count() == li.count()
    # within each output file rows are shipdate-clustered: per-partition
    # sortedness holds
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.spark_partition_id()).orderBy(F.monotonically_increasing_id())
    viol = (
        out.withColumn("prev", F.lag("l_shipdate").over(w))
        .filter(F.col("prev") > F.col("l_shipdate"))
        .count()
    )
    assert viol == 0
