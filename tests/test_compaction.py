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


def test_partition_pruning(spark, tmp_path):
    """A filter on the partition column must become a PartitionFilter
    (directory pruning), not a data filter: non-matching partitions are
    never scheduled."""
    from dod_etl_spark.catalog import write_partitioned

    dest = str(tmp_path / "by_type")
    ev = load_table(spark, SF, "events")
    write_partitioned(ev, dest, ["event_type"])
    out = spark.read.parquet(dest).filter("event_type = 'click'")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), plan
    # and the pruned read returns exactly the partition's rows
    assert out.count() == ev.filter("event_type = 'click'").count()


def test_compact_sizes_partitioned_source(spark, tmp_path):
    """Hive-partitioned sources (col=value subdirs) must size from the
    RECURSIVE listing: with a 1 MB target and >1 MB of partitioned data
    the old non-recursive listStatus summed ~0 bytes and collapsed
    everything to one file."""
    src, dest = str(tmp_path / "part_src"), str(tmp_path / "part_dest")
    base = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    li = base
    for _ in range(3):  # inflate past the 1 MB target (partitioned parquet compresses)
        li = li.unionAll(base)
    li.write.partitionBy("l_returnflag").parquet(src)
    n = compact_parquet(spark, src, dest, target_file_mb=1)
    assert n > 1  # sized from real bytes, not the empty top-level listing
    assert spark.read.parquet(dest).count() == li.count()


def test_spread_skips_already_parallel_memory_input(spark):
    """Non-file-backed frames report zero inputFiles; spread() must probe
    rdd partitioning instead of unconditionally shuffling."""
    from dod_etl_spark.catalog import spread

    df = spark.range(1000).repartition(16)
    assert spread(df, min_partitions=8) is df
    tiny = spark.range(10).coalesce(1)
    assert spread(tiny, min_partitions=8).rdd.getNumPartitions() >= 8
