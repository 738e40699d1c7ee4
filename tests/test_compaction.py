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


def test_zorder_file_skipping(spark, tmp_path):
    """write_zordered must make EVERY clustered column skippable: each
    output file's (min, max) span on each z-ordered column should
    cover a small fraction of the global range, vs ~100% per file for
    an unclustered write. Measured from the parquet footers (the same
    row-group stats the reader's predicate pushdown uses)."""
    from dod_etl_spark.catalog import load_table, write_zordered

    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    plain, zdir = str(tmp_path / "plain"), str(tmp_path / "zord")
    ev.repartition(16).write.parquet(plain)
    # 16 range-partitioned files = 4 z-prefix bits = both dimensions
    # split twice (8 files would split the leading dim twice and the
    # other once — its span only halves).
    write_zordered(ev, zdir, zorder_by=["user_id", "value"], n_files=16, bits=8)

    import pyspark.sql.functions as F

    def spans(d: str, col: str) -> float:
        """Mean per-file (max-min) span as a fraction of the global
        range — the quantity row-group min/max skipping prunes on."""
        files = sorted(glob.glob(d + "/part-*.parquet"))
        assert len(files) >= 4
        glob_row = spark.read.parquet(d).agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).first()
        width = float(glob_row["hi"] - glob_row["lo"]) or 1.0
        fr = []
        for f in files:
            r = spark.read.parquet(f).agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")
            ).first()
            fr.append((float(r["hi"] - r["lo"])) / width)
        return sum(fr) / len(fr)

    for col in ("user_id", "value"):
        plain_span = spans(plain, col)
        z_span = spans(zdir, col)
        # unclustered files each cover most of the range (value's tail
        # outliers keep its per-file maxima below 1.0); z-ordered files
        # must cover well under half of the unclustered span on BOTH
        # dimensions (measured: user_id 1.0 -> 0.44, value 0.65 -> 0.23).
        assert plain_span > 0.5, (col, plain_span)
        assert z_span < 0.5 * plain_span, (col, z_span, plain_span)
    # round-trip integrity
    assert spark.read.parquet(zdir).count() == ev.count()


def test_backfill_overwrites_only_its_partitions(spark, tmp_path):
    """catalog.backfill_partitions: re-running one day replaces exactly
    that day's rows — other partitions untouched, no duplicates, any
    number of re-runs."""
    from dod_etl_spark.catalog import backfill_partitions

    dest = str(tmp_path / "daily")
    full = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0),
         ("2024-01-02", 3, 30.0)],
        "day string, id int, v double",
    )
    backfill_partitions(full, dest, ["day"])

    # corrected day-1 recompute: one row dropped, one value changed
    fixed = spark.createDataFrame(
        [("2024-01-01", 1, 11.0)], "day string, id int, v double"
    )
    backfill_partitions(fixed, dest, ["day"])
    backfill_partitions(fixed, dest, ["day"])  # idempotent re-run

    got = sorted(
        (str(r["day"]), r["id"], r["v"])  # partition values read back typed
        for r in spark.read.parquet(dest).collect()
    )
    assert got == [("2024-01-01", 1, 11.0), ("2024-01-02", 3, 30.0)]


def test_bloom_filter_write_adds_structures(spark, tmp_path):
    """write_with_bloom must actually emit bloom structures: same data
    written with blooms is measurably larger than without (pyarrow
    here can't introspect bloom offsets, so footprint is the check),
    and reads back identically."""
    import os

    from pyspark.sql import functions as F

    from dod_etl_spark.catalog import write_with_bloom

    df = spark.range(50_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("k")
    ).coalesce(1)
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    df.write.parquet(plain)
    write_with_bloom(df, bloomed, ["k"], expected_ndv=50_000)

    def psize(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    assert psize(bloomed) > psize(plain) + 10_000
    assert spark.read.parquet(bloomed).count() == 50_000
