"""Skew-mitigation (operators/skew.py) and bucketed co-located joins
(catalog.write_bucketed): correctness vs the plain formulations, plus
the plan shapes that make them worth having at scale."""

import re

from pyspark.sql import functions as F

from dod_etl_spark.catalog import load_table, write_bucketed
from dod_etl_spark.operators.skew import salted_collect_agg, salted_join

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    o = o.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(o, ["l_orderkey"])
    salted = salted_join(li, o, ["l_orderkey"], n_salts=8)
    cols = ["l_orderkey", "l_partkey", "l_quantity", "o_totalprice"]
    assert _rows(plain, cols) == _rows(salted, cols)


def test_salted_join_left_outer(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_linenumber")
    # Dim missing some keys -> left-outer must preserve unmatched rows once.
    o = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    )
    plain = li.join(o, ["l_orderkey"], "left")
    salted = salted_join(li, o, ["l_orderkey"], n_salts=4, how="left")
    cols = ["l_orderkey", "l_linenumber", "o_totalprice"]
    assert _rows(plain, cols) == _rows(salted, cols)


def test_salted_collect_agg_matches_plain(spark):
    li = load_table(spark, SF, "lineitem")
    plain = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_linenumber")).alias("l_linenumber_list")
    )
    salted = salted_collect_agg(li, ["l_orderkey"], "l_linenumber", n_salts=8)
    cols = ["l_orderkey", "l_linenumber_list"]
    a = sorted((r["l_orderkey"], tuple(r["l_linenumber_list"])) for r in plain.collect())
    b = sorted((r["l_orderkey"], tuple(r["l_linenumber_list"])) for r in salted.collect())
    assert a == b


def test_salted_partial_lists_are_bounded(spark):
    """The point of the two-phase shape: no single reducer sees a hot
    key's full row set. Build a skewed frame (one key holds ~half the
    rows) and check every (key, salt) partial stays well under the hot
    key's total."""
    li = load_table(spark, SF, "lineitem").withColumn(
        "hot_key", F.when(F.col("l_orderkey") % 3 == 0, 0).otherwise(F.col("l_orderkey"))
    )
    hot_total = li.filter(F.col("hot_key") == 0).count()
    assert hot_total > 100
    from dod_etl_spark.operators.skew import _content_salt

    partial_max = (
        li.withColumn("_s", _content_salt(li, 16, None))
        .groupBy("hot_key", "_s")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert partial_max < hot_total / 2  # spread across salts, not one reducer


def test_bucketed_join_has_no_exchange(spark):
    """Same-key/same-count bucketed tables must join with ZERO Exchange:
    the write-once shuffle is reused by every subsequent join. (An
    in-partition Sort remains — modern Spark drops bucketed-scan output
    ordering unless spark.sql.legacy.bucketedTableScan.outputOrdering is
    set; that sort is local CPU, not network, so it's not a scale
    concern.)"""
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(o, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = joined._jdf.queryExecution().explainString(mode)
        assert len(re.findall(r"\bExchange\b[^\n(]*\(\d+\)", plan)) == 0, plan
        # and it's still the right answer
        n_plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_salted_join_rejects_small_side_preserving_modes(spark):
    """right/full would emit each unmatched replicated small-side row
    n_salts times; the guard refuses those modes up front."""
    import pytest

    li = load_table(spark, SF, "lineitem").select("l_orderkey")
    o = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(li, o, ["l_orderkey"], n_salts=4, how=how)
