"""Runtime bloom-filter join pruning (Spark's runtime row-level filter).

At 100 TB the classic fact⋈filtered-dim join shuffles the entire fact
table even when the dim filter keeps 1% of keys. Spark's runtime bloom
filter (spark.sql.optimizer.runtime.bloomFilter.*, on by default since
3.5) builds a bloom filter over the filtered dim keys at runtime and
installs a might_contain() predicate on the fact SCAN — rows for
never-joining keys die before the shuffle, cutting shuffled bytes by
the dim selectivity. These tests pin that the session keeps the
feature enabled and that injection actually happens on a
sort-merge-join plan (the big-big shape where it matters; broadcast
joins don't need it — the hash table is already the filter).
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def bloom_confs(spark):
    """Lower size thresholds so injection triggers on KB-scale testdata
    (prod defaults gate on creation side <= 10MB, application side >=
    10GB scan — both tuned for cluster scale, not local fixtures)."""
    keys = (
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    # Force the sort-merge path: broadcast joins subsume the filter.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_enabled_by_default(spark):
    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"


def test_bloom_filter_injected_on_selective_dim_join(spark, sf_dir, bloom_confs):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderpriority = '1-URGENT'"
    )
    j = li.join(od, li.l_orderkey == od.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_orderpriority"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, plan[:4000]
    # The filter must sit on the fact (lineitem) side, keyed on the join key.
    assert "bloom_filter_agg" in plan
    # And the join itself is the big-big SMJ shape we forced.
    assert "SortMergeJoin" in plan


def test_bloom_filter_preserves_results(spark, sf_dir, bloom_confs):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderpriority = '1-URGENT'"
    )
    with_bloom = li.join(od, li.l_orderkey == od.o_orderkey).count()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        without = li.join(od, li.l_orderkey == od.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert with_bloom == without and with_bloom > 0
