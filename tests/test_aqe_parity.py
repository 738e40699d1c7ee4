"""AQE on/off result parity: adaptive re-planning (coalesce, skew split,
join demotion) must never change ANSWERS, only plans. Guards the
query surface against plan-sensitive logic (e.g. anything accidentally
depending on partition counts or row order)."""

import pytest

from dod_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "name",
    ["q21_sole_blame_supplier", "q11_important_suppliers", "dedup_clusters",
     "token_budget_pack_docs"],
)
def test_aqe_off_same_result(spark, name):
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    rows_on = sorted(map(str, QUERIES[name](spark, SF).collect()))
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        rows_off = sorted(map(str, QUERIES[name](spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert rows_on == rows_off
