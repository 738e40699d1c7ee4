"""Corrupt-record quarantine (operators/quarantine.py)."""

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dod_etl_spark.operators.quarantine import parse_with_quarantine

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("name", StringType())]
)


def test_split_good_bad_and_required(spark):
    rows = [
        ('{"id": 1, "name": "a"}',),          # good
        ('{"id": 2}',),                        # parseable, missing required name
        ("not json at all",),                  # corrupt
        ('{"id": null, "name": "c"}',),        # missing required id
    ]
    raw = spark.createDataFrame(rows, "payload string")
    good, quar = parse_with_quarantine(raw, "payload", SCHEMA, required=["id", "name"])
    assert [(r["id"], r["name"]) for r in good.collect()] == [(1, "a")]
    q = sorted(r["payload"] for r in quar.collect())
    assert len(q) == 3 and "not json at all" in q
    # quarantine keeps the ORIGINAL payload column for replay
    assert quar.columns == ["payload"]


def test_no_required_fields_only_parse_failures_quarantined(spark):
    rows = [('{"id": 5}',), ("{{{",)]
    raw = spark.createDataFrame(rows, "payload string")
    good, quar = parse_with_quarantine(raw, "payload", SCHEMA)
    assert good.count() == 1 and quar.count() == 1


def test_single_scan_no_shuffle(spark):
    raw = spark.createDataFrame([('{"id": 1, "name": "x"}',)], "payload string")
    good, quar = parse_with_quarantine(raw, "payload", SCHEMA, required=["id"])
    for df in (good, quar):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
