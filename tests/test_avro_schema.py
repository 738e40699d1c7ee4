"""Dynamic schema path (F11, SURVEY §1.4): Avro JSON -> StructType with
doc-annotation metadata, replicating imtu/DatabaseManager.scala:128-151
semantics."""

from __future__ import annotations

import json

import pytest
from pyspark.sql.types import DoubleType, LongType, StringType, TimestampType

from dod_etl_spark.sources.avro_schema import (
    avro_to_struct,
    indexed_columns,
    primary_key_columns,
)

MES_AVRO = json.dumps(
    {
        "type": "record",
        "name": "EQUIPMENT_STATUS",
        "fields": [
            {"name": "ID", "type": "long", "doc": "PRIMARY KEY"},
            {"name": "COD_EQUIPMENT", "type": "string", "doc": '{"INDEX": true, "varchar": 50}'},
            {
                "name": "START_TIME",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            },
            {"name": "END_TIME", "type": ["null", {"type": "long", "logicalType": "timestamp-millis"}]},
            {"name": "LOAD_FACTOR", "type": ["null", "double"]},
        ],
    }
)


def test_avro_to_struct_types_and_nullability():
    st = avro_to_struct(MES_AVRO)
    by_name = {f.name: f for f in st.fields}
    assert isinstance(by_name["ID"].dataType, LongType) and not by_name["ID"].nullable
    assert isinstance(by_name["COD_EQUIPMENT"].dataType, StringType)
    assert isinstance(by_name["START_TIME"].dataType, TimestampType)
    assert by_name["END_TIME"].nullable
    assert isinstance(by_name["LOAD_FACTOR"].dataType, DoubleType)


def test_doc_annotations():
    st = avro_to_struct(MES_AVRO)
    assert primary_key_columns(st) == ["ID"]
    assert indexed_columns(st) == ["COD_EQUIPMENT"]
    cod = next(f for f in st.fields if f.name == "COD_EQUIPMENT")
    assert cod.metadata.get("varchar_length") == 50


def test_nested_record_rejected_early():
    bad = {
        "type": "record",
        "name": "X",
        "fields": [{"name": "nested", "type": {"type": "record", "name": "Y", "fields": []}}],
    }
    with pytest.raises(ValueError):
        avro_to_struct(bad)


def test_struct_roundtrip_with_spark(spark):
    st = avro_to_struct(MES_AVRO)
    df = spark.createDataFrame([], schema=st)
    assert df.schema == st
