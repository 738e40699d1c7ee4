"""Dynamic schema path: Avro JSON schema -> StructType with the
reference's doc-annotation channel preserved as StructField metadata.

Reference semantics being replicated (imtu/DatabaseManager.scala:101-151):
- runtime DDL from the Avro schema of the first record seen
  (InMemoryTableUpdater.scala:190-192 -> createTableIfNotExist:30-36);
- nullability from union members containing "null" (:131, :147);
- annotations ride in the field `doc` string as JSON: VARCHAR length
  (:134-138), INDEX / PRIMARY KEY markers driving CREATE INDEX / PK DDL
  (:103, 116-123);
- logical type timestamp-millis -> TIMESTAMP (:87-92, 140-142).

Spark has no indexes: INDEX/PRIMARY KEY become informational metadata
flags consumed by the pipeline spec (upsert keys J6; partitioning
hints §4). VARCHAR length is metadata-only (Spark strings are unbounded).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
    BinaryType,
)

_PRIMITIVES: dict[str, DataType] = {
    "string": StringType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "boolean": BooleanType(),
    "bytes": BinaryType(),
}


def _leaf_type(avro_type: Any) -> DataType:
    """Primitive or logical-type mapping (no nested records — the
    reference's DDL generator would produce invalid SQL for them,
    SURVEY §1.3; we raise early instead)."""
    if isinstance(avro_type, dict):
        logical = avro_type.get("logicalType")
        if logical == "timestamp-millis":
            return TimestampType()
        base = avro_type.get("type")
        if base in _PRIMITIVES:
            return _PRIMITIVES[base]
        raise ValueError(f"unsupported complex avro type: {avro_type!r}")
    if avro_type in _PRIMITIVES:
        return _PRIMITIVES[avro_type]
    raise ValueError(f"unsupported avro type: {avro_type!r}")


def _parse_doc(doc: str | None) -> dict[str, Any]:
    """The doc-string annotation channel. The reference does substring
    checks (`doc.contains("INDEX")`, DatabaseManager.scala:103); we parse
    the JSON when present and fall back to substring semantics."""
    meta: dict[str, Any] = {}
    if not doc:
        return meta
    try:
        parsed = json.loads(doc)
        if isinstance(parsed, dict):
            for k, v in parsed.items():
                meta[str(k).lower()] = v
    except (ValueError, TypeError):
        pass
    up = doc.upper()
    if "PRIMARY KEY" in up:
        meta["primary_key"] = True
    if "INDEX" in up and "primary_key" not in meta:
        meta.setdefault("index", True)
    return meta


def avro_to_struct(avro_schema: str | dict) -> StructType:
    """Avro record schema (JSON string or dict) -> StructType.

    Nullability from ["null", T] unions; annotations into field
    metadata under keys primary_key/index/varchar_length."""
    schema = json.loads(avro_schema) if isinstance(avro_schema, str) else avro_schema
    if schema.get("type") != "record":
        raise ValueError("top-level avro schema must be a record")
    fields = []
    for f in schema.get("fields", []):
        ftype = f["type"]
        nullable = False
        if isinstance(ftype, list):  # union
            members = [m for m in ftype if m != "null"]
            nullable = len(members) < len(ftype)
            if len(members) != 1:
                raise ValueError(f"unsupported union {ftype!r} on field {f['name']}")
            ftype = members[0]
        meta = _parse_doc(f.get("doc"))
        if isinstance(meta.get("varchar"), int):
            meta["varchar_length"] = meta.pop("varchar")
        fields.append(
            StructField(f["name"], _leaf_type(ftype), nullable=nullable, metadata=meta)
        )
    return StructType(fields)


def primary_key_columns(schema: StructType) -> list[str]:
    """Upsert identity (J6) from PRIMARY KEY annotations."""
    return [f.name for f in schema.fields if f.metadata.get("primary_key")]


def indexed_columns(schema: StructType) -> list[str]:
    """INDEX annotations — informational; feeds partitioning choices."""
    return [f.name for f in schema.fields if f.metadata.get("index")]
