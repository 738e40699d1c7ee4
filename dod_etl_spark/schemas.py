"""MES (manufacturing/OEE) schemas as explicit StructTypes.

The reference flows schemaless Map[String,Object] rows and generates H2
DDL from Avro at runtime (reference: imtu/DatabaseManager.scala:101-126,
utils/UtilDODETL.scala:35-38). We declare explicit StructTypes instead —
Tungsten columnar layout + whole-stage codegen need them, and analysis
errors surface at plan time rather than mid-stream.

Column sets reconstructed in FIXTURES.md from every column access in the
reference (citations there). The Avro `doc` annotation channel (VARCHAR
length / INDEX / PRIMARY KEY markers, reference DatabaseManager.scala:
103,116-123,134-138) maps to StructField metadata: {"primary_key": True,
"indexed": True} — informational in Spark (physical analogs are
broadcast/bucketing choices made in operator code).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True, **meta) -> T.StructField:
    return T.StructField(name, dtype, nullable, metadata=meta or None)


# Fact/operational stream: one event per produced product (topic
# PRODUCT_OP in the reference; JSON with epoch-millis longs).
PRODUCT_EVENTS = T.StructType(
    [
        _f("ID", T.LongType(), False, primary_key=True),
        _f("ID_PRODUCTION_ORDER", T.LongType(), False, indexed=True),
        _f("COD_EQUIPMENT", T.StringType(), False, indexed=True),
        _f("START_TIME", T.LongType(), False),  # epoch millis
        _f("END_TIME", T.LongType(), False),  # epoch millis
        _f("QUANTITY", T.DoubleType(), False),
        _f("timestamp", T.LongType(), False),  # transaction ts, late-data key
    ]
)

# Dimension: production orders (upsert key ID; reference H2 MERGE KEY(ID),
# DatabaseManager.scala:52-62).
PRODUCTION_ORDER = T.StructType(
    [
        _f("ID", T.LongType(), False, primary_key=True),
        _f("ID_MATERIAL", T.LongType()),
        _f("PLANNED_START_TIME", T.TimestampType()),
        _f("PLANNED_END_TIME", T.TimestampType()),
        _f("PLANNED_QUANTITY", T.DoubleType()),
        _f("COD_EQUIPMENT", T.StringType(), True, indexed=True),
        _f("DT_LAST_MODIFICATION", T.TimestampType(), False),
    ]
)

PRODUCT_QUALITY = T.StructType(
    [
        _f("ID", T.LongType(), False, primary_key=True),
        _f("ID_PRODUCT", T.LongType(), False, indexed=True),
        _f("IS_OUT_OF_SPECIFICATION", T.BooleanType()),
        _f("COD_EQUIPMENT", T.StringType(), True, indexed=True),
        _f("DT_LAST_MODIFICATION", T.TimestampType(), False),
    ]
)

# Interval table: per-equipment machine status periods; input to the
# interval-overlap join (J3) and grain split (J4).
EQUIPMENT_STATUS = T.StructType(
    [
        _f("ID", T.LongType(), False, primary_key=True),
        _f("COD_EQUIPMENT", T.StringType(), False, indexed=True),
        _f("START_TIME", T.TimestampType(), False),
        _f("END_TIME", T.TimestampType(), False),
        _f("STATUS_TYPE", T.StringType(), False),
        _f("IS_FREE_TIME", T.BooleanType()),
        _f("DT_LAST_MODIFICATION", T.TimestampType(), False),
    ]
)

# Interval table: work shifts per equipment (configured in the reference
# but its processing was TODO — we implement it, SURVEY §2.10 item 6).
PERIOD_SHIFT = T.StructType(
    [
        _f("ID", T.LongType(), False, primary_key=True),
        _f("COD_EQUIPMENT", T.StringType(), False, indexed=True),
        _f("START_TIME", T.TimestampType(), False),
        _f("END_TIME", T.TimestampType(), False),
        _f("SHIFT_CODE", T.StringType()),
        _f("DT_LAST_MODIFICATION", T.TimestampType(), False),
    ]
)

# Output shapes (FIXTURES.md §6).
FACT_GRAIN_COLUMNS = [
    "ID",
    "ID_PRODUCTION_ORDER",
    "ID_MATERIAL",
    "ID_EQUIPMENT_STATUS",
    "COD_EQUIPMENT",
    "PLANNED_START_TIME",
    "PLANNED_END_TIME",
    "FACT_START_TIME",
    "FACT_END_TIME",
    "PROD_START_TIME",
    "PROD_END_TIME",
    "PLANNED_QUANTITY",
    "QUANTITY",
    "IS_OUT_OF_SPECIFICATION",
    "STATUS_TYPE",
    "IS_FREE_TIME",
]

OEE_COLUMNS = [
    "ID",
    "ID_PRODUCTION_ORDER",
    "ID_MATERIAL",
    "ID_EQUIPMENT_STATUS",
    "COD_EQUIPMENT",
    "PERFORMANCE",
    "AVAILABILITY",
    "QUALITY",
    "OEE",
]

MES_SCHEMAS = {
    "product_events": PRODUCT_EVENTS,
    "production_order": PRODUCTION_ORDER,
    "product_quality": PRODUCT_QUALITY,
    "equipment_status": EQUIPMENT_STATUS,
    "period_shift": PERIOD_SHIFT,
}
