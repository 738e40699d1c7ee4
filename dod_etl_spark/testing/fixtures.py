"""Deterministic MES fixtures for the golden OEE tests.

Encodes the FIXTURES.md §4 generator constraints: per equipment the
status intervals tile time contiguously; events cover the cases
(a) fully inside one status row, (b) spanning multiple rows, (c) with
trailing uncovered time, (d) hitting an "OFF" grain, (e) out-of-spec
product, plus (f) a missing production order for the retry path.

All timestamps UTC. BASE = 2024-01-01T00:00:00Z.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from dod_etl_spark import schemas


def _df(spark: SparkSession, rows: list[tuple], schema) -> DataFrame:
    """Arrow-path createDataFrame: local rows -> pandas -> Spark. Avoids
    the per-partition Python-worker spin-up of the parallelize path
    (~10s saved per fixture table in tests)."""
    pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields])
    return spark.createDataFrame(pdf, schema=schema).coalesce(1)

BASE = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
BASE_MS = int(BASE.timestamp() * 1000)

HOUR_MS = 3_600_000


def _ts(hours: float) -> dt.datetime:
    return BASE + dt.timedelta(hours=hours)


def _ms(hours: float) -> int:
    return BASE_MS + int(hours * HOUR_MS)


def mes_fixture(spark: SparkSession) -> dict[str, DataFrame]:
    dtlm = _ts(0)

    events = _df(
        spark,
        [
            # (ID, ID_PRODUCTION_ORDER, COD_EQUIPMENT, START, END, QUANTITY, txn ts)
            (1, 101, "EQ1", _ms(0.0), _ms(0.5), 25.0, _ms(0.5)),  # (a) inside ES1
            (2, 101, "EQ1", _ms(0.5), _ms(1.5), 30.0, _ms(1.5)),  # (b)+(d) spans RUNNING|OFF
            (3, 102, "EQ1", _ms(2.0), _ms(3.0), 40.0, _ms(3.0)),  # (e) out-of-spec
            (4, 101, "EQ1", _ms(3.5), _ms(4.5), 10.0, _ms(4.5)),  # (c) trailing uncovered
            (5, 999, "EQ1", _ms(0.0), _ms(0.5), 5.0, _ms(0.5)),  # (f) missing PO
        ],
        schemas.PRODUCT_EVENTS,
    )

    production_order = _df(
        spark,
        [
            (101, 7, _ts(0), _ts(2), 100.0, "EQ1", dtlm),
            (102, 8, _ts(2), _ts(3), 50.0, "EQ1", dtlm),
        ],
        schemas.PRODUCTION_ORDER,
    )

    product_quality = _df(
        spark,
        [
            (201, 1, False, "EQ1", dtlm),
            (202, 3, True, "EQ1", dtlm),  # product 3 out of spec
        ],
        schemas.PRODUCT_QUALITY,
    )

    equipment_status = _df(
        spark,
        [
            (301, "EQ1", _ts(0), _ts(1), "RUNNING", False, dtlm),
            (302, "EQ1", _ts(1), _ts(2), "OFF_MAINTENANCE", True, dtlm),
            (303, "EQ1", _ts(2), _ts(4), "RUNNING", False, dtlm),
        ],
        schemas.EQUIPMENT_STATUS,
    )

    period_shift = _df(
        spark,
        [
            (401, "EQ1", _ts(0), _ts(2), "SHIFT_A", dtlm),
            (402, "EQ1", _ts(2), _ts(4), "SHIFT_B", dtlm),
        ],
        schemas.PERIOD_SHIFT,
    )

    return {
        "product_events": events,
        "production_order": production_order,
        "product_quality": product_quality,
        "equipment_status": equipment_status,
        "period_shift": period_shift,
    }


# Hand-computed golden OEE values (formula walk-through in
# tests/test_oee_golden.py): {(event ID, ID_EQUIPMENT_STATUS): (perf, avail, qual, oee)}
GOLDEN_OEE = {
    (1, 301): (1.0, 1.0, 1.0, 1.0),
    (2, 301): (0.3, 1.0, 1.0, 0.3),
    (2, 302): (0.0, 0.0, 1.0, 0.0),  # OFF grain
    (3, 303): (0.8, 1.0, 0.0, 0.0),  # out-of-spec
    (4, 303): (0.1, 1.0, 1.0, 0.1),
}
MISSING_PO_IDS = {5}
UNCOVERED_IDS = {4, 5}  # 4: trailing gap; 5: no grains at all (missing PO)
