"""Golden end-to-end OEE test (SURVEY §5 item 2).

Pins the intended semantics of the reference pipeline — interval split
J4, OEE formula F6, missing-data routing J5/P9 — with hand-computed
expected values.

Formula walk-through for event 2 grain A (RUNNING, 00:30-01:00):
  factDur=30min prodDur=60min plannedDur=120min
  splitFactor = 30/60 = 0.5 ; prodFactor = 60/120 = 0.5
  performance = 0.5 * (30 / (0.5*100)) = 0.3 ; OEE = 0.3
Grain B (OFF_MAINTENANCE, 01:00-01:30): performance 0, availability 0.
Event 3 (out-of-spec product): performance 0.8, quality 0 -> OEE 0.
Event 4 (03:30-04:30, status tiles end 04:00): one grain, trailing 30min
uncovered -> flagged by P9.
"""

from __future__ import annotations

import pytest

from dod_etl_spark.plans.pipeline import run_oee_pipeline
from dod_etl_spark.testing.fixtures import (
    GOLDEN_OEE,
    MISSING_PO_IDS,
    UNCOVERED_IDS,
    mes_fixture,
)


@pytest.fixture(scope="module")
def result(spark):
    fx = mes_fixture(spark)
    return run_oee_pipeline(
        fx["product_events"],
        fx["production_order"],
        fx["product_quality"],
        fx["equipment_status"],
    )


def test_grain_count_and_keys(result):
    rows = result.grains.collect()
    assert {(r.ID, r.ID_EQUIPMENT_STATUS) for r in rows} == set(GOLDEN_OEE)


def test_grain_intersection_bounds(result):
    for r in result.grains.collect():
        assert r.FACT_START_TIME >= r.PROD_START_TIME
        assert r.FACT_END_TIME <= r.PROD_END_TIME
        assert r.FACT_START_TIME < r.FACT_END_TIME


def test_oee_values(result):
    rows = {(r.ID, r.ID_EQUIPMENT_STATUS): r for r in result.oee.collect()}
    assert set(rows) == set(GOLDEN_OEE)
    for key, (perf, avail, qual, oee) in GOLDEN_OEE.items():
        r = rows[key]
        assert r.PERFORMANCE == pytest.approx(perf, abs=1e-9), key
        assert r.AVAILABILITY == pytest.approx(avail, abs=1e-9), key
        assert r.QUALITY == pytest.approx(qual, abs=1e-9), key
        assert r.OEE == pytest.approx(oee, abs=1e-9), key


def test_missing_po_routing(result):
    assert {r.ID for r in result.missing_po.collect()} == MISSING_PO_IDS


def test_uncovered_routing(result):
    assert {r.ID for r in result.uncovered.collect()} == UNCOVERED_IDS


def test_grain_ids_emitted_correctly(result):
    # SURVEY §2.10 item 3: the reference emitted None for the grain ids;
    # we require them populated.
    for r in result.oee.collect():
        assert r.ID is not None
        assert r.ID_EQUIPMENT_STATUS is not None
        assert r.ID_MATERIAL is not None
