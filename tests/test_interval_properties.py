"""Property-based invariants for the interval split (SURVEY §5.3):

(a) grains of an event are pairwise non-overlapping and lie within
    [START_TIME, END_TIME);
(b) when the ES tiling covers the event, Σ grain duration == event
    duration;
(c) OEE >= 0, and OEE == 0 whenever the status contains OFF or the
    product is out of spec (DataTransformer.scala:79-87, 116-134);
(d) bucketed and plain overlap joins agree for every generated case
    (the canonical-bucket dedup proof obligation, SURVEY §4.3.1).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dod_etl_spark.operators.interval_join import (
    grain_split,
    overlap_join,
    overlap_join_bucketed,
)

BASE_MS = 1704067200000  # 2024-01-01T00:00:00Z
HOUR = 3600000


@st.composite
def tiling_and_events(draw):
    """A contiguous ES tiling (2-6 tiles) plus 1-4 event intervals, all
    within a 48h range; tile and event boundaries at minute granularity
    (some aligned to bucket edges on purpose)."""
    n_bounds = draw(st.integers(3, 7))
    bounds = sorted(
        draw(
            st.lists(
                st.integers(0, 48 * 60).map(lambda m: BASE_MS + m * 60000),
                min_size=n_bounds,
                max_size=n_bounds,
                unique=True,
            )
        )
    )
    tiles = [
        (i, bounds[i], bounds[i + 1], draw(st.booleans()))
        for i in range(len(bounds) - 1)
    ]
    n_events = draw(st.integers(1, 4))
    events = []
    for j in range(n_events):
        a = draw(st.integers(0, 48 * 60 - 1))
        b = draw(st.integers(a + 1, 48 * 60))
        events.append((100 + j, BASE_MS + a * 60000, BASE_MS + b * 60000))
    return tiles, events


def _frames(spark, tiles, events):
    es = spark.createDataFrame(
        [(i, "EQ1", s, e, "OFF_X" if off else "RUNNING", False) for i, s, e, off in tiles],
        "ID_EQUIPMENT_STATUS long, COD_EQUIPMENT string, ES_START long, ES_END long,"
        " STATUS_TYPE string, IS_FREE_TIME boolean",
    )
    ev = spark.createDataFrame(
        [(i, "EQ1", s, e) for i, s, e in events],
        "ID long, COD_EQUIPMENT string, START_TIME long, END_TIME long",
    )
    return ev, es


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(tiling_and_events())
def test_interval_split_invariants(spark, case):
    tiles, events = case
    ev, es = _frames(spark, tiles, events)
    joined = overlap_join_bucketed(
        ev, es, on=["COD_EQUIPMENT"],
        l_start="START_TIME", l_end="END_TIME", r_start="ES_START", r_end="ES_END",
    )
    grains = grain_split(
        joined, "START_TIME", "END_TIME", "ES_START", "ES_END",
        out_start="FACT_START", out_end="FACT_END",
    ).collect()

    by_event: dict[int, list] = {}
    for g in grains:
        by_event.setdefault(g["ID"], []).append(g)
        # (a) within event bounds, positive length
        assert g["START_TIME"] <= g["FACT_START"] < g["FACT_END"] <= g["END_TIME"]

    tile_lo = min(t[1] for t in tiles)
    tile_hi = max(t[2] for t in tiles)
    for eid, s, e in events:
        gs = sorted(by_event.get(eid, []), key=lambda g: g["FACT_START"])
        # (a) pairwise non-overlapping
        for g1, g2 in zip(gs, gs[1:]):
            assert g1["FACT_END"] <= g2["FACT_START"]
        # (b) full coverage => durations sum to event duration
        if tile_lo <= s and e <= tile_hi:
            assert sum(g["FACT_END"] - g["FACT_START"] for g in gs) == e - s


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(tiling_and_events())
def test_bucketed_equals_plain_join(spark, case):
    tiles, events = case
    ev, es = _frames(spark, tiles, events)
    kw = dict(
        on=["COD_EQUIPMENT"],
        l_start="START_TIME", l_end="END_TIME", r_start="ES_START", r_end="ES_END",
    )
    plain = {
        (r["ID"], r["ID_EQUIPMENT_STATUS"])
        for r in overlap_join(ev, es, **kw).collect()
    }
    bucketed_rows = overlap_join_bucketed(ev, es, **kw).collect()
    bucketed = [(r["ID"], r["ID_EQUIPMENT_STATUS"]) for r in bucketed_rows]
    # (d) identical pair sets AND no duplicates from multi-bucket meetings
    assert len(bucketed) == len(set(bucketed))
    assert set(bucketed) == plain


def test_oee_zero_when_off_or_out_of_spec(spark):
    from dod_etl_spark.operators.oee import compute_oee
    from dod_etl_spark.testing.fixtures import mes_fixture
    from dod_etl_spark.plans.pipeline import run_oee_pipeline

    fx = mes_fixture(spark)
    oee = run_oee_pipeline(
        fx["product_events"], fx["production_order"], fx["product_quality"],
        fx["equipment_status"],
    ).oee.collect()
    assert all(r["OEE"] >= 0 for r in oee)
    for r in oee:
        if r["AVAILABILITY"] == 0.0 or r["QUALITY"] == 0.0:
            assert r["OEE"] == 0.0
