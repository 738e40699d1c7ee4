"""Generic N-stage funnel fold (operators/funnel.py): strict ordering,
within- and cross-stage tie rules, and arbitrary stage counts beyond
the oracle-paired 3-stage query."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.operators.funnel import funnel_fold


def _ts(ms: int):
    return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(tzinfo=None)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, _ts(ms), u, et) for i, (u, ms, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_four_stage_funnel(spark):
    ev = _events(
        spark,
        [
            # u1 completes all four in order
            (1, 100, "a"), (1, 200, "b"), (1, 300, "c"), (1, 400, "d"),
            # u2: stage 3 event arrives BEFORE stage 2 -> stops at 2;
            # a later c completes stage 3 but no d follows.
            (2, 100, "a"), (2, 150, "c"), (2, 200, "b"), (2, 250, "c"),
            # u3: never does stage 1 -> excluded entirely
            (3, 100, "b"), (3, 200, "c"),
        ],
    )
    got = {
        r["user_id"]: (r["stage_reached"], r["t1"], r["t2"], r["t3"], r["t4"])
        for r in funnel_fold(ev, ["a", "b", "c", "d"]).collect()
    }
    assert set(got) == {1, 2}
    assert got[1][0] == 4
    assert got[2][0] == 3
    assert got[2][3] == _ts(250)  # the c BEFORE b must not count
    assert got[2][4] is None


def test_equal_timestamp_is_not_after(spark):
    """Strict '>' at stage boundaries: a stage-2 event at exactly the
    stage-1 timestamp does not advance."""
    ev = _events(spark, [(1, 100, "a"), (1, 100, "b"), (1, 200, "b")])
    (row,) = funnel_fold(ev, ["a", "b"]).collect()
    assert row["stage_reached"] == 2
    assert row["t2"] == _ts(200)


def test_first_eligible_wins(spark):
    """Among several eligible stage-2 events, the earliest counts."""
    ev = _events(
        spark, [(1, 100, "a"), (1, 300, "b"), (1, 200, "b"), (1, 400, "b")]
    )
    (row,) = funnel_fold(ev, ["a", "b"]).collect()
    assert row["t2"] == _ts(200)


def test_rejects_single_stage(spark):
    with pytest.raises(ValueError):
        funnel_fold(_events(spark, [(1, 100, "a")]), ["a"])


def test_rejects_duplicate_stages(spark):
    with pytest.raises(ValueError):
        funnel_fold(_events(spark, [(1, 100, "a")]), ["a", "b", "a"])
