"""Interval algebra unit tests: merge_intervals island semantics
(overlap / touch / adjacency / gap), complement_spans head/mid/tail
gaps, and a hypothesis sweep against a brute-force sweep-line
reference."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dod_etl_spark.operators.intervals import complement_spans, merge_intervals

import pyspark.sql.functions as F


def _merge(spark, rows, merge_gap=0):
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = merge_intervals(df, "k", "s", "e", merge_gap=merge_gap)
    return sorted(
        (r.k, r.span_start, r.span_end, r.n_rows) for r in out.collect()
    )


def test_overlap_and_touch_merge(spark):
    rows = [("a", 1, 10), ("a", 5, 20), ("a", 20, 30), ("a", 40, 50)]
    assert _merge(spark, rows) == [("a", 1, 30, 3), ("a", 40, 50, 1)]


def test_adjacent_merges_only_with_gap(spark):
    rows = [("a", 1, 20), ("a", 21, 40)]
    assert _merge(spark, rows) == [("a", 1, 20, 1), ("a", 21, 40, 1)]
    assert _merge(spark, rows, merge_gap=1) == [("a", 1, 40, 2)]


def test_containment_and_keys_independent(spark):
    rows = [("a", 1, 100), ("a", 10, 20), ("b", 10, 20)]
    assert _merge(spark, rows) == [("a", 1, 100, 2), ("b", 10, 20, 1)]


def test_complement_head_mid_tail(spark):
    spans = [("a", 10, 20), ("a", 40, 50)]
    df = spark.createDataFrame(spans, "k string, span_start long, span_end long")
    out = complement_spans(df, "k", lo=F.lit(1), hi=F.lit(60))
    got = sorted((r.k, r.gap_start, r.gap_end) for r in out.collect())
    assert got == [("a", 1, 9), ("a", 21, 39), ("a", 51, 60)]


def test_complement_spans_tiling_range_emit_nothing(spark):
    df = spark.createDataFrame(
        [("a", 1, 60)], "k string, span_start long, span_end long"
    )
    out = complement_spans(df, "k", lo=F.lit(1), hi=F.lit(60))
    assert out.count() == 0


def _ref_merge(intervals, merge_gap):
    """Brute-force sweep-line reference."""
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1] + merge_gap:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += 1
        else:
            out.append([s, e, 1])
    return sorted((s, e, n) for s, e, n in out)


@settings(max_examples=15, deadline=None)
@given(
    iv=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    ),
    gap=st.sampled_from([0, 1]),
)
def test_merge_matches_reference(spark, iv, gap):
    intervals = [(s, s + d) for s, d in iv]
    rows = [("k", s, e) for s, e in intervals]
    got = [(s, e, n) for _, s, e, n in _merge(spark, rows, merge_gap=gap)]
    assert got == _ref_merge(intervals, gap)
