"""Gaps-and-islands interval algebra: merge overlapping spans per key,
and take the complement of merged spans against an enclosing range.

The reference models equipment state as *timeline intervals* (ES rows
with start/end; `stp/EventEnricher.scala` tiles event time against
them) — this module supplies the missing coverage algebra over such
intervals: collapsing an arbitrary bag of possibly-overlapping spans
into maximal disjoint islands (machine "busy" coverage, downtime
union, sensor-burst windows) and inverting them into gaps (idle
periods, or the kept segments of a text after duplicated spans are
scrubbed — operators/substring.py reuses this for ExactSubstr-style
dedup).

Scale shape: ONE hash exchange on the island key. The island
assignment is the classic running-max construction — sort spans
within each key, flag a new island whenever a span starts after every
previous span has ended, prefix-sum the flags — all computed in two
window passes over the SAME partitioning, then one same-key
aggregation that reuses the exchange (Catalyst collapses the
window/agg chain onto a single shuffle; pinned in
tests/test_plan_shapes.py). Nothing is quadratic in spans-per-key and
no global ordering exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key: str,
    start: str,
    end: str,
    *,
    merge_gap: int = 0,
) -> DataFrame:
    """Collapse closed integer intervals ``[start, end]`` into maximal
    disjoint islands per ``key``.

    Two intervals belong to the same island when the later one starts
    within ``merge_gap`` of the running maximum end of everything
    before it: ``start <= max_prev_end + merge_gap``.  ``merge_gap=0``
    merges overlapping AND touching intervals (end == next start);
    ``merge_gap=1`` additionally merges *adjacent* integer spans
    (``[1,20]`` + ``[21,40]``), the right setting for character-span
    complements where contiguity means one continuous region.

    Returns one row per island: ``key, span_start, span_end, n_rows``
    (n_rows = how many input intervals the island absorbed).
    Deterministic under input-order and tie permutations: the flag at
    each row depends only on the multiset of preceding (start, end)
    pairs under the (start, end) sort, and islands are emitted as
    aggregates, not row identities.
    """
    w = Window.partitionBy(key).orderBy(start, end)
    prev_end = F.max(end).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_end.isNull() | (F.col(start) > prev_end + F.lit(merge_gap)),
        F.lit(1),
    ).otherwise(F.lit(0))
    flagged = df.select(
        key, start, end, is_new.alias("_new_island")
    ).withColumn(
        "_island",
        F.sum("_new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return flagged.groupBy(key, "_island").agg(
        F.min(start).alias("span_start"),
        F.max(end).alias("span_end"),
        F.count(F.lit(1)).alias("n_rows"),
    ).drop("_island")


def complement_spans(
    spans: DataFrame,
    key: str,
    *,
    lo: Column,
    hi: Column,
    span_start: str = "span_start",
    span_end: str = "span_end",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Invert merged (disjoint, per-key) spans against the enclosing
    closed range ``[lo, hi]``: emit the gaps.

    ``lo`` / ``hi`` are Column expressions evaluated against the spans
    frame (so callers can join range bounds on beforehand).  Expects
    DISJOINT spans (merge_intervals output); emits one row per gap:
    ``key, gap_start, gap_end``.  Keys whose spans tile the whole
    range emit nothing; callers needing full-range gaps for absent
    keys handle that side (a left anti join) themselves.  ``carry``
    names extra columns of the spans frame to pass through onto every
    gap row (e.g. the text a character-gap will be sliced from,
    saving a re-join).

    Same scale shape as merge_intervals: one window over the key
    partitioning (lead + row_number), then a per-row gap construction
    in a SINGLE pass — the head gap ``[lo, first_start-1]`` rides the
    first span's row, the gap after each span rides that span's row
    via lead(span_start) (the last span closes against ``hi``) — as a
    2-slot array explode, so the upstream plan is never branched or
    recomputed.
    """
    w = Window.partitionBy(key).orderBy(span_start)
    enriched = spans.select(
        F.col(key),
        F.col(span_start),
        F.col(span_end),
        lo.alias("_lo"),
        hi.alias("_hi"),
        *[F.col(c) for c in carry],
    ).select(
        key,
        span_start,
        span_end,
        "_lo",
        "_hi",
        *carry,
        F.lead(span_start).over(w).alias("_next_start"),
        F.row_number().over(w).alias("_rk"),
    )
    head_gap = F.struct(
        F.col("_lo").alias("gap_start"),
        (F.col(span_start) - 1).alias("gap_end"),
    )
    after_gap = F.struct(
        (F.col(span_end) + 1).alias("gap_start"),
        F.coalesce(F.col("_next_start") - 1, F.col("_hi")).alias("gap_end"),
    )
    gaps = F.filter(
        F.when(F.col("_rk") == 1, F.array(head_gap, after_gap)).otherwise(
            F.array(after_gap)
        ),
        lambda g: g.gap_start <= g.gap_end,
    )
    return enriched.select(key, *carry, F.explode(gaps).alias("_g")).select(
        key,
        *carry,
        F.col("_g.gap_start").alias("gap_start"),
        F.col("_g.gap_end").alias("gap_end"),
    )
