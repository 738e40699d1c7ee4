"""Interval-overlap (temporal) join — J3 — and grain fan-out — J4.

Reference semantics (stp/DataTransformer.scala:40-61, query string :46):
for each fact event, find every EQUIPMENT_STATUS row of the same
equipment whose [START_TIME, END_TIME) interval strictly overlaps the
event's production interval:

    es.START_TIME < event.END_TIME AND es.END_TIME > event.START_TIME
    AND es.COD_EQUIPMENT = event.COD_EQUIPMENT

then (J4, stp/DataTransformer.scala:63-100) emit one *fact grain* per
matched pair with the interval intersection:

    FACT_START = greatest(event.start, es.start)
    FACT_END   = least(event.end, es.end)

Physical strategy
-----------------
`overlap_join` relies on the equi key: Catalyst plans a hash join
(broadcast when the interval side is small) on COD_EQUIPMENT with the two
range predicates as residual filters — exactly right when per-key
interval cardinality is modest.

`overlap_join_bucketed` is the 100 TB path: when one equipment has
millions of status rows (skew), the residual filter degrades to a per-key
nested loop. We decompose the theta join into an equi join on
(key, time_bucket): both sides explode into the coarse buckets their
interval touches via sequence(), join on (key, bucket) — a pure hash
join whose fan-out is bounded by interval_span/bucket_width — re-apply
the exact overlap predicate, and dedup pairs that met in multiple
buckets by keeping only the first shared bucket. No Catalyst extension
needed; this is the standard overlap-join blocking decomposition
(OSS Spark has no range-join hint).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKET_MS = 3_600_000  # 1 hour


def _ms(df: DataFrame, name: str) -> Column:
    """Epoch-millis view of a time column: TimestampType goes through
    unix_millis, integral epoch-millis columns pass through."""
    dtype = dict(df.dtypes).get(name, "")
    if dtype.startswith("timestamp"):
        col = df[name]
        if dtype == "timestamp_ntz":
            col = col.cast("timestamp")
        return F.unix_millis(col)
    return df[name].cast("long")


def _overlap_pred(
    left: DataFrame, right: DataFrame, l_start: str, l_end: str, r_start: str, r_end: str
) -> Column:
    # Strict overlap, half-open style: touching endpoints do NOT match
    # (reference uses < and >, DataTransformer.scala:46).
    return (right[r_start] < left[l_end]) & (right[r_end] > left[l_start])


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    l_start: str = "START_TIME",
    l_end: str = "END_TIME",
    r_start: str = "START_TIME",
    r_end: str = "END_TIME",
    how: str = "inner",
) -> DataFrame:
    """J3: equi keys + strict interval overlap. Right-side columns that
    collide with left names must be pre-renamed by the caller."""
    cond = _overlap_pred(left, right, l_start, l_end, r_start, r_end)
    for k in on:
        cond = cond & (left[k] == right[k])
    joined = left.join(right, cond, how)
    # Drop the duplicated equi-key columns from the right side.
    for k in on:
        joined = joined.drop(right[k])
    return joined


def overlap_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    l_start: str = "START_TIME",
    l_end: str = "END_TIME",
    r_start: str = "START_TIME",
    r_end: str = "END_TIME",
    bucket_ms: int = DEFAULT_BUCKET_MS,
) -> DataFrame:
    """J3 at scale: time-bucket blocking decomposition (SURVEY §4.3.1).

    Correctness: a pair overlaps iff the two intervals share at least one
    bucket AND the exact predicate holds; duplicates (pairs sharing >1
    bucket) are removed by keeping the canonical meeting bucket —
    greatest(floor(l_start), floor(r_start)) — instead of a post-join
    distinct, so no extra shuffle is added.

    Choose bucket_ms ≈ median interval length: fan-out per row is
    ceil(len/bucket)+1 while per-(key,bucket) populations stay small.

    Time columns may be TimestampType or epoch-millis longs.
    """
    lb, rb = "_lbucket", "_rbucket"

    def buckets(df: DataFrame, start: str, end: str) -> Column:
        # All buckets the half-open interval [start, end) touches.
        s = F.floor(_ms(df, start) / bucket_ms)
        e = F.floor((_ms(df, end) - 1) / bucket_ms)
        return F.sequence(s, F.greatest(s, e))

    lexp = left.withColumn(lb, F.explode(buckets(left, l_start, l_end)))
    rexp = right.withColumn(rb, F.explode(buckets(right, r_start, r_end)))

    cond = (lexp[lb] == rexp[rb]) & _overlap_pred(lexp, rexp, l_start, l_end, r_start, r_end)
    for k in on:
        cond = cond & (lexp[k] == rexp[k])
    # Canonical bucket = first bucket both intervals inhabit.
    canonical = F.greatest(
        F.floor(_ms(lexp, l_start) / bucket_ms),
        F.floor(_ms(rexp, r_start) / bucket_ms),
    )
    joined = lexp.join(rexp, cond, "inner").filter(F.col(lb) == canonical)
    for k in on:
        joined = joined.drop(rexp[k])
    return joined.drop(lb, rb)


def grain_split(
    joined: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    out_start: str = "FACT_START_TIME",
    out_end: str = "FACT_END_TIME",
) -> DataFrame:
    """J4: intersection columns on an overlap-join output. The join fan-out
    already produced one row per (event, interval) pair; no explode.

    Reference: max/min if-else chains, stp/DataTransformer.scala:79-87."""
    return joined.withColumn(out_start, F.greatest(F.col(l_start), F.col(r_start))).withColumn(
        out_end, F.least(F.col(l_end), F.col(r_end))
    )
