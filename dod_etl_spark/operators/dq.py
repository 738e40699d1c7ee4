"""Declarative data-quality constraint engine (Deequ-style), compiled
into ONE aggregation pass.

A production pipeline gates every ingestion batch on a constraint
suite — completeness, uniqueness, ranges, set membership, row counts —
before the data is allowed downstream (the reference's quarantine split
at `stp/EventEnricher` handles per-ROW malformedness; this is the
TABLE-level twin: reject or alert on a whole batch whose aggregate
shape is wrong).

Scale design
------------
Every constraint compiles to an aggregate Column over the same single
`df.agg(...)` — one scan, one (partial-aggregated) reduction to a
single row, regardless of how many constraints the suite carries. The
long-format report is produced by `inline()` on that one row —
driver-side the result is always |constraints| rows, never data-sized.

- Exact `uniqueness` uses count_distinct: Spark plans multi-distinct
  aggregates with one Expand (rows × distinct-columns) — acceptable up
  to a handful of distinct constraints. At warehouse scale pass
  `approx=True` to swap in HLL (approx_count_distinct), which keeps
  the pass fully map-side-combinable with bounded state.
- All metric arithmetic is counts and ratios of counts (exact IEEE
  division of BIGINTs) — deterministic across engines and
  partitionings, so a DuckDB oracle hashes identically.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import stable_round


@dataclass(frozen=True)
class Constraint:
    """One named check: an aggregate metric plus closed bounds on it.

    `lo`/`hi` are inclusive; None means unbounded on that side. A NULL
    metric (e.g. min() over an all-null column) fails the check."""

    name: str
    metric: Column
    lo: float | None = None
    hi: float | None = None

    def passed(self, metric: Column) -> Column:
        ok = F.lit(True)
        if self.lo is not None:
            ok = ok & (metric >= F.lit(self.lo))
        if self.hi is not None:
            ok = ok & (metric <= F.lit(self.hi))
        return F.coalesce(ok, F.lit(False))


def _ratio(num: Column, den: Column) -> Column:
    """Exact BIGINT/BIGINT ratio as double; 0/0 => 1.0 (vacuous truth:
    an empty frame satisfies every completeness-style constraint)."""
    return F.when(den == 0, F.lit(1.0)).otherwise(
        num.cast("double") / den.cast("double")
    )


def row_count(lo: float | None = 1, hi: float | None = None) -> Constraint:
    return Constraint("row_count", F.count(F.lit(1)).cast("double"), lo, hi)


def completeness(col: str, min_ratio: float = 1.0) -> Constraint:
    """Fraction of non-null values in `col`."""
    return Constraint(
        f"completeness({col})",
        _ratio(F.count(F.col(col)), F.count(F.lit(1))),
        lo=min_ratio,
    )


def uniqueness(col: str, min_ratio: float = 1.0, approx: bool = False) -> Constraint:
    """distinct(col)/count(*) — 1.0 means a true key. `approx` swaps
    exact count_distinct for HLL (the 100 TB mode; bounds then need
    ~2% slack for the sketch error)."""
    nd = F.approx_count_distinct(col) if approx else F.count_distinct(F.col(col))
    return Constraint(
        f"uniqueness({col})", _ratio(nd, F.count(F.lit(1))), lo=min_ratio
    )


def min_value(col: str, lo: float) -> Constraint:
    return Constraint(f"min({col})", F.min(F.col(col)).cast("double"), lo=lo)


def max_value(col: str, hi: float) -> Constraint:
    return Constraint(f"max({col})", F.max(F.col(col)).cast("double"), hi=hi)


def satisfies(name: str, cond: Column, min_ratio: float) -> Constraint:
    """Fraction of rows satisfying an arbitrary row predicate (the
    generalization of Deequ's `compliance`): membership sets, regexp
    shape checks, cross-column invariants."""
    return Constraint(
        name,
        _ratio(F.sum(cond.cast("long")), F.count(F.lit(1))),
        lo=min_ratio,
    )


def in_set(col: str, values: list[str], min_ratio: float = 1.0) -> Constraint:
    return satisfies(
        f"in_set({col})", F.col(col).isin(values), min_ratio
    )


def run_checks(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Evaluate the suite in one aggregation pass.

    Returns (constraint STRING, metric DOUBLE rounded to 6, passed INT)
    — one row per constraint, stable across engines and partitionings.
    """
    if not constraints:
        raise ValueError("empty constraint suite")
    names = [c.name for c in constraints]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate constraint names: {names}")
    one = df.agg(
        *[c.metric.cast("double").alias(f"_m{i}") for i, c in enumerate(constraints)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("constraint"),
                stable_round(F.col(f"_m{i}"), 6).alias("metric"),
                c.passed(F.col(f"_m{i}")).cast("int").alias("passed"),
            )
            for i, c in enumerate(constraints)
        ]
    )
    return one.select(F.inline(rows))


def assert_checks(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Gate mode: raise if any constraint fails, else return `df`
    unchanged (the foreachBatch-friendly shape — a failed batch aborts
    the micro-batch instead of poisoning downstream tables)."""
    report = run_checks(df, constraints)
    failed = [r["constraint"] for r in report.collect() if r["passed"] == 0]
    if failed:
        raise ValueError(f"data-quality constraints failed: {failed}")
    return df


# --- Config-surface compilation ----------------------------------------------

def compile_spec(raw: list[dict]) -> list[Constraint]:
    """Compile a JSON constraint list (the `qualityChecks` TableSpec
    field) into Constraint objects. Kinds mirror the builder functions:

        {"kind": "row_count", "lo": 1}
        {"kind": "completeness", "col": "user_id", "min": 1.0}
        {"kind": "uniqueness", "col": "event_id", "min": 1.0,
         "approx": false}
        {"kind": "min", "col": "value", "lo": 0.0}
        {"kind": "max", "col": "value", "hi": 500.0}
        {"kind": "in_set", "col": "event_type",
         "values": ["click"], "min": 1.0}
    """
    out: list[Constraint] = []
    for i, c in enumerate(raw):
        kind = c.get("kind")
        if kind == "row_count":
            out.append(row_count(lo=c.get("lo", 1), hi=c.get("hi")))
        elif kind == "completeness":
            out.append(completeness(c["col"], min_ratio=c.get("min", 1.0)))
        elif kind == "uniqueness":
            out.append(
                uniqueness(
                    c["col"],
                    min_ratio=c.get("min", 1.0),
                    approx=bool(c.get("approx", False)),
                )
            )
        elif kind == "min":
            out.append(min_value(c["col"], lo=c["lo"]))
        elif kind == "max":
            out.append(max_value(c["col"], hi=c["hi"]))
        elif kind == "in_set":
            out.append(
                in_set(c["col"], list(c["values"]), min_ratio=c.get("min", 1.0))
            )
        else:
            raise ValueError(f"qualityChecks[{i}]: unknown kind {kind!r}")
    return out
