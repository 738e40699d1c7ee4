"""Mergeable-sketch aggregates: the scale path for distinct counts and
quantiles.

At 100 TB an exact count(DISTINCT user_id) shuffles every distinct
value; the sketch version shuffles ONE lgK-sized binary per partition
per group and, because Datasketches HLL is a commutative monoid under
union, composes across any rollup topology: per-file -> per-partition
-> per-day -> global, each level `hll_union_agg` of the previous —
never touching raw data twice. Same story for quantiles via Spark's
approx_percentile (GK sketch).

Accuracy contract (pinned by tests/test_sketches.py): HLL relative
error ~ 1.04/sqrt(2^lgK) (default lgK=12 -> ~1.6%); approx_percentile
takes an explicit rank-accuracy parameter.

These are approximate BY DESIGN, so no DuckDB value-oracle exists: the
registry entry is rows-only-checked and the error bound is enforced in
pytest instead (the honest pairing for sketches).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_LGK = 12


def hll_partial(col: Column | str, lgk: int = DEFAULT_LGK) -> Column:
    """Binary HLL sketch aggregate — the map-side/partial object. Store
    it (e.g. per day/partition) to make distinct counts incrementally
    maintainable: new data = new sketch, rollup = union, no re-scan."""
    return F.hll_sketch_agg(col, F.lit(lgk))


def hll_merge(sketch_col: Column | str) -> Column:
    """Union previously materialized sketches (rollup step)."""
    return F.hll_union_agg(sketch_col)


def hll_distinct(col: Column | str, lgk: int = DEFAULT_LGK) -> Column:
    """One-shot approximate distinct count, emitted BIGINT."""
    return F.hll_sketch_estimate(hll_partial(col, lgk)).cast("long")


def approx_quantiles(col: Column | str, probs: list[float], accuracy: int = 10000) -> Column:
    """Approximate quantiles (array<double>), rank error <= 1/accuracy."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(
        c.cast("double"), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
    )


def hll_intersect_est(
    sketch_a: Column | str, sketch_b: Column | str
) -> Column:
    """Inclusion-exclusion estimate of |A ∩ B| from two HLL sketches:
    est(A) + est(B) − est(A ∪ B), floored at 0 (the subtraction can go
    slightly negative within sketch error on near-disjoint sets).

    This is the standard HLL workaround for intersections (HLL supports
    only union natively — a theta sketch would intersect directly, but
    Spark ships HLL). Error grows with |A ∪ B| / |A ∩ B|: fine for
    "how much do these two crawls overlap", unusable for tiny
    intersections of huge sets — tests pin both regimes."""
    a = F.col(sketch_a) if isinstance(sketch_a, str) else sketch_a
    b = F.col(sketch_b) if isinstance(sketch_b, str) else sketch_b
    est = F.hll_sketch_estimate
    union = est(F.hll_union(a, b))
    return F.greatest(
        est(a) + est(b) - union, F.lit(0).cast("long")
    ).cast("long")
