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


# --- Count-Min sketch (deterministic, oracle-checkable) ----------------------

def cm_bucket(col: Column | str, depth_idx, width: int) -> Column:
    """Row j's bucket for value x: md5-prefix of "x_cm{j}" mod width —
    the same cross-engine hash idiom as operators/sampling.hash_bucket,
    so the sketch is bit-identical in any engine."""
    from dod_etl_spark.functions.text import md5_prefix_long

    c = F.col(col) if isinstance(col, str) else col
    j = F.lit(depth_idx) if isinstance(depth_idx, int) else depth_idx
    salted = F.concat(c.cast("string"), F.lit("_cm"), j.cast("string"))
    return F.pmod(md5_prefix_long(salted), F.lit(width))


def cm_sketch(df, col: str, depth: int = 4, width: int = 1024):
    """Build a Count-Min sketch over `col` occurrences as a DataFrame:
    (depth, bucket, cnt), at most depth x width rows.

    Pure DataFrame aggregation — each row contributes `depth`
    (row, bucket) pairs via a map-side explode, and the groupBy's
    partial aggregation collapses every partition to <= depth·width
    counters before the only shuffle: the classic CM property (bounded
    state regardless of cardinality) expressed in Spark's own
    partial-agg machinery, no UDF, no custom accumulator. Sketches of
    disjoint data UNION by summing counters (groupBy (depth, bucket)
    sum) — the same monoid posture as hll_partial/hll_merge, but with
    a deterministic construction, so unlike HLL it is fully
    ORACLE-CHECKABLE cross-engine.

    Estimate(x) = min over j of cnt[j, bucket_j(x)] — overestimates
    only: E[err] <= 2N/width per row, exponentially unlikely to
    survive the min across depth rows."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        cm_bucket(col, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p")
    ).select("p.depth", "p.bucket")
    return pairs.groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cm_estimate(sketch, items, col: str, depth: int = 4, width: int = 1024):
    """Point-query the sketch for every row of `items`: appends `est`
    (BIGINT upper-bound count). The items side fans out x depth,
    joins the (<= depth·width)-row sketch — broadcast-sized by
    construction — and takes the min across rows."""
    probes = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        cm_bucket(col, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p"),
    ).select("*", "p.depth", "p.bucket").drop("p")
    joined = probes.join(F.broadcast(sketch), ["depth", "bucket"], "left").fillna(
        0, subset=["cnt"]
    )
    keys = [c for c in items.columns]
    return joined.groupBy(*keys).agg(F.min("cnt").alias("est"))
