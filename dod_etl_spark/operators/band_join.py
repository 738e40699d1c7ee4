"""Numeric band (epsilon) join: pairs with |a.v - b.v| <= eps, the
value-space sibling of the temporal overlap join (operators/
interval_join.py) — sensor reconciliation, price matching, tolerance
dedup on measurements.

Physical strategy
-----------------
A naive theta join (`abs(a.v - b.v) <= eps`) plans as a nested-loop /
cartesian filter — N² and forbidden here. The standard blocking
decomposition: bucket each value into floor(v / eps); a pair within
eps ALWAYS lands in the same or adjacent buckets, so joining a's
bucket b against b's buckets {b-1, b, b+1} (one side fans out 3x, the
other not at all) turns the band predicate into a pure EQUI hash join
with the exact |a-b| <= eps check as a residual filter. With optional
equi keys prepended (join within event_type, within equipment, ...)
the bucket join inherits their selectivity too.

Fan-out is a constant 3x of the SMALLER side (we explode the left);
candidate volume per bucket is E[rows/eps-bucket]² — the caller's eps
choice controls skew exactly like bucket width does in the temporal
decomposition. No pair can match in two buckets (the probe side keeps
its single bucket), so no dedup pass is needed — unlike the temporal
twin where both sides span buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    l_val: str,
    r_val: str,
    eps: float,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs with |l_val - r_val| <= eps (and equal
    `on` keys, if given). Column name collisions between the two sides
    must be pre-renamed by the caller (except `on` keys, which are
    coalesced like a USING join).

    Only ``how='inner'`` is supported: the bucket decomposition
    explodes the left side 3x and applies the exact band predicate as
    a post-join residual filter, so outer-join null-extended rows are
    silently dropped by the residual (NULL comparison) and left rows
    would be triplicated — an outer request would degenerate to inner
    results without error. Callers needing left semantics should
    anti-join the unmatched left keys back in on top of this result.
    """
    if eps <= 0:
        raise ValueError(f"eps must be positive, got {eps}")
    if how != "inner":
        raise ValueError(
            "band_join supports how='inner' only: the 3x bucket fan-out "
            "plus the residual |l-r|<=eps filter make outer semantics "
            f"silently wrong (got how={how!r}). Compose outer behavior "
            "via an anti-join of unmatched keys on the inner result."
        )
    on = on or []
    # Left side fans out to its bucket and both neighbors; the right
    # side stays single-bucket, so every true pair meets exactly once.
    lb = F.floor(F.col(l_val) / F.lit(eps))
    l = left.withColumn(
        "_band", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    r = right.withColumn("_band", F.floor(F.col(r_val) / F.lit(eps)))
    joined = l.join(r, [*on, "_band"], how).filter(
        F.abs(F.col(l_val) - F.col(r_val)) <= F.lit(eps)
    )
    return joined.drop("_band")
