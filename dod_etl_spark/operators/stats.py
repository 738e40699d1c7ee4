"""Distribution-comparison statistics over grouped numeric columns.

Two-sample Kolmogorov–Smirnov for every pair of groups, computed
integer-exactly: at each pooled distinct value v the ECDF gap for the
pair (a, b) is |C_a(v)·n_b − C_b(v)·n_a| (cross-multiplied so no
float division happens until the single final D = D_num/(n_a·n_b)),
and the max over v is taken with ordinary aggregation — so the
statistic is bit-stable across engines and partitionings (the
value_hour_correlation / type_hour_chi2 integer-moment convention).

Scale shape — the textbook parallel-prefix ECDF, NOT a global window:
a single-partition `ORDER BY value` window (the naive formulation)
serializes 100 TB through one task. Instead:

1. one exchange: per-distinct-value counts per group (map-combined);
2. a scalar aggregate (min/max/totals) broadcast back (q11 pattern);
3. per-range-bucket subtotal frame — B·|groups| rows, metadata-sized —
   whose strictly-before prefix sums become per-bucket offsets,
   broadcast-joined back;
4. a window partitioned BY BUCKET (parallel, bounded partitions)
   adds within-bucket running sums to the offsets → exact global
   cumulative counts with no global sort anywhere;
5. one final map-combined max-aggregation over the pair gaps.

Bucket boundaries only shape the internal computation — the output is
bucket-invariant (pinned in tests), so skewed value ranges can't
change results, only balance.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import stable_round


def ks_matrix(
    df: DataFrame,
    group_col: str,
    value_col: str,
    groups: list[str],
    *,
    n_buckets: int = 64,
) -> DataFrame:
    """All-pairs two-sample KS over ``groups`` of ``group_col``.

    Output: one row per unordered pair (a < b in ``groups`` order):
    ``group_a, group_b, n_a, n_b, d_num, ks_d`` where
    ``ks_d = d_num / (n_a·n_b)`` and ``d_num`` is the exact integer
    ``max_v |C_a(v)·n_b − C_b(v)·n_a|``.  Groups absent from the data
    get n=0 rows with ks_d = 0 (no NaN surface).
    """
    gi = {g: i for i, g in enumerate(groups)}
    src = df.where(F.col(group_col).isin(groups)).select(
        F.col(value_col).alias("v"), F.col(group_col).alias("g")
    )

    # 1. Pooled distinct values with one count column per group.
    per_value = src.groupBy("v").agg(
        *[
            F.sum(F.when(F.col("g") == g, 1).otherwise(0)).alias(f"c{gi[g]}")
            for g in groups
        ]
    )

    # 2. Scalar frame: range bounds + group totals, broadcast.
    scalars = src.agg(
        F.min("v").alias("_minv"),
        F.max("v").alias("_maxv"),
        *[
            F.sum(F.when(F.col("g") == g, 1).otherwise(0)).alias(f"n{gi[g]}")
            for g in groups
        ],
    )
    pv = per_value.crossJoin(F.broadcast(scalars))

    # 3. Range bucket per distinct value (output-invariant internal
    #    partitioning; degenerate min==max range collapses to bucket 0).
    width = (F.col("_maxv") - F.col("_minv")) / F.lit(float(n_buckets))
    bucket = F.when(F.col("_maxv") > F.col("_minv"),
                    F.least(
                        F.lit(n_buckets - 1),
                        F.floor((F.col("v") - F.col("_minv")) / width),
                    )).otherwise(F.lit(0))
    pv = pv.withColumn("_b", bucket.cast("int"))

    # 4. Per-bucket subtotals -> strictly-before prefix offsets (the
    #    frame is B×|groups| cells: metadata-sized at any data scale).
    subtotal = pv.groupBy("_b").agg(
        *[F.sum(f"c{i}").alias(f"s{i}") for i in range(len(groups))]
    )
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = subtotal.select(
        "_b",
        *[
            F.coalesce(F.sum(f"s{i}").over(w_off), F.lit(0)).alias(f"o{i}")
            for i in range(len(groups))
        ],
    )
    cum = pv.join(F.broadcast(offsets), "_b")

    # 5. Within-bucket running sums (parallel window, partitioned by
    #    bucket) complete the exact global cumulative counts.
    w_in = (
        Window.partitionBy("_b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for i in range(len(groups)):
        cum = cum.withColumn(
            f"k{i}", F.col(f"o{i}") + F.sum(f"c{i}").over(w_in)
        )

    # 6. One map-combined max per pair over the integer gaps.
    pairs = list(combinations(range(len(groups)), 2))
    agg_cols = [
        F.max(
            F.abs(
                F.col(f"k{a}") * F.col(f"n{b}") - F.col(f"k{b}") * F.col(f"n{a}")
            )
        ).alias(f"m_{a}_{b}")
        for a, b in pairs
    ] + [F.max(f"n{i}").alias(f"t{i}") for i in range(len(groups))]
    one = cum.agg(*agg_cols)

    stack_args = ", ".join(
        f"'{groups[a]}', '{groups[b]}', coalesce(t{a}, 0), coalesce(t{b}, 0),"
        f" coalesce(m_{a}_{b}, 0)"
        for a, b in pairs
    )
    out = one.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (group_a, group_b, n_a, n_b, d_num)"
    )
    ks = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.col("d_num").cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
    ).otherwise(F.lit(0.0))
    return out.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        "d_num",
        stable_round(ks, 6).alias("ks_d"),
    )
