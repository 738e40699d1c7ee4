"""Deterministic corpus-curation operators: hash sampling, stratified
top-k, token-budget packing.

Training-data pipelines need REPRODUCIBLE selection — `df.sample()` is
seed-stable only for a fixed partitioning, which no 100 TB pipeline has
(file splits move, AQE re-plans). Every operator here derives its
decision from row CONTENT (md5 of a key), so the same row is selected
on any cluster, any partitioning, any engine — and each is expressible
in ANSI SQL for the DuckDB oracle.

No reference counterpart: the reference engine (Scala/Beam, see SURVEY
§0) has no sampling surface; these are the sanctioned LLM-pipeline
extensions (brief: "operations a large-scale training-data pipeline
would need").

All pure built-in column expressions — codegen'd, zero Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# md5-prefix bucket space: 16^8 ≈ 4.3e9 cut to 10_000 buckets keeps the
# fraction granularity at 0.01% while staying exact in both engines.
SAMPLE_BUCKETS = 10_000


def hash_bucket(key: Column, seed: int, n_buckets: int = SAMPLE_BUCKETS) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5(key || '_' || seed).

    Content-derived, so stable under repartitioning/shuffles/engine —
    unlike rand(seed), which Spark evaluates per-partition-index.
    """
    salted = F.concat(key.cast("string"), F.lit(f"_{seed}"))
    prefix = F.substring(F.md5(salted.cast("binary")), 1, 8)
    return (F.conv(prefix, 16, 10).cast("long") % n_buckets).cast("long")


def hash_bucket_sql(key_expr: str, seed: int, n_buckets: int = SAMPLE_BUCKETS) -> str:
    """DuckDB mirror of hash_bucket (same md5 prefix, same modulus)."""
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '_{seed}'), 1, 8))::BIGINT"
        f" % {n_buckets})"
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose content
    bucket falls below fraction * SAMPLE_BUCKETS.

    Scale: a pure filter — pushed into the scan, no shuffle, no state;
    resampling with a different seed draws an independent subset.
    """
    cut = int(fraction * SAMPLE_BUCKETS)
    return df.filter(hash_bucket(F.col(key_col), seed) < cut)


def stratified_topk(
    df: DataFrame,
    group_col: str,
    score_col: Column | str,
    k: int,
    tiebreak_col: str,
) -> DataFrame:
    """Top-k rows per group by score (desc), deterministic tiebreak.

    Scale: one shuffle on group_col; Spark's WindowGroupLimit pushes the
    rank<=k cut below the exchange (partial top-k per map task), so the
    shuffle carries at most k rows per group per mapper — the same
    pattern PLANS.md documents for topk_orders_per_customer.
    """
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    w = Window.partitionBy(group_col).orderBy(score.desc(), F.col(tiebreak_col).asc())
    return (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .withColumn("rnk", F.col("rnk").cast("long"))
    )


def token_budget_pack(
    df: DataFrame,
    group_col: str,
    score_col: Column | str,
    token_col: Column | str,
    budget: int,
    tiebreak_col: str,
) -> DataFrame:
    """Greedy token-budget packing: walk each group best-score-first and
    keep documents while the running token total stays within budget
    (inclusive prefix sum <= budget). The standard "fill each domain's
    token quota with its best documents" curation step.

    Scale: one shuffle on group_col, one in-partition sort; the running
    sum is a frame-bounded window (no second shuffle). Unlike top-k the
    cut depends on the prefix sum, so no group-limit pushdown — the sort
    is the price of the semantics.
    """
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    toks = F.col(token_col) if isinstance(token_col, str) else token_col
    w = (
        Window.partitionBy(group_col)
        .orderBy(score.desc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("cum_tokens", F.sum(toks).over(w)).filter(
        F.col("cum_tokens") <= budget
    )


def split_train_holdout(
    df: DataFrame, key_col: str, holdout_fraction: float, seed: int = 7
) -> tuple[DataFrame, DataFrame]:
    """Deterministic, disjoint train/holdout split on a content key.

    Same-bucket rows always land on the same side, so a key that
    appears twice (e.g. near-dup docs sharing a fingerprint key) never
    straddles the split — the property that matters for contamination.
    Returns (train, holdout).
    """
    cut = int(holdout_fraction * SAMPLE_BUCKETS)
    bucket = hash_bucket(F.col(key_col), seed)
    return df.filter(bucket >= cut), df.filter(bucket < cut)


def priority_sample(
    df,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
):
    """Priority sampling (Duffield/Lund/Thorup): a deterministic
    weighted sample of k rows supporting UNBIASED subset-sum estimates
    — the principled way to keep "a representative 0.1%" when rows
    carry very different weights (token counts, byte sizes) and a
    plain Bernoulli sample would be dominated by small items.

    priority_i = w_i / u_i with u_i = hash(key, seed)/2^32 in (0,1];
    keep the k largest priorities; tau = the (k+1)-th priority; each
    kept row's estimator is max(w_i, tau) — E[sum of estimators over
    the sample] equals the true total weight (pinned by a multi-seed
    pytest). All arithmetic is integer (priority = w·2^32 div h), so
    the sample and estimates are identical on any engine/partitioning.

    Scale: priorities are a scan-stage projection; the top-(k+1) cut
    is a global TakeOrdered (per-partition heaps + one k+1-sized merge
    — never a full sort), and tau is one driver-side scalar, the same
    metadata posture as IVF centroids. Returns (key, weight,
    est_weight) as a DataFrame with the key column's original name."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = hash_bucket(F.col(key_col), seed, 1 << 32) + 1  # [1, 2^32]
    scored = df.select(
        F.col(key_col),
        F.col(weight_col).cast("long").alias("weight"),
    ).withColumn("_h", h).withColumn(
        "_prio", F.expr(f"(weight * {1 << 32}) div _h")
    )
    rows = scored.orderBy(F.desc("_prio"), F.asc(key_col)).limit(k + 1).collect()
    if len(rows) <= k:
        kept = [(r[key_col], r["weight"], r["weight"]) for r in rows]
    else:
        tau = rows[k]["_prio"]
        kept = [(r[key_col], r["weight"], max(r["weight"], tau)) for r in rows[:k]]
    key_type = dict(df.dtypes)[key_col]
    return df.sparkSession.createDataFrame(
        kept, f"{key_col} {key_type}, weight LONG, est_weight LONG"
    )
