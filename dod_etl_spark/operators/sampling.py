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


def dsir_importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    n_buckets: int = 256,
    seed: int = 7,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score each
    candidate document by how much its hashed-unigram distribution
    looks like a small TARGET corpus relative to the raw pool.

    Per token occurrence the bucket is a content hash (hash_bucket, so
    engine/partition-invariant); two bag-of-buckets models are fit with
    add-one smoothing — p over `is_target` rows, q over the candidate
    rest — and a candidate's weight is the mean per-token likelihood
    ratio carried in floor-microunits:

        micro(b)  = (p_b+1)(Q+B) * 1e6  div  (q_b+1)(P+B)
        weight(d) = sum over d's tokens of micro(bucket)  div  n_toks

    Every step is exact BIGINT arithmetic (the paper's float log-ratio
    sum is order-sensitive and would break cross-engine hashing; the
    linear-ratio mean keeps the same "looks like the target" ordering
    signal for ratios near 1, which smoothing enforces). Bound: needs
    (P+B)(Q+B)*1e6 < 2^63 — fine to ~1e6-token targets against ~1e9
    candidate tokens; at 100 TB drop micro to milli or move the ratio
    to DECIMAL(38,0), no shape change.

    Scale: tokenize/explode is scan-stage; BOTH bucket models come out
    of ONE groupBy(bucket) pass (conditional sums — the target/pool
    split is a column, not two scans), yielding a B-row model frame
    (metadata-sized — broadcast, like IVF centroids); occurrences join
    the ratio table broadcast-side and one groupBy(id) folds the doc
    scores. Three exchanges total, all carrying bucket ids or doc
    scalars, never text (pinned in tests/test_plan_shapes.py). An
    empty target degrades to the smoothed uniform ratio (weights
    ~constant), never an error. Returns (id_col, n_toks,
    avg_microratio) for candidate (non-target) rows only.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    occ = df.select(
        F.col(id_col),
        is_target.alias("_is_t"),
        F.explode(toks).alias("_tok"),
    ).withColumn(
        "_bucket", hash_bucket(F.col("_tok"), seed, n_buckets)
    ).localCheckpoint(eager=True)
    counts = occ.groupBy("_bucket").agg(
        F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("_pb"),
        F.sum(F.when(~F.col("_is_t"), 1).otherwise(0)).alias("_qb"),
    )
    totals = counts.agg(
        F.coalesce(F.sum("_pb"), F.lit(0)).alias("_praw"),
        F.coalesce(F.sum("_qb"), F.lit(0)).alias("_qraw"),
    )
    ratio = (
        counts.filter(F.col("_qb") > 0)  # mirror: model over pool buckets only
        .crossJoin(F.broadcast(totals))
        .select(
            "_bucket",
            F.expr(
                f"((_pb + 1) * (_qraw + {n_buckets}) * 1000000)"
                f" div ((_qb + 1) * (_praw + {n_buckets}))"
            ).alias("_micro"),
        )
    )
    scored = (
        occ.filter("NOT _is_t")
        .join(F.broadcast(ratio), "_bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.expr("sum(_micro) div count(1)").cast("long").alias("avg_microratio"),
        )
    )
    return scored


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    n_buckets: int = 64,
) -> DataFrame:
    """2D Pareto frontier (skyline): keep rows no other row dominates,
    where "r' dominates r" means x' >= x, y' >= y and strictly greater
    in at least one.  The multi-objective curation cut — e.g. keep
    documents on the (length, vocabulary-richness) frontier — that a
    pair of independent top-k cuts can't express (a doc can be
    dominated yet pass both marginal cuts).

    Both metric columns must be integers (ties are real dominance
    cases, not float noise).

    Scale shape — NO global sort: the classic skyline window
    formulation (max(y) over a full ORDER BY x) serializes everything
    through one partition.  Instead, the KS parallel-prefix pattern
    with MAX as the monoid: range-bucket x (broadcast bounds), take
    per-bucket max(y) on a metadata-sized frame, prefix-max the
    strictly-higher buckets into per-bucket offsets (any row in a
    higher bucket has strictly greater x — range buckets are
    monotone), broadcast back, and finish with a bucket-partitioned
    window for the strictly-greater-x-within-bucket max plus an
    x-partitioned window for the equal-x tie rule.  Output is
    bucket-count invariant (pinned in tests)."""
    src = df.withColumn("_x", F.col(x_col).cast("long")).withColumn(
        "_y", F.col(y_col).cast("long")
    )
    scalars = src.agg(F.min("_x").alias("_minx"), F.max("_x").alias("_maxx"))
    b = src.crossJoin(F.broadcast(scalars))
    width = (F.col("_maxx") - F.col("_minx") + 1).cast("double") / F.lit(
        float(n_buckets)
    )
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("_x") - F.col("_minx")).cast("double") / width),
    ).cast("int")
    b = b.withColumn("_b", bucket)

    per_bucket = b.groupBy("_b").agg(F.max("_y").alias("_by"))
    w_above = Window.orderBy(F.col("_b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "_b", F.max("_by").over(w_above).alias("_above_max")
    )
    j = b.join(F.broadcast(offsets), "_b")

    w_in = (
        Window.partitionBy("_b")
        .orderBy(F.col("_x").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    strict_in_bucket = F.max("_y").over(w_in)
    w_eq = Window.partitionBy("_x")
    same_x_max = F.max("_y").over(w_eq)
    # greatest() ignores nulls: empty frames (frontier candidates with
    # nothing strictly above) stay null and the >= comparison stays
    # null -> coalesced to not-dominated below.
    dominated = (
        F.greatest(strict_in_bucket, F.col("_above_max")) >= F.col("_y")
    ) | (same_x_max > F.col("_y"))
    return (
        j.withColumn("_dom", F.coalesce(dominated, F.lit(False)))
        .where(~F.col("_dom"))
        .drop("_x", "_y", "_b", "_minx", "_maxx", "_above_max", "_dom")
    )
