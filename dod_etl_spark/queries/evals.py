"""Evaluation & dataset-composition queries (round-7 second wave).

A training-data platform doesn't just BUILD indexes and corpora — it
measures them. This module registers the evaluation surface as
first-class oracle-paired queries:

- `lsh_recall_eval`: measured recall of the LSH ANN path against the
  exact brute-force ranking, per query — the number the ANN family's
  quality floors rest on, computed in-engine (oracle composes the two
  existing oracle texts, so the measurement itself is hash-checked).
- `retrieval_label_eval`: nDCG@10 / MRR / recall@10 of exact cosine
  retrieval against label-relevance qrels — the standard IR-eval
  triple. Gain weights are precomputed integer micro-units (one Python
  `math.log2` at import builds BOTH engines' literals), so the metric
  arithmetic is integer-exact and engine-invariant.
- `source_overlap_jaccard`: pairwise shingle-set Jaccard between
  sources — the cross-provider contamination matrix (which feeds
  dedup priority and mixture design).
- `label_fisher_scores`: per-dimension Fisher discriminant ratio over
  the embedding table — between-class variance of class means over
  mean within-class variance, the classic feature-selection score.
- `mixture_temperature_docs`: temperature-weighted source mixture
  (tau = 0.5 via IEEE-exact sqrt) with integer-exact target
  apportionment and content-hash document selection — the
  multinomial-smoothing step real pretraining mixtures use.

Reference parity: none (no eval surface in the reference) —
LLM-pipeline extension per the brief.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import stable_round
from dod_etl_spark.functions.text import char_ngrams
from dod_etl_spark.queries.base import query, sround_sql, t
from dod_etl_spark.queries.llm import _COSINE_ORACLE, _LSH_ANN_ORACLE

# --- LSH measured recall -------------------------------------------------------

_LSH_RECALL_ORACLE = f"""
WITH truth AS ({_COSINE_ORACLE}),
approx AS ({_LSH_ANN_ORACLE}),
hits AS (
  SELECT t.query_id, count(*) AS n_hits
  FROM truth t JOIN approx a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
  GROUP BY t.query_id
)
SELECT t.query_id,
       count(*) AS n_truth,
       coalesce(max(h.n_hits), 0) AS n_hits,
       {sround_sql("CAST(coalesce(max(h.n_hits), 0) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)} AS recall
FROM truth t LEFT JOIN hits h ON t.query_id = h.query_id
GROUP BY t.query_id
"""


@query("lsh_recall_eval", _LSH_RECALL_ORACLE)
def lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@5 of the LSH-bucketed ANN against the exact
    brute-force top-5 — the ANN quality measurement AS a query, so the
    recall number itself is oracle-checked (both arms' oracle texts
    compose as CTEs). Scale shape: both arms are the already-audited
    operators; the recall join touches n_queries x k rows."""
    from dod_etl_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
    )

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    truth = brute_force_topk(queries_df, emb, k=5)
    approx = lsh_bucketed_topk(queries_df, emb, k=5, n_bits=4)
    hits = (
        truth.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        truth.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_truth"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_truth",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            stable_round(
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_truth").cast("double"),
                6,
            ).alias("recall"),
        )
    )


# --- IR eval triple: nDCG@10 / MRR / recall@10 ---------------------------------

_EVAL_K = 10
# Integer micro-unit gain weights 1/log2(i+1): ONE math.log2 call at
# import builds both engines' literals, so the metric arithmetic is
# integer-exact and identical everywhere.
_W = [round(1_000_000 / math.log2(i + 1)) for i in range(1, _EVAL_K + 1)]
_P = [sum(_W[: j + 1]) for j in range(_EVAL_K)]  # IDCG prefix sums

_W_SQL = "[" + ", ".join(str(w) for w in _W) + "]"
_P_SQL = "[" + ", ".join(str(p) for p in _P) + "]"

_LABEL_EVAL_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS qlab
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label AS clab
      FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, qlab, clab,
         {sround_sql('''CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) > 0
                    THEN list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                    ELSE 0.0 END''', 3)} AS cosine
  FROM q CROSS JOIN c
  WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
),
nrel AS (
  SELECT q.query_id, count(*) AS n_rel
  FROM q JOIN c ON c.clab = q.qlab AND c.neighbor_id <> q.query_id
  GROUP BY q.query_id
),
topk AS (SELECT * FROM ranked WHERE rk <= {_EVAL_K}),
per_q AS (
  SELECT query_id,
         CAST(sum(CASE WHEN clab = qlab THEN ({_W_SQL})[rk] ELSE 0 END) AS BIGINT) AS dcg_micro,
         CAST(sum(CASE WHEN clab = qlab THEN 1 ELSE 0 END) AS BIGINT) AS hits10,
         min(CASE WHEN clab = qlab THEN rk END) AS first_rel
  FROM topk GROUP BY query_id
)
SELECT p.query_id,
       p.hits10,
       n.n_rel,
       {sround_sql(f"CAST(p.dcg_micro AS DOUBLE) / CAST(({_P_SQL})[least(n.n_rel, {_EVAL_K})] AS DOUBLE)", 6)} AS ndcg10,
       {sround_sql("CASE WHEN p.first_rel IS NULL THEN 0.0 ELSE 1.0 / CAST(p.first_rel AS DOUBLE) END", 6)} AS mrr,
       {sround_sql("CAST(p.hits10 AS DOUBLE) / CAST(n.n_rel AS DOUBLE)", 6)} AS recall10
FROM per_q p JOIN nrel n ON p.query_id = n.query_id
"""


@query("retrieval_label_eval", _LABEL_EVAL_ORACLE)
def retrieval_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard IR-eval triple — nDCG@10, MRR, recall@10 — of exact
    cosine retrieval against label-relevance qrels (a neighbor is
    relevant iff it shares the query's class label). Gain weights
    1/log2(rank+1) are precomputed integer micro-units shared by both
    engines, so DCG sums are exact integers and the only doubles are
    two final divisions (engine-invariant IEEE). Scale shape: the
    ranking is the audited top-k operator; metrics aggregate
    n_queries x k rows."""
    from dod_etl_spark.operators.similarity import brute_force_topk

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    topk = brute_force_topk(queries_df, emb, k=_EVAL_K)
    qlab = emb.select(F.col("vec_id").alias("query_id"), F.col("label").alias("qlab"))
    clab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("clab")
    )
    labeled = topk.join(F.broadcast(qlab), "query_id").join(
        F.broadcast(clab), "neighbor_id"
    )
    w_arr = F.array(*[F.lit(w) for w in _W])
    p_arr = F.array(*[F.lit(p) for p in _P])
    rel = (F.col("clab") == F.col("qlab")).cast("int")
    per_q = labeled.groupBy("query_id").agg(
        F.sum(rel * F.element_at(w_arr, F.col("rk").cast("int"))).alias("dcg_micro"),
        F.sum(rel).cast("long").alias("hits10"),
        F.min(F.when(rel == 1, F.col("rk"))).alias("first_rel"),
    )
    n_rel = (
        qlab.join(
            emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("clab")),
            F.col("clab") == F.col("qlab"),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    return per_q.join(n_rel, "query_id").select(
        "query_id",
        "hits10",
        "n_rel",
        stable_round(
            F.col("dcg_micro").cast("double")
            / F.element_at(p_arr, F.least(F.col("n_rel"), F.lit(_EVAL_K)).cast("int")).cast(
                "double"
            ),
            6,
        ).alias("ndcg10"),
        stable_round(
            F.when(F.col("first_rel").isNull(), F.lit(0.0)).otherwise(
                F.lit(1.0) / F.col("first_rel").cast("double")
            ),
            6,
        ).alias("mrr"),
        stable_round(
            F.col("hits10").cast("double") / F.col("n_rel").cast("double"), 6
        ).alias("recall10"),
    )


# --- Cross-source contamination matrix -----------------------------------------

_OVERLAP_SHINGLE = 8

_SOURCE_OVERLAP_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT source, substr(md5(g), 1, 16) AS gh FROM (
    SELECT source,
           unnest([substr(text, i, {_OVERLAP_SHINGLE})
                   for i in range(1, greatest(length(text) - {_OVERLAP_SHINGLE - 2}, 2))]) AS g
    FROM documents
  )
),
sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.gh = b.gh AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b, i.n_common,
       sa.n AS n_a, sb.n AS n_b,
       {sround_sql("CAST(i.n_common AS DOUBLE) / CAST(sa.n + sb.n - i.n_common AS DOUBLE)", 6)} AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
"""


@query("source_overlap_jaccard", _SOURCE_OVERLAP_ORACLE)
def source_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise shingle-set Jaccard between SOURCES — the cross-provider
    contamination matrix (two crawls re-selling the same pages show up
    here before any document-level dedup runs). Scale shape: text
    reduces to distinct (source, gh16) in the scan + one distinct
    exchange; the self-join key is the shingle hash whose per-key
    fan-out is bounded by the number of sources (pair emission is
    <= |sources|^2 per shingle, never corpus-quadratic); the matrix
    itself is |sources|^2 rows — metadata."""
    docs = t(spark, sf_dir, "documents")
    # char_ngrams convention (advisor r7): a doc shorter than the
    # shingle emits ONE truncated shingle, exactly like the oracle's
    # range(1, greatest(length-6, 2)) — a when-guarded empty array
    # here silently dropped short docs from the matrix denominators.
    grams = char_ngrams(F.col("text"), _OVERLAP_SHINGLE)
    sh = (
        docs.select("source", F.explode(grams).alias("g"))
        .select("source", F.substring(F.md5(F.col("g").cast("binary")), 1, 16).alias("gh"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("source").alias("source_a"), "gh")
    b = sh.select(F.col("source").alias("source_b"), "gh")
    inter = (
        a.join(b, "gh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_common",
            "n_a",
            "n_b",
            stable_round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


# --- Fisher discriminant per embedding dimension -------------------------------

_FISHER_ORACLE = f"""
WITH ex AS (
  SELECT vec_id, label,
         unnest([{{'i': i, 'v': embedding[i]::DOUBLE}}
                 for i in range(1, len(embedding)+1)], recursive := true)
  FROM embeddings
),
cls AS (
  SELECT label, i,
         count(*) AS n,
         CAST(sum(CAST(v AS DECIMAL(27,6))) AS DOUBLE) AS s,
         CAST(sum(CAST(v * v AS DECIMAL(27,12))) AS DOUBLE) AS ss
  FROM ex GROUP BY label, i
),
gtot AS (
  SELECT i,
         CAST(sum(CAST(v AS DECIMAL(27,6))) AS DOUBLE) AS gs,
         count(*) AS gn
  FROM ex GROUP BY i
),
parts AS (
  SELECT c.i,
         CAST(sum(CAST(c.n * (c.s / c.n - g.gs / g.gn) * (c.s / c.n - g.gs / g.gn) AS DECIMAL(27,12))) AS DOUBLE) AS between_w,
         CAST(sum(CAST(c.ss - c.s * c.s / c.n AS DECIMAL(27,12))) AS DOUBLE) AS within_w
  FROM cls c JOIN gtot g ON c.i = g.i
  GROUP BY c.i
)
SELECT i,
       {sround_sql("between_w", 6)} AS between_var_w,
       {sround_sql("within_w", 6)} AS within_var_w,
       {sround_sql("CASE WHEN within_w > 0 THEN between_w / within_w ELSE 0.0 END", 6)} AS fisher
FROM parts
"""


@query("label_fisher_scores", _FISHER_ORACLE)
def label_fisher_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension Fisher discriminant ratio over the embedding table
    — weighted between-class scatter of class means over pooled
    within-class scatter, the classic filter-method feature-selection
    score (which embedding dimensions actually separate the labels).
    Decimal-exact class sums/sumsquares make every aggregation
    order-independent; the variance algebra runs on the exact sums in
    identical IEEE expressions. ONE explode + two bucket aggregations
    (|labels| x |dims| rows, metadata-sized) — vectors cross the
    exchange as per-dimension scalars."""
    emb = t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select(
        "label",
        (F.col("pos") + 1).alias("i"),
        F.col("v").cast("double").alias("v"),
    )
    cls = ex.groupBy("label", "i").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(27,6)")).cast("double").alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(27,12)")).cast("double").alias("ss"),
    )
    glob = ex.groupBy("i").agg(
        F.sum(F.col("v").cast("decimal(27,6)")).cast("double").alias("gs"),
        F.count(F.lit(1)).alias("gn"),
    )
    d = F.col("s") / F.col("n") - F.col("gs") / F.col("gn")
    parts = (
        cls.join(glob, "i")
        .groupBy("i")
        .agg(
            F.sum((F.col("n") * d * d).cast("decimal(27,12)"))
            .cast("double")
            .alias("between_w"),
            F.sum((F.col("ss") - F.col("s") * F.col("s") / F.col("n")).cast("decimal(27,12)"))
            .cast("double")
            .alias("within_w"),
        )
    )
    return parts.select(
        "i",
        stable_round(F.col("between_w"), 6).alias("between_var_w"),
        stable_round(F.col("within_w"), 6).alias("within_var_w"),
        stable_round(
            F.when(F.col("within_w") > 0, F.col("between_w") / F.col("within_w")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("fisher"),
    )


# --- Temperature-weighted source mixture ---------------------------------------

_MIX_TARGET = 200  # total documents the mixture draws

_MIX_ORACLE = f"""
WITH sizes AS (
  SELECT source, count(*) AS n,
         CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000000) AS BIGINT) AS w_micro
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(w_micro) AS BIGINT) AS tw FROM sizes),
targets AS (
  SELECT s.source, s.n, s.w_micro,
         CAST({_MIX_TARGET} * s.w_micro // t.tw AS BIGINT) AS target
  FROM sizes s CROSS JOIN tot t
),
ranked AS (
  SELECT d.doc_id, d.source,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '_mix'), 1, 8))::BIGINT,
                    d.doc_id) AS rk
  FROM documents d
)
SELECT r.doc_id, r.source, t.target AS source_target
FROM ranked r JOIN targets t ON r.source = t.source
WHERE r.rk <= t.target
"""


@query("mixture_temperature_docs", _MIX_ORACLE)
def mixture_temperature_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixture (tau = 0.5): per-source draw
    targets proportional to n_s^tau — the multinomial smoothing real
    pretraining mixtures use to keep small sources from vanishing —
    then a deterministic content-hash draw of each source's quota.
    Engine-invariant by construction: sqrt is correctly-rounded IEEE,
    weights become integer micro-units BEFORE the (unordered) sum, the
    apportionment is integer floor division, and the per-source draw
    orders by an md5-derived long. One aggregation for sizes, one
    window for the draw."""
    docs = t(spark, sf_dir, "documents")
    sizes = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    sizes = sizes.withColumn(
        "w_micro",
        F.floor(F.sqrt(F.col("n").cast("double")) * F.lit(1_000_000_000)).cast("long"),
    )
    tot = sizes.agg(F.sum("w_micro").cast("long").alias("tw"))
    targets = sizes.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr(f"CAST({_MIX_TARGET} * w_micro DIV tw AS BIGINT)").alias("target"),
    )
    draw_key = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("_mix")).cast("binary")), 1, 8),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("source").orderBy(draw_key.asc(), F.col("doc_id").asc())
    ranked = docs.select("doc_id", "source").withColumn("rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(targets), "source")
        .filter(F.col("rk") <= F.col("target"))
        .select("doc_id", "source", F.col("target").alias("source_target"))
    )


# --- Two-proportion A/B z-test -------------------------------------------------

_AB_ORACLE = f"""
WITH users AS (
  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm, count(*) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_converted
  FROM users GROUP BY arm
),
wide AS (
  SELECT
    max(CASE WHEN arm = 0 THEN n_users END) AS n0,
    max(CASE WHEN arm = 0 THEN n_converted END) AS c0,
    max(CASE WHEN arm = 1 THEN n_users END) AS n1,
    max(CASE WHEN arm = 1 THEN n_converted END) AS c1
  FROM arms
)
SELECT n0, c0, n1, c1,
       {sround_sql("CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)", 6)} AS rate0,
       {sround_sql("CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)", 6)} AS rate1,
       {sround_sql('''CASE WHEN (c0 + c1) > 0 AND (c0 + c1) < (n0 + n1)
         THEN (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
              / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                     * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                     * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
         ELSE 0.0 END''', 6)} AS z_score
FROM wide
"""


@query("conversion_ab_test", _AB_ORACLE)
def conversion_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between deterministic experiment arms
    (arm = user_id % 2; conversion = any 'purchase' event): the
    experiment-analysis primitive a platform runs over event logs.
    Counts are exact integers; the pooled-proportion z statistic is one
    fixed IEEE expression over them (sqrt is correctly rounded), so
    both engines agree bit-for-bit after rounding. ONE user-level
    aggregation + a 2-row arm rollup — scan-bounded at any scale."""
    ev = t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("long").alias("arm"), "converted"
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0").cast("double")
    p1 = F.col("c1").cast("double") / F.col("n1").cast("double")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    se = F.sqrt(
        pp * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n0").cast("double") + F.lit(1.0) / F.col("n1").cast("double"))
    )
    z = F.when(
        ((F.col("c0") + F.col("c1")) > 0)
        & ((F.col("c0") + F.col("c1")) < (F.col("n0") + F.col("n1"))),
        (p1 - p0) / se,
    ).otherwise(F.lit(0.0))
    return wide.select(
        "n0", "c0", "n1", "c1",
        stable_round(p0, 6).alias("rate0"),
        stable_round(p1, 6).alias("rate1"),
        stable_round(z, 6).alias("z_score"),
    )


# --- Robust outliers: median absolute deviation --------------------------------

_MAD_ORACLE = f"""
WITH med AS (
  SELECT event_type, {sround_sql("quantile_cont(value, 0.5)", 6)} AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS (
  SELECT event_type, {sround_sql("quantile_cont(adev, 0.5)", 6)} AS mad
  FROM dev GROUP BY event_type
),
cut AS (
  SELECT event_type, mad, {sround_sql("3.0 * 1.4826 * mad", 6)} AS cutoff FROM mad
)
SELECT d.event_type,
       max(d.med) AS med,
       max(c.mad) AS mad,
       count(*) AS n,
       CAST(sum(CASE WHEN d.adev > c.cutoff THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN cut c ON d.event_type = c.event_type
GROUP BY d.event_type
"""


@query("value_mad_outliers", _MAD_ORACLE)
def value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier screen: median absolute deviation with
    the classic 3 x 1.4826 cut (MAD-to-sigma consistency constant) —
    the monitoring primitive that survives the heavy tails a mean/std
    z-score drowns in. Cross-engine determinism: Spark's exact
    percentile() and DuckDB's quantile_cont share linear-interpolation
    semantics, and BOTH the median and the cutoff are rounded to 6
    digits BEFORE any comparison, so the outlier count cannot flip on
    a last-ulp interpolation difference. Two grouped exact-percentile
    aggregations + one counting pass, all keyed by event_type."""
    ev = t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        stable_round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        stable_round(F.expr("percentile(adev, 0.5)"), 6).alias("mad")
    )
    cut = mad.select(
        "event_type", "mad",
        stable_round(F.lit(3.0) * F.lit(1.4826) * F.col("mad"), 6).alias("cutoff"),
    )
    return (
        dev.join(F.broadcast(cut), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("adev") > F.col("cutoff")).cast("int"))
            .cast("long")
            .alias("n_outliers"),
        )
    )


# --- Neyman (variance-optimal) stratified allocation ----------------------------

_NEYMAN_TARGET = 150

_NEYMAN_ORACLE = f"""
WITH stats AS (
  SELECT source, count(*) AS n,
         CAST(sum(CAST(n_chars AS DECIMAL(27,6))) AS DOUBLE) AS s,
         CAST(sum(CAST(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE) AS DECIMAL(27,6))) AS DOUBLE) AS ss
  FROM documents GROUP BY source
),
weights AS (
  SELECT source, n,
         CAST(floor(CAST(n AS DOUBLE) * sqrt(greatest((ss - s * s / n) / n, 0.0)) * 1000000) AS BIGINT) AS w_micro
  FROM stats
),
tot AS (SELECT CAST(sum(w_micro) AS BIGINT) AS tw FROM weights),
targets AS (
  SELECT w.source, w.n, CAST({_NEYMAN_TARGET} * w.w_micro // t.tw AS BIGINT) AS target
  FROM weights w CROSS JOIN tot t
),
ranked AS (
  SELECT d.doc_id, d.source,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '_neyman'), 1, 8))::BIGINT,
                    d.doc_id) AS rk
  FROM documents d
)
SELECT r.doc_id, r.source, t.target AS source_target
FROM ranked r JOIN targets t ON r.source = t.source
WHERE r.rk <= t.target
"""


@query("neyman_allocation_sample", _NEYMAN_ORACLE)
def neyman_allocation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-optimal (Neyman) stratified sample: per-source draw
    targets proportional to N_s x sigma_s (strata with more internal
    spread get more budget — the survey-sampling optimum for estimating
    a corpus mean), then the deterministic content-hash draw of each
    quota. sigma comes from decimal-exact sum/sumsq (order-independent)
    feeding one fixed IEEE expression; weights become integer
    micro-units BEFORE the unordered total; apportionment is integer
    floor division. One stats aggregation + one window draw."""
    docs = t(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_chars").cast("decimal(27,6)")).cast("double").alias("s"),
        F.sum(
            (F.col("n_chars").cast("double") * F.col("n_chars").cast("double")).cast(
                "decimal(27,6)"
            )
        )
        .cast("double")
        .alias("ss"),
    )
    var = F.greatest(
        (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / F.col("n"), F.lit(0.0)
    )
    weights = stats.select(
        "source",
        F.floor(F.col("n").cast("double") * F.sqrt(var) * F.lit(1_000_000))
        .cast("long")
        .alias("w_micro"),
    )
    tot = weights.agg(F.sum("w_micro").cast("long").alias("tw"))
    targets = weights.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr(f"CAST({_NEYMAN_TARGET} * w_micro DIV tw AS BIGINT)").alias("target"),
    )
    draw_key = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("_neyman")).cast("binary")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("source").orderBy(draw_key.asc(), F.col("doc_id").asc())
    ranked = docs.select("doc_id", "source").withColumn("rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(targets), "source")
        .filter(F.col("rk") <= F.col("target"))
        .select("doc_id", "source", F.col("target").alias("source_target"))
    )


# --- Cross-corpus novelty score --------------------------------------------------

_NOVELTY_SHINGLE = 8

_NOVELTY_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, substr(md5(g), 1, 16) AS gh FROM (
    SELECT doc_id,
           unnest([substr(text, i, {_NOVELTY_SHINGLE})
                   for i in range(1, greatest(length(text) - {_NOVELTY_SHINGLE - 2}, 2))]) AS g
    FROM documents
  )
),
counts AS (SELECT gh, count(*) AS c FROM sh GROUP BY gh)
SELECT s.doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN c.c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       {sround_sql("CAST(sum(CASE WHEN c.c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)} AS novelty
FROM sh s JOIN counts c ON s.gh = c.gh
GROUP BY s.doc_id
"""


@query("doc_novelty_scores", _NOVELTY_ORACLE)
def doc_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus novelty per document: the fraction of its DISTINCT
    shingles that appear NOWHERE else in the corpus — the complement of
    repetition_ratio_docs (intra-doc) on the inter-doc axis. Low
    novelty = templated/boilerplate-heavy material even when no single
    near-dup pair fires; real curation stacks use it to down-weight
    template farms. Scale shape: text reduces to distinct (doc, gh16)
    in the scan; one map-combined gh count; membership attaches
    through a join keyed by gh whose per-key fan-in is the shingle's
    document frequency (the corpus-frequency distribution dedup
    already bounds); exact integer ratio at the end."""
    docs = t(spark, sf_dir, "documents")
    # char_ngrams convention (advisor r7): short docs emit one
    # truncated shingle, matching the oracle — never an empty array
    # (which dropped the doc from the novelty output entirely).
    grams = char_ngrams(F.col("text"), _NOVELTY_SHINGLE)
    sh = (
        docs.select("doc_id", F.explode(grams).alias("g"))
        .select(
            "doc_id",
            F.substring(F.md5(F.col("g").cast("binary")), 1, 16).alias("gh"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    counts = sh.groupBy("gh").agg(F.count(F.lit(1)).alias("c"))
    return (
        sh.join(counts, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("c") == 1).cast("int")).cast("long").alias("n_unique"),
            stable_round(
                F.sum((F.col("c") == 1).cast("int")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("novelty"),
        )
    )


# --- Quality-aware cluster survivor selection ------------------------------------


def _best_survivor_oracle() -> str:
    from dod_etl_spark.queries.llm import _CLUSTERS_ORACLE

    return f"""
WITH clusters AS ({_CLUSTERS_ORACLE}),
q AS (
  SELECT doc_id,
         {sround_sql('''least(CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE) / 100.0, 1.0)
            * (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
                     / CAST(greatest(length(text), 1) AS DOUBLE))''', 6)} AS quality
  FROM documents
)
SELECT cluster_id, cluster_size, best_doc_id, best_quality FROM (
  SELECT c.cluster_id, c.doc_id AS best_doc_id, q.quality AS best_quality,
         count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.quality DESC, c.doc_id) AS rn
  FROM clusters c JOIN q ON c.doc_id = q.doc_id
) WHERE rn = 1
"""


@query("cluster_best_survivors", _best_survivor_oracle())
def cluster_best_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware keep-one-per-cluster: instead of the min-id cut
    (dedup_clusters' convention), each near-dup cluster keeps its
    HIGHEST-QUALITY member (token-count x punctuation-ratio score, the
    curation gate's own metric; ties break to the smaller doc_id) —
    what production dedup actually ships, since the min-id member may
    be the truncated/mojibake copy. One max_by over the checkpointed
    cluster assignment joined to the map-only quality scan."""
    from dod_etl_spark.functions.text import punct_count
    from dod_etl_spark.operators.graph import dedup_cluster_assignments
    from dod_etl_spark.operators.text_dedup import minhash_cluster_edges

    docs = t(spark, sf_dir, "documents")
    edges = minhash_cluster_edges(docs, num_hashes=8, band_size=2, shingle_len=5)
    clusters = dedup_cluster_assignments(docs, edges)
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    quality = stable_round(
        F.least(F.size(toks).cast("double") / F.lit(100.0), F.lit(1.0))
        * (
            F.lit(1.0)
            - punct_count(F.col("text")).cast("double")
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ),
        6,
    )
    q = docs.select("doc_id", quality.alias("quality"))
    joined = clusters.join(q, "doc_id")
    return joined.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.min_by(
            F.col("doc_id"), F.struct((-F.col("quality")).alias("nq"), F.col("doc_id"))
        ).alias("best_doc_id"),
        F.max("quality").alias("best_quality"),
    )


# --- Chunk-granularity BM25 (the RAG retrieval unit) -----------------------------


# Chunk-key span: cid = doc_id * 2^20 + chunk_id. 2^20 chunks at
# stride 48 is ~50M tokens in ONE document before overflow (vs ~48k at
# the old *1000, which a long web page can exceed — advisor r7: a doc
# with >=1000 chunks silently collided with the next doc_id's chunk 0).
# The Spark side guards the bound with raise_error; int64 holds
# doc_id up to ~8.8e12 at this span.
_CHUNK_KEY_SPAN = 1 << 20


def _encode_cid(doc_id: Column, chunk_id: Column, span: int = _CHUNK_KEY_SPAN) -> Column:
    """doc_id*span + chunk_id with a non-prunable overflow guard (the
    guard lives inside the key expression itself, so Catalyst cannot
    eliminate it as an unused column)."""
    return F.when(chunk_id < F.lit(span), doc_id * F.lit(span) + chunk_id).otherwise(
        F.raise_error(
            F.format_string(
                "chunk_id %s overflows the cid span " + str(span),
                chunk_id.cast("string"),
            )
        ).cast("long")
    )


def _bm25_chunks_oracle() -> str:
    from dod_etl_spark.queries.llm import _CHUNK_S, _CHUNK_W
    from dod_etl_spark.queries.quality import _BM25_CONTRIB, _BM25_VALUES

    return f"""
WITH toksed AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS dtoks
  FROM documents
), sized AS (
  SELECT doc_id, dtoks, greatest(len(dtoks), 1) AS n FROM toksed
), chunks AS (
  SELECT doc_id * {_CHUNK_KEY_SPAN} + i AS cid,
         list_slice(dtoks, i * {_CHUNK_S} + 1, i * {_CHUNK_S} + {_CHUNK_W}) AS ts
  FROM (SELECT doc_id, dtoks,
               unnest(generate_series(0, CAST(floor((n - 1) / {_CHUNK_S}.0) AS BIGINT))) AS i
        FROM sized)
),
posting AS (
  SELECT cid, tok, count(*) AS tf, max(dl) AS dl
  FROM (SELECT cid, len(ts) AS dl, unnest(ts) AS tok FROM chunks)
  GROUP BY cid, tok
),
withdf AS (SELECT *, count(*) OVER (PARTITION BY tok) AS df FROM posting),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(len(ts)) AS DOUBLE) / count(*) AS avgdl
  FROM chunks
),
q(query_id, tok) AS (VALUES {_BM25_VALUES}),
scored AS (
  SELECT q.query_id, p.cid,
         sum(CAST(({_BM25_CONTRIB.replace("p.doc_id", "p.cid")}) AS DECIMAL(27,6))) AS sdec
  FROM withdf p JOIN q USING (tok) CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, cid, sdec,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sdec DESC, cid ASC) AS rank
  FROM scored
)
SELECT query_id,
       cid // {_CHUNK_KEY_SPAN} AS doc_id,
       cid % {_CHUNK_KEY_SPAN} AS chunk_id,
       rank,
       {sround_sql('CAST(sdec AS DOUBLE)', 4)} AS score
FROM ranked WHERE rank <= 10
"""


@query("bm25_chunks_topk", _bm25_chunks_oracle())
def bm25_chunks_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over CHUNKS — the granularity a RAG pipeline actually
    retrieves at (a long document's one relevant passage shouldn't be
    drowned by its length, and dl normalization over chunks is what
    fixes that). Composes the audited chunker (token windows, stride
    with overlap) with the audited BM25 core: each chunk becomes a
    pseudo-document keyed doc_id*2^20+chunk_id (span guarded in
    _encode_cid — overflow raises rather than colliding into the next
    doc_id), scored and ranked by the same decimal-exact rational-idf
    arithmetic, then mapped back to (doc_id, chunk_id). Plan shape is
    bm25_topk_docs' over the chunk frame — tokenize once, posting
    scalars only, WindowGroupLimit top-k."""
    from dod_etl_spark.operators.chunking import chunk_tokens
    from dod_etl_spark.operators.retrieval import bm25_topk
    from dod_etl_spark.queries.llm import _CHUNK_S, _CHUNK_W
    from dod_etl_spark.queries.quality import _BM25_QUERIES

    docs = t(spark, sf_dir, "documents")
    chunks = chunk_tokens(
        docs, window=_CHUNK_W, stride=_CHUNK_S, keep_text=True
    ).select(
        _encode_cid(F.col("doc_id"), F.col("chunk_id")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    queries = spark.createDataFrame(
        _BM25_QUERIES, "query_id long, query_text string"
    )
    out = bm25_topk(chunks, queries, k=10, rational_idf=True)
    # power-of-two span decodes with exact integer bit ops (double
    # division would lose exactness past 2^53)
    return out.select(
        "query_id",
        F.shiftright(F.col("doc_id"), 20).alias("_d"),
        F.col("doc_id").bitwiseAND(F.lit(_CHUNK_KEY_SPAN - 1)).alias("chunk_id"),
        "rank",
        "score",
    ).withColumnRenamed("_d", "doc_id")


# --- Hard-triplet mining (contrastive training pairs) ------------------------

# Integer argmax keys: cosine collapses to its exact stable_round(3)
# integer milli value m = floor(cos*1000 + 0.5), then
# key = m * 2^-free span +/- neighbor_id packs (similarity, tiebreak)
# into ONE BIGINT — min/max/arg_min/arg_max over it are total orders
# identical in any engine (no float comparator, no struct-ordering
# semantics to align between Spark and DuckDB).
_TRIPLET_T = 1_000_000_000_000  # id span per milli step; ids < 10^12
_TRIPLET_ANCHORS = 30

_TRIPLET_ORACLE = f"""
WITH a AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {_TRIPLET_ANCHORS}
),
c AS (
  SELECT vec_id AS neighbor_id, label AS n_label, embedding::DOUBLE[] AS cv
  FROM embeddings
),
pair AS (
  SELECT anchor_id, anchor_label, neighbor_id, n_label,
         CAST(floor((CASE WHEN sqrt(list_dot_product(qv, qv))
                               * sqrt(list_dot_product(cv, cv)) > 0
                          THEN list_dot_product(qv, cv)
                               / (sqrt(list_dot_product(qv, qv))
                                  * sqrt(list_dot_product(cv, cv)))
                          ELSE 0.0 END) * 1000 + 0.5) AS BIGINT) AS m
  FROM a CROSS JOIN c
  WHERE anchor_id <> neighbor_id
),
agg AS (
  SELECT anchor_id,
         arg_min(neighbor_id, CASE WHEN n_label = anchor_label
                 THEN m * {_TRIPLET_T} + neighbor_id END) AS pos_id,
         min(CASE WHEN n_label = anchor_label
             THEN m * {_TRIPLET_T} + neighbor_id END) AS kp,
         arg_max(neighbor_id, CASE WHEN n_label <> anchor_label
                 THEN m * {_TRIPLET_T} - neighbor_id END) AS neg_id,
         max(CASE WHEN n_label <> anchor_label
             THEN m * {_TRIPLET_T} - neighbor_id END) AS kn
  FROM pair GROUP BY anchor_id
)
SELECT anchor_id, pos_id,
       CAST((kp - pos_id) // {_TRIPLET_T} AS DOUBLE) / 1000.0 AS pos_cos,
       neg_id,
       CAST((kn + neg_id) // {_TRIPLET_T} AS DOUBLE) / 1000.0 AS neg_cos,
       CAST((kp - pos_id) // {_TRIPLET_T}
            - (kn + neg_id) // {_TRIPLET_T} AS DOUBLE) / 1000.0 AS margin
FROM agg
WHERE kp IS NOT NULL AND kn IS NOT NULL
"""


@query("hard_triplet_mining", _TRIPLET_ORACLE)
def hard_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-anchor hard triplet for contrastive/metric training: the
    hardest POSITIVE (least-similar same-label vector — the pair the
    model most needs to pull together) and the hardest NEGATIVE
    (most-similar different-label vector — the pair it most needs to
    push apart), with margin = pos_cos - neg_cos; a negative margin is
    a violated triplet, the curation signal for mining batches.

    Scale shape: anchors broadcast (mining runs in anchor batches);
    ONE pass over the corpus computes both arms as conditional
    aggregations (both engines skip NULL ordering keys in
    max_by/arg_max, verified) — no window, no second scan, and the
    only shuffle is the metadata-sized per-anchor aggregate. Exactness:
    the argmax runs on a packed integer key (rounded-milli cosine +
    id tiebreak), so ranking never compares raw doubles across
    engines."""
    from dod_etl_spark.operators.similarity import _dot_sql, _norm_sql, _probe_dim

    emb = t(spark, sf_dir, "embeddings")
    dim = _probe_dim(emb, "embedding") or 1
    anchors = F.broadcast(
        emb.where(F.col("vec_id") < _TRIPLET_ANCHORS).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            F.col("embedding").alias("_qv"),
            F.expr(_norm_sql("embedding", dim)).alias("_qn"),
        )
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("_cv"),
        F.expr(_norm_sql("embedding", dim)).alias("_cn"),
    )
    pair = anchors.crossJoin(c).filter(F.col("anchor_id") != F.col("neighbor_id"))
    denom = F.col("_qn") * F.col("_cn")
    sim = F.when(
        denom > 0, F.expr(_dot_sql("_qv", "_cv", dim)) / denom
    ).otherwise(F.lit(0.0))
    m = F.floor(sim * 1000 + F.lit(0.5)).cast("long")
    same = F.col("n_label") == F.col("anchor_label")
    kp = F.when(same, m * _TRIPLET_T + F.col("neighbor_id"))
    kn = F.when(~same, m * _TRIPLET_T - F.col("neighbor_id"))
    agg = (
        pair.select("anchor_id", "neighbor_id", kp.alias("_kp"), kn.alias("_kn"))
        .groupBy("anchor_id")
        .agg(
            F.min_by("neighbor_id", "_kp").alias("pos_id"),
            F.min("_kp").alias("_kpm"),
            F.max_by("neighbor_id", "_kn").alias("neg_id"),
            F.max("_kn").alias("_knm"),
        )
        .where(F.col("_kpm").isNotNull() & F.col("_knm").isNotNull())
    )
    pm = F.expr(f"(_kpm - pos_id) div {_TRIPLET_T}")
    nm = F.expr(f"(_knm + neg_id) div {_TRIPLET_T}")
    return agg.select(
        "anchor_id",
        "pos_id",
        (pm.cast("double") / 1000.0).alias("pos_cos"),
        "neg_id",
        (nm.cast("double") / 1000.0).alias("neg_cos"),
        ((pm - nm).cast("double") / 1000.0).alias("margin"),
    )


# --- MinHash candidate precision/recall (the dedup-index eval twin) ----------

_PR_N_DOCS = 100      # eval slice: all-pairs exact truth stays 100*99/2
_PR_TAU_MILLI = 250   # resemblance threshold 0.25, exact integer milli


def _minhash_pr_oracle() -> str:
    from dod_etl_spark.queries.llm import _minhash_oracle

    cand = _minhash_oracle(table="sub", text="text")
    return f"""
WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id < {_PR_N_DOCS}),
cand AS ({cand}),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest([substr(text, i, 5)
                   for i in range(1, greatest(length(text) - 3, 2))]) AS shingle
    FROM sub
  )
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
truth AS (
  SELECT i.id_1, i.id_2,
         CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jac
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_1
  JOIN sizes sb ON sb.doc_id = i.id_2
  WHERE 1000 * i.c >= {_PR_TAU_MILLI} * (sa.n + sb.n - i.c)
),
theory AS (
  -- LSH S-curve, 4 bands of 2: P(candidate | j) = 1 - (1 - j^2)^4,
  -- expanded as explicit multiplications (deterministic IEEE in both
  -- engines; pow() is not)
  SELECT avg(1.0 - (1.0 - jac * jac) * (1.0 - jac * jac)
                 * (1.0 - jac * jac) * (1.0 - jac * jac)) AS exp_rec
  FROM truth
),
hit AS (
  SELECT count(*) AS n_hit
  FROM truth t JOIN cand c ON t.id_1 = c.id_1 AND t.id_2 = c.id_2
),
tot AS (
  SELECT (SELECT count(*) FROM truth) AS n_truth,
         (SELECT count(*) FROM cand) AS n_cand,
         (SELECT n_hit FROM hit) AS n_hit,
         (SELECT exp_rec FROM theory) AS exp_rec
)
SELECT n_truth, n_cand, n_hit,
       {sround_sql('CASE WHEN n_cand > 0 THEN CAST(n_hit AS DOUBLE) / n_cand ELSE 1.0 END', 6)} AS precision,
       {sround_sql('CASE WHEN n_truth > 0 THEN CAST(n_hit AS DOUBLE) / n_truth ELSE 1.0 END', 6)} AS recall,
       {sround_sql('coalesce(exp_rec, 1.0)', 6)} AS recall_expected
FROM tot
"""


@query("minhash_pr_eval", _minhash_pr_oracle())
def minhash_pr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the MinHash-LSH candidate generator against
    EXACT 5-char-shingle resemblance >= 0.5 — the dedup-index twin of
    lsh_recall_eval, measured IN-ENGINE on the same shingle space the
    index hashes (token-set Jaccard would measure a different
    similarity notion, the r6 trap). Truth is all-pairs exact Jaccard
    over a bounded doc slice (all-pairs is the point of an eval: the
    index must be judged against ground truth the index never saw);
    the comparison itself is integer counts + a handful of divisions,
    so the measurement is oracle-hash-checked end to end. The
    `recall_expected` column is the LSH S-curve anchor
    E[1-(1-j^2)^4] over the truth pairs: at tau=0.25 with 8 perms / 4
    bands the THEORETICAL candidate rate near threshold is ~0.25, so
    the measured ~0.4 recall and ~0.02 precision are the index
    behaving exactly as designed for low-similarity pairs — the
    high-similarity regime (where dedup decisions live) is pinned
    separately at recall 1.0 in tests/test_model_quality.py. Scale:
    the slice bounds the quadratic truth arm; the candidate arm is
    the production bucketed operator."""
    from dod_etl_spark.operators.text_dedup import minhash_candidates

    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") < _PR_N_DOCS)
    cand = minhash_candidates(docs, num_hashes=8, band_size=2, shingle_len=5)

    sh = (
        docs.select(
            "doc_id", F.explode(F.array_distinct(char_ngrams(F.col("text"), 5))).alias("s")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("id_1"), "s")
    b = sh.select(F.col("doc_id").alias("id_2"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("id_1") < F.col("id_2"))
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    truth = (
        inter.join(
            F.broadcast(sizes.select(F.col("doc_id").alias("id_1"), F.col("n").alias("na"))),
            "id_1",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("id_2"), F.col("n").alias("nb"))),
            "id_2",
        )
        .where(
            1000 * F.col("c")
            >= _PR_TAU_MILLI * (F.col("na") + F.col("nb") - F.col("c"))
        )
        .select(
            "id_1",
            "id_2",
            (
                F.col("c").cast("double")
                / (F.col("na") + F.col("nb") - F.col("c")).cast("double")
            ).alias("jac"),
        )
        .localCheckpoint(eager=True)
    )
    # LSH S-curve anchor for the measured recall: E[P(candidate | j)]
    # over the truth pairs, with (1-j^2)^4 as explicit multiplications
    # (pow() is not IEEE-identical across engines; products are).
    j2 = F.lit(1.0) - F.col("jac") * F.col("jac")
    exp_rec_row = truth.agg(
        F.avg(F.lit(1.0) - j2 * j2 * j2 * j2).alias("e")
    ).first()
    n_truth = truth.count()
    n_hit = truth.join(
        cand.select("id_1", "id_2"), ["id_1", "id_2"], "left_semi"
    ).count()
    n_cand = cand.count()
    # counts are driver metadata (4 scalars); the heavy arms ran in-engine
    import math as _math

    def _sr(x):  # stable_round twin for the driver-side divisions
        return _math.floor(x * 10**6 + 0.5) / 10**6

    prec = _sr(n_hit / n_cand) if n_cand else 1.0
    rec = _sr(n_hit / n_truth) if n_truth else 1.0
    exp_rec = _sr(exp_rec_row["e"]) if exp_rec_row["e"] is not None else 1.0
    return spark.createDataFrame(
        [(n_truth, n_cand, n_hit, prec, rec, exp_rec)],
        "n_truth long, n_cand long, n_hit long, "
        "precision double, recall double, recall_expected double",
    )
