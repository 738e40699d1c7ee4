"""Behavioral / product-analytics queries over the event stream.

The reference's MES pipeline stops at per-event enrichment + OEE
aggregation; a production events table additionally serves funnel,
retention, and path analysis.  These are expressed as the
shuffle-disciplined Spark shapes a 100 TB events table needs:

- funnel: ONE shuffle (groupBy user, sorted-array fold) instead of the
  textbook 3-way self-join (3 shuffles of the full fact table);
- retention: join-free — min-day and the distinct active-day set come
  out of one (user_id) aggregation;
- transitions: one window shuffle + a tiny (|types|^2) aggregate;
- RFM / z-score: global cut points return as ONE broadcast row
  (never a global ntile/sort), facts never shuffle for the scoring.

All oracle-paired against DuckDB on identical semantics (strict '>'
stage ordering, microsecond event-time, epoch-ms output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import stable_round, stable_sum
from dod_etl_spark.queries.base import query, sround_sql, ssum_sql, t

# --- Ordered funnel: signup -> click -> purchase ------------------------------
#
# Stage N counts only if it happens STRICTLY after the user's stage-N-1
# time (classic ordered-funnel semantics).  The Spark plan is a single
# groupBy(user_id): the per-user event list is sorted and folded once
# with a 3-slot struct accumulator, so the fact table shuffles exactly
# once and nothing joins.  Per-user list size is bounded by per-user
# activity (power users => operators/skew.py two-phase collect is the
# documented escape hatch).

_FUNNEL_STAGES = ("signup", "click", "purchase")

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
)
SELECT s1.user_id,
       epoch_ms(t1) AS signup_ms,
       epoch_ms(t2) AS click_ms,
       epoch_ms(t3) AS purchase_ms,
       1 + CAST(t2 IS NOT NULL AS INT) + CAST(t3 IS NOT NULL AS INT)
         AS stage_reached
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


@query("funnel_signup_purchase", _FUNNEL_ORACLE)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered funnel in ONE shuffle (operators/funnel.py
    funnel_fold — the generic N-stage fold; strict ts comparisons
    inside the fold pin tie semantics to the oracle's '>' independent
    of sort-order details)."""
    from dod_etl_spark.operators.funnel import funnel_fold

    events = t(spark, sf_dir, "events")
    f = funnel_fold(events, _FUNNEL_STAGES)
    return f.select(
        "user_id",
        F.unix_millis("t1").alias("signup_ms"),
        F.unix_millis("t2").alias("click_ms"),
        F.unix_millis("t3").alias("purchase_ms"),
        F.col("stage_reached").cast("int").alias("stage_reached"),
    )


# --- Retention cohorts --------------------------------------------------------

_RETENTION_ORACLE = """
WITH first_seen AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
)
SELECT epoch_ms(CAST(f.cohort_day AS TIMESTAMP)) AS cohort_day_ms,
       datediff('day', f.cohort_day, a.active_day) AS day_offset,
       count(*) AS n_users
FROM first_seen f JOIN activity a USING (user_id)
GROUP BY 1, 2
"""


@query("retention_cohorts", _RETENTION_ORACLE)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day,
    counted on each later active day.  Join-free shape: ONE shuffle of
    the (user_id, day) projection computes min-day AND the distinct
    active-day set per user in the same map-side-combined aggregation
    (set size is bounded by the calendar range, not event volume); the
    exploded (cohort, offset) frame is distinct user-days, so the final
    groupBy shuffles a deduplicated fraction of the fact table.  The
    textbook first_seen-join-activity formulation costs a third
    exchange because distinct partitions on (user, day), misaligning
    with the user_id join key."""
    events = t(spark, sf_dir, "events")
    day = F.to_date("ts")
    per_user = events.select("user_id", day.alias("d")).groupBy("user_id").agg(
        F.min("d").alias("cohort_day"), F.collect_set("d").alias("days")
    )
    return (
        per_user.select("cohort_day", F.explode("days").alias("active_day"))
        .groupBy(
            F.unix_millis(F.col("cohort_day").cast("timestamp")).alias(
                "cohort_day_ms"
            ),
            F.datediff("active_day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# --- Event transition matrix --------------------------------------------------

_TRANSITION_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, n AS n_transitions,
       {sround_sql("n / sum(n) OVER (PARTITION BY prev_type)", 6)} AS p_next
FROM pairs
"""


@query("event_transition_matrix", _TRANSITION_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts/probabilities between
    consecutive events per user.  One window shuffle on user_id builds
    the lag pairs; the transition matrix itself is |types|^2 rows, so
    the normalizing window runs on a metadata-sized frame."""
    events = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        stable_round(
            F.col("n_transitions") / F.sum("n_transitions").over(wp), 6
        ).alias("p_next"),
    )


# --- RFM segmentation ---------------------------------------------------------
#
# Classic customer-value segmentation (recency / frequency / monetary)
# over purchase events.  The quartile bucketing deliberately avoids a
# global ntile() — that sorts every user on ONE partition; instead the
# three quartile thresholds come back as a single broadcast row (the
# quality_cut / rarity-decile pattern), so at 100 TB the shape stays
# one fact shuffle + one metadata-sized scalar aggregate.

_RFM_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         count(*) AS frequency,
         {sround_sql("CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE)", 2)}
           AS monetary,
         max(ts) AS last_ts
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), anchored AS (
  SELECT user_id, frequency, monetary,
         CAST((epoch_ms((SELECT max(last_ts) FROM per_user))
               - epoch_ms(last_ts)) // 3600000 AS BIGINT) AS recency_h
  FROM per_user
), thr AS (
  SELECT
    [{", ".join(sround_sql(f"quantile_cont(recency_h, {q})", 6) for q in (0.25, 0.5, 0.75))}] AS r_ts,
    [{", ".join(sround_sql(f"quantile_cont(frequency, {q})", 6) for q in (0.25, 0.5, 0.75))}] AS f_ts,
    [{", ".join(sround_sql(f"quantile_cont(monetary, {q})", 6) for q in (0.25, 0.5, 0.75))}] AS m_ts
  FROM anchored
)
SELECT a.user_id, a.recency_h, a.frequency, a.monetary,
       1 + len(list_filter(thr.r_ts, t -> a.recency_h >= t)) AS r_q,
       1 + len(list_filter(thr.f_ts, t -> a.frequency >= t)) AS f_q,
       1 + len(list_filter(thr.m_ts, t -> a.monetary >= t)) AS m_q
FROM anchored a, thr
"""


@query("rfm_segments", _RFM_ORACLE)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartiles: one map-side-combined groupBy(user_id) over the
    pushed-down purchase filter builds the per-user frame (materialized
    once — the threshold aggregate and the global-anchor max would each
    replay the fact scan otherwise); quartile thresholds and the
    recency anchor return as ONE broadcast row."""
    events = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("frequency"),
            stable_sum(F.col("value"), 2).alias("monetary"),
            F.max("ts").alias("last_ts"),
        )
        .localCheckpoint(eager=True)
    )
    qs = "array(0.25D, 0.5D, 0.75D)"
    thr = per_user.select(
        F.unix_millis("last_ts").alias("last_ms"),
        F.col("frequency").cast("double").alias("fq"),
        F.col("monetary").alias("mq"),
    ).agg(
        F.max("last_ms").alias("anchor_ms"),
        F.expr(f"transform(percentile(fq, {qs}), t -> floor(t * 1e6 + 0.5) / 1e6)").alias("f_ts"),
        F.expr(f"transform(percentile(mq, {qs}), t -> floor(t * 1e6 + 0.5) / 1e6)").alias("m_ts"),
    )
    anchored = per_user.crossJoin(F.broadcast(thr)).select(
        "user_id",
        "frequency",
        "monetary",
        "f_ts",
        "m_ts",
        "anchor_ms",
        (
            (F.col("anchor_ms") - F.unix_millis("last_ts"))
            / F.lit(3600000)
        ).cast("long").alias("recency_h"),
    ).localCheckpoint(eager=True)
    r_thr = anchored.agg(
        F.expr(f"transform(percentile(recency_h, {qs}), t -> floor(t * 1e6 + 0.5) / 1e6)").alias("r_ts")
    )

    def _quart(val, ts):
        return F.lit(1) + F.size(
            F.filter(F.col(ts), lambda x: val.cast("double") >= x)
        )

    return anchored.crossJoin(F.broadcast(r_thr)).select(
        "user_id",
        "recency_h",
        "frequency",
        "monetary",
        _quart(F.col("recency_h"), "r_ts").alias("r_q"),
        _quart(F.col("frequency"), "f_ts").alias("f_q"),
        _quart(F.col("monetary"), "m_ts").alias("m_q"),
    )


# --- Top session paths --------------------------------------------------------

_PATHS_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
), paths AS (
  SELECT user_id, session_id,
         array_to_string((list(event_type ORDER BY ts, event_id))[1:8], '>') AS path
  FROM sess GROUP BY user_id, session_id
)
SELECT path, count(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
"""


@query("top_session_paths", _PATHS_ORACLE)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common session journeys (first 8 event types per 30-min-gap
    session).  Reuses sessionize_events' lag-gap semantics; the
    (user_id, session_id) aggregation consumes the window's user_id
    partitioning (no second fact exchange), the path-count frame is
    |distinct paths| rows, and the global top-20 runs as
    TakeOrdered (per-partition heads, never a full sort)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    sess = ev.withColumn(
        "session_id",
        F.sum(F.when(gap > 30 * 60000, 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    path = F.array_join(
        F.slice(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            1,
            8,
        ),
        ">",
    )
    paths = sess.groupBy("user_id", "session_id").agg(path.alias("path"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


# --- Per-type z-score outliers ------------------------------------------------
#
# Moment sums are decimal-exact (order-independent), so mean/variance —
# and therefore every z-score — are bit-identical across engines; the
# flag threshold compares the same doubles on both sides.

_ZSCORE_ORACLE = f"""
WITH moments AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(value AS DECIMAL(27,6)) * CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS s2
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, {sround_sql("e.value", 4)} AS value,
       {sround_sql("(e.value - m.s1 / m.n) / sqrt(m.s2 / m.n - (m.s1 / m.n) * (m.s1 / m.n))", 4)} AS zscore
FROM events e JOIN moments m USING (event_type)
WHERE abs((e.value - m.s1 / m.n) / sqrt(m.s2 / m.n - (m.s1 / m.n) * (m.s1 / m.n))) >= 2.5
"""


@query("value_zscore_outliers", _ZSCORE_ORACLE)
def value_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type anomaly screen: |z| >= 2.5 against decimal-exact
    per-type moments.  The moments frame is |types| rows broadcast back
    over the scan — the fact table never shuffles; at 100 TB this is
    one map-side-combined scalar aggregate + a map-only flag pass."""
    events = t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(27,6)")
    moments = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    z = (F.col("value") - mean) / std
    return (
        events.join(F.broadcast(moments), "event_type")
        .where(F.abs(z) >= 2.5)
        .select(
            "event_id",
            "event_type",
            stable_round("value", 4).alias("value"),
            stable_round(z, 4).alias("zscore"),
        )
    )


# --- EWMA smoothing (alpha = 1/2, bit-exact) ------------------------------------
#
# Exponentially weighted moving average per user over the ordered value
# stream.  alpha = 1/2 makes every fold step s = (s + x) / 2 an exact
# IEEE operation (division by a power of two), and both engines fold
# the SAME sorted sequence — so the smoothed value is bit-identical
# cross-engine with no decimal detour.

_EWMA_ORACLE = f"""
WITH seq AS (
  SELECT user_id,
         list(value ORDER BY ts, event_id)::DOUBLE[] AS vals
  FROM events GROUP BY user_id
)
SELECT user_id,
       len(vals) AS n_events,
       {sround_sql("vals[len(vals)]", 4)} AS last_value,
       {sround_sql("list_reduce(vals, (s, x) -> (s + x) / 2)", 6)} AS ewma
FROM seq
"""


@query("ewma_user_value", _EWMA_ORACLE)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of the event value stream: ONE groupBy(user_id)
    shuffle carrying (ts, id, value) scalars; the smoothing is a single
    higher-order fold over the sorted array (seed = first element,
    matching DuckDB's list_reduce) — the same single-shuffle
    fold-aggregation family as the funnel."""
    events = t(spark, sf_dir, "events")
    seq = events.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda x: x["value"],
        ).alias("vals")
    )
    n = F.size("vals")
    ewma = F.aggregate(
        F.slice("vals", 2, n - 1),
        F.element_at("vals", 1),
        lambda s, x: (s + x) / F.lit(2.0),
    )
    return seq.select(
        "user_id",
        n.cast("long").alias("n_events"),
        stable_round(F.element_at("vals", n), 4).alias("last_value"),
        stable_round(ewma, 6).alias("ewma"),
    )


# --- Last-touch purchase attribution --------------------------------------------

_ATTRIBUTION_ORACLE = """
WITH touched AS (
  SELECT user_id, ts, event_id, event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN epoch_ms(ts) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_ms
  FROM events
)
SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS purchase_ms,
       touch_type, touch_ms,
       (epoch_ms(ts) - touch_ms) // 1000 AS gap_s
FROM touched WHERE event_type = 'purchase'
"""


@query("purchase_attribution", _ATTRIBUTION_ORACLE)
def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the most recent
    preceding non-purchase event.  ONE window shuffle on user_id; the
    two ignore-nulls last() calls share the same when-condition, so
    they always pick the same touch row.  (The purchase filter cannot
    push below the window — it needs the non-purchase rows as
    candidates — which is exactly why this is a window, not a join.)"""
    events = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.col("event_type") != "purchase"
    touch_type = F.last(
        F.when(non_purchase, F.col("event_type")), ignorenulls=True
    ).over(w)
    touch_ms = F.last(
        F.when(non_purchase, F.unix_millis("ts")), ignorenulls=True
    ).over(w)
    return (
        events.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            touch_type.alias("touch_type"),
            touch_ms.alias("touch_ms"),
        )
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.unix_millis("ts").alias("purchase_ms"),
            "touch_type",
            "touch_ms",
            ((F.unix_millis("ts") - F.col("touch_ms")) / F.lit(1000))
            .cast("long")
            .alias("gap_s"),
        )
    )


# --- Semi-structured props extraction --------------------------------------------
#
# The events table carries a JSON payload column (`props`) the way real
# event pipelines do.  Typed extraction happens ONCE in the scan stage
# via from_json with an explicit schema (no schema inference pass, no
# string re-parsing per field); malformed payloads degrade to NULL and
# are counted, not thrown — the quarantine posture (P1/F10) applied to
# a column instead of the record.

_PROPS_ORACLE = f"""
WITH parsed AS (
  SELECT event_type,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         value
  FROM events
)
SELECT event_type,
       k // 10 AS k_decade,
       count(*) AS n_events,
       CAST(count(*) FILTER (WHERE k IS NULL) AS BIGINT) AS n_bad_payload,
       CAST(sum(k) AS BIGINT) AS sum_k,
       {ssum_sql("value", 2)} AS sum_value
FROM parsed
GROUP BY event_type, k // 10
"""


@query("props_extract_agg", _PROPS_ORACLE)
def props_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload analytics: schema-directed from_json in the scan
    stage, then ONE map-side-combined aggregate over (type, k-decade).
    At 100 TB the JSON parse is the dominant CPU — doing it once per
    row with an explicit schema (vs get_json_object per field) halves
    the parse count the moment a second field is read."""
    events = t(spark, sf_dir, "events")
    parsed = events.select(
        "event_type",
        F.from_json(F.col("props"), "k BIGINT").getField("k").alias("k"),
        "value",
    )
    return parsed.groupBy(
        "event_type",
        F.expr("k div 10").alias("k_decade"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("k").isNull(), 1)).cast("long").alias("n_bad_payload"),
        F.sum("k").cast("long").alias("sum_k"),
        stable_sum(F.col("value"), 2).alias("sum_value"),
    )


# --- Point-in-time SCD2 state lookup ---------------------------------------------
#
# "Which dimension version was valid when this event happened" — the
# temporal-correctness query every feature pipeline needs (training-
# serving skew comes from getting this wrong).  Because SCD2 validity
# intervals tile contiguously per key, the interval-containment join
# REDUCES to a backward as-of join — so the plan is operators/asof.py's
# linear union+window merge (ONE shuffle), never the |events| x
# |versions-per-key| non-equi fan-out the oracle below uses.

_PIT_ORACLE = f"""
WITH v AS (
  SELECT user_id, ts AS vts, epoch_ms(ts) AS valid_from_ms, value AS amount,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS version
  FROM events WHERE event_type = 'purchase'
), e AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
), matched AS (
  SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS event_ms,
         v.version, v.valid_from_ms, v.amount,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY v.vts DESC, v.version DESC) AS rn
  FROM e LEFT JOIN v ON v.user_id = e.user_id AND v.vts <= e.ts
)
SELECT event_id, user_id, event_ms,
       CAST(version AS BIGINT) AS version, valid_from_ms,
       {sround_sql("amount", 4)} AS amount,
       CAST(version IS NOT NULL AS INT) AS has_state
FROM matched WHERE rn = 1
"""


@query("events_scd2_pit", _PIT_ORACLE)
def events_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct state attach: each view event gets the
    purchase-history version valid AT its timestamp (events before the
    first purchase keep NULL state — left-outer).  Right-side ties on
    (user, ts) are pre-resolved to the highest version, matching the
    as-of operator's contract."""
    from dod_etl_spark.operators.asof import as_of_join

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            F.row_number().over(w).cast("long").alias("version"),
            F.col("value").alias("amount"),
        )
        .groupBy("user_id", "ts")
        .agg(
            F.max("version").alias("version"),
            F.max_by("amount", "version").alias("amount"),
        )
    )
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    joined = as_of_join(
        views,
        versions,
        left_on="user_id",
        right_on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["version", "amount"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("event_ms"),
        "version",
        F.unix_millis("asof_ts").alias("valid_from_ms"),
        stable_round("amount", 4).alias("amount"),
        F.col("version").isNotNull().cast("int").alias("has_state"),
    )


# --- DAU / MAU stickiness ---------------------------------------------------------

_STICKINESS_ORACLE = f"""
WITH dau AS (
  SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS dau
  FROM events GROUP BY CAST(ts AS DATE)
), mau AS (
  SELECT date_trunc('month', ts)::DATE AS month, count(DISTINCT user_id) AS mau
  FROM events GROUP BY date_trunc('month', ts)::DATE
)
SELECT epoch_ms(CAST(d.day AS TIMESTAMP)) AS day_ms,
       d.dau, m.mau,
       {sround_sql("CAST(d.dau AS DOUBLE) / m.mau", 6)} AS stickiness
FROM dau d JOIN mau m ON date_trunc('month', d.day)::DATE = m.month
"""


@query("dau_mau_stickiness", _STICKINESS_ORACLE)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users over monthly active users — the standard
    engagement ratio.  Both frames are distinct-count aggregates whose
    shuffles carry (period, user) pairs; the MAU frame is
    months-cardinality and broadcasts back onto the daily frame."""
    events = t(spark, sf_dir, "events")
    day = F.to_date("ts")
    month = F.date_trunc("month", "ts").cast("date")
    dau = events.groupBy(day.alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    mau = events.groupBy(month.alias("month")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    return (
        dau.join(
            F.broadcast(mau),
            F.date_trunc("month", F.col("day")).cast("date") == F.col("month"),
        )
        .select(
            F.unix_millis(F.col("day").cast("timestamp")).alias("day_ms"),
            "dau",
            "mau",
            stable_round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
                "stickiness"
            ),
        )
    )


# --- Funnel conversion summary ------------------------------------------------------

_CONVERSION_ORACLE = f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
), f AS (
  SELECT s1.user_id, t1, t2, t3
  FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
)
SELECT count(*) AS n_stage1,
       count(t2) AS n_stage2,
       count(t3) AS n_stage3,
       {sround_sql("CAST(count(t2) AS DOUBLE) / count(*)", 6)} AS conv_1_2,
       {sround_sql("CAST(count(t3) AS DOUBLE) / greatest(count(t2), 1)", 6)} AS conv_2_3,
       {sround_sql("quantile_cont(epoch_ms(t2) - epoch_ms(t1), 0.5)", 4)} AS median_ms_1_2,
       {sround_sql("quantile_cont(epoch_ms(t3) - epoch_ms(t2), 0.5)", 4)} AS median_ms_2_3
FROM f
"""


@query("funnel_conversion_summary", _CONVERSION_ORACLE)
def funnel_conversion_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel's one-row executive summary: stage counts, step
    conversion rates, and exact median time-to-convert per step —
    one scalar aggregate over the single-shuffle funnel_fold frame
    (null stage timestamps drop out of count()/percentile() the same
    way in both engines)."""
    from dod_etl_spark.operators.funnel import funnel_fold

    events = t(spark, sf_dir, "events")
    f = funnel_fold(events, _FUNNEL_STAGES)
    return f.agg(
        F.count(F.lit(1)).alias("n_stage1"),
        F.count("t2").alias("n_stage2"),
        F.count("t3").alias("n_stage3"),
        stable_round(F.count("t2") / F.count(F.lit(1)), 6).alias("conv_1_2"),
        stable_round(
            F.count("t3") / F.greatest(F.count("t2"), F.lit(1)), 6
        ).alias("conv_2_3"),
        stable_round(
            F.expr("percentile(unix_millis(t2) - unix_millis(t1), 0.5D)"), 4
        ).alias("median_ms_1_2"),
        stable_round(
            F.expr("percentile(unix_millis(t3) - unix_millis(t2), 0.5D)"), 4
        ).alias("median_ms_2_3"),
    )
