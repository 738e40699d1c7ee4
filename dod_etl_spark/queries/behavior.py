"""Behavioral / product-analytics queries over the event stream.

The reference's MES pipeline stops at per-event enrichment + OEE
aggregation; a production events table additionally serves funnel,
retention, and path analysis.  These are expressed as the
shuffle-disciplined Spark shapes a 100 TB events table needs:

- funnel: ONE shuffle (groupBy user, sorted-array fold) instead of the
  textbook 3-way self-join (3 shuffles of the full fact table);
- retention: first-seen + activity frames co-partitioned on user_id so
  the join after their aggregations needs no extra exchange;
- transitions: one window shuffle + a tiny (|types|^2) aggregate.

All oracle-paired against DuckDB on identical semantics (strict '>'
stage ordering, microsecond event-time, epoch-ms output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import stable_round
from dod_etl_spark.queries.base import query, sround_sql, t

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
    """Per-user ordered funnel in ONE shuffle: sort_array(collect_list)
    + a single higher-order fold carrying (t1, t2, t3).  The sorted
    order makes each stage's first-eligible event the first match; the
    strict ts comparison inside the fold pins tie semantics to the
    oracle's '>' independent of sort-order details."""
    events = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*_FUNNEL_STAGES)
    )
    seq = F.sort_array(
        F.collect_list(F.struct("ts", "event_type", "event_id"))
    )
    acc0 = F.struct(
        F.lit(None).cast("timestamp").alias("t1"),
        F.lit(None).cast("timestamp").alias("t2"),
        F.lit(None).cast("timestamp").alias("t3"),
    )

    def _step(acc, x):
        et = x["event_type"]
        take1 = acc["t1"].isNull() & (et == _FUNNEL_STAGES[0])
        take2 = (
            acc["t1"].isNotNull()
            & acc["t2"].isNull()
            & (et == _FUNNEL_STAGES[1])
            & (x["ts"] > acc["t1"])
        )
        take3 = (
            acc["t2"].isNotNull()
            & acc["t3"].isNull()
            & (et == _FUNNEL_STAGES[2])
            & (x["ts"] > acc["t2"])
        )
        return F.struct(
            F.when(take1, x["ts"]).otherwise(acc["t1"]).alias("t1"),
            F.when(take2, x["ts"]).otherwise(acc["t2"]).alias("t2"),
            F.when(take3, x["ts"]).otherwise(acc["t3"]).alias("t3"),
        )

    folded = (
        events.groupBy("user_id")
        .agg(F.aggregate(seq, acc0, _step).alias("f"))
        .filter(F.col("f.t1").isNotNull())
    )
    return folded.select(
        "user_id",
        F.unix_millis("f.t1").alias("signup_ms"),
        F.unix_millis("f.t2").alias("click_ms"),
        F.unix_millis("f.t3").alias("purchase_ms"),
        (
            F.lit(1)
            + F.col("f.t2").isNotNull().cast("int")
            + F.col("f.t3").isNotNull().cast("int")
        ).alias("stage_reached"),
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
