"""Generic operator queries (SURVEY §2) over the driver's testdata,
each with a DuckDB oracle.

These pin the reference's dimension-maintenance semantics: A1
latest-per-key CDC dedup, P6 on-demand key-set filter, P7 retention,
J6 upsert, A2 high-water marks, A4 collect-concat, plus the set-op
surface used for cache invalidation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import stable_round, stable_sum
from dod_etl_spark.operators.dedup import latest_per_key, upsert_snapshot
from dod_etl_spark.operators.filters import keyset_filter, retention_filter
from dod_etl_spark.queries.base import query, sround_sql, ssum_sql, t

# --- A1: latest-per-key dedup ------------------------------------------------

_A1_ORACLE = f"""
SELECT user_id, event_type, event_id AS last_event_id,
       epoch_ms(ts) AS last_ts_ms, {sround_sql("value", 4)} AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@query("a1_latest_per_key", _A1_ORACLE)
def a1_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (imtu/InMemoryTableUpdater.scala:129-171): last version per key.
    Implemented as one max_by aggregation (partial+final, map-side
    combine) rather than the window-function formulation — less shuffle
    at scale."""
    events = t(spark, sf_dir, "events")
    out = latest_per_key(events, ["user_id", "event_type"], ["ts", "event_id"])
    return out.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("last_event_id"),
        F.unix_millis("ts").alias("last_ts_ms"),
        stable_round("value", 4).alias("last_value"),
    )


# --- P6: on-demand key-set filter -------------------------------------------

_P6_ORACLE = f"""
SELECT o_orderkey, o_custkey, {sround_sql("o_totalprice", 2)} AS o_totalprice
FROM orders
WHERE o_custkey IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
"""


@query("p6_keyset_filter", _P6_ORACLE)
def p6_keyset_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 (imtu/InMemoryTableUpdater.scala:142-146,182-187): keep
    dimension rows whose filter-column value was observed on the
    stream. Stream-observed keys -> broadcast left-semi join (the
    set-based analog of the reference's shared filterKeySet)."""
    orders = t(spark, sf_dir, "orders")
    events = t(spark, sf_dir, "events")
    keys = events.filter(F.col("event_type") == "purchase").select("user_id")
    # orders.o_custkey is never null in testdata, but keyset_filter's
    # null-passes rule matches the reference; the oracle's IN() drops
    # nulls identically because none exist.
    filtered = keyset_filter(orders, "o_custkey", keys)
    return filtered.select(
        "o_orderkey", "o_custkey", stable_round("o_totalprice", 2).alias("o_totalprice")
    )


# --- P7: retention filter ----------------------------------------------------

_P7_ORACLE = """
SELECT event_id, epoch_ms(ts) AS ts_ms
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
"""


@query("p7_retention_filter", _P7_ORACLE)
def p7_retention_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 (imtu/InMemoryTableUpdater.scala:49-57 + TODO :75, implemented
    for real): rows within the retention window. Anchored at max(ts) for
    determinism (prod anchors at current_timestamp)."""
    events = t(spark, sf_dir, "events")
    anchor = events.agg(F.max("ts").alias("m")).select(F.col("m"))
    out = retention_filter(events, "ts", 7, now=F.lit(anchor.first()[0]))
    return out.select("event_id", F.unix_millis("ts").alias("ts_ms"))


# --- J6: upsert (snapshot MERGE) --------------------------------------------

_J6_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_totalprice, 0 AS src
  FROM orders WHERE o_orderkey % 2 = 0
),
updates AS (
  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice, 1 AS src
  FROM orders WHERE o_orderkey % 4 = 2
),
unioned AS (SELECT * FROM base UNION ALL SELECT * FROM updates)
SELECT o_orderkey, o_custkey, {sround_sql("o_totalprice", 2)} AS o_totalprice
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY src DESC) AS rn
  FROM unioned
) WHERE rn = 1
"""


@query("j6_upsert", _J6_ORACLE)
def j6_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 (imtu/DatabaseManager.scala:52-62 H2 `MERGE INTO ... KEY(ID)`):
    insert-or-replace by key, updates winning — Delta-free snapshot
    merge via one shuffle."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    updates = orders.filter(F.col("o_orderkey") % 4 == 2).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    merged = upsert_snapshot(base, updates, ["o_orderkey"], [])
    return merged.select(
        "o_orderkey", "o_custkey", stable_round("o_totalprice", 2).alias("o_totalprice")
    )


# --- A2: high-water marks ----------------------------------------------------

_A2_ORACLE = """
SELECT event_type, epoch_ms(max(ts)) AS high_water_ms, count(*) AS n
FROM events GROUP BY event_type
"""


@query("a2_high_water", _A2_ORACLE)
def a2_high_water(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (imtu/InMemoryTableUpdater.scala:201-204,212): running max
    transaction timestamp per table — the late-data release signal."""
    events = t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.unix_millis(F.max("ts")).alias("high_water_ms"),
        F.count(F.lit(1)).alias("n"),
    )


# --- T2: release-when-dims-arrive eligibility (batch form) -------------------

_T2_ORACLE = """
WITH hw AS (
  SELECT user_id, max(ts) AS hw
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT e.event_id, e.user_id,
       (h.hw IS NOT NULL AND e.ts <= h.hw) AS released
FROM events e LEFT JOIN hw h ON e.user_id = h.user_id
WHERE e.event_type <> 'purchase'
"""


@query("t2_release_eligibility", _T2_ORACLE)
def t2_release_eligibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 release predicate, batch form (imtu/
    InMemoryTableUpdaterManager.scala:67-74 + stp/
    BeamStreamProcessor.scala:56-64): an event is releasable iff every
    required table's A2 high-water mark has passed its timestamp —
    here 'purchase' events play the dimension feed and everything else
    the fact stream. The stateful streaming realization of the same
    semantics is streaming/stateful.py (applyInPandasWithState); this
    query pins the release predicate against the SQL oracle. The
    high-water side is key-bounded, hence broadcast — the fact stream
    is never shuffled."""
    events = t(spark, sf_dir, "events")
    hw = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.max("ts").alias("hw"))
    )
    facts = events.filter(F.col("event_type") != "purchase")
    return facts.join(F.broadcast(hw), "user_id", "left").select(
        "event_id",
        "user_id",
        (F.col("hw").isNotNull() & (F.col("ts") <= F.col("hw"))).alias("released"),
    )


# --- A4: collect + concat ----------------------------------------------------

_A4_ORACLE = """
SELECT event_type,
       string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS line
FROM events
WHERE event_id % 97 = 0
GROUP BY event_type
"""


@query("a4_collect_concat", _A4_ORACLE)
def a4_collect_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (stp/BeamStreamProcessor.scala:107-116): batch collapse to one
    comma-joined line — sorted for determinism (the reference relied on
    arrival order)."""
    events = t(spark, sf_dir, "events").filter(F.col("event_id") % 97 == 0)
    return events.groupBy("event_type").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("event_id")), lambda x: x.cast("string")),
            ",",
        ).alias("line")
    )


# --- Set ops: key-set difference (cache invalidation) ------------------------

_EXCEPT_ORACLE = """
SELECT user_id FROM events WHERE ts <  TIMESTAMP '2024-01-08 00:00:00'
EXCEPT
SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-22 00:00:00'
"""


@query("setop_key_diff", _EXCEPT_ORACLE)
def setop_key_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-set difference driving cache invalidation (reference
    imtu/InMemoryTableUpdater.scala:90-103 removeAll + targeted DELETE,
    imtu/DatabaseManager.scala:161-167) — EXCEPT on key frames."""
    events = t(spark, sf_dir, "events")
    week1 = events.filter(F.col("ts") < "2024-01-08 00:00:00").select("user_id")
    week4 = events.filter(F.col("ts") >= "2024-01-22 00:00:00").select("user_id")
    return week1.subtract(week4)


# --- Window surface: running aggregates -------------------------------------

_RUNNING_ORACLE = f"""
SELECT event_id, user_id,
       {sround_sql('''sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''', 4)}
           AS running_value,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
FROM events
"""


@query("window_running_agg", _RUNNING_ORACLE)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function surface (free in Spark, absent in the reference —
    SURVEY §2.5): per-user running sum + sequence number."""
    events = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        stable_round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_value"),
        F.row_number().over(w).alias("seq"),
    )


# --- Distinct aggregation surface --------------------------------------------

_DISTINCT_ORACLE = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


@query("distinct_agg", _DISTINCT_ORACLE)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) surface (free Spark capability; the approximate
    twin approx_count_distinct is exposed but cannot be oracle-hashed —
    HLL sketches are engine-specific by definition)."""
    events = t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- Tumbling event-time window aggregation (T7 batch twin) -------------------

_TUMBLING_ORACLE = f"""
SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start_ms,
       event_type,
       count(*) AS n_events,
       {ssum_sql("value", 2)} AS sum_value
FROM events
GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
"""


@query("tumbling_window_agg", _TUMBLING_ORACLE)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (SURVEY §2.7 T7): the batch
    twin of the streaming `groupBy(window(...))` agg in
    streaming/pipeline.py — identical plan shape minus the watermark.
    One shuffle; window assignment is a pure projection."""
    events = t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_sum(F.col("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --- As-of join: point-in-time-correct dimension lookup -----------------------

_ASOF_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
       epoch_ms(o.o_orderdate) AS asof_ts_ms,
       o.o_orderkey AS asof_orderkey
FROM events e ASOF LEFT JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


@query("asof_latest_order", _ASOF_ORACLE)
def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each event picks up the latest
    order at or before its event time for its user — the
    point-in-time-correct feature-lookup shape. Ties on (custkey,
    orderdate) are pre-resolved to max(o_orderkey) on both sides so the
    match is deterministic (DuckDB ASOF picks an arbitrary row among
    equal timestamps)."""
    from dod_etl_spark.operators.asof import as_of_join

    events = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    out = as_of_join(
        events,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.unix_millis(F.col("asof_ts")).alias("asof_ts_ms"),
        F.col("o_orderkey").alias("asof_orderkey"),
    )


_ASOF_FWD_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
       epoch_ms(o.o_orderdate) AS asof_ts_ms,
       o.o_orderkey AS asof_orderkey
FROM events e ASOF LEFT JOIN o
  ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
"""


@query("asof_next_order", _ASOF_FWD_ORACLE)
def asof_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each event picks up the EARLIEST order at or
    after its event time — the label-attachment shape (what happened
    next) to asof_latest_order's feature-lookup shape (what was true
    then). Same single-shuffle union+window merge-asof, direction
    reversed; checked against DuckDB's native forward ASOF (e.ts <=
    o.o_orderdate)."""
    from dod_etl_spark.operators.asof import as_of_join

    events = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    out = as_of_join(
        events,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.unix_millis(F.col("asof_ts")).alias("asof_ts_ms"),
        F.col("o_orderkey").alias("asof_orderkey"),
    )


# --- Mergeable-sketch profile (approximate by design: rows-only check) ---------

from dod_etl_spark.functions.sketches import approx_quantiles, hll_distinct  # noqa: E402


@query("sketch_events_profile")  # no SQL oracle: sketches are approximate;
# the error bound is enforced in tests/test_sketches.py instead.
def sketch_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type profile via mergeable sketches: HLL distinct users
    (Datasketches binary, unions across any rollup topology) + GK
    approximate value quantiles. The 100 TB substitute for
    count(DISTINCT ...): partials are lgK-sized binaries, not value
    sets, so the shuffle is O(groups), not O(distinct values)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            hll_distinct("user_id").alias("approx_users"),
            approx_quantiles("value", [0.5, 0.95]).alias("value_q"),
        )
        .select(
            "event_type",
            "n_events",
            "approx_users",
            F.col("value_q")[0].alias("value_p50"),
            F.col("value_q")[1].alias("value_p95"),
        )
    )


# --- SCD2 history derivation ---------------------------------------------------

_SCD2_ORACLE = """
WITH v AS (
  SELECT user_id, epoch_ms(ts) AS valid_from_ms, value,
         lead(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to_ms,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, CAST(version AS BIGINT) AS version, valid_from_ms, valid_to_ms,
       value AS amount, CAST(valid_to_ms IS NULL AS BOOLEAN) AS is_current
FROM v
"""


@query("scd2_purchase_history", _SCD2_ORACLE)
def scd2_purchase_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 derivation from a change stream:
    each key's updates become versioned validity intervals
    ([valid_from, valid_to), open-ended current row) — the warehouse
    twin of the reference's latest-only upsert (J6 keeps the last value;
    SCD2 keeps the lineage). One shuffle on the key; both window
    functions share the single sort. Deterministic tiebreak on event_id
    for equal timestamps."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    return (
        ev.select(
            "user_id",
            F.row_number().over(w).cast("long").alias("version"),
            ms.alias("valid_from_ms"),
            F.lead(ms).over(w).alias("valid_to_ms"),
            F.col("value").alias("amount"),
        )
        .withColumn("is_current", F.col("valid_to_ms").isNull())
    )


# --- Pivot (wide metrics) ------------------------------------------------------

_EVENT_TYPES = ("click", "view", "signup", "purchase", "error")

_PIVOT_ORACLE = f"""
SELECT user_id,
       {", ".join(
           f"CAST(sum(CASE WHEN event_type = '{et}' THEN 1 ELSE 0 END) AS BIGINT)"
           f" AS n_{et}" for et in _EVENT_TYPES)}
FROM events GROUP BY user_id
"""


@query("pivot_event_counts", _PIVOT_ORACLE)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user activity matrix via pivot with an EXPLICIT value
    list — at scale the implicit form needs a full extra pass to
    discover the pivot domain; pinning the list keeps it one shuffle
    with map-side combine (plans as a plain grouped aggregate of
    conditional counts)."""
    ev = t(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(et), F.lit(0)).cast("long").alias(f"n_{et}") for et in _EVENT_TYPES],
    )


# --- Inter-event gaps + ntile (window-function breadth) ------------------------

_DELTAS_ORACLE = """
SELECT user_id, event_id,
       epoch_ms(ts) - lag(epoch_ms(ts))
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms,
       CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
         AS quartile
FROM events WHERE event_type = 'click'
"""


@query("user_event_deltas", _DELTAS_ORACLE)
def user_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gaps (lag) + temporal quartile (ntile), both
    windows sharing ONE (user_id | ts,event_id) sort — one shuffle for
    the whole projection. Deterministic tiebreak on event_id."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    return ev.select(
        "user_id",
        "event_id",
        (ms - F.lag(ms).over(w)).alias("gap_ms"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


# --- Per-key linear trend (exact-sum least squares) ----------------------------

# x = whole seconds since 2024-01-01 (events all land in Jan 2024):
# integer, so every regression sum below is EXACT in both engines and
# the closed-form slope is identical IEEE double arithmetic.
_TREND_X0 = 1704067200

_TREND_ORACLE = f"""
WITH pts AS (
  SELECT user_id,
         epoch_ms(ts) // 1000 - {_TREND_X0} AS x,
         value AS y
  FROM events WHERE event_type = 'purchase'
), sums AS (
  SELECT user_id,
         count(*) AS n,
         CAST(sum(x) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(27,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(y AS DECIMAL(27,6)) * x) AS DOUBLE) AS sxy,
         CAST(sum(CAST(x * x AS DECIMAL(27,0))) AS DOUBLE) AS sxx
  FROM pts GROUP BY user_id
)
SELECT user_id, n,
       (floor((((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 86400.0)
              * 100000000 + 0.5) / 100000000) AS slope_per_day
FROM sums WHERE n >= 3 AND (n * sxx - sx * sx) <> 0
"""


@query("trend_per_user", _TREND_ORACLE)
def trend_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key least-squares trend (purchase value per day) from the
    closed-form normal equations — grouped regression as ONE aggregate
    pass (no ML library, no iteration): n/sx/sy/sxy/sxx ride a single
    shuffle with map-side combine. x is integer seconds and y sums in
    exact decimals, so all five aggregates are exact and the slope is
    deterministic double arithmetic — bit-identical across engines and
    partitionings."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    x = F.expr("unix_millis(cast(ts as timestamp)) div 1000") - F.lit(_TREND_X0)
    ydec = F.col("y").cast("decimal(27,6)")
    sums = (
        ev.select("user_id", x.alias("x"), F.col("value").alias("y"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").cast("double").alias("sx"),
            F.sum(ydec).cast("double").alias("sy"),
            F.sum(ydec * F.col("x")).cast("double").alias("sxy"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(27,0)"))
            .cast("double")
            .alias("sxx"),
        )
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    denom = n * sxx - sx * sx
    return (
        sums.filter((n >= 3) & (denom != 0))
        .select(
            "user_id",
            "n",
            stable_round((n * sxy - sx * sy) / denom * F.lit(86400.0), 8).alias(
                "slope_per_day"
            ),
        )
    )


# --- Exact percentiles / histogram / shared-SQL-text surface -------------------

_PCT_ORACLE = f"""
SELECT event_type,
       {sround_sql("quantile_cont(value, 0.25)", 6)} AS p25,
       {sround_sql("quantile_cont(value, 0.50)", 6)} AS p50,
       {sround_sql("quantile_cont(value, 0.90)", 6)} AS p90
FROM events GROUP BY event_type
"""


@query("value_percentiles_by_type", _PCT_ORACLE)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed percentiles (linear interpolation — verified
    identical to DuckDB's quantile_cont to 10 decimals). Spark computes
    them without a global sort: per-partition digests merge on the
    single aggregation shuffle. For the sketch-bounded version at
    extreme group counts, see sketch_events_profile."""
    ev = t(spark, sf_dir, "events")
    p = F.expr("percentile(value, array(0.25D, 0.50D, 0.90D))")
    return ev.groupBy("event_type").agg(p.alias("_p")).select(
        "event_type",
        stable_round(F.col("_p")[0], 6).alias("p25"),
        stable_round(F.col("_p")[1], 6).alias("p50"),
        stable_round(F.col("_p")[2], 6).alias("p90"),
    )


_HIST_ORACLE = """
SELECT event_type,
       CAST(least(floor(value / 10.0), 19) AS BIGINT) AS bucket,
       count(*) AS n
FROM events WHERE value >= 0
GROUP BY event_type, CAST(least(floor(value / 10.0), 19) AS BIGINT)
"""


@query("value_histogram", _HIST_ORACLE)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (20 buckets of 10, clamped tail) with the
    bucketing written as explicit floor arithmetic — engine-portable
    (DuckDB has no width_bucket) and deterministic. One conditional-
    count aggregate, map-side combined."""
    ev = t(spark, sf_dir, "events").filter(F.col("value") >= 0)
    bucket = F.least(F.floor(F.col("value") / 10.0), F.lit(19)).cast("long")
    return ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )


# ONE SQL string, two engines: Spark's SQL frontend runs the LITERAL
# oracle text (decimal-exact sum + floor-form round are ANSI enough for
# both). This pins frontend parity, not just DataFrame parity.
_SHARED_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       (floor(CAST(sum(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) * 100 + 0.5)
        / 100) AS total_price
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


@query("sql_surface_pricing", _SHARED_SQL)
def sql_surface_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() surface executing the EXACT oracle text — the
    reference never had a SQL frontend (SURVEY §0); ours is Spark SQL
    itself, demonstrated by running the same string both engines run."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SHARED_SQL)


# --- Window surface: time-range (RANGE) frames --------------------------------

_TRAILING_ORACLE = """
SELECT event_id, user_id,
       CAST(sum(CAST(value AS DECIMAL(27,6))) OVER (
              PARTITION BY user_id ORDER BY epoch_ms(ts)
              RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS trailing_1h_sum,
       count(*) OVER (
              PARTITION BY user_id ORDER BY epoch_ms(ts)
              RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
         AS trailing_1h_n
FROM events
"""


@query("value_trailing_1h", _TRAILING_ORACLE)
def value_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing one-hour per-user aggregate via a time-RANGE window
    frame — the sliding-window surface ROWS frames cannot express
    (the frame is defined by event-time distance, not row count).
    One window Exchange on user_id; the frame is evaluated over epoch
    millis on BOTH engines so boundaries and peer groups agree
    exactly, and the sum aggregates as DECIMAL so frame-internal
    addition order cannot perturb the double result. The streaming twin
    of this shape is the watermarked sliding window()/session_window()
    aggregation (tumbling_window_agg, sessionize_events)."""
    events = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis(F.col("ts")))
        .rangeBetween(-3_600_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("trailing_1h_sum"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_n"),
    )


# --- Sliding (hopping) event-time windows ------------------------------------

_SLIDING_ORACLE = f"""
WITH w AS (
  SELECT unnest([s0, s0 - 300000]) AS window_start_ms,
         event_type, value
  FROM (
    SELECT epoch_ms(ts) - epoch_ms(ts) % 300000 AS s0, event_type, value
    FROM events
  )
)
SELECT window_start_ms, event_type,
       count(*) AS n_events,
       {ssum_sql("value", 2)} AS sum_value
FROM w
GROUP BY window_start_ms, event_type
"""


@query("sliding_window_agg", _SLIDING_ORACLE)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 10-minute windows hopping every 5 (T7's overlapping
    twin — trend panels, rate alerting): `window(ts, '10m', '5m')`
    fans each event into exactly window/hop = 2 rows map-side, then
    ONE aggregation shuffle, same as tumbling. The oracle derives the
    two covering window starts arithmetically (floor-to-hop and its
    predecessor). Shuffle volume scales with the fan-out factor — keep
    window/hop small at 100 TB, or pre-aggregate per hop and merge
    hops (the standard two-level sliding-window trick)."""
    events = t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_sum(F.col("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --- Interval coverage (gaps-and-islands merge) -------------------------------

_COVERAGE_ORACLE = """
WITH iv AS (
  SELECT user_id, epoch_ms(ts) AS s,
         epoch_ms(ts) + CAST(floor(value * 1000) AS BIGINT) AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
              THEN 1 ELSE 0 END AS new_island
  FROM iv
  WINDOW w AS (PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl AS (
  SELECT user_id, s, e,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
)
SELECT user_id, min(s) AS span_start_ms, max(e) AS span_end_ms,
       count(*) AS n_events
FROM isl GROUP BY user_id, island
"""


@query("interval_coverage_events", _COVERAGE_ORACLE)
def interval_coverage_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands coverage merge: each event claims the closed
    span [ts, ts + value seconds]; overlapping/touching spans per user
    collapse into maximal busy islands (operators/intervals.py
    merge_intervals — the running-max construction). This is the
    coverage algebra the reference's ES timeline implies but never
    computes (machine busy-time union, downtime coverage; the
    EventEnricher tiles against intervals, it cannot union them).
    Scale: ONE hash exchange on user_id — both window passes and the
    island aggregation reuse the same partitioning; nothing is global
    or quadratic. value >= 0 in this dataset, so closed spans always
    have span_end >= span_start and island flags are deterministic
    under sort-tie permutations."""
    from dod_etl_spark.operators.intervals import merge_intervals

    events = t(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        F.unix_millis("ts").alias("s"),
        (
            F.unix_millis("ts")
            + F.floor(F.col("value") * F.lit(1000)).cast("bigint")
        ).alias("e"),
    )
    return merge_intervals(iv, "user_id", "s", "e").select(
        "user_id",
        F.col("span_start").alias("span_start_ms"),
        F.col("span_end").alias("span_end_ms"),
        F.col("n_rows").alias("n_events"),
    )
