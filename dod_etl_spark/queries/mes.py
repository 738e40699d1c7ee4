"""MES/OEE queries over driver testdata — the reference's core workload,
re-based onto the TPC-H-ish tables so the DuckDB oracle can check it
end-to-end.

The driver's testdata has no MES tables, so we DERIVE them
deterministically (same arithmetic on both engines):

- facts            <- events   (event intervals of 3..119 minutes)
- production_order <- orders   (planned windows + planned quantity)
- product_quality  <- events   (out-of-spec flag ~11% of products)
- equipment_status <- events   (per-equipment timeline tiling via lead())

The derivation exercises exactly the reference dataflow: J1/J2 equi
lookups (stp/DataTransformer.scala:17-38), J3 interval overlap
(:40-61), J4 grain split (:63-100), F6 OEE (:102-142) — on ~100× more
rows than the hand fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dod_etl_spark.operators.enrich import build_fact_grains, enrich_with_orders, split_missing_po
from dod_etl_spark.operators.oee import compute_oee
from dod_etl_spark.queries.base import query, sround_sql, t

# ---------------------------------------------------------------------------
# Derived MES frames (Spark side). The SQL CTE block below mirrors these
# expressions 1:1; keep them in sync.
# ---------------------------------------------------------------------------


def facts_from_events(events: DataFrame) -> DataFrame:
    """Fact stream in the reference's epoch-millis wire shape
    (FIXTURES.md §1)."""
    start_ms = F.unix_millis(F.col("ts"))
    end_ms = start_ms + ((F.col("event_id") % 117) + 3) * 60000
    return events.select(
        F.col("event_id").alias("ID"),
        ((F.col("event_id") * 7) % 20000).alias("ID_PRODUCTION_ORDER"),
        F.concat(F.lit("EQ"), (F.col("user_id") % 8).cast("string")).alias("COD_EQUIPMENT"),
        start_ms.alias("START_TIME"),
        end_ms.alias("END_TIME"),
        (F.col("value") * 10).alias("QUANTITY"),
        F.unix_millis(F.col("ts")).alias("timestamp"),
    )


def po_from_orders(orders: DataFrame) -> DataFrame:
    base = F.lit(1704067200000)  # 2024-01-01T00:00:00Z
    start = base + (F.col("o_orderkey") % 720) * 3600000
    end = start + ((F.col("o_orderkey") % 48) + 1) * 3600000
    return orders.select(
        F.col("o_orderkey").alias("ID"),
        F.col("o_custkey").alias("ID_MATERIAL"),
        F.timestamp_millis(start).alias("PLANNED_START_TIME"),
        F.timestamp_millis(end).alias("PLANNED_END_TIME"),
        (1 + F.col("o_orderkey") % 500).cast("double").alias("PLANNED_QUANTITY"),
    )


def pq_from_events(events: DataFrame) -> DataFrame:
    return events.select(
        (F.col("event_id") + 500000).alias("ID"),
        F.col("event_id").alias("ID_PRODUCT"),
        (((F.col("event_id") * 31) % 9) == 0).alias("IS_OUT_OF_SPECIFICATION"),
    )


def es_from_events(events: DataFrame) -> DataFrame:
    """Per-equipment contiguous timeline tiling (the FIXTURES.md §4
    generator constraint) built with lead() — the one true
    window-function obligation of the reference surface (SURVEY §2.5)."""
    eq = F.col("user_id") % 8
    w = Window.partitionBy(eq).orderBy(F.col("ts"), F.col("event_id"))
    # Truncate to millis (events.ts carries microseconds): the fact side is
    # derived in epoch-millis, and sub-ms remainders would create spurious
    # strict-overlap matches at tile boundaries vs the epoch_ms() oracle.
    ts_ms = F.timestamp_millis(F.unix_millis(F.col("ts")))
    out = events.select(
        F.col("event_id").alias("ID"),
        F.concat(F.lit("EQ"), eq.cast("string")).alias("COD_EQUIPMENT"),
        ts_ms.alias("START_TIME"),
        F.timestamp_millis(F.unix_millis(F.lead("ts").over(w))).alias("END_TIME"),
        F.when(F.col("event_type") == "error", F.lit("OFF_ERROR"))
        .when(F.col("event_type") == "signup", F.lit("OFF_MAINTENANCE"))
        .otherwise(F.concat(F.lit("RUNNING_"), F.col("event_type")))
        .alias("STATUS_TYPE"),
        (F.col("event_type") == "view").alias("IS_FREE_TIME"),
    )
    return out.filter(F.col("END_TIME").isNotNull())


# SQL mirror of the derivations (DuckDB dialect). epoch_ms()/
# make_timestamp(us) keep timestamp arithmetic in exact integer millis on
# both engines.
MES_CTE = """
WITH facts AS (
  SELECT event_id AS ID,
         (event_id * 7) % 20000 AS ID_PRODUCTION_ORDER,
         'EQ' || CAST(user_id % 8 AS VARCHAR) AS COD_EQUIPMENT,
         epoch_ms(ts) AS START_TIME,
         epoch_ms(ts) + ((event_id % 117) + 3) * 60000 AS END_TIME,
         value * 10 AS QUANTITY
  FROM events
),
po AS (
  SELECT o_orderkey AS ID,
         o_custkey AS ID_MATERIAL,
         1704067200000 + (o_orderkey % 720) * 3600000 AS PLANNED_START_MS,
         1704067200000 + (o_orderkey % 720) * 3600000
             + ((o_orderkey % 48) + 1) * 3600000 AS PLANNED_END_MS,
         CAST(1 + o_orderkey % 500 AS DOUBLE) AS PLANNED_QUANTITY
  FROM orders
),
pq AS (
  SELECT event_id + 500000 AS ID,
         event_id AS ID_PRODUCT,
         ((event_id * 31) % 9) = 0 AS IS_OUT_OF_SPECIFICATION
  FROM events
),
es AS (
  SELECT * FROM (
    SELECT event_id AS ID,
           'EQ' || CAST(user_id % 8 AS VARCHAR) AS COD_EQUIPMENT,
           epoch_ms(ts) AS START_TIME,
           epoch_ms(LEAD(ts) OVER (PARTITION BY user_id % 8
                                   ORDER BY ts, event_id)) AS END_TIME,
           CASE WHEN event_type = 'error' THEN 'OFF_ERROR'
                WHEN event_type = 'signup' THEN 'OFF_MAINTENANCE'
                ELSE 'RUNNING_' || event_type END AS STATUS_TYPE,
           event_type = 'view' AS IS_FREE_TIME
    FROM events
  ) WHERE END_TIME IS NOT NULL
)
"""


def mes_frames(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    events = t(spark, sf_dir, "events")
    orders = t(spark, sf_dir, "orders")
    return {
        "facts": facts_from_events(events),
        "production_order": po_from_orders(orders),
        "product_quality": pq_from_events(events),
        "equipment_status": es_from_events(events),
    }


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------

_GRAINS_ORACLE = (
    MES_CTE
    + """
SELECT f.ID AS ID,
       f.ID_PRODUCTION_ORDER AS ID_PRODUCTION_ORDER,
       es.ID AS ID_EQUIPMENT_STATUS,
       f.COD_EQUIPMENT AS COD_EQUIPMENT,
       greatest(f.START_TIME, es.START_TIME) AS FACT_START_MS,
       least(f.END_TIME, es.END_TIME) AS FACT_END_MS,
       es.STATUS_TYPE AS STATUS_TYPE,
       es.IS_FREE_TIME AS IS_FREE_TIME
FROM facts f
JOIN es ON es.COD_EQUIPMENT = f.COD_EQUIPMENT
       AND es.START_TIME < f.END_TIME
       AND es.END_TIME > f.START_TIME
"""
)


@query("j3_j4_interval_grains", _GRAINS_ORACLE)
def j3_j4_interval_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 overlap join + J4 grain intersection on derived MES frames,
    via the time-bucket blocking decomposition (equipment cardinality is
    tiny, so blocking is what keeps the join hash-based).

    Reference: stp/DataTransformer.scala:40-100."""
    from dod_etl_spark.operators.interval_join import overlap_join_bucketed

    fx = mes_frames(spark, sf_dir)
    facts = fx["facts"].select(
        "ID",
        "ID_PRODUCTION_ORDER",
        "COD_EQUIPMENT",
        F.col("START_TIME"),
        F.col("END_TIME"),
    )
    es = fx["equipment_status"].select(
        F.col("ID").alias("ID_EQUIPMENT_STATUS"),
        "COD_EQUIPMENT",
        F.unix_millis("START_TIME").alias("ES_START"),
        F.unix_millis("END_TIME").alias("ES_END"),
        "STATUS_TYPE",
        "IS_FREE_TIME",
    )
    joined = overlap_join_bucketed(
        facts,
        es,
        on=["COD_EQUIPMENT"],
        l_start="START_TIME",
        l_end="END_TIME",
        r_start="ES_START",
        r_end="ES_END",
    )
    return joined.select(
        "ID",
        "ID_PRODUCTION_ORDER",
        "ID_EQUIPMENT_STATUS",
        "COD_EQUIPMENT",
        F.greatest(F.col("START_TIME"), F.col("ES_START")).alias("FACT_START_MS"),
        F.least(F.col("END_TIME"), F.col("ES_END")).alias("FACT_END_MS"),
        "STATUS_TYPE",
        "IS_FREE_TIME",
    )


# Shared OEE core CTEs (grains -> durations -> raw metrics); FACT times
# carried through perf for the shift join.
_OEE_CORE = """
, grains AS (
  SELECT f.ID, f.ID_PRODUCTION_ORDER, po.ID_MATERIAL, es.ID AS ID_EQUIPMENT_STATUS,
         f.COD_EQUIPMENT,
         greatest(f.START_TIME, es.START_TIME) AS FACT_START,
         least(f.END_TIME, es.END_TIME) AS FACT_END,
         f.START_TIME AS PROD_START, f.END_TIME AS PROD_END,
         po.PLANNED_START_MS AS PLANNED_START, po.PLANNED_END_MS AS PLANNED_END,
         po.PLANNED_QUANTITY, f.QUANTITY,
         COALESCE(pq.IS_OUT_OF_SPECIFICATION, FALSE) AS IS_OUT_OF_SPECIFICATION,
         es.STATUS_TYPE
  FROM facts f
  JOIN po ON f.ID_PRODUCTION_ORDER = po.ID
  LEFT JOIN pq ON pq.ID_PRODUCT = f.ID
  JOIN es ON es.COD_EQUIPMENT = f.COD_EQUIPMENT
         AND es.START_TIME < f.END_TIME
         AND es.END_TIME > f.START_TIME
),
m AS (
  SELECT *,
         CAST(FACT_END - FACT_START AS DOUBLE) AS fact_dur,
         CAST(PROD_END - PROD_START AS DOUBLE) AS prod_dur,
         CAST(PLANNED_END - PLANNED_START AS DOUBLE) AS planned_dur,
         STATUS_TYPE LIKE '%OFF%' AS off
  FROM grains
),
perf AS (
  SELECT ID, ID_PRODUCTION_ORDER, ID_MATERIAL, ID_EQUIPMENT_STATUS, COD_EQUIPMENT,
         CASE WHEN (NOT off) AND prod_dur > 0 AND planned_dur > 0
                   AND PLANNED_QUANTITY > 0 AND QUANTITY IS NOT NULL
              THEN (fact_dur / prod_dur)
                   * (QUANTITY / ((prod_dur / planned_dur) * PLANNED_QUANTITY))
              ELSE 0.0 END AS PERFORMANCE_RAW,
         CASE WHEN off THEN 0.0 ELSE 1.0 END AS AVAILABILITY,
         CASE WHEN IS_OUT_OF_SPECIFICATION THEN 0.0 ELSE 1.0 END AS QUALITY,
         FACT_START, FACT_END
  FROM m
)
"""

_OEE_ORACLE = (
    MES_CTE
    + _OEE_CORE
    + f"""
SELECT ID, ID_PRODUCTION_ORDER, ID_MATERIAL, ID_EQUIPMENT_STATUS, COD_EQUIPMENT,
       {sround_sql("PERFORMANCE_RAW", 4)} AS PERFORMANCE,
       AVAILABILITY, QUALITY,
       {sround_sql("PERFORMANCE_RAW * AVAILABILITY * QUALITY", 4)} AS OEE
FROM perf
"""
)


@query("oee_flagship", _OEE_ORACLE)
def oee_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship: full enrichment + interval split + OEE metric
    (reference pipeline end-to-end, stp/BeamStreamProcessor.scala:37-121)
    on derived MES frames at testdata scale."""
    fx = mes_frames(spark, sf_dir)
    from dod_etl_spark.operators.enrich import normalize_events

    ev = normalize_events(fx["facts"])
    enriched = enrich_with_orders(ev, fx["production_order"], fx["product_quality"])
    ok, _missing = split_missing_po(enriched)
    grains = build_fact_grains(ok, fx["equipment_status"])
    oee = compute_oee(grains, round_digits=4)
    return oee


_MISSING_ORACLE = (
    MES_CTE
    + """
SELECT f.ID AS ID, f.ID_PRODUCTION_ORDER AS ID_PRODUCTION_ORDER
FROM facts f
LEFT JOIN po ON f.ID_PRODUCTION_ORDER = po.ID
WHERE po.ID IS NULL
"""
)


@query("j5_missing_dim_routing", _MISSING_ORACLE)
def j5_missing_dim_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/P8: events whose production order is absent — the retry-buffer
    feed (reference BeamStreamProcessor.scala:83-98, fixed per SURVEY
    §2.10 item 2)."""
    fx = mes_frames(spark, sf_dir)
    from dod_etl_spark.operators.enrich import normalize_events

    ev = normalize_events(fx["facts"])
    enriched = enrich_with_orders(ev, fx["production_order"], fx["product_quality"])
    _ok, missing = split_missing_po(enriched)
    return missing.select("ID", "ID_PRODUCTION_ORDER")


# ---------------------------------------------------------------------------
# PERIOD_SHIFT: the third enrichment join the reference configured but
# left TODO (conf/tableConfig.json:12-21, stp/BeamStreamProcessor.scala:87)
# — implemented per SURVEY §2.10 item 6, plus the per-shift BI rollup the
# config implies.
# ---------------------------------------------------------------------------


def ps_for_testdata(spark: SparkSession) -> DataFrame:
    """Derived shift table: 8 equipments × 96 eight-hour slots covering
    Jan 2024 (+1 day margin), codes SHIFT_0/1/2 rotating."""
    base = 1704067200000
    eqs = spark.range(8).select(F.col("id").alias("eq"))
    slots = spark.range(96).select(F.col("id").alias("slot"))
    return eqs.crossJoin(slots).select(
        (F.col("eq") * 1000 + F.col("slot")).alias("ID"),
        F.concat(F.lit("EQ"), F.col("eq").cast("string")).alias("COD_EQUIPMENT"),
        F.timestamp_millis(F.lit(base) + F.col("slot") * 28800000).alias("START_TIME"),
        F.timestamp_millis(F.lit(base) + (F.col("slot") + 1) * 28800000).alias("END_TIME"),
        F.concat(F.lit("SHIFT_"), (F.col("slot") % 3).cast("string")).alias("SHIFT_CODE"),
    )


_PS_CTE = """
, ps AS (
  SELECT eq.x * 1000 + s.x AS ID,
         'EQ' || CAST(eq.x AS VARCHAR) AS COD_EQUIPMENT,
         1704067200000 + s.x * 28800000 AS PS_START,
         1704067200000 + (s.x + 1) * 28800000 AS PS_END,
         'SHIFT_' || CAST(s.x % 3 AS VARCHAR) AS SHIFT_CODE
  FROM (SELECT unnest(range(8)) AS x) eq
  CROSS JOIN (SELECT unnest(range(96)) AS x) s
)
"""

_SHIFT_ORACLE = (
    MES_CTE
    + _OEE_CORE
    + _PS_CTE
    + f"""
SELECT p.COD_EQUIPMENT AS COD_EQUIPMENT, ps.SHIFT_CODE AS SHIFT_CODE,
       count(*) AS n_grains,
       {sround_sql("CAST(sum(CAST((" + sround_sql("p.PERFORMANCE_RAW * p.AVAILABILITY * p.QUALITY", 4) + ") AS DECIMAL(27,6))) AS DOUBLE) / count(*)", 4)} AS avg_oee
FROM perf p
JOIN ps ON ps.COD_EQUIPMENT = p.COD_EQUIPMENT
       AND ps.PS_START < p.FACT_END
       AND ps.PS_END > p.FACT_START
GROUP BY p.COD_EQUIPMENT, ps.SHIFT_CODE
"""
)


@query("oee_by_shift", _SHIFT_ORACLE)
def oee_by_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-equipment per-shift average OEE: flagship grains ⋈ PERIOD_SHIFT
    (J3 shape, bucketed) -> grouped rollup. Decimal-exact aggregation of
    the per-grain (stable-rounded) OEE keeps the average engine-stable."""
    from dod_etl_spark.operators.enrich import enrich_with_shift, normalize_events

    fx = mes_frames(spark, sf_dir)
    ev = normalize_events(fx["facts"])
    enriched = enrich_with_orders(ev, fx["production_order"], fx["product_quality"])
    ok, _missing = split_missing_po(enriched)
    grains = build_fact_grains(ok, fx["equipment_status"])
    with_shift = enrich_with_shift(grains, ps_for_testdata(spark))
    oee = compute_oee(with_shift, round_digits=4, extra_cols=("SHIFT_CODE",))
    cnt = F.count(F.lit(1))
    dsum = F.sum(F.col("OEE").cast("decimal(27,6)")).cast("double")
    from dod_etl_spark.functions.scalar import stable_round

    return oee.groupBy("COD_EQUIPMENT", "SHIFT_CODE").agg(
        cnt.alias("n_grains"),
        stable_round(dsum / F.count(F.lit(1)), 4).alias("avg_oee"),
    )


# --- P9: equipment-status coverage routing -----------------------------------

_UNCOVERED_ORACLE = (
    MES_CTE
    + """
, grain_cov AS (
  SELECT f.ID, max(least(f.END_TIME, es.END_TIME)) AS max_end
  FROM facts f
  JOIN es ON es.COD_EQUIPMENT = f.COD_EQUIPMENT
         AND es.START_TIME < f.END_TIME
         AND es.END_TIME > f.START_TIME
  GROUP BY f.ID
)
SELECT f.ID AS ID, f.COD_EQUIPMENT AS COD_EQUIPMENT,
       f.END_TIME AS END_TIME_MS, g.max_end AS MAX_COVERED_MS
FROM facts f
LEFT JOIN grain_cov g ON g.ID = f.ID
WHERE g.max_end IS NULL OR g.max_end < f.END_TIME
"""
)


@query("p9_uncovered_events", _UNCOVERED_ORACLE)
def p9_uncovered_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: events not fully covered by equipment-status intervals —
    explicit max(FACT_END) per event, not the reference's scan-order
    `ESList.last` (BeamStreamProcessor.scala:86; SURVEY §2.10 item 5)."""
    from dod_etl_spark.operators.interval_join import overlap_join_bucketed

    fx = mes_frames(spark, sf_dir)
    facts = fx["facts"].select("ID", "COD_EQUIPMENT", "START_TIME", "END_TIME")
    es = fx["equipment_status"].select(
        "COD_EQUIPMENT",
        F.unix_millis("START_TIME").alias("ES_START"),
        F.unix_millis("END_TIME").alias("ES_END"),
    )
    joined = overlap_join_bucketed(
        facts, es, on=["COD_EQUIPMENT"],
        l_start="START_TIME", l_end="END_TIME", r_start="ES_START", r_end="ES_END",
    )
    cov = joined.groupBy(F.col("ID").alias("_cid")).agg(
        F.max(F.least(F.col("END_TIME"), F.col("ES_END"))).alias("MAX_COVERED_MS")
    )
    out = facts.join(cov, facts["ID"] == cov["_cid"], "left")
    return out.filter(
        F.col("MAX_COVERED_MS").isNull() | (F.col("MAX_COVERED_MS") < F.col("END_TIME"))
    ).select(
        "ID", "COD_EQUIPMENT", F.col("END_TIME").alias("END_TIME_MS"), "MAX_COVERED_MS"
    )
