"""Generic relational surface: TPC-H-style queries on the driver's
star-schema testdata.

The reference has no SQL frontend (SURVEY §0) — its relational work was
delegated to embedded H2. Our engine's generic surface IS Spark SQL /
DataFrame; these queries pin it against the DuckDB oracle and serve as
the BENCH headline set alongside the OEE pipeline.

Float determinism: every aggregated double goes through decimal-exact
summation (stable_sum/ssum_sql) so partition/merge order can't move the
result, and every emitted double is rounded with the floor-form
stable_round/sround_sql — identical IEEE ops in both engines (engine
round() builtins disagree on boundary doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import stable_round, stable_sum
from dod_etl_spark.queries.base import query, sround_sql, ssum_sql, t


def _dsum(col, scale: int = 6):
    """Decimal-exact sum of a per-row double expression, emitted double
    (unrounded) — for derived stats like averages."""
    return F.sum(col.cast("double").cast(f"decimal(27,{scale})")).cast("double")


def _dsum_sql(expr: str, scale: int = 6) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(27,{scale}))) AS DOUBLE)"


# --- Q1-style pricing summary ------------------------------------------------

_DISC = "l_extendedprice * (1 - l_discount)"
_CHARGE = "(l_extendedprice * (1 - l_discount)) * (1 + l_tax)"

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {ssum_sql("l_quantity", 2)} AS sum_qty,
       {ssum_sql("l_extendedprice", 2)} AS sum_base_price,
       {ssum_sql(_DISC, 2)} AS sum_disc_price,
       {ssum_sql(_CHARGE, 2)} AS sum_charge,
       {sround_sql(_dsum_sql("l_quantity") + " / count(*)", 4)} AS avg_qty,
       {sround_sql(_dsum_sql("l_extendedprice") + " / count(*)", 4)} AS avg_price,
       {sround_sql(_dsum_sql("l_discount") + " / count(*)", 4)} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", _Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        stable_sum(F.col("l_quantity"), 2).alias("sum_qty"),
        stable_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
        stable_sum(disc, 2).alias("sum_disc_price"),
        stable_sum(charge, 2).alias("sum_charge"),
        stable_round(_dsum(F.col("l_quantity")) / cnt, 4).alias("avg_qty"),
        stable_round(_dsum(F.col("l_extendedprice")) / cnt, 4).alias("avg_price"),
        stable_round(_dsum(F.col("l_discount")) / cnt, 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --- Q3-style shipping priority ---------------------------------------------

_Q3_ORACLE = f"""
SELECT l.l_orderkey AS l_orderkey,
       {ssum_sql("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue,
       epoch_ms(o.o_orderdate) AS o_orderdate_ms
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
"""


@query("q3_shipping_priority", _Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg. customer is the small side -> broadcast;
    orders⋈lineitem shuffles on the order key."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-03-15 00:00:00")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-03-15 00:00:00")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    return joined.groupBy("l_orderkey", "o_orderdate").agg(
        stable_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue")
    ).select(
        "l_orderkey",
        "revenue",
        # o_orderdate scans as TIMESTAMP_NTZ; session tz is UTC so the
        # cast to TIMESTAMP is an identity re-tag for unix_millis.
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_ms"),
    )


# --- Q5-style revenue by nation ---------------------------------------------

_Q5_ORACLE = f"""
SELECT n.n_name AS n_name,
       {ssum_sql("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


@query("q5_revenue_by_nation", _Q5_ORACLE)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join; all dims broadcast, single shuffle for the agg."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
    )
    return joined.groupBy("n_name").agg(
        stable_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue")
    )


# --- Top-K per group ---------------------------------------------------------

_TOPK_ORACLE = f"""
SELECT o_custkey, o_orderkey, {sround_sql("o_totalprice", 2)} AS o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
"""


@query("topk_orders_per_customer", _TOPK_ORACLE)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            stable_round("o_totalprice", 2).alias("o_totalprice"),
            "rk",
        )
    )


# --- ROLLUP ------------------------------------------------------------------

_ROLLUP_ORACLE = f"""
SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
       coalesce(l_linestatus, '<all>') AS l_linestatus,
       {ssum_sql("l_extendedprice", 2)} AS sum_price,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("rollup_pricing", _ROLLUP_ORACLE)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface (free Spark capability beyond the
    reference's H2 delegation)."""
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        stable_sum(F.col("l_extendedprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
        F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
        "sum_price",
        "n",
    )


# --- Sessionization ----------------------------------------------------------

_SESSION_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
       epoch_ms(min(ts)) AS session_start_ms, epoch_ms(max(ts)) AS session_end_ms
FROM sess GROUP BY user_id, session_id
"""


@query("sessionize_events", _SESSION_ORACLE)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap + running-sum session ids, 30-minute gap.
    (Streaming twin: session_window(), streaming/ layer.)"""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    is_new = F.when(gap > 30 * 60000, 1).otherwise(0)
    sess = ev.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_millis(F.min("ts")).alias("session_start_ms"),
        F.unix_millis(F.max("ts")).alias("session_end_ms"),
    )


# --- Q6-style forecast revenue (pushdown showcase) ---------------------------

_Q6_ORACLE = f"""
SELECT {ssum_sql("l_extendedprice * l_discount", 2)} AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", _Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-table filter + global aggregate. Every
    predicate reaches the parquet scan (PushedFilters) and only 4
    columns are read — the plan is one scan + partial/final agg, no
    shuffle of data rows at all."""
    li = t(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.04, 0.06)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        stable_round(
            stable_sum(F.col("l_extendedprice") * F.col("l_discount")), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- Q10-style returned-item top customers -----------------------------------

_Q10_ORACLE = f"""
WITH rev AS (
  SELECT c.c_custkey, any_value(c.c_name) AS c_name,
         {ssum_sql("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY c.c_custkey
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rk FROM rev
)
SELECT c_custkey, c_name, revenue, rk FROM ranked WHERE rk <= 20
"""


@query("q10_returned_revenue", _Q10_ORACLE)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact-side filter, two joins (customer broadcast,
    orders-lineitem shuffle on orderkey), grouped revenue, global
    top-20. Ranking is on the decimal-exact (order-independent) sum, so
    cross-engine order ties only on identical values — broken by
    custkey. The global window runs on the tiny aggregated frame."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    rev = joined.groupBy("c_custkey").agg(
        F.any_value(F.col("c_name")).alias("c_name"),
        stable_round(
            stable_sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 2
        ).alias("revenue"),
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("c_custkey", "c_name", "revenue", "rk")
    )
