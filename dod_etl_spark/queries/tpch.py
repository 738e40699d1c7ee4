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


# --- Q4-style order priority (EXISTS semi-join) -------------------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority AS o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o.o_orderpriority
"""


@query("q4_order_priority", _Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (schema-adapted: the testdata lineitem has no
    commit/receipt dates, so "late line" = shipped >30 days after the
    order date). EXISTS compiles to a LEFT SEMI hash join on the order
    key with the date comparison as residual — one shuffle, no
    duplicate-elimination pass, and the orders scan carries both date
    predicates as PushedFilters."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --- Q12-style priority-class line counts (conditional agg) -------------------

_Q12_ORACLE = """
SELECT l.l_linestatus AS l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_linestatus
"""


@query("q12_priority_lines", _Q12_ORACLE)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (schema-adapted: no l_shipmode column, grouped by
    l_linestatus instead). Conditional aggregation — the CASE folds into
    the partial agg, so the shuffle carries two longs per group, not
    rows."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- Q14-style promo revenue share --------------------------------------------

_Q14_ORACLE = f"""
SELECT {sround_sql(
    "100.0 * "
    + _dsum_sql("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")
    + " / " + _dsum_sql("l.l_extendedprice * (1 - l.l_discount)"), 4)} AS promo_share,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@query("q14_promo_revenue", _Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (p_type is a plain enum here, so PROMO is an
    equality not a LIKE-prefix). part broadcasts; the month filter is
    pushed to the lineitem scan; the ratio is computed from two
    decimal-exact sums in a single aggregate."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            stable_round(F.lit(100.0) * _dsum(promo) / _dsum(disc), 4).alias("promo_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- Q16-style supplier count per part class ----------------------------------

_Q16_ORACLE = """
SELECT p.p_brand AS p_brand, p.p_type AS p_type,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#9'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
GROUP BY p.p_brand, p.p_type
"""


@query("q16_supplier_cnt", _Q16_ORACLE)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (no partsupp table in the testdata — lineitem is
    the part↔supplier association; no s_comment so the NOT-IN-supplier
    leg is dropped). Distinct-agg after a broadcast join: Spark expands
    to a two-phase agg (local distinct, then count) — both phases
    map-side combine before the single shuffle."""
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --- Q18-style large-volume orders --------------------------------------------

_Q18_ORACLE = f"""
SELECT c.c_custkey AS c_custkey, o.o_orderkey AS o_orderkey,
       epoch_ms(o.o_orderdate) AS o_orderdate_ms,
       {sround_sql("o.o_totalprice", 2)} AS o_totalprice,
       {ssum_sql("l.l_quantity", 2)} AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@query("q18_large_orders", _Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery with HAVING -> aggregate once, semi
    join the tiny qualifying key set back (broadcast left-semi), then
    re-aggregate only the surviving orders. The heavy lineitem agg runs
    once; the requalifying join costs no shuffle."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey")
    )
    o = t(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = t(spark, sf_dir, "customer")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    return joined.groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice").agg(
        stable_sum(F.col("l_quantity"), 2).alias("sum_qty")
    ).select(
        "c_custkey",
        "o_orderkey",
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_ms"),
        stable_round("o_totalprice", 2).alias("o_totalprice"),
        "sum_qty",
    )


# --- Q19-style disjunctive-predicate revenue ----------------------------------

_Q19_ORACLE = f"""
SELECT {ssum_sql("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@query("q19_disjunctive_revenue", _Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (schema-adapted: no p_container / l_shipmode, so
    the disjunction is over brand/size/quantity). The equi key
    (p_partkey = l_partkey) is conjunctive over the whole OR, so
    Catalyst extracts it into a broadcast hash join and evaluates the
    disjunction as a residual filter — not a cartesian product."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    arm = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & q.between(qlo, qhi)
    )
    cond = arm("Brand#1", 15, 1, 11) | arm("Brand#2", 25, 10, 20) | arm("Brand#3", 35, 20, 30)
    return (
        li.join(F.broadcast(p), (p.p_partkey == li.l_partkey) & cond)
        .agg(
            stable_round(
                stable_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- Q7-style volume shipping between nation pair -----------------------------

_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       {ssum_sql("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", _Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.
    Five joins, one shuffle (orders⋈lineitem on the order key) — every
    dimension broadcasts, and the nation-pair disjunction is a residual
    on broadcast-joined columns."""
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(
        stable_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue")
    )


# --- CUBE with grouping flags -------------------------------------------------

_CUBE_ORACLE = f"""
SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
       coalesce(l_linestatus, '<all>') AS l_linestatus,
       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
       {ssum_sql("l_quantity", 2)} AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("cube_pricing", _CUBE_ORACLE)
def cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full grouping-sets surface: CUBE over (returnflag, linestatus)
    with grouping() flags distinguishing real NULL groups from
    subtotals. Spark expands the cube into one Expand + single-shuffle
    aggregate — subtotals cost no extra pass over the fact table."""
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        stable_sum(F.col("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
        F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
        "g_flag",
        "g_status",
        "sum_qty",
        "n",
    )


# --- Q9-style profit by nation/year ------------------------------------------

_Q9_ORACLE = f"""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       {ssum_sql(_DISC, 2)} AS sum_profit
FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_name LIKE '%widget%'
GROUP BY nation, o_year
"""


@query("q9_profit_by_nation_year", _Q9_ORACLE)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (schema-adapted: no partsupp table, so profit =
    discounted revenue). part/supplier/nation broadcast — the filtered
    part set semi-shrinks lineitem before the one big-big shuffle join
    (orders on l_orderkey). At 100 TB that orders join is the only
    exchange besides the final agg; AQE handles its sizing."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        # year() yields int; the oracle's year() is BIGINT — match widths
        # (the driver's value hash is width-sensitive for some readers).
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(
        stable_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "sum_profit"
        )
    )


# --- Q13-style customer order-count distribution ------------------------------

_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey AS c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


@query("q13_customer_distribution", _Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer-join order counts, then a distribution over
    the counts. Aggregate-before-join: orders pre-aggregates to one row
    per customer (map-side combine), so the outer join's right side is
    |customers|, not |orders| — the shuffle carries counts, not order
    rows. count(o_orderkey) over the left join == coalesce(pre-agg, 0)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("_cnt"))
    counted = c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        F.coalesce(F.col("_cnt"), F.lit(0)).alias("c_count")
    )
    return counted.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- Q15-style top supplier ----------------------------------------------------

_Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, {ssum_sql(_DISC, 2)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, r.total_revenue AS total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
"""


@query("q15_top_supplier", _Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarter revenue per supplier, keep the max.
    The scalar max is a 1-row aggregate broadcast against the (already
    aggregated, |suppliers|-sized) revenue table — no window over a
    single partition, no second scan of lineitem. Revenue equality is
    safe cross-engine because total_revenue is the decimal-exact rounded
    sum on both sides."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        stable_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    s = t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("_mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q17-style small-quantity revenue (correlated avg subquery) ---------------

_Q17_ORACLE = f"""
SELECT {sround_sql(_dsum_sql("l.l_extendedprice") + " / 7.0", 2)} AS avg_yearly
FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN (
    SELECT l_partkey, count(*) AS cnt,
           sum(CAST(l_quantity AS DECIMAL(27,2))) AS sq
    FROM lineitem GROUP BY l_partkey
  ) a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND CAST(l.l_quantity AS DECIMAL(27,2)) * a.cnt * 5 < a.sq
"""


@query("q17_small_qty_revenue", _Q17_ORACLE)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems under 20% of their part's average
    quantity. The correlated subquery decorrelates to a per-part
    aggregate join; both sides are first semi-shrunk by the brand filter
    (the threshold only matters for surviving parts), so the per-part
    aggregate is broadcast-sized at any SF. The 20%-of-avg comparison is
    done in integer-ish decimals (qty * cnt * 5 < sum) — no division, no
    float boundary flakiness between engines."""
    brand_parts = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(F.col("l_quantity").cast("decimal(27,2)")).alias("_sq"),
    )
    small = li.join(F.broadcast(per_part), F.col("l_partkey") == F.col("_pk")).filter(
        F.col("l_quantity").cast("decimal(27,2)") * F.col("_cnt") * 5 < F.col("_sq")
    )
    return small.agg(
        stable_round(
            F.sum(F.col("l_extendedprice").cast("double").cast("decimal(27,6)")).cast(
                "double"
            )
            / 7.0,
            2,
        ).alias("avg_yearly")
    )


# --- Q22-style idle high-balance customers -------------------------------------

_Q22_ORACLE = f"""
WITH pos AS (
  SELECT count(*) AS cnt, sum(CAST(c_acctbal AS DECIMAL(27,2))) AS sb
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_mktsegment AS c_mktsegment, count(*) AS numcust,
       {ssum_sql("c.c_acctbal", 2)} AS totacctbal
FROM customer c, pos
WHERE CAST(c.c_acctbal AS DECIMAL(27,2)) * pos.cnt > pos.sb
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_mktsegment
"""


@query("q22_idle_customers", _Q22_ORACLE)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (schema-adapted: grouped by market segment, no
    phone prefixes; "idle" = no URGENT orders — every sf0.01 customer
    has SOME order, which would make the plain anti join vacuous).
    The global average is a 1-row broadcast; above-average compares
    balance * count > sum in exact decimals (no float boundary); the
    NOT EXISTS compiles to a LEFT ANTI hash join on the customer key."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(F.col("c_acctbal").cast("decimal(27,2)")).alias("_sb"),
    )
    rich = c.join(F.broadcast(pos)).filter(
        F.col("c_acctbal").cast("decimal(27,2)") * F.col("_cnt") > F.col("_sb")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        stable_sum(F.col("c_acctbal"), 2).alias("totacctbal"),
    )


# --- Q2-style minimum-cost supplier --------------------------------------------

_Q2_ORACLE = f"""
WITH spc AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS uc
  FROM lineitem GROUP BY l_partkey, l_suppkey
), cand AS (
  SELECT s.s_name AS s_name, s.s_acctbal AS s_acctbal, n.n_name AS n_name,
         p.p_partkey AS p_partkey, spc.uc AS uc,
         min(spc.uc) OVER (PARTITION BY p.p_partkey) AS mn
  FROM spc
  JOIN part p ON p.p_partkey = spc.l_partkey
             AND p.p_size = 15 AND p.p_type = 'STANDARD'
  JOIN supplier s ON s.s_suppkey = spc.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
)
SELECT s_name, {sround_sql("s_acctbal", 2)} AS s_acctbal, n_name, p_partkey,
       {sround_sql("uc", 4)} AS unit_cost
FROM cand WHERE uc = mn
"""


@query("q2_min_cost_supplier", _Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the EUROPE supplier(s)
    offering its minimum unit cost. No partsupp table in the testdata
    (SURVEY testdata note) — lineitem is the part<->supplier association
    and unit cost is min(extendedprice/quantity) per pair, mirroring the
    reference-era correlated `ps_supplycost = (SELECT min ...)`.

    Scale shape: the correlated min DECORRELATES to a window over the
    already part+region-filtered candidate set — the per-pair aggregate
    is one lineitem shuffle; part and the supplier->nation->region chain
    are broadcast; the window shuffles only the tiny candidate set.
    Equality against the window min is exact (same double, same set).
    """
    li = t(spark, sf_dir, "lineitem")
    spc = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("uc")
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
    )
    cand = spc.join(F.broadcast(p), spc.l_partkey == p.p_partkey).join(
        F.broadcast(sn), spc.l_suppkey == F.col("s_suppkey")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("mn", F.min("uc").over(w))
        .filter(F.col("uc") == F.col("mn"))
        .select(
            "s_name",
            stable_round("s_acctbal", 2).alias("s_acctbal"),
            "n_name",
            "p_partkey",
            stable_round("uc", 4).alias("unit_cost"),
        )
    )


# --- Q8-style market share -----------------------------------------------------

_Q8_ORACLE = f"""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       {sround_sql(
           _dsum_sql("CASE WHEN n2.n_name = 'NATION_3' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")
           + " / " + _dsum_sql("l.l_extendedprice * (1 - l.l_discount)"), 6)} AS mkt_share
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'AMERICA'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
GROUP BY year(o.o_orderdate)
"""


@query("q8_market_share", _Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of AMERICA-market ECONOMY-part
    revenue by order year. 7-way star join — every dim side broadcast,
    the conditional and total sums ride ONE shuffle (group by year) with
    map-side combine; the share division happens on two decimal-exact
    sums (identical IEEE op in both engines, then stable-rounded)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = n.alias("n1")
    n2 = n.alias("n2")
    cust_america = c.join(
        F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey")
    ).join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey).select("c_custkey")
    supp_nation = s.join(
        F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey")
    ).select("s_suppkey", F.col("n2.n_name").alias("supp_nation"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_america), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
    )
    nation_disc = F.when(F.col("supp_nation") == "NATION_3", disc).otherwise(F.lit(0.0))
    return joined.groupBy(
        F.year(F.col("o_orderdate")).cast("long").alias("o_year")
    ).agg(
        stable_round((_dsum(nation_disc) / _dsum(disc)), 6).alias("mkt_share")
    )


# --- Q11-style important suppliers ---------------------------------------------

_Q11_NATIONS = "('NATION_1', 'NATION_2', 'NATION_3')"

_Q11_ORACLE = f"""
WITH sv AS (
  SELECT s.s_suppkey AS s_suppkey,
         sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6))) AS vd
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name IN {_Q11_NATIONS}
  GROUP BY s.s_suppkey
), tot AS (SELECT sum(vd) AS tv FROM sv)
SELECT sv.s_suppkey AS s_suppkey,
       {sround_sql("CAST(sv.vd AS DOUBLE)", 2)} AS supp_value
FROM sv, tot
WHERE sv.vd * 100 > tot.tv * 9
"""


@query("q11_important_suppliers", _Q11_ORACLE)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: suppliers (in a nation set) holding > 9% of the
    group's total revenue. The scalar `HAVING sum > frac * (SELECT ...)`
    decorrelates to a 1-row broadcast cross join — no collect, no second
    scan of lineitem (the total re-aggregates the per-supplier decimal
    sums, which is exact and order-independent). The 9%-threshold
    comparison is pure decimal arithmetic: no float boundary between
    engines."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    sv = (
        li.join(F.broadcast(sn), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("double")
                .cast("decimal(27,6)")
            ).alias("vd")
        )
    )
    tot = sv.agg(F.sum("vd").alias("tv"))
    return (
        sv.join(F.broadcast(tot))
        .filter(F.col("vd") * 100 > F.col("tv") * 9)
        .select(
            "s_suppkey",
            stable_round(F.col("vd").cast("double"), 2).alias("supp_value"),
        )
    )


# --- Q20-style excess-shipment suppliers ---------------------------------------

_Q20_ORACLE = """
WITH sq AS (
  SELECT l.l_suppkey
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'small%'
    AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING sum(CAST(l.l_quantity AS DECIMAL(27,2))) > 60
)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
             AND n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
WHERE s.s_suppkey IN (SELECT l_suppkey FROM sq)
"""


@query("q20_excess_shipments", _Q20_ORACLE)
def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved > 60 units of any 'small%'
    part in 1995-96 (nested IN-subqueries over part and the shipment
    aggregate). Decorrelation: part-filter broadcast semi-shrinks
    lineitem BEFORE the (suppkey, partkey) aggregate; the surviving
    supplier key set is tiny -> broadcast LEFT SEMI into supplier. The
    threshold compares decimal sums (exact). One shuffle total (the
    pair aggregate)."""
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1995-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-01-01 00:00:00")
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    )
    movers = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,2)")).alias("_q"))
        .filter(F.col("_q") > 60)
        .select("l_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(movers), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


# --- Q21-style sole-blame supplier ---------------------------------------------

_Q21_ORACLE = """
WITH per AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
  FROM lineitem GROUP BY l_orderkey, l_suppkey
), ord AS (
  SELECT l_orderkey, count(*) AS n_supp,
         CAST(sum(has_r) AS BIGINT) AS n_r_supp
  FROM per GROUP BY l_orderkey
)
SELECT s.s_name AS s_name, count(*) AS numwait
FROM per
JOIN ord ON ord.l_orderkey = per.l_orderkey
JOIN orders o ON o.o_orderkey = per.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = per.l_suppkey
WHERE per.has_r = 1 AND ord.n_supp >= 2 AND ord.n_r_supp = 1
GROUP BY s.s_name
"""


@query("q21_sole_blame_supplier", _Q21_ORACLE)
def q21_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (schema-adapted: no receipt/commit dates, so
    "late" = returned lines, l_returnflag = 'R'): suppliers who were the
    ONLY supplier with a returned line on a finished multi-supplier
    order. The classic EXISTS (other supplier) AND NOT EXISTS (other
    late supplier) pair decorrelates to per-order counts: n_supp >= 2
    carries the EXISTS, n_r_supp = 1 (+ has_r on the probe row) carries
    the NOT EXISTS — aggregation instead of two correlated joins, the
    formulation that survives at scale.

    Shuffle budget: pair agg (partial/final on l_orderkey+l_suppkey),
    per-order rollup + self-join co-partitioned on l_orderkey, orders
    joined on the same key (no extra exchange under AQE), supplier
    broadcast, final tiny agg on s_name."""
    li = t(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r")
    )
    ord_stats = per.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_r").alias("n_r_supp"),
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = t(spark, sf_dir, "supplier")
    blamed = (
        per.filter(F.col("has_r") == 1)
        .join(ord_stats, per.l_orderkey == F.col("_ok"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
        .join(o, per.l_orderkey == o.o_orderkey, "left_semi")
        .join(F.broadcast(s), per.l_suppkey == s.s_suppkey)
    )
    return blamed.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))


# --- GROUPING SETS -----------------------------------------------------------

_GSETS_ORACLE = f"""
SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
       coalesce(l_linestatus, '<all>') AS l_linestatus,
       {ssum_sql("l_quantity", 2)} AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
"""


@query("groupingsets_pricing", _GSETS_ORACLE)
def groupingsets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the irregular-lattice sibling of
    rollup/cube (a set list neither would produce: (a,b), (b), ()).
    One shuffle; Spark expands the sets map-side with a single Expand
    node, so input is scanned once regardless of how many sets."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )
    out = li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        stable_sum(F.col("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )
    return out.select(
        F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
        F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
        "sum_qty",
        "n",
    )
