"""Sketch accuracy + mergeability contracts (functions/sketches.py)."""

from pyspark.sql import functions as F

from dod_etl_spark.catalog import load_table
from dod_etl_spark.functions.sketches import (
    approx_quantiles,
    hll_distinct,
    hll_merge,
    hll_partial,
)

SF = "/root/testdata/sf0.001"


def test_hll_estimate_within_error_bound(spark):
    ev = load_table(spark, SF, "events")
    got = ev.agg(
        hll_distinct("user_id").alias("est"),
        F.count_distinct("user_id").alias("exact"),
    ).first()
    assert abs(got["est"] - got["exact"]) / got["exact"] < 0.05  # lgK=12 ~1.6% typ


def test_hll_union_of_partials_equals_one_shot(spark):
    """Mergeability — the property that makes sketches the scale path:
    per-group partial sketches unioned give the SAME estimate as one
    global sketch (identical binary algebra, not merely close)."""
    ev = load_table(spark, SF, "events")
    one_shot = ev.agg(hll_distinct("user_id")).first()[0]
    rolled = (
        ev.groupBy("event_type")
        .agg(hll_partial("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(hll_merge("sk")).cast("long"))
        .first()[0]
    )
    assert rolled == one_shot


def test_approx_quantiles_rank_accuracy(spark):
    ev = load_table(spark, SF, "events").select(F.col("value").cast("double"))
    n = ev.count()
    q = ev.agg(approx_quantiles("value", [0.5]).alias("q")).first()["q"][0]
    rank = ev.filter(F.col("value") <= q).count()
    assert abs(rank / n - 0.5) < 0.01  # accuracy=10000 -> 1e-4 rank err + ties


def test_hll_intersect_estimate(spark):
    """Inclusion-exclusion intersection: accurate when the overlap is a
    healthy fraction of the union; floored at 0 for near-disjoint sets."""
    from pyspark.sql import functions as F

    from dod_etl_spark.functions.sketches import hll_intersect_est, hll_partial

    a = spark.range(0, 20000).select(F.col("id").alias("v"))
    b = spark.range(10000, 30000).select(F.col("id").alias("v"))
    sk = a.agg(hll_partial("v").alias("sa")).crossJoin(
        b.agg(hll_partial("v").alias("sb"))
    )
    est = sk.select(hll_intersect_est("sa", "sb").alias("i")).first()["i"]
    assert abs(est - 10000) / 10000 < 0.10  # compounded sketch error

    dis = spark.range(40000, 60000).select(F.col("id").alias("v"))
    sk2 = a.agg(hll_partial("v").alias("sa")).crossJoin(
        dis.agg(hll_partial("v").alias("sb"))
    )
    est2 = sk2.select(hll_intersect_est("sa", "sb").alias("i")).first()["i"]
    assert 0 <= est2 < 2000  # near-disjoint: small, never negative


def test_cm_sketch_bounds_and_merge(spark):
    """CM estimates never undercount, overcount within the e·N/width
    bound (loose factor applied), and sketches of disjoint halves merge
    by counter addition into the full-data sketch."""
    from pyspark.sql import functions as F

    from dod_etl_spark.functions.sketches import cm_estimate, cm_sketch

    # Zipf-ish: token t_k appears ~1000/k times.
    rows = []
    for k in range(1, 40):
        rows += [(f"t{k}",)] * (1000 // k)
    df = spark.createDataFrame(rows, "v STRING")
    n = df.count()
    width, depth = 256, 4
    sk = cm_sketch(df, "v", depth=depth, width=width)
    assert sk.count() <= depth * width
    items = df.distinct()
    est = {
        r["v"]: r["est"]
        for r in cm_estimate(sk, items, "v", depth=depth, width=width).collect()
    }
    true = {r["v"]: r["cnt"] for r in df.groupBy("v").agg(F.count("*").alias("cnt")).collect()}
    for v, t in true.items():
        assert est[v] >= t, (v, est[v], t)
        assert est[v] <= t + 3 * n // width, (v, est[v], t)

    # Merge: sketch(a) + sketch(b) == sketch(a ∪ b), counter-exact.
    half1 = spark.createDataFrame(rows[: len(rows) // 2], "v STRING")
    half2 = spark.createDataFrame(rows[len(rows) // 2 :], "v STRING")
    merged = (
        cm_sketch(half1, "v", depth=depth, width=width)
        .unionByName(cm_sketch(half2, "v", depth=depth, width=width))
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = cm_sketch(df, "v", depth=depth, width=width)
    diff = merged.exceptAll(full).count() + full.exceptAll(merged).count()
    assert diff == 0
