"""ks_matrix correctness: brute-force ECDF reference, bucket-count
invariance (the internal range partitioning must never change the
statistic), and absent-group degradation."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from dod_etl_spark.operators.stats import ks_matrix


def _ref_ks(xs, ys):
    """Exact two-sample KS via Fractions (no float ECDF)."""
    if not xs or not ys:
        return 0, Fraction(0)
    pooled = sorted(set(xs) | set(ys))
    nx, ny = len(xs), len(ys)
    d_num = 0
    for v in pooled:
        cx = sum(1 for x in xs if x <= v)
        cy = sum(1 for y in ys if y <= v)
        d_num = max(d_num, abs(cx * ny - cy * nx))
    return d_num, Fraction(d_num, nx * ny)


def _run(spark, rows, groups, n_buckets=16):
    df = spark.createDataFrame(rows, "g string, v double")
    out = ks_matrix(df, "g", "v", groups, n_buckets=n_buckets)
    return {(r.group_a, r.group_b): r.asDict() for r in out.collect()}


def test_known_small_case(spark):
    rows = [("a", float(v)) for v in (1, 2, 3, 4)] + [
        ("b", float(v)) for v in (3, 4, 5, 6)
    ]
    got = _run(spark, rows, ["a", "b"])[("a", "b")]
    # ECDF gap peaks at v=2: C_a=2, C_b=0 -> |2*4 - 0*4| = 8; D = 8/16.
    assert got["d_num"] == 8
    assert got["ks_d"] == 0.5


def test_identical_distributions_zero(spark):
    rows = [("a", float(v)) for v in range(10)] + [
        ("b", float(v)) for v in range(10)
    ]
    got = _run(spark, rows, ["a", "b"])[("a", "b")]
    assert got["d_num"] == 0 and got["ks_d"] == 0.0


def test_absent_group_yields_zero_not_nan(spark):
    rows = [("a", 1.0), ("a", 2.0)]
    got = _run(spark, rows, ["a", "ghost"])[("a", "ghost")]
    assert got["n_b"] == 0 and got["ks_d"] == 0.0


@settings(max_examples=12, deadline=None)
@given(
    xs=st.lists(st.integers(0, 30), min_size=1, max_size=40),
    ys=st.lists(st.integers(0, 30), min_size=1, max_size=40),
    n_buckets=st.sampled_from([1, 3, 16]),
)
def test_matches_fraction_reference(spark, xs, ys, n_buckets):
    rows = [("a", float(x)) for x in xs] + [("b", float(y)) for y in ys]
    got = _run(spark, rows, ["a", "b"], n_buckets=n_buckets)[("a", "b")]
    d_num, _ = _ref_ks(xs, ys)
    assert got["d_num"] == d_num
    assert got["n_a"] == len(xs) and got["n_b"] == len(ys)


def test_three_group_pairing_and_bucket_invariance(spark):
    rows = (
        [("a", float(v)) for v in range(0, 20)]
        + [("b", float(v)) for v in range(10, 30)]
        + [("c", 5.0)] * 7
    )
    g1 = _run(spark, rows, ["a", "b", "c"], n_buckets=64)
    g2 = _run(spark, rows, ["a", "b", "c"], n_buckets=2)
    assert set(g1) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert g1 == g2
    for (ga, gb), r in g1.items():
        xs = [v for g, v in rows if g == ga]
        ys = [v for g, v in rows if g == gb]
        assert r["d_num"] == _ref_ks(xs, ys)[0], (ga, gb)
