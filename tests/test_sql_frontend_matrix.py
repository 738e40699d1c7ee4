"""SQL-frontend coverage matrix: every oracle text that is expressible
in the shared ANSI dialect (59 of the registry — the remainder use
DuckDB list comprehensions / engine-specific functions by design) runs
VERBATIM through spark.sql() and returns exactly what the DataFrame
implementation returns. Extends the TPC-H-only frontend proof
(test_sql_frontend_tpch.py) to the whole relational + behavioral +
eval surface."""

from __future__ import annotations

from dod_etl_spark.catalog import register_views
from dod_etl_spark.functions.sql_udfs import register_sql_functions
from dod_etl_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.test_oracle_parity import _cells_equal, _normalize

# Pinned: the oracle texts the Spark SQL frontend must keep running
# verbatim. A query leaving this list is a frontend regression.
FRONTEND_COMPATIBLE = """
a1_latest_per_key a2_high_water basket_part_pairs cdc_user_state
conversion_ab_test corpus_diff cube_pricing dau_mau_stickiness
dedup_exact_docs dedup_rate_by_source distinct_agg
event_transition_matrix events_scd2_pit funnel_signup_purchase
fuzzy_name_pairs fuzzy_name_pairs_d2 groupingsets_pricing
interval_coverage_events j6_upsert p6_keyset_filter p7_retention_filter
phash_near_dup_media pivot_event_counts q10_returned_revenue
q11_important_suppliers q12_priority_lines q13_customer_distribution
q14_promo_revenue q16_supplier_cnt q15_top_supplier
q17_small_qty_revenue q18_large_orders q19_disjunctive_revenue
q1_pricing_summary q20_excess_shipments q21_sole_blame_supplier
q22_idle_customers q2_min_cost_supplier q3_shipping_priority
q4_order_priority q5_revenue_by_nation q6_forecast_revenue
q7_volume_shipping q8_market_share q9_profit_by_nation_year
rollup_pricing scd2_purchase_history sessionize_events setop_key_diff
source_concentration sql_surface_pricing t2_release_eligibility
topk_orders_per_customer user_event_deltas value_band_pairs
value_histogram value_trailing_1h value_zscore_outliers
window_running_agg
""".split()


def test_frontend_matrix_values_match_dataframe(spark):
    assert len(FRONTEND_COMPATIBLE) == 59
    register_views(spark, SF_SMOKE)
    register_sql_functions(spark)
    failures = []
    for name in FRONTEND_COMPATIBLE:
        try:
            sql_df = spark.sql(ORACLES[name]).toPandas()
            api_df = QUERIES[name](spark, SF_SMOKE).toPandas()
        except Exception as ex:  # frontend regression
            failures.append((name, str(ex).split("\n")[0][:120]))
            continue
        if sorted(sql_df.columns) != sorted(api_df.columns):
            failures.append((name, "column mismatch"))
            continue
        s, a = _normalize(sql_df), _normalize(api_df)
        if len(s) != len(a):
            failures.append((name, f"rows {len(s)} vs {len(a)}"))
            continue
        for col in s.columns:
            bad = next(
                (
                    (col, i, x, y)
                    for i, (x, y) in enumerate(zip(s[col].tolist(), a[col].tolist()))
                    if not _cells_equal(x, y)
                ),
                None,
            )
            if bad:
                failures.append((name, f"value {bad}"))
                break
    assert not failures, failures
