#!/usr/bin/env python
"""Regenerate the PLANS.md evidence: formatted physical plans of the
headline queries at $SPARK_GRAFT_SF_DIR (default sf0.01)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
AUDIT = [
    "oee_flagship",
    "j3_j4_interval_grains",
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "p6_keyset_filter",
    "a1_latest_per_key",
    "minhash_lsh_candidates",
    "cosine_topk",
    "ivf_ann_topk",
    "q4_order_priority",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "cube_pricing",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q11_important_suppliers",
    "q21_sole_blame_supplier",
    "dedup_clusters",
    "lsh_ann_multiprobe",
    "pii_scrub_docs",
    "repetition_ratio_docs",
    "domain_cap_docs",
    "sample_docs_deterministic",
    "quality_topk_per_source",
    "token_budget_pack_docs",
    "pivot_event_counts",
    "scd2_purchase_history",
    "chunk_docs_stride",
    "corpus_profile",
    "tfidf_top_terms",
    "source_overlap_matrix",
    "quality_percentile_rank",
    "shard_assignment_stats",
    "dedup_survivors_docs",
    "knn_graph_docs",
    "minhash_jaccard_est",
    "corpus_diff",
    "rarity_score_docs",
    "incremental_dedup_docs",
    "funnel_signup_purchase",
    "retention_cohorts",
    "event_transition_matrix",
    "rfm_segments",
    "top_session_paths",
    "value_zscore_outliers",
    "knn_label_propagation",
    "knn_pagerank",
    "mixture_sample_docs",
    "mixture_upsample_docs",
    "gopher_rules_docs",
    "ewma_user_value",
    "purchase_attribution",
    "props_extract_agg",
    "events_scd2_pit",
    "hybrid_dedup_pairs",
    "dau_mau_stickiness",
    "funnel_conversion_summary",
    # Round-5 quality/similarity wave.
    "dq_checks_events",
    "winnow_fingerprints_docs",
    "winnow_dup_pairs",
    "winnow_decontaminate_docs",
    "lm_score_docs",
    "source_drift_tvd",
    "value_band_pairs",
    "pca_project_embeddings",
    "jaccard_join_docs",
    "knn_triangles",
]


def main() -> None:
    from dod_etl_spark.queries import QUERIES
    from dod_etl_spark.session import get_spark

    spark = get_spark("explain_audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in AUDIT:
        df = QUERIES[name](spark, SF_DIR)
        print(f"\n{'=' * 30} {name}\n")
        print(df._jdf.queryExecution().explainString(mode))


if __name__ == "__main__":
    main()
