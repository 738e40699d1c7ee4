#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is timed end-to-end (plan + execute + count-style consume).
Results are consumed with a count() of the final DataFrame so the full
plan executes but no rows cross back to the driver (collect would
measure driver materialization, not engine throughput).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline suite: the end-to-end OEE pipeline (J1-J4 + F1-F9), the
# dimension-maintenance operators (A1/P6/P7/J6), a representative BI
# aggregation, and the training-data north-star family.
BENCH_QUERIES = [
    "oee_flagship",
    "j3_j4_interval_grains",
    "a1_latest_per_key",
    "p6_keyset_filter",
    "j6_upsert",
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "dedup_exact_docs",
    "minhash_lsh_candidates",
    "text_stats",
    "cosine_topk",
    "oee_by_shift",
    "simhash_near_pairs",
    "multimodal_features",
]


def main() -> None:
    from dod_etl_spark.session import get_spark
    from dod_etl_spark.queries import QUERIES

    spark = get_spark("dod_etl_spark_bench")

    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else 0.0

    # JVM/codegen warm-up on the smallest table so the first timed query
    # doesn't pay session startup.
    warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    warm.count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
