"""Partition-invariance battery: the engine's reproducibility claims,
tested directly.

Every content-hash decision (sampling, sharding, mixture cuts), every
signature (minhash/simhash), and every fold aggregation (funnel, EWMA)
must produce IDENTICAL results when the physical partitioning changes —
that is the property that makes a 100 TB run reproducible across
cluster sizes, AQE re-plans, and input-split layouts (and the property
rand()/monotonically_increasing_id-based designs silently lose).

Method: run each query normally, then re-run with the shuffle-partition
count dropped 32 -> 7 AND the input loader wrapped in an adversarial
repartition(5); compare full sorted outputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dod_etl_spark import catalog
from dod_etl_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

DETERMINISTIC_QUERIES = [
    "sample_docs_deterministic",
    "shard_assignment_stats",
    "mixture_sample_docs",
    "mixture_upsample_docs",
    "minhash_lsh_candidates",
    "simhash_fingerprints",
    "funnel_signup_purchase",
    "ewma_user_value",
    "rfm_segments",
    "dedup_exact_docs",
]


def _rows(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


@pytest.mark.parametrize("name", DETERMINISTIC_QUERIES)
def test_partition_invariance(spark, name, monkeypatch):
    base = _rows(spark, name)

    real_load = catalog.load_table

    def adversarial_load(sp, sf_dir, table):
        return real_load(sp, sf_dir, table).repartition(5)

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        monkeypatch.setattr(catalog, "load_table", adversarial_load)
        # queries/base.t resolves load_table at call time via the
        # catalog module, so the monkeypatch reaches every query.
        import dod_etl_spark.queries.base as qbase

        monkeypatch.setattr(qbase, "load_table", adversarial_load)
        perturbed = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    assert perturbed == base, (
        f"{name}: output depends on physical partitioning "
        f"({len(base)} vs {len(perturbed)} rows or value drift)"
    )
