"""Corpus-scaling probe: measured evidence that the dedup/curation
family scales ~linearly in corpus size (docs/SCALE.md's four rules,
demonstrated rather than argued).

Builds x1/x2/x4/x8 replicas of the sf0.1 documents table (replica rows
get offset doc_ids and a replica-tag token appended to the text, so
replicas are NEAR-duplicates — the adversarial case for banded
self-joins: most minhash bands collide across replicas and the
bucket-star edge generation + max_bucket_size guard carry the load),
runs a fixed query set at each scale on an otherwise-idle machine, and
prints one JSON line per scale plus a fitted log-log slope per query.

Slope ~1.0 = linear scaling; the pair-generating queries are allowed
mild super-linearity from replica collisions (documented worst case);
anything approaching 2.0 would mean a quadratic shape escaped the
banding — the regression this tool exists to catch.

Usage: python tools/scaling_probe.py [max_factor] (default 8; factors
are powers of two up to it). Writes parquet fixtures under
/tmp/spark_graft_scale/ and emits JSON to stdout.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dod_etl_spark.catalog import load_table  # noqa: E402
from dod_etl_spark.queries.base import QUERIES  # noqa: E402
from dod_etl_spark.session import get_spark  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/spark_graft_scale"

# Dedup/curation heavies whose scaling the 100 TB claims rest on.
PROBE_QUERIES = [
    "text_stats",            # map-only scan: the linear floor
    "dedup_exact_docs",      # one fingerprint shuffle
    "minhash_lsh_prod",      # banded self-join, xxhash64 mode
    "winnow_dup_pairs",      # fingerprint-bucket pair join
    "dedup_clusters",        # LSH + connected components
    "dsir_select_docs",      # one-pass model fit + priority sample
]


def build_fixture(spark, factor: int) -> str:
    path = os.path.join(ROOT, f"x{factor}")
    out = os.path.join(path, "documents.parquet")
    if os.path.exists(out):
        return path
    os.makedirs(path, exist_ok=True)
    base = load_table(spark, BASE_SF, "documents")
    n = base.count()
    reps = [
        base.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text")
            if i
            else F.col("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(factor)
    ]
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    df.repartition(32).write.mode("overwrite").parquet(out)
    return path


def main() -> None:
    max_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    factors = [f for f in (1, 2, 4, 8, 16, 32) if f <= max_factor]
    spark = get_spark("scaling_probe")
    results: dict[str, dict[int, float]] = {q: {} for q in PROBE_QUERIES}
    for factor in factors:
        sf_dir = build_fixture(spark, factor)
        for name in PROBE_QUERIES:
            fn = QUERIES[name]
            fn(spark, sf_dir).count()  # warm (plan + shuffle files)
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            dt = round(time.monotonic() - t0, 3)
            results[name][factor] = dt
        print(
            json.dumps(
                {"factor": factor, "times": {q: results[q][factor] for q in PROBE_QUERIES}}
            ),
            flush=True,
        )
    slopes = {}
    for q, times in results.items():
        xs = [math.log2(f) for f in sorted(times)]
        ys = [math.log2(times[f]) for f in sorted(times)]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        slopes[q] = round(
            sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3
        ) if denom else None
    print(json.dumps({"loglog_slopes": slopes, "base_sf_dir": BASE_SF}))
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
