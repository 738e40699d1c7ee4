"""Adversarial skew stress for the round-9 stores (judge r10 item 7):
the r9 throughput numbers (BENCH_LM_r09, BENCH_IVFPQ_r09) were
measured on UNIFORM synthetic streams; this tool measures the
adversarial twin of each and asserts the degradation is bounded — the
same discipline the storm scenario gave the dedup store.

Scenario A — NgramLmStore under Zipf-skewed w1:
  doc tokens drawn log-uniform over a 1000-word vocab (approximates
  Zipf(1); the hottest token is ~1/3 of ALL tokens, so one w1 bucket
  receives a hugely disproportionate token mass). The structural
  defense being verified: update_batch PRE-AGGREGATES to distinct
  (w1, w2) pairs before the bucketed append, so row volume per batch
  is bounded by pair cardinality, not token mass — a hot w1's rows
  are its distinct continuations, not its occurrences.

Scenario B — IvfPqVectorStore with one hot IVF cell:
  every ingested vector lands in cell 0 (centroid + small noise). The
  cells table is bucketed by cell_id, so the append's bucket_align
  funnels the whole batch through ONE write task — the worst case for
  the layout that makes probe-pruned serving zero-shuffle. Measures
  ingest throughput hot-vs-uniform and the probe-side serve time when
  the probed cell holds ~everything.

Writes BENCH_STORE_SKEW_r10.json; exits non-zero if a bound fails:
  - LM: zipf throughput >= 0.4x uniform; hot-w1 row share stays a
    pair-cardinality fraction (< 2%% of batch rows) despite ~33%%
    token share;
  - IVF-PQ: hot-cell ingest >= 0.3x uniform (one write task vs 16).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = 5
LM_DOCS_PER_BATCH = 20_000
VEC_ROWS_PER_BATCH = 50_000
DIM = 16


def _lm_docs(spark, batch_id: int, skew: str):
    """~24-token docs; token rank log-uniform (zipf) or uniform."""
    base = spark.range(
        batch_id * LM_DOCS_PER_BATCH, (batch_id + 1) * LM_DOCS_PER_BATCH
    )
    if skew == "zipf":
        # u^2 pushes mass to the head: P(rank==1) ~ sqrt(log_V 2) ~ 0.32
        rank = "1 + CAST(pow(1000.0, pow(u, 2.0)) AS INT)"
    else:
        rank = "1 + CAST(u * 1000 AS INT)"
    return base.selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(1, 24), j -> concat('t', CAST("
        + rank.replace(
            "u", "(pmod(xxhash64(id * 31 + j), 1000000) / 1000000.0)"
        )
        + " AS STRING)))) AS text",
    )


def _vecs(spark, batch_id: int, hot: bool, centroid0: list[float]):
    from pyspark.sql import functions as F

    base = spark.range(
        batch_id * VEC_ROWS_PER_BATCH, (batch_id + 1) * VEC_ROWS_PER_BATCH
    )
    if hot:
        # centroid 0 plus +-0.01 deterministic noise: all in cell 0
        comps = ", ".join(
            f"CAST({c!r} + (pmod(xxhash64(id * 131 + {i}), 200) - 100) / 10000.0 AS FLOAT)"
            for i, c in enumerate(centroid0)
        )
    else:
        comps = ", ".join(
            f"CAST((pmod(xxhash64(id * 131 + {i}), 2000) - 1000) / 1000.0 AS FLOAT)"
            for i in range(DIM)
        )
    return base.selectExpr("id AS vec_id", f"array({comps}) AS embedding")


def _drop(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def lm_scenario(spark, skew: str) -> dict:
    from pyspark.sql import functions as F

    from dod_etl_spark.streaming.lm_store import NgramLmStore

    tag = f"skx_{skew}"
    store = NgramLmStore(
        spark,
        table=f"lmb_{tag}",
        docs_table=f"lmd_{tag}",
        commits_table=f"lmc_{tag}",
    )
    _drop(spark, store.table, store.docs_table, store.commits_table)
    times = []
    for b in range(BATCHES):
        docs = _lm_docs(spark, b, skew).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        n = store.update_batch(docs, batch_id=b)
        times.append(time.perf_counter() - t0)
        assert n == LM_DOCS_PER_BATCH, (skew, b, n)
    steady = times[1:]
    rows = spark.table(store.table)
    total_rows = rows.count()
    top_w1 = (
        rows.groupBy("w1")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .first()
    )
    # token share of the hottest w1 (occurrences, from summed c2)
    occ = rows.groupBy("w1").agg(F.sum("c2").alias("o")).orderBy(F.desc("o")).first()
    total_occ = rows.agg(F.sum("c2")).first()[0]
    out = {
        "docs_per_sec": round(LM_DOCS_PER_BATCH * len(steady) / sum(steady), 1),
        "batch_secs": [round(t, 2) for t in times],
        "count_rows_total": total_rows,
        "hot_w1_row_share": round(top_w1["n"] / total_rows, 4),
        "hot_w1_token_share": round(occ["o"] / total_occ, 4),
    }
    _drop(spark, store.table, store.docs_table, store.commits_table)
    return out


def ivfpq_scenario(spark, hot: bool) -> dict:
    from dod_etl_spark.operators.pq import seed_pq_codebooks
    from dod_etl_spark.streaming.tombstones import tombstone_table_name
    from dod_etl_spark.streaming.vector_store import IvfPqVectorStore

    # well-separated coarse cells: +-2 on axis pairs
    cents = []
    for c in range(8):
        v = [0.0] * DIM
        v[c % DIM] = 2.0 if c < 4 else -2.0
        v[(c + 7) % DIM] = -2.0 if c % 2 else 2.0
        cents.append((c, v))
    train = _vecs(spark, 0, False, cents[0][1])
    cbs = seed_pq_codebooks(train, 8, 16, id_col="vec_id", vec_col="embedding")
    tag = "hot" if hot else "uni"
    store = IvfPqVectorStore(
        spark,
        table=f"skx_{tag}_cells",
        vecs_table=f"skx_{tag}_vecs",
        cent_table=f"skx_{tag}_cent",
        cb_table=f"skx_{tag}_cb",
        centroids=cents,
        codebooks=cbs,
    )
    _drop(
        spark, store.table, store.vecs_table, store.cent_table, store.cb_table,
        tombstone_table_name(store.table),
    )
    times = []
    for b in range(BATCHES):
        batch = _vecs(spark, b, hot, cents[0][1]).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        n = store.index_batch(batch)
        times.append(time.perf_counter() - t0)
        assert n == VEC_ROWS_PER_BATCH, (hot, b, n)
    steady = times[1:]
    balance = store.cell_balance()
    # serve while the probed cell holds ~everything (hot) or ~1/8 (uniform)
    queries = _vecs(spark, 0, hot, cents[0][1]).limit(10)
    t0 = time.perf_counter()
    n_out = store.search(queries, 5, n_probe=2).count()
    serve_s = time.perf_counter() - t0
    out = {
        "vecs_per_sec": round(VEC_ROWS_PER_BATCH * len(steady) / sum(steady), 1),
        "batch_secs": [round(t, 2) for t in times],
        "max_cell_frac": balance["max_cell_frac"],
        "serve_10q_s": round(serve_s, 2),
        "serve_rows": n_out,
    }
    _drop(
        spark, store.table, store.vecs_table, store.cent_table, store.cb_table,
        tombstone_table_name(store.table),
    )
    return out


def main() -> int:
    from dod_etl_spark.session import get_spark

    spark = get_spark(
        "bench_store_skew", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8")
    )
    lm_uni = lm_scenario(spark, "uniform")
    lm_zipf = lm_scenario(spark, "zipf")
    pq_uni = ivfpq_scenario(spark, hot=False)
    pq_hot = ivfpq_scenario(spark, hot=True)

    lm_ratio = lm_zipf["docs_per_sec"] / lm_uni["docs_per_sec"]
    pq_ratio = pq_hot["vecs_per_sec"] / pq_uni["vecs_per_sec"]
    ok = (
        lm_ratio >= 0.4
        and lm_zipf["hot_w1_row_share"] < 0.02
        and lm_zipf["hot_w1_token_share"] > 0.2
        and pq_ratio >= 0.3
        and pq_hot["max_cell_frac"] > 0.99
    )
    rec = {
        "metric": "store_skew_throughput_ratio",
        "value": round(min(lm_ratio, pq_ratio), 3),
        "unit": "ratio",
        "queries": {
            "lm_uniform": lm_uni,
            "lm_zipf": lm_zipf,
            "ivfpq_uniform": pq_uni,
            "ivfpq_hot_cell": pq_hot,
        },
        "sf": 0.0,
        "lm_zipf_over_uniform": round(lm_ratio, 3),
        "ivfpq_hot_over_uniform": round(pq_ratio, 3),
        "bounds": {
            "lm_ratio_min": 0.4,
            "lm_hot_w1_row_share_max": 0.02,
            "ivfpq_ratio_min": 0.3,
        },
        "ok": ok,
    }
    with open("BENCH_STORE_SKEW_r10.json", "w") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
