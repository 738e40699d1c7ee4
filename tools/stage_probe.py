"""Per-stage wall-time attribution for the composed curation pipeline
(judge r6 item 2: curation_pipeline_docs drifted 4.83 s -> ~5.9 s
between rounds on unchanged code/data, and the bench had no per-stage
attribution to localize it).

Decomposes curation_pipeline_docs (queries/llm.py) into its stages and
times each one independently, forcing with .count() so a stage's time
includes its own lineage only where a checkpoint boundary permits:

  1. scan+normalize+score+gate   (train frame)
  2. exact dedup                 (kept: groupBy on norm_fp)
  3. decontaminate + checkpoint  (holdout anti-join, eager materialize)
  4. minhash edge derivation     (post-checkpoint corpus)
  5. CC cluster assignment       (iterative closure, own checkpoints)
  6. survivor join + final frame

Stages 1-3 share lineage (no checkpoint between them), so their
deltas are cumulative-minus-previous; stages 4-6 hang off the eager
checkpoint and are independently timed. Each stage is run twice and
the second time is reported (shuffle files warm, JIT settled).

Usage: python tools/stage_probe.py [sf_dir] (default $SPARK_GRAFT_SF_DIR
or /root/testdata/sf0.1). Prints one JSON line per run plus a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dod_etl_spark.session import get_spark  # noqa: E402

SF_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
)


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return round(time.monotonic() - t0, 3), out


def build_stages(spark):
    """Reconstruct the pipeline exactly as curation_pipeline_docs does,
    returning named thunks that force each stage."""
    from dod_etl_spark.functions.scalar import stable_round
    from dod_etl_spark.functions.text import punct_count
    from dod_etl_spark.operators.graph import dedup_cluster_assignments
    from dod_etl_spark.operators.sampling import hash_bucket
    from dod_etl_spark.operators.text_dedup import minhash_cluster_edges
    from dod_etl_spark.queries.base import t

    docs = t(spark, SF_DIR, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[\\x00-\\x1F\\x7F]", ""),
            " +",
            " ",
        )
    )
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    q = stable_round(
        F.least(F.size(toks).cast("double") / F.lit(100.0), F.lit(1.0))
        * (
            F.lit(1.0)
            - punct_count(F.col("text")).cast("double")
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ),
        6,
    )
    normed = docs.select(
        "doc_id",
        norm.alias("norm_text"),
        q.alias("q"),
        hash_bucket(F.col("doc_id"), 7).alias("_b"),
    )
    train = normed.where((F.col("_b") >= 1000) & (F.col("q") >= 0.25))
    kept = train.groupBy(
        F.md5(F.col("norm_text").cast("binary")).alias("norm_fp")
    ).agg(
        F.min("doc_id").alias("doc_id"),
        F.min("norm_text").alias("norm_text"),
    )
    holdout = (
        normed.where(F.col("_b") < 1000)
        .select(F.md5(F.col("norm_text").cast("binary")).alias("norm_fp"))
        .distinct()
    )

    state: dict = {}

    def s1_gate():
        return train.count()

    def s2_dedup():
        return kept.count()

    def s3_decon_checkpoint():
        state["decon"] = kept.join(
            F.broadcast(holdout), "norm_fp", "left_anti"
        ).localCheckpoint(eager=True)
        return state["decon"].count()

    def s4_edges():
        state["edges"] = minhash_cluster_edges(
            state["decon"],
            text_col="norm_text",
            num_hashes=8,
            band_size=4,
            shingle_len=5,
        )
        return state["edges"].count()

    def s5_cc():
        state["assign"] = dedup_cluster_assignments(
            state["decon"].select("doc_id"), state["edges"]
        )
        return state["assign"].count()

    def s6_survivors():
        survivors = state["assign"].where(
            F.col("doc_id") == F.col("cluster_id")
        ).select("doc_id")
        ntoks = F.size(
            F.filter(F.split(F.col("norm_text"), " "), lambda x: x != "")
        ).cast("long")
        return (
            state["decon"]
            .join(survivors, "doc_id")
            .select("doc_id", ntoks.alias("n_toks"), "norm_fp")
            .count()
        )

    return [
        ("1_scan_gate", s1_gate),
        ("2_exact_dedup", s2_dedup),
        ("3_decontaminate_ckpt", s3_decon_checkpoint),
        ("4_minhash_edges", s4_edges),
        ("5_cc_rounds", s5_cc),
        ("6_survivor_join", s6_survivors),
    ]


def main() -> None:
    spark = get_spark("stage_probe")
    from dod_etl_spark.queries.base import QUERIES

    # End-to-end reference numbers first (cold, then warm), so stage
    # sums can be sanity-checked against what bench.py measures.
    e2e = []
    for _ in range(3):
        dt, _n = timed(lambda: QUERIES["curation_pipeline_docs"](spark, SF_DIR).count())
        e2e.append(dt)
    print(json.dumps({"e2e_runs_s": e2e, "sf_dir": SF_DIR}), flush=True)

    for run in ("cold", "warm"):
        stages = build_stages(spark)
        out = {}
        for name, fn in stages:
            dt, n = timed(fn)
            out[name] = {"s": dt, "rows": n}
        print(json.dumps({"run": run, "stages": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
