"""Declarative curation spec: JSON -> composed corpus-curation plan.

config.py gives the reference's MES surface its JSON front door
(conf/tableConfig.json -> Spark plan, config/ConfigLoader.scala:11-32);
this module gives the LLM-curation surface the same treatment. A spec
is an ordered stage list:

    {"stages": [
        {"op": "normalize"},
        {"op": "holdout_split", "permille": 100, "seed": 7},
        {"op": "quality_gate", "minScore": 0.25},
        {"op": "exact_dedup", "on": "norm_text"},
        {"op": "decontaminate"},
        {"op": "near_dedup", "numHashes": 8, "bandSize": 4},
        {"op": "project_tokens"}
    ]}

and compiles to exactly the operator composition the hand-written
flagship runs (curation_pipeline_docs, queries/llm.py) — pinned
bit-identical in tests/test_curation_spec.py, so the declarative path
is not a second implementation that can drift: every stage delegates
to the same operator modules, and the compiler only sequences them.

Column contract: the working frame always carries (doc_id, text);
`normalize` adds norm_text; stages that need it fail fast if it is
absent. Side state (the holdout fingerprint set) flows through the
compile, not through the frame.

Scale posture is inherited from the stages (each documents its own);
the compiler adds exactly one localCheckpoint — after the
decontaminate stage, where the flagship's measured three-consumer
fan-out (edges + nodes + survivor join) sits.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import stable_round
from dod_etl_spark.functions.text import punct_count
from dod_etl_spark.operators.graph import dedup_cluster_assignments
from dod_etl_spark.operators.sampling import hash_bucket
from dod_etl_spark.operators.text_dedup import minhash_cluster_edges

_KNOWN_OPS = (
    "normalize",
    "holdout_split",
    "quality_gate",
    "exact_dedup",
    "decontaminate",
    "near_dedup",
    "project_tokens",
    "pii_scrub",
    "pii_card_gate",
    "segment_dedup",
    "blocklist_gate",
    "ppl_gate",
    "semdedup",
    "classifier_gate",
)


@dataclass(frozen=True)
class CurationSpec:
    stages: tuple[dict, ...]

    @classmethod
    def from_json(cls, s: str) -> "CurationSpec":
        raw = json.loads(s)
        stages = tuple(raw["stages"])
        for st in stages:
            if st.get("op") not in _KNOWN_OPS:
                raise ValueError(f"unknown curation op: {st.get('op')!r}")
        return cls(stages)

    @classmethod
    def from_file(cls, path: str) -> "CurationSpec":
        with open(path) as f:
            return cls.from_json(f.read())


def _norm_col() -> Column:
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[\\x00-\\x1F\\x7F]", ""),
            " +",
            " ",
        )
    )


def _quality_col() -> Column:
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    return stable_round(
        F.least(F.size(toks).cast("double") / F.lit(100.0), F.lit(1.0))
        * (
            F.lit(1.0)
            - punct_count(F.col("text")).cast("double")
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ),
        6,
    )


def _require(df: DataFrame, col: str, op: str) -> None:
    if col not in df.columns:
        raise ValueError(f"stage {op!r} needs column {col!r}; add its producer stage first")


def compile_curation(
    spark: SparkSession,
    docs: DataFrame,
    spec: CurationSpec,
    embeddings: DataFrame | None = None,
    labeled: DataFrame | None = None,
) -> DataFrame:
    """Compile `spec` over a (doc_id, text) frame. Returns the curated
    frame; its columns depend on the terminal stage (project_tokens
    yields the flagship's (doc_id, n_toks, norm_fp)). `embeddings` is
    the optional (vec_id, embedding) side frame the semdedup stage
    joins by doc_id — supplied by the caller like the corpus itself,
    never derived here (embedding inference is upstream of curation)."""
    df = docs
    holdout_fps: DataFrame | None = None
    for st in spec.stages:
        op = st["op"]
        if op == "normalize":
            df = df.withColumn("norm_text", _norm_col())
        elif op == "quality_gate":
            df = df.withColumn("q", _quality_col()).where(
                F.col("q") >= float(st.get("minScore", 0.25))
            )
        elif op == "holdout_split":
            _require(df, "norm_text", op)
            cut = int(st.get("permille", 100)) * 10  # of SAMPLE_BUCKETS=10000
            seed = int(st.get("seed", 7))
            b = hash_bucket(F.col("doc_id"), seed)
            df = df.withColumn("_b", b)
            holdout_fps = (
                df.where(F.col("_b") < cut)
                .select(F.md5(F.col("norm_text").cast("binary")).alias("norm_fp"))
                .distinct()
            )
            df = df.where(F.col("_b") >= cut)
        elif op == "exact_dedup":
            on = st.get("on", "norm_text")
            _require(df, on, op)
            carried = [c for c in df.columns if c not in ("doc_id", "_b", "q")]
            df = df.groupBy(
                F.md5(F.col(on).cast("binary")).alias("norm_fp")
            ).agg(
                F.min("doc_id").alias("doc_id"),
                *[F.min(c).alias(c) for c in carried],
            )
        elif op == "decontaminate":
            if holdout_fps is None:
                raise ValueError("decontaminate needs a holdout_split stage first")
            _require(df, "norm_fp", op)
            df = df.join(F.broadcast(holdout_fps), "norm_fp", "left_anti")
        elif op == "near_dedup":
            on = st.get("on", "norm_text")
            _require(df, on, op)
            # the flagship's measured fan-out point: edges + nodes +
            # survivor join all consume this frame
            df = df.localCheckpoint(eager=True)
            edges = minhash_cluster_edges(
                df,
                text_col=on,
                num_hashes=int(st.get("numHashes", 8)),
                band_size=int(st.get("bandSize", 4)),
                shingle_len=int(st.get("shingleLen", 5)),
            )
            assign = dedup_cluster_assignments(df.select("doc_id"), edges)
            survivors = assign.where(
                F.col("doc_id") == F.col("cluster_id")
            ).select("doc_id")
            df = df.join(survivors, "doc_id")
        elif op == "project_tokens":
            _require(df, "norm_text", op)
            _require(df, "norm_fp", op)
            ntoks = F.size(
                F.filter(F.split(F.col("norm_text"), " "), lambda x: x != "")
            ).cast("long")
            df = df.select("doc_id", ntoks.alias("n_toks"), "norm_fp")
        elif op == "pii_scrub":
            from dod_etl_spark.queries.llm import _PII_PATTERNS

            clean = F.col("text")
            for _, pat, repl in _PII_PATTERNS:
                clean = F.regexp_replace(clean, pat, repl)
            df = df.withColumn("text", clean)
        elif op == "pii_card_gate":
            # Compliance gate: drop documents carrying a Luhn-VALID
            # payment-card number (queries/llm.py pii_card_numbers_docs
            # is the audit query; regex-only scrubbing can't make this
            # call — the checksum can). Zero-exchange codegen filter.
            from dod_etl_spark.queries.llm import _LUHN_VALID_EXPR

            # NULL text => NULL predicate, which `where` treats as
            # false — a null-text doc carries no card number and must
            # PASS the gate, not be silently dropped and attributed to
            # it. coalesce pins NULL to "0 valid cards".
            df = df.where(
                F.coalesce(F.expr(_LUHN_VALID_EXPR), F.lit(0)) == 0
            )
        elif op == "segment_dedup":
            from dod_etl_spark.operators.segment_dedup import segment_dedup

            scrubbed = segment_dedup(
                df, mode=st.get("mode", "words"),
                seg_words=int(st.get("segWords", 10)),
            ).select("doc_id", F.col("text_dedup"))
            df = (
                df.drop("text")
                .join(scrubbed, "doc_id")
                .withColumnRenamed("text_dedup", "text")
            )
        elif op == "semdedup":
            # SemDeDup over the supplied embedding side frame: the
            # surviving vec_ids (cluster-scoped, keep-min-id —
            # operators/similarity.semdedup) gate the document frame
            # by doc_id. Docs WITHOUT an embedding pass (same rule as
            # ppl_gate: absence of evidence is not a drop reason).
            if embeddings is None:
                raise ValueError(
                    "semdedup stage needs the `embeddings` side frame "
                    "(vec_id, embedding), joined to docs by doc_id"
                )
            from dod_etl_spark.operators.similarity import semdedup

            kept_vecs = semdedup(
                embeddings,
                threshold=float(st.get("threshold", 0.35)),
                n_cells=int(st.get("nCells", 8)),
            ).select(F.col("vec_id").alias("doc_id"))
            has_emb = embeddings.select(
                F.col("vec_id").alias("doc_id")
            ).distinct()
            dropped = has_emb.join(kept_vecs, "doc_id", "left_anti")
            df = df.join(dropped, "doc_id", "left_anti")
        elif op == "classifier_gate":
            # The reference-corpus quality classifier (the GPT-3
            # WebText-vs-crawl pattern): train the log-free NB grid on
            # a LABELED seed corpus (side frame, like `embeddings` —
            # labeling is upstream of curation), score the working
            # frame, keep docs whose argmax class is in `keep`.
            # Unscorable docs (no in-vocabulary token) PASS — the
            # ppl_gate no-evidence rule.
            if labeled is None:
                raise ValueError(
                    "classifier_gate needs the `labeled` side frame "
                    "(doc_id, text, <classCol>) to train on"
                )
            keep_classes = st.get("keep")
            if not keep_classes:
                raise ValueError("classifier_gate needs a non-empty keep list")
            from pyspark.sql import Window

            from dod_etl_spark.operators.classify import nb_score, nb_train

            grid = nb_train(labeled, st.get("classCol", "cls"))
            aff = nb_score(df, grid)
            w = Window.partitionBy("doc_id").orderBy(
                F.col("micro_affinity").desc(), F.col("cls").asc()
            )
            drop_ids = (
                aff.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") == 1)
                .filter(~F.col("cls").isin(*keep_classes))
                .select("doc_id")
            )
            df = df.join(drop_ids, "doc_id", "left_anti")
        elif op == "ppl_gate":
            # CCNet perplexity bucketing as a gate (Wenzek et al.
            # 2020): train the KN bigram model on a content-hash split
            # of the CURRENT frame, score every doc, tertile by mean
            # per-token micro-probability, keep the configured buckets
            # (default drops the tail). Docs too short to score (<2
            # tokens) PASS — no evidence is not bad evidence.
            from pyspark.sql import Window

            from dod_etl_spark.streaming.lm_store import (
                _doc_bigrams,
                kn_score_frame,
            )

            seed = int(st.get("seed", 99))
            cut = int(st.get("trainCut", 2000))
            keep = set(st.get("keep", ["head", "middle"]))
            bad = keep - {"head", "middle", "tail"}
            if bad or not keep:
                raise ValueError(
                    f"ppl_gate keep must be a non-empty subset of "
                    f"head/middle/tail, got {sorted(keep)}"
                )
            bg = _doc_bigrams(df, "doc_id", "text")
            train_ids = df.where(
                hash_bucket(F.col("doc_id"), seed) >= cut
            ).select("doc_id")
            c2 = (
                bg.join(F.broadcast(train_ids), "doc_id", "left_semi")
                .groupBy("w1", "w2")
                .agg(F.count(F.lit(1)).alias("c2"))
                .localCheckpoint(eager=True)
            )
            if c2.limit(1).count() == 0:
                # empty training split (tiny frame or an extreme
                # trainCut): no model means no evidence against ANY
                # doc — the gate passes everything instead of dividing
                # by an empty-model Nbb (ANSI: job failure) or
                # bucketing on NULL scores (arbitrary drops).
                continue
            scored = kn_score_frame(bg, c2)
            w = Window.orderBy(
                F.col("avg_microprob").desc(), F.col("doc_id")
            )
            bucketed = scored.withColumn("tile", F.ntile(3).over(w)).select(
                "doc_id",
                F.when(F.col("tile") == 1, "head")
                .when(F.col("tile") == 2, "middle")
                .otherwise("tail")
                .alias("ppl_bucket"),
            )
            drop_ids = bucketed.filter(
                ~F.col("ppl_bucket").isin(*sorted(keep))
            ).select("doc_id")
            df = df.join(drop_ids, "doc_id", "left_anti")
        elif op == "blocklist_gate":
            terms = [t.lower() for t in st.get("terms", [])]
            if not terms:
                raise ValueError("blocklist_gate needs terms")
            toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
            frac = F.size(
                F.filter(toks, lambda x: x.isin(terms))
            ).cast("double") / F.greatest(F.size(toks), F.lit(1))
            df = df.where(frac <= float(st.get("maxFraction", 0.0)))
        else:  # pragma: no cover - from_json validates
            raise ValueError(f"unknown curation op: {op!r}")
    return df


def compile_curation_audit(
    spark: SparkSession,
    docs: DataFrame,
    spec: CurationSpec,
    embeddings: DataFrame | None = None,
    labeled: DataFrame | None = None,
) -> DataFrame:
    """Diagnostics twin of compile_curation: run the SAME stage
    sequence but return one row per INPUT document with the first
    stage that dropped it (the stage's `op` name, suffixed `#i` with
    its position when a spec repeats an op), or 'kept'. Transforming
    stages (normalize, pii_scrub, segment_dedup, project_tokens) never
    drop and never appear as reasons.

    Mechanics: after every filtering stage the survivor id set
    anti-joins the previous id set; the dropped ids take that stage's
    label. Each filtering stage adds one id-frame checkpoint + one
    anti-join of id columns — audit runs cost roughly 2x the pipeline
    and are a diagnostics mode, not the production path. For the
    flagship spec this attribution is pinned identical to the
    hand-written curation_audit_docs (label-mapped) in
    tests/test_curation_audit.py."""
    ops = [st["op"] for st in spec.stages]

    def label(i: int) -> str:
        op = ops[i]
        return op if ops.count(op) == 1 else f"{op}#{i}"

    df = docs
    holdout_fps: DataFrame | None = None
    prev_ids = docs.select("doc_id").localCheckpoint(eager=True)
    dropped_parts: list[DataFrame] = []
    filtering = {
        "quality_gate",
        "holdout_split",
        "exact_dedup",
        "decontaminate",
        "near_dedup",
        "blocklist_gate",
        "pii_card_gate",
        "ppl_gate",
        "semdedup",
        "classifier_gate",
    }

    for i, st in enumerate(spec.stages):
        op = st["op"]
        one = CurationSpec((st,))
        if op == "holdout_split":
            # replicate inline (compile_curation tracks holdout_fps as
            # side state across stages)
            _require(df, "norm_text", op)
            cut = int(st.get("permille", 100)) * 10
            seed = int(st.get("seed", 7))
            df = df.withColumn("_b", hash_bucket(F.col("doc_id"), seed))
            holdout_fps = (
                df.where(F.col("_b") < cut)
                .select(F.md5(F.col("norm_text").cast("binary")).alias("norm_fp"))
                .distinct()
            )
            df = df.where(F.col("_b") >= cut)
        elif op == "decontaminate":
            if holdout_fps is None:
                raise ValueError("decontaminate needs a holdout_split stage first")
            _require(df, "norm_fp", op)
            df = df.join(F.broadcast(holdout_fps), "norm_fp", "left_anti")
        else:
            df = compile_curation(spark, df, one, embeddings=embeddings, labeled=labeled)
        if op in filtering:
            cur_ids = df.select("doc_id").localCheckpoint(eager=True)
            dropped_parts.append(
                prev_ids.join(cur_ids, "doc_id", "left_anti").select(
                    "doc_id", F.lit(label(i)).alias("reason")
                )
            )
            prev_ids = cur_ids

    out = prev_ids.select("doc_id", F.lit("kept").alias("reason"))
    for part in dropped_parts:
        out = out.unionByName(part)
    return out
