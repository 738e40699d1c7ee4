"""Per-document curation audit (queries/llm.py curation_audit_docs):
the reason labels must partition the corpus, 'kept' must equal the
pipeline's survivor set exactly, and every stage label must be
reachable (the synthetic corpus never fires exact_dup/decontaminated,
so a hand fixture exercises the full priority chain)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dod_etl_spark.operators.sampling import hash_bucket
from dod_etl_spark.queries.llm import curation_audit_docs, curation_pipeline_docs
from tests.conftest import SF_ORACLE


def _buckets(spark, n=300):
    rows = (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), hash_bucket(F.col("id"), 7).alias("b"))
        .collect()
    )
    holdout = [r["doc_id"] for r in rows if r["b"] < 1000]
    train = [r["doc_id"] for r in rows if r["b"] >= 1000]
    return holdout, train


def test_audit_partitions_corpus_and_kept_matches_pipeline(spark):
    audit = curation_audit_docs(spark, SF_ORACLE)
    n_docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").count()
    counts = {r["reason"]: r["cnt"] for r in
              audit.groupBy("reason").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert sum(counts.values()) == n_docs  # exactly one reason per doc
    assert audit.select("doc_id").distinct().count() == n_docs
    assert counts["kept"] == curation_pipeline_docs(spark, SF_ORACLE).count()
    assert set(counts) <= {
        "holdout_split", "quality_gate", "exact_dup",
        "decontaminated", "near_dup", "kept",
    }


def test_audit_all_six_reasons_on_fixture(spark, tmp_path):
    holdout, train = _buckets(spark)
    h1 = holdout[0]
    t_dup_w, t_dup_l = sorted(train[:2])  # same text: winner/loser
    t_decon, t_gate, t_near_a, t_near_b, t_kept = train[2:7]

    base = " ".join(f"w{i % 23}" for i in range(120))
    near_a = base + " endalpha"
    near_b = base + " endbeta"
    # long enough (>= ~26 tokens) that q passes the 0.25 gate — the
    # decon label must come from the fp collision, not the quality cut
    shared = "shared benchmark sentence that leaks into the holdout split " + " ".join(
        f"s{i}" for i in range(40)
    )
    rows = [
        (h1, shared),                       # holdout_split (also decon source)
        (t_dup_w, "duplicate text body " + base),
        (t_dup_l, "duplicate text body " + base),  # exact_dup (loser)
        (t_decon, shared),                  # decontaminated (fp in holdout)
        (t_gate, "x ......................"),  # quality_gate (punct-heavy)
        (min(t_near_a, t_near_b), near_a),  # near-dup winner
        (max(t_near_a, t_near_b), near_b),  # near_dup (loser)
        (t_kept, "a perfectly unique document " + " ".join(f"u{i}" for i in range(60))),
    ]
    d = tmp_path / "auditfix"
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    got = {r["doc_id"]: r["reason"] for r in curation_audit_docs(spark, str(d)).collect()}
    assert got[h1] == "holdout_split"
    assert got[t_dup_w] == "kept" or got[t_dup_w] == "near_dup"  # winner survives exact dedup
    assert got[t_dup_l] == "exact_dup"
    assert got[t_decon] == "decontaminated"
    assert got[t_gate] == "quality_gate"
    assert got[max(t_near_a, t_near_b)] == "near_dup"
    assert got[min(t_near_a, t_near_b)] in ("kept", "near_dup")
    assert got[t_kept] == "kept"
    assert set(got.values()) >= {
        "holdout_split", "quality_gate", "exact_dup", "decontaminated", "near_dup", "kept",
    }


def test_spec_audit_matches_hand_audit_on_flagship(spark):
    """The generic spec-compiler audit (compile_curation_audit) must
    attribute every document to the same stage the hand-written
    flagship audit does (label-mapped: the spec's op names vs the
    audit's reason names), and 'kept' must equal the compiled
    pipeline's survivor ids."""
    from dod_etl_spark.catalog import load_table
    from dod_etl_spark.curation import (
        CurationSpec,
        compile_curation,
        compile_curation_audit,
    )
    from tests.test_curation_spec import FLAGSHIP_SPEC
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    spec = CurationSpec.from_json(FLAGSHIP_SPEC)
    spec_audit = {
        r["doc_id"]: r["reason"]
        for r in compile_curation_audit(spark, docs, spec).collect()
    }
    hand = {
        r["doc_id"]: r["reason"]
        for r in curation_audit_docs(spark, SF_SMOKE).collect()
    }
    mapping = {
        "exact_dedup": "exact_dup",
        "decontaminate": "decontaminated",
        "near_dedup": "near_dup",
    }
    assert set(spec_audit) == set(hand)
    for doc_id, reason in spec_audit.items():
        assert mapping.get(reason, reason) == hand[doc_id], doc_id

    kept_ids = {d for d, r in spec_audit.items() if r == "kept"}
    pipe_ids = {
        r["doc_id"] for r in compile_curation(spark, docs, spec).collect()
    }
    assert kept_ids == pipe_ids


def test_spec_audit_generic_stages(spark):
    """Audit labels for the generic gates on a hand corpus: blocklist
    drops, repeated ops get #i suffixes, transforming stages never
    appear."""
    from dod_etl_spark.curation import CurationSpec, compile_curation_audit

    spec = CurationSpec.from_json(
        '{"stages": ['
        '{"op": "blocklist_gate", "terms": ["bad"], "maxFraction": 0.0},'
        '{"op": "normalize"},'
        '{"op": "quality_gate", "minScore": 0.1},'
        '{"op": "blocklist_gate", "terms": ["worse"], "maxFraction": 0.0}'
        "]}"
    )
    long = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, long),                      # kept
            (2, "bad " + long),             # first blocklist
            (3, "x ..................."),   # quality gate
            (4, "worse " + long),           # second blocklist
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["reason"]
        for r in compile_curation_audit(spark, docs, spec).collect()
    }
    assert got == {
        1: "kept",
        2: "blocklist_gate#0",
        3: "quality_gate",
        4: "blocklist_gate#3",
    }
