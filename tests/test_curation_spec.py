"""Declarative curation specs (dod_etl_spark/curation.py): the
JSON-compiled pipeline must be bit-identical to the hand-composed
flagship, stage validation must fail fast, and the generic stages
(pii_scrub, segment_dedup, blocklist_gate) must match their operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.catalog import load_table
from dod_etl_spark.curation import CurationSpec, compile_curation
from tests.conftest import SF_SMOKE

FLAGSHIP_SPEC = """{
  "stages": [
    {"op": "normalize"},
    {"op": "holdout_split", "permille": 100, "seed": 7},
    {"op": "quality_gate", "minScore": 0.25},
    {"op": "exact_dedup", "on": "norm_text"},
    {"op": "decontaminate"},
    {"op": "near_dedup", "numHashes": 8, "bandSize": 4, "shingleLen": 5},
    {"op": "project_tokens"}
  ]
}"""


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_flagship_spec_matches_hand_composition(spark):
    """The declarative path IS the flagship: same stages, same operator
    calls, bit-identical output — the no-drift contract."""
    from dod_etl_spark.queries.llm import curation_pipeline_docs

    docs = load_table(spark, SF_SMOKE, "documents")
    spec = CurationSpec.from_json(FLAGSHIP_SPEC)
    got = compile_curation(spark, docs, spec)
    want = curation_pipeline_docs(spark, SF_SMOKE)
    assert sorted(got.columns) == sorted(want.columns)
    assert _rows(got.select(*sorted(got.columns))) == _rows(
        want.select(*sorted(want.columns))
    )


def test_unknown_op_rejected():
    with pytest.raises(ValueError, match="unknown curation op"):
        CurationSpec.from_json('{"stages": [{"op": "frobnicate"}]}')


def test_missing_producer_fails_fast(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    spec = CurationSpec.from_json(
        '{"stages": [{"op": "holdout_split"}]}'
    )
    with pytest.raises(ValueError, match="norm_text"):
        compile_curation(spark, docs, spec)
    with pytest.raises(ValueError, match="holdout_split"):
        compile_curation(
            spark,
            docs,
            CurationSpec.from_json(
                '{"stages": [{"op": "normalize"}, {"op": "exact_dedup"},'
                ' {"op": "decontaminate"}]}'
            ),
        )


def test_pii_and_segment_stages_match_operators(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact bob@corp.example now x y z BOILER SEG HERE"),
            (2, "BOILER SEG HERE plus unique tail words go here ok"),
        ],
        "doc_id long, text string",
    )
    spec = CurationSpec.from_json(
        '{"stages": [{"op": "pii_scrub"},'
        ' {"op": "segment_dedup", "segWords": 3}]}'
    )
    out = {r["doc_id"]: r["text"] for r in compile_curation(spark, docs, spec).collect()}
    # email scrubbed, then 3-word segments deduped globally
    assert "<EMAIL>" in out[1]
    assert "bob@corp.example" not in out[1]
    from dod_etl_spark.operators.segment_dedup import segment_dedup
    from dod_etl_spark.queries.llm import _PII_PATTERNS

    clean = F.col("text")
    for _, pat, repl in _PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    want = {
        r["doc_id"]: r["text_dedup"]
        for r in segment_dedup(
            docs.withColumn("text", clean), mode="words", seg_words=3
        ).collect()
    }
    assert out == want


def test_blocklist_gate(spark):
    docs = spark.createDataFrame(
        [(1, "clean words only here"), (2, "badword everywhere badword spam")],
        "doc_id long, text string",
    )
    spec = CurationSpec.from_json(
        '{"stages": [{"op": "blocklist_gate", "terms": ["badword"],'
        ' "maxFraction": 0.1}]}'
    )
    out = compile_curation(spark, docs, spec)
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_pii_card_gate(spark):
    """The Luhn compliance gate drops exactly the docs carrying a
    VALID card number (checksum decides, not the digit-run regex), and
    the audit compiler attributes them to the stage."""
    from dod_etl_spark.curation import compile_curation_audit

    docs = spark.createDataFrame(
        [
            (1, "pay 4111111111111111 now"),   # valid -> dropped
            (2, "bad 4111111111111112 here"),  # digit run, bad checksum -> kept
            (3, "no numbers at all"),
            (4, "amex 378282246310005"),        # valid -> dropped
            (5, None),                           # null text -> PASSES (no card)
            (6, "order 12345678901234567890123"),  # 23-digit run: not a card
        ],
        "doc_id long, text string",
    )
    spec = CurationSpec.from_json('{"stages": [{"op": "pii_card_gate"}]}')
    kept = sorted(r["doc_id"] for r in compile_curation(spark, docs, spec).collect())
    assert kept == [2, 3, 5, 6]
    audit = {
        r["doc_id"]: r["reason"]
        for r in compile_curation_audit(spark, docs, spec).collect()
    }
    assert audit == {
        1: "pii_card_gate",
        2: "kept",
        3: "kept",
        4: "pii_card_gate",
        5: "kept",
        6: "kept",
    }


def test_ppl_gate(spark):
    """The CCNet perplexity gate drops the gibberish tertile: fluent
    docs share common bigrams (high mean micro-probability), the
    token-soup docs share none. One-token docs can't be scored and
    PASS. The audit attributes the drops."""
    from dod_etl_spark.curation import compile_curation_audit

    rows = []
    for i in range(12):
        rows.append((i, "the cat sat on the mat and the cat sat again"))
    for i in range(12, 18):
        rows.append((i, f"zq{i}a wxj{i} qqv{i}b kpz{i} vnm{i}c jjr{i}"))
    rows.append((99, "solo"))  # 1 token: unscorable -> passes
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spec = CurationSpec.from_json('{"stages": [{"op": "ppl_gate"}]}')
    kept = sorted(r["doc_id"] for r in compile_curation(spark, docs, spec).collect())
    dropped = sorted(set(r[0] for r in rows) - set(kept))
    assert 99 in kept
    assert len(dropped) == 6  # exactly the tail tertile of 18 scored
    assert all(d >= 12 for d in dropped), dropped  # all gibberish
    audit = {
        r["doc_id"]: r["reason"]
        for r in compile_curation_audit(spark, docs, spec).collect()
    }
    assert all(audit[d] == "ppl_gate" for d in dropped)
    assert audit[99] == "kept"

    with pytest.raises(ValueError, match="ppl_gate keep"):
        compile_curation(
            spark, docs,
            CurationSpec.from_json('{"stages": [{"op": "ppl_gate", "keep": []}]}'),
        )


def test_semdedup_stage(spark):
    """SemDeDup as a curation stage: the embeddings side frame decides
    which docs are semantic duplicates; docs without an embedding
    pass; missing side frame fails fast."""
    from dod_etl_spark.curation import compile_curation_audit

    docs = spark.createDataFrame(
        [(i, f"document number {i}") for i in (0, 1, 10, 11, 50)],
        "doc_id long, text string",
    )
    # 0/1 are the cell seeds; 10 duplicates 0's direction; 11 is far;
    # doc 50 has no embedding
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (10, [0.95, 0.05, 0.0, 0.0]),
            (11, [0.0, 0.1, 0.95, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    spec = CurationSpec.from_json(
        '{"stages": [{"op": "semdedup", "threshold": 0.9, "nCells": 2}]}'
    )
    kept = sorted(
        r["doc_id"]
        for r in compile_curation(spark, docs, spec, embeddings=emb).collect()
    )
    assert kept == [0, 1, 11, 50]
    audit = {
        r["doc_id"]: r["reason"]
        for r in compile_curation_audit(spark, docs, spec, embeddings=emb).collect()
    }
    assert audit == {0: "kept", 1: "kept", 10: "semdedup", 11: "kept", 50: "kept"}
    with pytest.raises(ValueError, match="embeddings"):
        compile_curation(spark, docs, spec)


def test_ppl_gate_empty_training_split_passes_everything(spark):
    """trainCut above every bucket leaves no model: the gate must pass
    all docs (no evidence) instead of dividing by an empty-model Nbb
    or bucketing on NULL scores."""
    docs = spark.createDataFrame(
        [(i, f"some text number {i} here") for i in range(9)],
        "doc_id long, text string",
    )
    spec = CurationSpec.from_json(
        '{"stages": [{"op": "ppl_gate", "trainCut": 10000}]}'
    )
    kept = sorted(r["doc_id"] for r in compile_curation(spark, docs, spec).collect())
    assert kept == list(range(9))


def test_classifier_gate(spark):
    """The reference-corpus quality classifier: trained on a labeled
    seed (good/spam vocabularies), it keeps docs predicted 'good',
    drops predicted 'spam', passes docs with no in-vocabulary token,
    and fails fast without the side frame or a keep list."""
    from dod_etl_spark.curation import compile_curation_audit

    labeled = spark.createDataFrame(
        [
            (100, "good", "insightful analysis of the quarterly report"),
            (101, "good", "detailed report with careful analysis inside"),
            (102, "spam", "click here winner prize free money"),
            (103, "spam", "free prize click now winner"),
        ],
        "doc_id long, cls string, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "a careful analysis of the report"),
            (2, "click for your free prize winner"),
            (3, "xylophone zebra quux"),  # no in-vocab token -> passes
        ],
        "doc_id long, text string",
    )
    spec = CurationSpec.from_json(
        '{"stages": [{"op": "classifier_gate", "keep": ["good"]}]}'
    )
    kept = sorted(
        r["doc_id"]
        for r in compile_curation(spark, docs, spec, labeled=labeled).collect()
    )
    assert kept == [1, 3]
    audit = {
        r["doc_id"]: r["reason"]
        for r in compile_curation_audit(spark, docs, spec, labeled=labeled).collect()
    }
    assert audit == {1: "kept", 2: "classifier_gate", 3: "kept"}
    with pytest.raises(ValueError, match="labeled"):
        compile_curation(spark, docs, spec)
    with pytest.raises(ValueError, match="keep"):
        compile_curation(
            spark, docs,
            CurationSpec.from_json('{"stages": [{"op": "classifier_gate"}]}'),
            labeled=labeled,
        )
