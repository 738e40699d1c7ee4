"""Data-quality constraint engine semantics (operators/dq.py) and
winnowing fingerprint guarantees (operators/text_dedup.py).

Oracle parity for the registered queries (dq_checks_events,
winnow_fingerprints_docs, winnow_dup_pairs, lm_score_docs,
source_drift_tvd) is auto-covered by tests/test_oracle_parity.py; this
file pins the operator-level contracts parity can't see.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.operators import dq
from dod_etl_spark.operators.text_dedup import (
    winnow_fingerprints,
    winnow_shared_pairs,
)


def _report(df, suite):
    return {
        r["constraint"]: (r["metric"], r["passed"])
        for r in dq.run_checks(df, suite).collect()
    }


def test_dq_basic_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "a", 30.0), (3, None, 40.0)],
        "id INT, cat STRING, v DOUBLE",
    )
    rep = _report(
        df,
        [
            dq.row_count(lo=1),
            dq.completeness("cat", min_ratio=1.0),
            dq.uniqueness("id", min_ratio=1.0),
            dq.min_value("v", lo=0.0),
            dq.max_value("v", hi=35.0),
            dq.in_set("cat", ["a", "b"], min_ratio=0.7),
        ],
    )
    assert rep["row_count"] == (4.0, 1)
    assert rep["completeness(cat)"] == (0.75, 0)
    assert rep["uniqueness(id)"] == (0.75, 0)
    assert rep["min(v)"] == (10.0, 1)
    assert rep["max(v)"] == (40.0, 0)
    # 3 of 4 rows in-set (NULL cat is not in-set)
    assert rep["in_set(cat)"] == (0.75, 1)


def test_dq_empty_frame_vacuous_ratios(spark):
    df = spark.createDataFrame([], "id INT, cat STRING")
    rep = _report(
        df,
        [
            dq.row_count(lo=1),
            dq.completeness("cat"),
            dq.uniqueness("id"),
            dq.min_value("id", lo=0.0),
        ],
    )
    # 0/0 ratios are vacuously 1.0 (pass); min() over empty is NULL -> fail.
    assert rep["row_count"] == (0.0, 0)
    assert rep["completeness(cat)"] == (1.0, 1)
    assert rep["uniqueness(id)"] == (1.0, 1)
    assert rep["min(id)"] == (None, 0)


def test_dq_single_aggregation_pass(spark):
    """The whole suite compiles to ONE Aggregate over one scan — no
    per-constraint jobs, no joins."""
    df = spark.range(100).withColumn("v", F.col("id").cast("double"))
    report = dq.run_checks(
        df, [dq.row_count(), dq.completeness("v"), dq.min_value("v", lo=0.0)]
    )
    plan = report._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1, plan
    assert "Join" not in plan, plan


def test_dq_approx_uniqueness_mode(spark):
    df = spark.range(1000).withColumn("k", F.col("id") % 100)
    rep = _report(df, [dq.uniqueness("k", min_ratio=0.05, approx=True)])
    metric, passed = rep["uniqueness(k)"]
    assert passed == 1
    assert 0.08 <= metric <= 0.12  # ~100/1000 within HLL error


def test_dq_gate_raises_and_passes(spark):
    df = spark.createDataFrame([(1,), (1,)], "id INT")
    with pytest.raises(ValueError, match="uniqueness"):
        dq.assert_checks(df, [dq.uniqueness("id")])
    out = dq.assert_checks(df, [dq.row_count(lo=2)])
    assert out.count() == 2


def test_dq_rejects_bad_suites(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="empty"):
        dq.run_checks(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        dq.run_checks(df, [dq.row_count(), dq.row_count()])


# --- Winnowing ---------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_winnow_shared_substring_guarantee(spark):
    """Any shared substring of length >= k + w - 1 (= 11) must produce
    at least one shared selected fingerprint — the winnowing paper's
    core guarantee, independent of surrounding text."""
    shared = "xqzvbnmwklp"  # 11 chars = k + w - 1
    docs = _docs(
        spark,
        [
            (1, f"aaaa bbbb cccc {shared} dddd eeee"),
            (2, f"totally different prefix {shared} and suffix here"),
        ],
    )
    fps = winnow_fingerprints(docs, k=8, window=4)
    by_doc = {
        r["doc_id"]: set(r["s"])
        for r in fps.groupBy("doc_id").agg(F.collect_set("fp").alias("s")).collect()
    }
    assert by_doc[1] & by_doc[2], "shared 11-char substring produced no shared fp"


def test_winnow_short_doc_still_fingerprints(spark):
    docs = _docs(spark, [(1, "ab")])  # shorter than one k-gram
    fps = winnow_fingerprints(docs, k=8, window=4).collect()
    assert len(fps) == 1


def test_winnow_density(spark):
    """Selected-set size tracks the textbook 2/(w+1) density on random
    text (loose band: positional dedup pushes it below 1.5x)."""
    import random

    rng = random.Random(7)
    text = " ".join(
        "".join(rng.choice("abcdefghijklmnop") for _ in range(6)) for _ in range(200)
    )
    docs = _docs(spark, [(1, text)])
    n_grams = len(text) - 7
    n_sel = winnow_fingerprints(docs, k=8, window=4).count()
    expected = 2.0 * n_grams / 5.0
    assert 0.4 * expected <= n_sel <= 1.5 * expected, (n_sel, expected)


def test_winnow_pairs_detect_copy_not_disjoint(spark):
    copied = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(
        spark,
        [
            (1, f"intro paragraph one {copied} closing words"),
            (2, f"unrelated opening {copied} different ending"),
            (3, "completely disjoint content with nothing in common zz"),
        ],
    )
    pairs = {
        (r["id_1"], r["id_2"])
        for r in winnow_shared_pairs(docs, k=8, window=4, min_shared=3).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_winnow_bucket_cap_drops_boilerplate(spark):
    """A fingerprint shared by more docs than the cap contributes no
    pairs (the |bucket|^2 skew guard)."""
    boiler = "common boilerplate sentence shared by every document here"
    docs = _docs(spark, [(i, f"doc {i} says {boiler}") for i in range(1, 7)])
    capped = winnow_shared_pairs(
        docs, k=8, window=4, min_shared=1, max_bucket_size=3
    ).count()
    uncapped = winnow_shared_pairs(
        docs, k=8, window=4, min_shared=1, max_bucket_size=1000
    ).count()
    assert uncapped == 15  # all C(6,2) pairs share the boilerplate
    assert capped < uncapped


# --- Config-surface compilation / builder wiring ----------------------------


def test_compile_spec_roundtrip(spark):
    raw = [
        {"kind": "row_count", "lo": 1},
        {"kind": "completeness", "col": "cat", "min": 0.5},
        {"kind": "uniqueness", "col": "id"},
        {"kind": "min", "col": "v", "lo": 0.0},
        {"kind": "max", "col": "v", "hi": 100.0},
        {"kind": "in_set", "col": "cat", "values": ["a", "b"], "min": 0.5},
    ]
    suite = dq.compile_spec(raw)
    assert [c.name for c in suite] == [
        "row_count",
        "completeness(cat)",
        "uniqueness(id)",
        "min(v)",
        "max(v)",
        "in_set(cat)",
    ]
    df = spark.createDataFrame([(1, "a", 5.0), (2, "b", 6.0)], "id INT, cat STRING, v DOUBLE")
    rep = {r["constraint"]: r["passed"] for r in dq.run_checks(df, suite).collect()}
    assert all(v == 1 for v in rep.values())
    with pytest.raises(ValueError, match="unknown kind"):
        dq.compile_spec([{"kind": "nope"}])


def test_builder_quality_gate_from_spec(spark):
    from dod_etl_spark.config import GlobalSpec, PipelineSpec, TableSpec
    from dod_etl_spark.plans.builder import prepare_event_stream, quality_gate, quality_report

    checks = [
        {"kind": "completeness", "col": "v", "min": 1.0},
        {"kind": "min", "col": "v", "lo": 0.0},
    ]
    spec = PipelineSpec(
        global_spec=GlobalSpec(),
        tables=(
            TableSpec(
                tableName="EVENTS",
                isOperational=True,
                qualityChecks=checks,
            ),
        ),
    )
    good = spark.createDataFrame([(1.0,), (2.0,)], "v DOUBLE")
    bad = spark.createDataFrame([(-1.0,), (None,)], "v DOUBLE")

    # enforce: batch path raises on the bad load, passes the good one.
    assert prepare_event_stream(spec, good).count() == 2
    with pytest.raises(ValueError, match="constraints failed"):
        prepare_event_stream(spec, bad).count()

    # foreachBatch twin behaves identically per micro-batch.
    gate = quality_gate(spec)
    assert gate(good).count() == 2
    with pytest.raises(ValueError, match="constraints failed"):
        gate(bad)

    # report mode: nothing raises, the report carries the failures.
    rep = {r["constraint"]: r["passed"] for r in quality_report(spark, spec, bad).collect()}
    assert rep == {"completeness(v)": 0, "min(v)": 0}


# --- CUSUM change-point detection power --------------------------------------


def test_cusum_detects_injected_rate_shift(spark):
    """A 3x sustained rate shift in the second half of one type's
    timeline must raise alarms for THAT type and none for the steady
    type — detection power the all-uniform oracle data can't show."""
    import datetime

    rows = []
    base = datetime.datetime(2024, 1, 1)
    eid = 0
    for h in range(200):
        ts = base + datetime.timedelta(hours=h)
        for _ in range(3):  # steady: 3/hour
            rows.append((eid, ts, 1, "steady", 1.0, "{}")); eid += 1
        rate = 9 if h >= 100 else 3  # shifted: 3 -> 9/hour at h=100
        for _ in range(rate):
            rows.append((eid, ts, 1, "shifted", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        from dod_etl_spark.queries import QUERIES

        out = {
            r["event_type"]: r["n_alarms"]
            for r in QUERIES["cusum_changepoints"](spark, d).collect()
        }
    assert out["steady"] == 0
    assert out["shifted"] > 0
