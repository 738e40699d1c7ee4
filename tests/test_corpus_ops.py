"""Hand-fixture pins for the round-8 third-session surface: segment
dedup (both segmenters), bounded-round BFS, golden-record entity
resolution, and integer-moment autocorrelation.

Corpus-level value parity is covered by test_oracle_parity; these pin
the behaviors the synthetic corpus can't exercise (multi-line docs,
empty lines, unreachable nodes, survivorship tiebreaks) against
hand-computed expectations.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dod_etl_spark.operators.graph import bfs_hops
from dod_etl_spark.operators.segment_dedup import segment_dedup, segment_docs


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# --- segment dedup: lines mode (the C4 unit; testdata is single-line) --------


def test_line_dedup_keeps_global_first_occurrence(spark):
    docs = spark.createDataFrame(
        [
            (1, "keep me\nBOILER\nunique a"),
            (2, "BOILER\nunique b\nBOILER"),
            (3, "BOILER"),
        ],
        "doc_id long, text string",
    )
    out = segment_dedup(docs, mode="lines")
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    # BOILER survives only at its global first occurrence: doc 1 pos 2.
    assert got[1]["text_dedup"] == "keep me\nBOILER\nunique a"
    assert (got[1]["n_segs"], got[1]["n_kept"]) == (3, 3)
    # doc 2 loses BOTH copies (cross-doc dup + in-doc repeat).
    assert got[2]["text_dedup"] == "unique b"
    assert (got[2]["n_segs"], got[2]["n_kept"]) == (3, 1)
    # doc 3 loses everything -> empty reassembly, still present.
    assert got[3]["text_dedup"] == ""
    assert (got[3]["n_segs"], got[3]["n_kept"]) == (1, 0)


def test_line_dedup_empty_lines_are_segments(spark):
    docs = spark.createDataFrame(
        [(1, "a\n\nb"), (2, "\nc")], "doc_id long, text string"
    )
    out = segment_dedup(docs, mode="lines")
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    # The empty line is a legitimate (maximally duplicated) segment:
    # doc 1 keeps its pos-2 empty line, doc 2's is deduped away.
    assert got[1]["text_dedup"] == "a\n\nb"
    assert got[2]["text_dedup"] == "c"
    assert got[2]["n_segs"] == 2 and got[2]["n_kept"] == 1


# --- segment dedup: words mode (partial tail segment, empty doc) -------------


def test_word_segments_partial_tail_and_empty_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, ""), (3, "  ")], "doc_id long, text string"
    )
    segs = segment_docs(docs, mode="words", seg_words=2)
    assert _rows(segs, "id", "pos", "seg") == [
        (1, 1, "a b"), (1, 2, "c d"), (1, 3, "e"),
    ]
    out = segment_dedup(docs, mode="words", seg_words=2)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert (got[2]["n_segs"], got[2]["n_kept"], got[2]["text_dedup"]) == (0, 0, "")
    assert (got[3]["n_segs"], got[3]["n_kept"], got[3]["text_dedup"]) == (0, 0, "")
    assert got[1]["text_dedup"] == "a b c d e"


def test_word_segment_dedup_first_occurrence_rule(spark):
    # Same segment "x y" in three docs; only doc 1 pos 1 survives.
    docs = spark.createDataFrame(
        [(1, "x y p q"), (2, "x y r s"), (3, "r s x y")],
        "doc_id long, text string",
    )
    out = segment_dedup(docs, mode="words", seg_words=2)
    got = {r["doc_id"]: r["text_dedup"] for r in out.collect()}
    # doc 2 loses "x y" (doc 1 owns it) but keeps "r s" (doc 2 pos 2
    # precedes doc 3 pos 1 in (doc_id, pos) order).
    assert got == {1: "x y p q", 2: "r s", 3: ""}


# --- BFS ---------------------------------------------------------------------


def _chain_edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_bfs_levels_and_unreachable(spark):
    # 0-1-2-3-4 chain plus isolated 9; seed = {0}.
    edges = _chain_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (9, 9)])
    seeds = spark.createDataFrame([(0,)], "node long")
    out = _rows(bfs_hops(edges, seeds, rounds=3), "node", "hop")
    # Bounded at 3 rounds: node 4 (hop 4) and isolated 9 are absent.
    assert out == [(0, 0), (1, 1), (2, 2), (3, 3)]


def test_bfs_multi_source_takes_min_hop(spark):
    edges = _chain_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    seeds = spark.createDataFrame([(0,), (4,)], "node long")
    out = dict(_rows(bfs_hops(edges, seeds, rounds=4), "node", "hop"))
    assert out == {0: 0, 1: 1, 2: 2, 3: 1, 4: 0}


def test_bfs_converged_extra_round_is_noop(spark):
    edges = _chain_edges(spark, [(0, 1), (1, 2)])
    seeds = spark.createDataFrame([(0,)], "node long")
    a = _rows(bfs_hops(edges, seeds, rounds=2), "node", "hop")
    b = _rows(bfs_hops(edges, seeds, rounds=5), "node", "hop")
    assert a == b == [(0, 0), (1, 1), (2, 2)]


def test_bfs_seed_in_cycle(spark):
    # Cycle 0-1-2-0: hops wrap correctly, no infinite growth.
    edges = _chain_edges(spark, [(0, 1), (1, 2), (2, 0)])
    seeds = spark.createDataFrame([(0,)], "node long")
    out = dict(_rows(bfs_hops(edges, seeds, rounds=4), "node", "hop"))
    assert out == {0: 0, 1: 1, 2: 1}


# --- golden record survivorship ---------------------------------------------


def test_golden_record_survivorship_price_then_partkey(spark, sf_dir):
    # Direct check of the packed-ordinal argmax on the corpus query.
    from dod_etl_spark.queries.corpus_ops import entity_golden_record

    out = entity_golden_record(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    n_names = part.select("p_name").distinct().count()
    # Every distinct name lands in exactly one cluster.
    assert out.agg(F.sum("n_names")).first()[0] == n_names
    # Golden price is the cluster max (tiebreak can't lower it).
    joined = (
        part.join(
            out.select("cluster_id", "golden_price"),
            part.p_name == F.col("cluster_id"),
        )
    )
    bad = joined.filter(
        F.floor(F.col("p_retailprice") * 100 + 0.5)
        > F.floor(F.col("golden_price") * 100 + 0.5)
    ).count()
    assert bad == 0


# --- autocorrelation ---------------------------------------------------------


def test_autocorrelation_matches_numpy(spark, tmp_path):
    # Deterministic synthetic series, two users, one type; pin lag-1..3
    # ACF against numpy corrcoef over the same lag pairs.
    import pandas as pd

    rng = np.random.RandomState(7)
    rows = []
    eid = 0
    series = {}
    for uid in (1, 2):
        vals = np.round(rng.uniform(1, 50, size=40), 2)
        series[uid] = np.floor(vals * 100 + 0.5).astype(np.int64)
        for i, v in enumerate(vals):
            rows.append((eid, pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                         uid, "click", float(v), "{}"))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)
    # Build the expected from the integer series exactly as the query does.
    import shutil, os
    fx = tmp_path / "fx"
    os.makedirs(fx, exist_ok=True)
    shutil.copy(path, fx / "events.parquet")
    from dod_etl_spark.queries.corpus_ops import value_autocorrelation

    out = value_autocorrelation(spark, str(fx)).collect()
    got = {(r["event_type"], r["lag_k"]): (r["n_pairs"], r["acf"]) for r in out}
    for lag in (1, 2, 3):
        prevs, curs = [], []
        for uid in (1, 2):
            y = series[uid]
            prevs.extend(y[:-lag])
            curs.extend(y[lag:])
        n_pairs, acf = got[("click", lag)]
        assert n_pairs == len(prevs)
        expected = np.corrcoef(np.array(prevs, dtype=float),
                               np.array(curs, dtype=float))[0, 1]
        assert abs(acf - expected) < 1e-5
