"""Incremental connected-components store (streaming/cluster_store.py):
after every micro-batch, the stored labels must equal a from-scratch
min-label CC over the union of all edges added so far; replays are
no-ops; a torn batch is safe to replay WITHOUT repair(); fold/compact
never change labels; the serve plan has no store-side exchange."""

from __future__ import annotations

import shutil
import uuid
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.operators.graph import connected_components
from dod_etl_spark.streaming.cluster_store import ClusterStore


@pytest.fixture()
def store(spark):
    tag = uuid.uuid4().hex[:8]
    s = ClusterStore(
        spark,
        labels_table=f"cc_l_{tag}",
        remaps_table=f"cc_r_{tag}",
        commits_table=f"cc_c_{tag}",
        n_buckets=4,
    )
    yield s
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (s.labels_table, s.remaps_table, s.commits_table):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}__compacting")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _labels(store) -> dict[int, int]:
    return {r["node"]: r["comp"] for r in store.current_labels().collect()}


def _batch_cc(spark, all_pairs) -> dict[int, int]:
    e = _edges(spark, all_pairs)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    comp = connected_components(nodes, e, src_col="src", dst_col="dst")
    return {r["node"]: r["component"] for r in comp.collect()}


# Batches engineered to force every merge topology: chain-shaped merges
# that create remap chains (ever-smaller minima), a cross-batch merge
# of two big components, singleton registration via self-loop, and a
# batch that merges three stored components at once through a new node.
BATCHES = [
    [(10, 11), (20, 21), (30, 31), (40, 40)],      # three comps + singleton
    [(11, 20)],                                    # merge {10,11}+{20,21} -> 10
    [(5, 21)],                                     # new min 5 joins -> remap 10->5
    [(3, 5), (30, 50)],                            # chain deeper: 5->3; grow 30s
    [(99, 31), (99, 40), (99, 3)],                 # one new node merges all
    [(7, 7), (100, 101)],                          # singleton + fresh comp
]


def test_prefix_equivalence(spark, store):
    """Headline contract: incremental labels == batch CC at every prefix."""
    seen: list[tuple[int, int]] = []
    for i, batch in enumerate(BATCHES):
        out = store.add_edges(_edges(spark, batch), batch_id=i)
        assert not out["replay"]
        seen.extend(batch)
        assert _labels(store) == _batch_cc(spark, seen), f"diverged after batch {i}"


def test_replay_is_noop(spark, store):
    for i, batch in enumerate(BATCHES[:3]):
        store.add_edges(_edges(spark, batch), batch_id=i)
    before = _labels(store)
    out = store.add_edges(_edges(spark, BATCHES[1]), batch_id=1)
    assert out == {"new_nodes": 0, "merges": 0, "replay": True}
    assert _labels(store) == before


def _tear(store, monkeypatch, edges, batch_id):
    """Authentic torn batch on the REAL store: the data appends land,
    the commit-record write 'crashes'."""

    def boom(batch_id, n_new, n_merges):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(store, "_write_commit", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        store.add_edges(edges, batch_id=batch_id)
    monkeypatch.undo()


def test_torn_batch_replay_without_repair(spark, store, monkeypatch):
    """Crash between the appends and the commit record: the orphan rows
    are invisible, and replaying the same batch_id (the foreachBatch
    restart contract) converges to the correct committed state with no
    duplicate label rows."""
    store.add_edges(_edges(spark, BATCHES[0]), batch_id=0)
    _tear(store, monkeypatch, _edges(spark, BATCHES[1]), batch_id=1)

    # Orphans exist on disk but are invisible: batch 0 state only.
    assert spark.table(store.remaps_table).count() >= 1
    assert _labels(store) == _batch_cc(spark, BATCHES[0])

    # Replay the torn batch — no repair() first.
    out = store.add_edges(_edges(spark, BATCHES[1]), batch_id=1)
    assert not out["replay"]
    assert _labels(store) == _batch_cc(spark, BATCHES[0] + BATCHES[1])
    # one label row per node, no duplicates from the orphan window
    lbl = spark.table(store.labels_table)
    assert lbl.count() == lbl.select("node").distinct().count()
    # one remap row per old_comp, no duplicates either
    rm = spark.table(store.remaps_table)
    assert rm.count() == rm.select("old_comp").distinct().count()


def test_repair_drops_orphans(spark, store, monkeypatch):
    store.add_edges(_edges(spark, BATCHES[0]), batch_id=0)
    _tear(store, monkeypatch, _edges(spark, BATCHES[1]), batch_id=1)
    removed = store.repair()
    assert removed[store.remaps_table] >= 1  # batch 1 merged two comps
    assert _labels(store) == _batch_cc(spark, BATCHES[0])
    # after repair, a DIFFERENT batch may safely run first
    store.add_edges(_edges(spark, BATCHES[2]), batch_id=2)
    assert _labels(store) == _batch_cc(spark, BATCHES[0] + BATCHES[2])


def test_fold_and_compact_preserve_labels(spark, store):
    seen: list[tuple[int, int]] = []
    for i, batch in enumerate(BATCHES):
        store.add_edges(_edges(spark, batch), batch_id=i)
        seen.extend(batch)
    before = _labels(store)
    folded = store.fold_remaps()
    assert folded >= 2  # the chain batches really produced remaps
    assert _labels(store) == before
    assert spark.table(store.remaps_table).count() == 0
    out = store.compact()
    assert out["remaps_folded"] == 0
    assert _labels(store) == before
    # fold is idempotent
    assert store.fold_remaps() == 0


def test_component_of_and_counts(spark, store):
    for i, batch in enumerate(BATCHES):
        store.add_edges(_edges(spark, batch), batch_id=i)
    req = spark.createDataFrame([(99,), (40,), (12345,)], "node long")
    got = {r["node"]: r["comp"] for r in store.component_of(req).collect()}
    expect = _batch_cc(spark, [p for b in BATCHES for p in b])
    assert got[99] == expect[99] and got[40] == expect[40]
    assert got[12345] is None
    assert store.n_nodes() == len(expect)
    assert store.n_components() == len(set(expect.values()))


def test_serve_plan_no_store_side_exchange(spark, store):
    """The labels scan (the frame that grows with the corpus) reaches
    the remap join via broadcast — no Exchange anywhere at serve time."""
    import re

    for i, batch in enumerate(BATCHES[:4]):
        store.add_edges(_edges(spark, batch), batch_id=i)
    df = store.current_labels()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert not re.findall(r"\bExchange\b[^\n(]*\(\d+\)", plan), plan
    assert "BroadcastHashJoin" in plan
