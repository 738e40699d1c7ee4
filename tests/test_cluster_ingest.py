"""Streaming corpus clustering (streaming/cluster_ingest.py): the
incremental labels must equal the batch clustering
(minhash_cluster_edges -> dedup_cluster_assignments) over everything
ingested so far, at every prefix; exact dups drop unregistered;
history near-dups are suppressed but attributed; replays (committed
and torn) converge bit-identically."""

from __future__ import annotations

import shutil
import uuid
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.operators.graph import dedup_cluster_assignments
from dod_etl_spark.operators.text_dedup import minhash_cluster_edges
from dod_etl_spark.streaming.cluster_ingest import ClusteredIngest

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain in "
    "spain stays mainly on the plain and stream processing keeps state"
)
ALT = (
    "completely different material with no shared shingles anywhere "
    "zebra xylophone quartz vortex jigsaw blitz nymph fjord gryphon"
)

# (doc_id, text) in three micro-batches. 1/2 paraphrase pair split
# across batches; 3 exact dup of 1; 5 unique; 6 paraphrase of 2.
BATCHES = [
    [(1, BASE), (5, ALT)],
    [(2, BASE[:-6] + " cats!"), (3, BASE)],
    [(6, BASE[:-12] + " elephants!!"), (7, "tiny snippet of text")],
]


@pytest.fixture()
def store(spark):
    s = ClusteredIngest(spark, prefix=f"ci_{uuid.uuid4().hex[:8]}", n_buckets=4)
    yield s
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (
        s.bands_table,
        s.fps_table,
        s.cluster.labels_table,
        s.cluster.remaps_table,
        s.cluster.commits_table,
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}__compacting")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _twin(spark, rows) -> dict[int, int]:
    """Batch clustering over the registered (non-exact-dup) corpus,
    with the SAME minhash parameters the ingest uses."""
    docs = _df(spark, rows)
    edges = minhash_cluster_edges(
        docs, num_hashes=8, band_size=2, shingle_len=5, hash_fn="md5"
    )
    comp = dedup_cluster_assignments(docs, edges, pair_cols=("id_1", "id_2"))
    return {r["doc_id"]: r["cluster_id"] for r in comp.collect()}


def _labels(store) -> dict[int, int]:
    return {r["node"]: r["comp"] for r in store.labels().collect()}


def _registered(batches_so_far):
    """Corpus minus exact duplicates of earlier content (doc 3)."""
    seen_text, out = set(), []
    for b in batches_so_far:
        for i, t in b:
            if t not in seen_text:
                seen_text.add(t)
                out.append((i, t))
    return out


def test_prefix_equivalence_with_batch_twin(spark, store):
    """Headline: after every micro-batch the incremental labels equal
    the from-scratch batch clustering of everything registered."""
    for bi, batch in enumerate(BATCHES):
        store.ingest_batch(_df(spark, batch), batch_id=bi)
        expect = _twin(spark, _registered(BATCHES[: bi + 1]))
        assert _labels(store) == expect, f"diverged after batch {bi}"


def test_edge_check_paraphrases_really_collide(spark):
    """Meta-check: the fixture's paraphrase pairs DO share bands (so
    the equivalence test above is not vacuously all-singletons)."""
    rows = _registered(BATCHES)
    expect = _twin(spark, rows)
    assert expect[2] == expect[1]  # cross-batch paraphrase merged
    assert expect[6] == expect[1]  # second paraphrase in same cluster
    assert expect[5] != expect[1]  # unrelated doc separate


def test_exact_dup_suppressed_unregistered(spark, store):
    store.ingest_batch(_df(spark, BATCHES[0]), batch_id=0)
    out = store.ingest_batch(_df(spark, BATCHES[1]), batch_id=1)
    emitted = {r["doc_id"] for r in out.collect()}
    assert 3 not in emitted  # exact dup of doc 1
    assert 3 not in _labels(store)  # and never registered


def test_history_near_dup_suppressed_but_attributed(spark, store):
    store.ingest_batch(_df(spark, BATCHES[0]), batch_id=0)
    out = store.ingest_batch(_df(spark, BATCHES[1]), batch_id=1)
    emitted = {r["doc_id"] for r in out.collect()}
    assert 2 not in emitted  # paraphrase of committed doc 1
    lab = _labels(store)
    assert lab[2] == lab[1]  # ...but a member of doc 1's cluster


def test_within_batch_near_dups_both_emitted(spark, store):
    """The incremental_dedup_docs batch contract: same-batch near-dups
    are all emitted, and share a cluster."""
    batch = [(11, BASE), (12, BASE[:-6] + " mice!")]
    out = store.ingest_batch(_df(spark, batch), batch_id=0)
    assert {r["doc_id"] for r in out.collect()} == {11, 12}
    lab = _labels(store)
    assert lab[11] == lab[12]


def test_committed_replay_identical_emission(spark, store):
    store.ingest_batch(_df(spark, BATCHES[0]), batch_id=0)
    first = sorted(
        (r["doc_id"],)
        for r in store.ingest_batch(_df(spark, BATCHES[1]), batch_id=1).collect()
    )
    before = _labels(store)
    replay = sorted(
        (r["doc_id"],)
        for r in store.ingest_batch(_df(spark, BATCHES[1]), batch_id=1).collect()
    )
    assert replay == first  # post-commit crash: same docs re-emitted
    assert _labels(store) == before
    # duplicate band rows are allowed but bounded: distinct unchanged
    bands = spark.table(store.bands_table)
    assert bands.select("bh", "doc_id").distinct().count() <= bands.count()


def test_torn_replay_without_repair(spark, store, monkeypatch):
    store.ingest_batch(_df(spark, BATCHES[0]), batch_id=0)

    def boom(batch_id, n_new, n_merges):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(store.cluster, "_write_commit", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        store.ingest_batch(_df(spark, BATCHES[1]), batch_id=1)
    monkeypatch.undo()

    # torn state: batch 1 invisible everywhere
    assert _labels(store) == _twin(spark, _registered(BATCHES[:1]))

    out = store.ingest_batch(_df(spark, BATCHES[1]), batch_id=1)
    emitted = {r["doc_id"] for r in out.collect()}
    assert 2 not in emitted and 3 not in emitted
    assert _labels(store) == _twin(spark, _registered(BATCHES[:2]))
    # node-granular state stayed exactly-once
    lbl = spark.table(store.cluster.labels_table)
    assert lbl.count() == lbl.select("node").distinct().count()


def test_cluster_sizes_and_compact(spark, store):
    for bi, batch in enumerate(BATCHES):
        store.ingest_batch(_df(spark, batch), batch_id=bi)
    before = _labels(store)
    sizes = {r["comp"]: r["n_members"] for r in store.cluster_sizes().collect()}
    assert sum(sizes.values()) == len(before)
    assert max(sizes.values()) >= 3  # the paraphrase cluster {1,2,6}
    store.compact()
    assert _labels(store) == before
