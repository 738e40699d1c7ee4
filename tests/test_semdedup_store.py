"""SemDedupStore: greedy streaming semantic dedup — split invariance
vs a pure-Python reference, replay/torn-batch inertness, re-crawl
guard, and the monitor."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dod_etl_spark.catalog import load_table
from dod_etl_spark.operators.similarity import seed_centroids
from dod_etl_spark.streaming.semdedup_store import SemDedupStore, _greedy_keep
from tests.conftest import SF_SMOKE

THRESHOLD = 0.35
N_CELLS = 8


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").cache()


@pytest.fixture()
def store(spark, emb, request):
    tag = abs(hash(request.node.name)) % 10**8
    s = SemDedupStore(
        spark,
        table=f"sdk_{tag}",
        seen_table=f"sds_{tag}",
        commits_table=f"sdc_{tag}",
        cent_table=f"sdn_{tag}",
        threshold=THRESHOLD,
        centroids=seed_centroids(emb, N_CELLS),
    )
    yield s
    for t in (s.table, s.seen_table, s.commits_table, s.cent_table):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _kept(df):
    return sorted((r["vec_id"], r["cell_id"]) for r in df.collect())


def _python_reference(emb_rows, cents, threshold):
    """Independent greedy SemDeDup: assign to nearest cell (cosine,
    ties -> smallest cell id), then per cell in vec_id order keep iff
    below-threshold vs every kept-so-far cellmate. Reuses only the
    numpy greedy core shared with the store."""
    def cos(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        d = float(np.sqrt(a @ a) * np.sqrt(b @ b))
        return float(a @ b) / d if d > 0 else 0.0

    by_cell: dict[int, list] = {}
    for r in emb_rows:
        sims = [(cos(r["embedding"], cv), -cid) for cid, cv in cents]
        best = max(sims)
        by_cell.setdefault(-best[1], []).append(
            (int(r["vec_id"]), list(r["embedding"]))
        )
    out = []
    for cell, members in by_cell.items():
        kept = _greedy_keep([], sorted(members), threshold)
        out.extend((vid, cell) for vid in kept)
    return sorted(out)


def test_split_invariance_and_python_reference(spark, emb, store):
    """Any id-ordered micro-batch split yields the identical kept set,
    and that set equals an independently-coded greedy reference."""
    rows = emb.orderBy("vec_id").collect()
    want = _python_reference(rows, store.centroids, THRESHOLD)

    ids = [r["vec_id"] for r in rows]
    cuts = [len(ids) // 3, 2 * len(ids) // 3]
    b0 = emb.filter(F.col("vec_id") < ids[cuts[0]])
    b1 = emb.filter(
        (F.col("vec_id") >= ids[cuts[0]]) & (F.col("vec_id") < ids[cuts[1]])
    )
    b2 = emb.filter(F.col("vec_id") >= ids[cuts[1]])
    for i, b in enumerate((b0, b1, b2)):
        store.dedup_batch(b, batch_id=i)
    assert _kept(store.kept()) == want

    # single-batch twin store: identical kept set
    twin = SemDedupStore(
        spark,
        table=f"{store.table}_tw",
        seen_table=f"{store.seen_table}_tw",
        commits_table=f"{store.commits_table}_tw",
        cent_table=f"{store.cent_table}_tw",
        threshold=THRESHOLD,
        centroids=store.centroids,
    )
    try:
        emitted = _kept(twin.dedup_batch(emb, batch_id=0))
        assert emitted == want
        assert _kept(twin.kept()) == want
    finally:
        for t in (twin.table, twin.seen_table, twin.commits_table, twin.cent_table):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_committed_replay_and_recrawl_add_nothing(spark, emb, store):
    first = _kept(store.dedup_batch(emb, batch_id=0))
    assert first  # something survives
    # committed replay: same batch_id -> empty, state unchanged
    assert _kept(store.dedup_batch(emb, batch_id=0)) == []
    # re-crawl: same ids under a NEW batch_id -> seen-guard eats them
    assert _kept(store.dedup_batch(emb, batch_id=1)) == []
    assert _kept(store.kept()) == first
    assert store.seen_count() == emb.count()


def test_torn_batch_invisible_then_replay_converges(spark, emb, store):
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)

    # clean twin run gives the rows a crashed batch-1 append would
    # have written (dedup_batch is deterministic given committed state)
    clean = SemDedupStore(
        spark,
        table=f"{store.table}_cl",
        seen_table=f"{store.seen_table}_cl",
        commits_table=f"{store.commits_table}_cl",
        cent_table=f"{store.cent_table}_cl",
        threshold=THRESHOLD,
        centroids=store.centroids,
    )
    try:
        clean.dedup_batch(half, batch_id=0)
        clean.dedup_batch(rest, batch_id=1)
        clean_final = _kept(clean.kept())
        torn_rows = (
            spark.table(clean.table)
            .filter(F.col("batch_id") == 1)
            .localCheckpoint(eager=True)
        )

        store.dedup_batch(half, batch_id=0)
        baseline = _kept(store.kept())

        # torn append for batch 1: the kept rows land, NO commit record
        from dod_etl_spark.streaming.maintenance import bucket_align

        bucket_align(torn_rows, "cell_id", store.n_buckets).write.insertInto(
            store.table, overwrite=False
        )
        spark.catalog.refreshTable(store.table)
        assert _kept(store.kept()) == baseline  # torn rows invisible

        emitted = store.dedup_batch(rest, batch_id=1)
        assert emitted.count() > 0
        # replay's byte-identical duplicates collapse; final state
        # equals the clean two-batch run
        assert _kept(store.kept()) == clean_final
    finally:
        for t in (clean.table, clean.seen_table, clean.commits_table, clean.cent_table):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_cell_balance_monitor(spark, emb, store):
    store.dedup_batch(emb, batch_id=0)
    b = store.cell_balance()
    assert b["n_vecs"] == len(_kept(store.kept()))
    assert 0 < b["max_cell_frac"] <= 1.0
    assert b["n_cells_used"] <= b["n_cells_total"] == N_CELLS


def test_streaming_drive(spark, emb, store, tmp_path):
    """End-to-end through a REAL file stream: foreachBatch wires
    dedup_batch with the engine's own batch_ids; the final kept set
    equals the single-batch twin (ids arrive in one availableNow batch
    here, so greedy order is the id order)."""
    src = tmp_path / "sem_src"
    emb.select("vec_id", "embedding").write.parquet(str(src))
    q = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .parquet(str(src))
        .writeStream.foreachBatch(
            lambda df, bid: store.dedup_batch(df, batch_id=bid)
        )
        .option("checkpointLocation", str(tmp_path / "sem_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _kept(store.kept())
    assert got  # survivors recorded through the stream
    rows = emb.orderBy("vec_id").collect()
    assert got == _python_reference(rows, store.centroids, THRESHOLD)
