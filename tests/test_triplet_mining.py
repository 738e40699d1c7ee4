"""hard_triplet_mining semantics on a hand-computed fixture: hardest
positive = least-similar same-label, hardest negative = most-similar
different-label, margin sign flags violated triplets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _mine(spark, rows, n_anchors=30):
    """Run the query body against an in-memory embeddings table by
    monkey-free substitution: write a tmp parquet and point sf_dir."""
    return rows


@pytest.fixture()
def fixture_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("triplet")
    # 2-d unit-ish vectors, two labels. Anchor 0 (label 1) at (1, 0):
    #   same-label: id 1 at (1, 0.1) cos~0.995; id 2 at (0, 1) cos 0.0
    #     -> hardest positive = id 2 (least similar same-label)
    #   diff-label: id 3 at (0.9, 0.1) cos~0.993; id 4 at (-1, 0) cos -1
    #     -> hardest negative = id 3 (most similar diff-label)
    #   margin = 0.0 - 0.993 < 0: violated triplet.
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [1.0, 0.1], 1),
        (2, [0.0, 1.0], 1),
        (3, [0.9, 0.1], 2),
        (4, [-1.0, 0.0], 2),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_hardest_pos_neg_and_margin(spark, fixture_dir):
    from dod_etl_spark.queries.evals import hard_triplet_mining

    out = {
        r["anchor_id"]: r
        for r in hard_triplet_mining(spark, fixture_dir).collect()
    }
    a0 = out[0]
    assert a0["pos_id"] == 2 and a0["pos_cos"] == 0.0
    assert a0["neg_id"] == 3
    assert a0["neg_cos"] == pytest.approx(0.993, abs=0.002)
    assert a0["margin"] == pytest.approx(a0["pos_cos"] - a0["neg_cos"], abs=1e-9)
    assert a0["margin"] < 0  # violated triplet

    # anchor 4 (label 2): positive arm is id 3 (only same-label),
    # negative arm is the most similar of labels-1 vectors to (-1,0),
    # which is id 2 at cos 0.0.
    a4 = out[4]
    assert a4["pos_id"] == 3 and a4["neg_id"] == 2
    assert a4["neg_cos"] == 0.0
    # every anchor has both arms in this fixture
    assert set(out) == {0, 1, 2, 3, 4}


def test_ties_break_to_smaller_id(spark, tmp_path):
    # two identical negatives -> smaller id wins in both arms' keys
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.0, 1.0], 1),
        (7, [1.0, 0.0], 2),
        (5, [1.0, 0.0], 2),
    ]
    d = tmp_path / "t2"
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    from dod_etl_spark.queries.evals import hard_triplet_mining

    out = {r["anchor_id"]: r for r in hard_triplet_mining(spark, str(d)).collect()}
    assert out[0]["neg_id"] == 5  # cos 1.0 tie between 5 and 7
