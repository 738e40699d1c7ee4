"""ANN quality measurement: recall@k of the approximate indexes against
the exact brute-force ground truth — the metric that matters for the
scale path (bucketing correctness is necessary, recall is sufficient)."""

import pytest

from dod_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"
K = 5


def _topk_sets(df, id_col, n_col, k=K):
    out = {}
    for r in df.collect():
        out.setdefault(r[id_col], []).append((r["rk"], r[n_col]))
    return {q: {n for _, n in sorted(v)[:k]} for q, v in out.items()}


@pytest.fixture(scope="module")
def truth(spark):
    df = QUERIES["cosine_topk"](spark, SF)
    return _topk_sets(df, "query_id", "neighbor_id")


# Floors are honest measurements at sf0.001 toy bucket widths, pinned
# so regressions surface: single-probe LSH is LOW by design (4-bit
# buckets split near-neighbors) — that gap is the reason
# lsh_ann_multiprobe exists.
@pytest.mark.parametrize(
    "name,floor",
    [("lsh_ann_topk", 0.1), ("lsh_ann_multiprobe", 0.2), ("ivf_ann_topk", 0.2)],
)
def test_ann_recall_floor(spark, truth, name, floor):
    approx = _topk_sets(QUERIES[name](spark, SF), "query_id", "neighbor_id")
    recalls = [
        len(approx.get(q, set()) & t) / len(t) for q, t in truth.items() if t
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= floor, f"{name} recall@{K}={mean_recall:.3f}"


def test_multiprobe_not_worse_than_single_probe(spark, truth):
    """Query-side multi-probe exists to buy recall: it must never lose
    to the single-probe index it extends."""
    single = _topk_sets(QUERIES["lsh_ann_topk"](spark, SF), "query_id", "neighbor_id")
    multi = _topk_sets(QUERIES["lsh_ann_multiprobe"](spark, SF), "query_id", "neighbor_id")

    def mean_recall(approx):
        rs = [len(approx.get(q, set()) & t) / len(t) for q, t in truth.items() if t]
        return sum(rs) / len(rs)

    assert mean_recall(multi) >= mean_recall(single) - 1e-9
