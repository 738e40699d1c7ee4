"""Deterministic-curation operator properties (operators/sampling.py)."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dod_etl_spark.catalog import load_table
from dod_etl_spark.operators.sampling import (
    SAMPLE_BUCKETS,
    hash_bucket,
    hash_sample,
    split_train_holdout,
    stratified_topk,
    token_budget_pack,
)

SF = "/root/testdata/sf0.001"


def test_hash_sample_deterministic_and_partition_invariant(spark):
    docs = load_table(spark, SF, "documents")
    a = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect())
    # Different partitioning must select the IDENTICAL row set.
    b = sorted(
        r["doc_id"]
        for r in hash_sample(docs.repartition(7, "source"), "doc_id", 0.3).collect()
    )
    assert a == b and 0 < len(a) < docs.count()


def test_hash_sample_fraction_roughly_holds(spark):
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    k = hash_sample(docs, "doc_id", 0.5).count()
    assert abs(k / n - 0.5) < 0.15  # md5 uniformity at small n


def test_split_train_holdout_disjoint_exhaustive(spark):
    docs = load_table(spark, SF, "documents")
    train, hold = split_train_holdout(docs, "doc_id", 0.25)
    nt, nh, n = train.count(), hold.count(), docs.count()
    assert nt + nh == n and nh > 0 and nt > 0
    assert train.join(hold, "doc_id", "inner").count() == 0
    # Side assignment is the bucket cut — re-derivable, content-stable.
    cut = int(0.25 * SAMPLE_BUCKETS)
    assert hold.filter(hash_bucket(F.col("doc_id"), 7) >= cut).count() == 0


def test_stratified_topk_bounds_and_order(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", F.length("text").alias("score")
    )
    out = stratified_topk(docs, "source", "score", 5, "doc_id")
    per = out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.min("score").alias("mn")
    )
    assert per.filter(F.col("n") > 5).count() == 0
    # Every kept row's score >= the best excluded score in its group.
    excluded = docs.join(out.select("doc_id"), "doc_id", "left_anti").groupBy(
        "source"
    ).agg(F.max("score").alias("best_out"))
    bad = per.join(excluded, "source").filter(F.col("mn") < F.col("best_out"))
    assert bad.count() == 0


def test_token_budget_pack_respects_budget(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id",
        "source",
        F.length("text").alias("score"),
        F.size(F.split("text", " ")).alias("n_toks"),
    )
    out = token_budget_pack(docs, "source", "score", "n_toks", 500, "doc_id")
    assert out.filter(F.col("cum_tokens") > 500).count() == 0
    # Greedy: per group the packed set is a prefix of the score-desc order,
    # so its max cum_tokens equals the sum of its token counts.
    chk = out.groupBy("source").agg(
        (F.max("cum_tokens") == F.sum("n_toks")).alias("ok")
    )
    assert chk.filter(~F.col("ok")).count() == 0


def test_minhash_xxhash64_mode_finds_exact_dups(spark):
    """Production hash mode (hash_fn="xxhash64", ~3-5x cheaper per
    shingle): identical-content documents share every shingle, hence
    every signature and every band, under ANY hash function — so each
    exact-dup pair MUST surface as a full-band candidate. (Borderline
    near-dup candidates legitimately differ between hash functions;
    that's LSH, not a defect — md5 stays the oracle-checkable mode.)"""
    from dod_etl_spark.operators.text_dedup import minhash_candidates

    base = load_table(spark, SF, "documents").select("doc_id", "text")
    shift = 100_000
    docs = base.union(
        base.withColumn("doc_id", F.col("doc_id") + shift)
    )  # every doc now has one exact duplicate at id+shift
    expected_pairs = {(r["doc_id"], r["doc_id"] + shift) for r in base.collect()}
    xx = {
        (r["id_1"], r["id_2"]): r["n_bands"]
        for r in minhash_candidates(docs, hash_fn="xxhash64").collect()
    }
    for pair in expected_pairs:
        assert xx.get(pair) == 4, f"exact dup {pair} missing/partial in xxhash64 mode"


# --- Priority sampling -------------------------------------------------------


def test_priority_sample_deterministic_and_partition_invariant(spark):
    from pyspark.sql import functions as F

    from dod_etl_spark.operators.sampling import priority_sample

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("w")
    )
    a = priority_sample(df, "doc_id", "w", k=40, seed=3).collect()
    b = priority_sample(df.repartition(13), "doc_id", "w", k=40, seed=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 40
    # Estimator never under-reports the item's own weight.
    assert all(r["est_weight"] >= r["weight"] for r in a)


def test_priority_sample_unbiased_subset_sum(spark):
    """Mean of the total-weight estimator across seeds approaches the
    true total (the property priority sampling exists for)."""
    from pyspark.sql import functions as F

    from dod_etl_spark.operators.sampling import priority_sample

    df = spark.range(300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 1).alias("w")
    )
    truth = df.agg(F.sum("w")).first()[0]
    ests = []
    for seed in range(12):
        s = priority_sample(df, "doc_id", "w", k=60, seed=seed)
        ests.append(sum(r["est_weight"] for r in s.collect()))
    mean = sum(ests) / len(ests)
    assert abs(mean - truth) / truth < 0.12, (mean, truth)


def test_priority_sample_small_population_kept_exactly(spark):
    from pyspark.sql import functions as F

    from dod_etl_spark.operators.sampling import priority_sample

    df = spark.range(5).select(F.col("id").alias("doc_id"), F.lit(7).alias("w"))
    out = priority_sample(df, "doc_id", "w", k=10).collect()
    assert len(out) == 5
    assert all(r["est_weight"] == 7 for r in out)


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """The importance signal: candidates written in the target's
    vocabulary must out-weigh candidates from a disjoint vocabulary.
    Two separated vocabularies, a clean target slice, and candidates
    split between them — every in-vocab candidate beats every
    out-of-vocab one."""
    from dod_etl_spark.operators.sampling import dsir_importance_weights

    target_text = "alpha beta gamma delta epsilon zeta"
    other_text = "foo bar baz qux quux corge"
    rows = (
        [(i, target_text, True) for i in range(10)]
        + [(100 + i, target_text, False) for i in range(5)]
        + [(200 + i, other_text, False) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, is_t BOOLEAN")
    w = dsir_importance_weights(df, "doc_id", "text", F.col("is_t"), n_buckets=64)
    got = {r["doc_id"]: r["avg_microratio"] for r in w.collect()}
    assert set(got) == {100 + i for i in range(5)} | {200 + i for i in range(5)}
    in_vocab = [got[100 + i] for i in range(5)]
    out_vocab = [got[200 + i] for i in range(5)]
    assert min(in_vocab) > max(out_vocab), (in_vocab, out_vocab)


def test_dsir_weights_empty_target_degrades_smoothly(spark):
    """No target rows: every candidate still gets a finite positive
    weight from the smoothed uniform model (never an error, never 0
    rows)."""
    from dod_etl_spark.operators.sampling import dsir_importance_weights

    df = spark.createDataFrame(
        [(1, "some words here"), (2, "other words there")],
        "doc_id LONG, text STRING",
    )
    w = dsir_importance_weights(df, "doc_id", "text", F.lit(False), n_buckets=64)
    rows = w.collect()
    assert len(rows) == 2
    assert all(r["avg_microratio"] > 0 for r in rows)


def test_leakage_safe_split_keeps_clusters_whole(spark):
    """Every near-dup cluster lands entirely on one side; the doc-keyed
    split demonstrably straddles at least one cluster on the same
    corpus — the leakage this operator exists to prevent."""
    import collections

    from pyspark.sql import functions as F

    from dod_etl_spark.operators.sampling import hash_bucket
    from dod_etl_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    rows = QUERIES["leakage_safe_split_docs"](spark, SF_SMOKE).collect()
    assert len(rows) == 500  # one verdict per document
    members = collections.defaultdict(list)
    sides = collections.defaultdict(set)
    for r in rows:
        members[r["cluster_id"]].append(r["doc_id"])
        sides[r["cluster_id"]].add(r["split"])
    multi = [c for c, m in members.items() if len(m) >= 2]
    assert multi, "fixture must contain real near-dup clusters"
    assert all(len(sides[c]) == 1 for c in members), "cluster straddles split"
    assert {s for ss in sides.values() for s in ss} == {"train", "holdout"}

    # Control: the naive doc-keyed split DOES straddle a cluster here.
    doc_side = {
        r["doc_id"]: r["s"]
        for r in spark.createDataFrame(
            [(d,) for m in members.values() for d in m], "doc_id long"
        )
        .select("doc_id", (hash_bucket(F.col("doc_id"), 7) < 1000).alias("s"))
        .collect()
    }
    straddled = [
        c for c in multi if len({doc_side[d] for d in members[c]}) > 1
    ]
    assert straddled, "expected the doc-keyed control to leak on this corpus"


# --- pareto_frontier ----------------------------------------------------------


def _ref_skyline(pts):
    out = []
    for i, (x, y) in enumerate(pts):
        dominated = any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for j, (x2, y2) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(set(out))


def _sky(spark, pts, n_buckets=16):
    from dod_etl_spark.operators.sampling import pareto_frontier

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x long, y long"
    )
    out = pareto_frontier(df, "x", "y", n_buckets=n_buckets)
    return sorted({(r.x, r.y) for r in out.collect()})


def test_skyline_staircase(spark):
    # Staircase plus interior points: frontier = the staircase corners.
    pts = [(1, 9), (3, 7), (5, 5), (7, 3), (9, 1), (2, 2), (4, 4), (1, 1)]
    assert _sky(spark, pts) == [(1, 9), (3, 7), (5, 5), (7, 3), (9, 1)]


def test_skyline_duplicates_both_kept(spark):
    # Equal points don't dominate each other; both copies stay.
    from dod_etl_spark.operators.sampling import pareto_frontier

    df = spark.createDataFrame(
        [(1, 5, 5), (2, 5, 5), (3, 1, 1)], "id long, x long, y long"
    )
    out = pareto_frontier(df, "x", "y")
    assert sorted(r.id for r in out.collect()) == [1, 2]


def test_skyline_equal_x_tie_rule(spark):
    # Same x: only the max-y row survives (the other is dominated).
    pts = [(5, 9), (5, 3), (2, 1)]
    assert _sky(spark, pts) == [(5, 9)]


@settings(max_examples=15, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=40,
    ),
    n_buckets=st.sampled_from([1, 4, 32]),
)
def test_skyline_matches_bruteforce(spark, pts, n_buckets):
    assert _sky(spark, pts, n_buckets=n_buckets) == _ref_skyline(pts)
