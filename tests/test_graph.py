"""Connected-components operator (operators/graph.py)."""

from dod_etl_spark.operators.graph import (
    connected_components,
    dedup_cluster_assignments,
)


def test_connected_components_chain_and_singleton(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "node long")
    # chain 1-2-3 (transitive: 1~3 without a direct edge), pair 4-5, singleton 6
    edges = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "src long, dst long")
    out = {
        r["node"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_connected_components_long_path_converges(spark):
    """A 12-hop path needs ~12 propagation rounds — exercises the loop,
    the lineage truncation, and the fixpoint stop."""
    n = 13
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    out = connected_components(nodes, edges)
    assert {r["component"] for r in out.collect()} == {0}


def test_dedup_cluster_assignments_keep_one_cut(spark):
    docs = spark.createDataFrame([(i,) for i in [10, 11, 12, 20]], "doc_id long")
    pairs = spark.createDataFrame([(10, 11), (11, 12)], "id_1 long, id_2 long")
    out = dedup_cluster_assignments(docs, pairs)
    keep = sorted(r["doc_id"] for r in out.filter("doc_id = cluster_id").collect())
    assert keep == [10, 20]  # one canonical per cluster + the singleton


def test_star_chain_converges_in_log_rounds(spark):
    """Adversarial worst case for propagation (diameter = n): the
    large-star/small-star contraction must close a 10k-node path in
    O(log n) rounds — the Kiveris et al. bound, ~2*log2(n)."""
    import math

    from dod_etl_spark.operators.graph import star_components

    n = 10_000
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    labels, rounds = star_components(edges)
    bound = 2 * math.ceil(math.log2(n)) + 2  # +2: checksum needs a stable round
    assert rounds <= bound, f"{rounds} rounds > {bound}"
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert set(got) == set(range(n)) and set(got.values()) == {0}


def test_auto_switches_to_star_on_deep_graph(spark):
    """auto mode: a path much deeper than switch_after must still land
    every node in component 0 (propagation alone would need n rounds)."""
    from dod_etl_spark.operators.graph import connected_components

    n = 300
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    out = connected_components(nodes, edges, method="auto", switch_after=3)
    assert {r["component"] for r in out.collect()} == {0}


def test_bucket_star_edges_same_components_as_cliques(spark, sf_dir):
    """minhash_cluster_edges (k-1 star edges per LSH bucket) must yield
    the exact same transitive closure as the k(k-1)/2 pairwise
    candidate edges, at ~1/100th the edge volume."""
    from pyspark.sql import functions as F

    from dod_etl_spark.catalog import load_table
    from dod_etl_spark.operators.graph import dedup_cluster_assignments
    from dod_etl_spark.operators.text_dedup import (
        minhash_candidates,
        minhash_cluster_edges,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidates(docs, num_hashes=8, band_size=2, shingle_len=5)
    stars = minhash_cluster_edges(docs, num_hashes=8, band_size=2, shingle_len=5)
    n_pairs, n_stars = pairs.count(), stars.count()
    assert n_stars < n_pairs  # the contraction actually contracts

    via_pairs = dedup_cluster_assignments(docs, pairs.select("id_1", "id_2")).toPandas()
    via_stars = dedup_cluster_assignments(docs, stars).toPandas()
    assert via_pairs.sort_values("doc_id").reset_index(drop=True).equals(
        via_stars.sort_values("doc_id").reset_index(drop=True)
    )


def test_triangle_counts_small_graph(spark):
    """Known graph: one triangle (1,2,3) + a pendant edge (3,4) + an
    isolated edge (5,6)."""
    from dod_etl_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (5, 6), (2, 1)],  # (2,1) dup direction
        "src LONG, dst LONG",
    )
    got = {r["node"]: (r["degree"], r["n_triangles"]) for r in triangle_counts(edges).collect()}
    assert got == {
        1: (2, 1),
        2: (2, 1),
        3: (3, 1),
        4: (1, 0),
        5: (1, 0),
        6: (1, 0),
    }


def test_triangle_counts_k4_and_no_cartesian(spark):
    from pyspark.sql import functions as F

    from dod_etl_spark.operators.graph import triangle_counts

    # K4: every node sits in C(3,2) = 3 triangles.
    import itertools

    edges = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(range(4), 2)], "src LONG, dst LONG"
    )
    out = triangle_counts(edges)
    assert {r["n_triangles"] for r in out.collect()} == {3}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# --- link_prediction ---------------------------------------------------------


def _lp(spark, edge_list, top_n=50):
    from dod_etl_spark.operators.graph import link_prediction

    df = spark.createDataFrame(edge_list, "src long, dst long")
    return [
        (r.id_1, r.id_2, r.common_neighbors, r.ra_micro)
        for r in link_prediction(df, top_n=top_n).collect()
    ]


def test_link_prediction_path_graph(spark):
    # Path 1-2-3: the only non-edge wedge is (1,3) through center 2
    # (deg 2) -> cn=1, ra = 10^12 div 2.
    got = _lp(spark, [(1, 2), (2, 3)])
    assert got == [(1, 3, 1, 10**12 // 2)]


def test_link_prediction_excludes_existing_edges(spark):
    # Triangle: every wedge closes an existing edge -> nothing predicted.
    assert _lp(spark, [(1, 2), (2, 3), (1, 3)]) == []


def test_link_prediction_ranking_and_ra_tiebreak(spark):
    # Star center 0 with leaves 1..4, plus extra edges (1,5) and (2,5).
    # Two cn=2 pairs: (0,5) through centers 1 and 2 (deg 2 each, RA =
    # 10^12) and (1,2) through centers 0 (deg 4) and 5 (deg 2, RA =
    # 0.75*10^12) -> RA breaks the cn tie in favor of (0,5).
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 5), (2, 5)]
    got = _lp(spark, edges)
    assert got[0] == (0, 5, 2, 2 * (10**12 // 2))
    assert got[1] == (1, 2, 2, 10**12 // 4 + 10**12 // 2)
    cn1 = [g for g in got[2:]]
    assert all(g[2] == 1 for g in cn1)
    assert cn1 == sorted(cn1, key=lambda g: (-g[2], -g[3], g[0], g[1]))


def test_link_prediction_direction_and_duplicate_invariant(spark):
    # Same undirected graph given as reversed/duplicated directed edges.
    a = _lp(spark, [(1, 2), (2, 3)])
    b = _lp(spark, [(2, 1), (3, 2), (2, 3), (1, 2)])
    assert a == b


# --- k_core ------------------------------------------------------------------


def _kc(spark, edge_list, k, rounds=6):
    from dod_etl_spark.operators.graph import k_core

    df = spark.createDataFrame(edge_list, "src long, dst long")
    return sorted(
        (r.node, r.core_degree) for r in k_core(df, k=k, rounds=rounds).collect()
    )


def test_kcore_clique_survives_tail_peels(spark):
    # Triangle 1-2-3 with pendant chain 3-4-5: 2-core = the triangle
    # (4 and 5 peel off in two rounds).
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    assert _kc(spark, edges, k=2) == [(1, 2), (2, 2), (3, 2)]


def test_kcore_cascade_requires_multiple_rounds(spark):
    # Path 1-2-3-4-5: every node peels eventually under k=2, but only
    # via cascading rounds (endpoints first).
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert _kc(spark, edges, k=2) == []
    # Bounded rounds honest check: 1 round only strips the endpoints'
    # edges; interior still looks 2-ish -> nonempty, not yet the core.
    assert _kc(spark, edges, k=2, rounds=1) != []


def test_kcore_k3_on_k4_minus_edge(spark):
    # K4 = 3-core; remove one edge and the 3-core dissolves entirely.
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert _kc(spark, k4, k=3) == [(1, 3), (2, 3), (3, 3), (4, 3)]
    assert _kc(spark, k4[:-1], k=3) == []


def test_kcore_registry_rounds_converged(spark):
    """The registered knn_kcore uses 6 rounds — prove that is PAST the
    fixpoint on the current testdata (one more round changes nothing),
    so the bounded-round output IS the exact 3-core. Bump
    _KCORE_ROUNDS if a testdata regeneration ever trips this."""
    from dod_etl_spark.operators.graph import k_core
    from dod_etl_spark.operators.similarity import knn_graph
    from dod_etl_spark.queries.llm import _KCORE_K, _KCORE_ROUNDS
    from dod_etl_spark.catalog import load_table
    from tests.conftest import SF_SMOKE
    import pyspark.sql.functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    edges = knn_graph(emb, k=3, sign_dims=4).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    ).localCheckpoint(eager=True)
    a = sorted(map(tuple, k_core(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS).collect()))
    b = sorted(map(tuple, k_core(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS + 1).collect()))
    assert a == b
    assert len(a) > 0  # the fixture graph actually has a 3-core
