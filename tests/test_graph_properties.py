"""Property test: connected_components vs a reference union-find on
random graphs (hypothesis)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dod_etl_spark.operators.graph import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id per component
    return {
        v: min(u for u in range(n_nodes) if find(u) == find(v))
        for v in range(n_nodes)
    }


graphs = st.integers(min_value=1, max_value=18).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ),
            max_size=25,
        ),
    )
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(graphs)
def test_components_match_union_find(spark, g):
    n, edges = g
    expected = _union_find(n, edges)
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edges_df = (
        spark.createDataFrame(edges, "src long, dst long")
        if edges
        else spark.createDataFrame([], "src long, dst long")
    )
    for method in ("propagation", "star", "auto"):
        got = {
            r["node"]: r["component"]
            for r in connected_components(
                nodes_df, edges_df, max_iters=n + 1, method=method, switch_after=2
            ).collect()
        }
        assert got == expected, method
