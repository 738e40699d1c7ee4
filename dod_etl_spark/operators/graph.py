"""Connected components for dedup clustering.

Near-dup pair lists (MinHash/SimHash candidates) are EDGES; the unit a
curation pipeline actually drops or keeps is the CLUSTER (transitive
closure: A~B, B~C => {A,B,C} even if A,C never collide). This operator
closes that gap: min-label propagation over the pair graph, canonical
cluster id = min(doc_id) in the component.

Iterative Spark done right:
- data never leaves executors; the driver only runs the loop and reads
  ONE aggregate per iteration (the convergence scalar);
- labels monotonically decrease, so convergence is `sum(label)`
  unchanged — an O(1)-row action, not a full-frame comparison;
- `localCheckpoint(eager=True)` after each round truncates the lineage
  that otherwise grows linearly and re-executes from scratch on every
  action (the classic iterative-DataFrame trap). On a real cluster with
  an unreliable-executor budget, swap for reliable `checkpoint()` to a
  cluster-visible directory.

Rounds needed = graph diameter (one hop per round). Dedup clusters are
shallow (near-dup balls), so this converges in a handful of rounds; for
adversarial long-chain graphs use the alternating large-star/small-star
formulation (Kiveris et al., "Connected Components in MapReduce",
O(log n) rounds) — same join primitives, left as the documented scale
escape hatch.

Reference parity: none (single-node reference, no graph surface) —
LLM-pipeline extension per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 25,
) -> DataFrame:
    """(node, component) for every node; component = min node id
    reachable via undirected edges. Nodes absent from `edges` are their
    own singleton component."""
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    ).localCheckpoint(eager=True)
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .union(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym.s == labels.node)
            .groupBy("d")
            .agg(F.min("label").alias("_nl"))
        )
        labels = (
            labels.join(nbr_min, labels.node == nbr_min.d, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_nl"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:  # labels only decrease -> fixpoint
            break
        prev_sum = cur_sum
    return labels.select("node", F.col("label").alias("component"))


def dedup_cluster_assignments(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("id_1", "id_2"),
) -> DataFrame:
    """(doc_id, cluster_id): transitive closure of a near-dup pair list
    over the full corpus (singletons keep their own id). Downstream
    `filter(doc_id == cluster_id)` is the canonical keep-one-per-cluster
    cut."""
    comp = connected_components(
        docs.select(id_col), pairs, node_col=id_col,
        src_col=pair_cols[0], dst_col=pair_cols[1],
    )
    return comp.select(
        F.col("node").alias(id_col), F.col("component").alias("cluster_id")
    )
