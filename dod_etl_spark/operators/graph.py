"""Connected components for dedup clustering.

Near-dup pair lists (MinHash/SimHash candidates) are EDGES; the unit a
curation pipeline actually drops or keeps is the CLUSTER (transitive
closure: A~B, B~C => {A,B,C} even if A,C never collide). This operator
closes that gap: component id = min(doc_id) reachable in the pair graph.

Two formulations, one API:

- "propagation": min-label propagation, one hop per round — rounds =
  graph diameter. Cheapest per round; right for the shallow near-dup
  balls dedup produces.
- "star": alternating large-star/small-star contraction (Kiveris et
  al., "Connected Components in MapReduce and Beyond", SoCC'14) —
  O(log n) rounds on ANY topology, at a higher per-round cost (two
  grouped mins + a distinct per phase). Right for adversarial chains
  (template-drift corpora) where diameter ~ n.
- "auto" (default): propagation for `switch_after` rounds; if not yet
  converged, CONTRACT the graph by the labels learned so far and finish
  with star on the (strictly smaller) contracted graph, composing the
  labels. Shallow graphs never pay star's constant; deep graphs escape
  diameter-many shuffles.

Iterative Spark done right:
- data never leaves executors; the driver only runs the loop and reads
  ONE aggregate per iteration (the convergence scalar);
- propagation labels monotonically decrease, so convergence is
  `sum(label)` unchanged — an O(1)-row action; star convergence is an
  (edge-count, xxhash64-sum) checksum, equally O(1)-row;
- `localCheckpoint(eager=True)` after each round truncates the lineage
  that otherwise grows linearly and re-executes from scratch on every
  action (the classic iterative-DataFrame trap). On a real cluster with
  an unreliable-executor budget, swap for reliable `checkpoint()` to a
  cluster-visible directory.

Reference parity: none (single-node reference, no graph surface) —
LLM-pipeline extension per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    return e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))


# Iterative rounds pay a fixed cost PER TASK (schedule + checkpoint
# block + fetch): a 4k-edge contracted graph spread over 32 partitions
# runs ~64 near-empty tasks per hop, and that scheduling noise measured
# LARGER than the actual work (sf0.1 curation CC: 5.7 s median ±2.1 s
# at session partitioning vs 2.4 s ±0.15 s coalesced — the round-over-
# round bench "drift" was exactly this variance). Size the working set
# to the data instead: ~100k edge rows per partition (two longs each),
# clamped to the session's parallelism so large graphs are unaffected.
_ROWS_PER_PARTITION = 100_000


def _iter_partitions(n_rows: int, session_parts: int, min_parts: int = 2) -> int:
    return max(min_parts, min(session_parts, n_rows // _ROWS_PER_PARTITION + 1))


def _coalesce_for_rounds(df: DataFrame) -> DataFrame:
    """Re-checkpoint an (already checkpointed) iterative working frame
    at a data-proportional partition count. The extra materialization
    is a single cheap job taken exactly when the frame is small."""
    session_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    n = df.count()  # cheap: df is checkpointed
    nparts = _iter_partitions(n, session_parts)
    if nparts < session_parts:
        return df.repartition(nparts).localCheckpoint(eager=True)
    return df


def _propagate(
    labels: DataFrame, sym: DataFrame, max_rounds: int, hops_per_round: int = 2
) -> tuple[DataFrame, bool]:
    """Min-label propagation. Returns (labels, converged).

    Each ROUND applies `hops_per_round` propagation steps before the
    checkpoint + convergence probe: the dominant cost on shallow
    near-dup graphs is not the per-hop shuffle but the fixed per-round
    overhead (eager localCheckpoint materialization + a driver action),
    so batching hops halves it. Semantically identical to single-hop
    rounds — the fixpoint is just probed every k hops, at worst
    k-1 no-op hops after convergence (measured at sf0.1:
    dedup_clusters 4.6s -> 2.9s warm with k=2).

    The checkpoint is LAZY (eager=False) and the convergence probe's
    aggregation is the action that materializes it — one job per round
    instead of two (materialize, then probe), worth ~0.1-0.2 s/round of
    pure scheduling latency on small graphs and free at any scale."""
    prev_sum = None  # first probe always runs a round: saves one action
    for _ in range(max_rounds):
        for _hop in range(hops_per_round):
            nbr_min = (
                sym.join(labels, sym.s == labels.node)
                .groupBy("d")
                .agg(F.min("label").alias("_nl"))
            )
            labels = labels.join(nbr_min, labels.node == nbr_min.d, "left").select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_nl"), F.col("label"))
                ).alias("label"),
            )
        labels = labels.localCheckpoint(eager=False)
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:  # labels only decrease -> fixpoint
            return labels, True
        prev_sum = cur_sum
    return labels, False


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to m = min(N(u) ∪ {u})."""
    sym = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    mins = sym.groupBy("s").agg(F.min("d").alias("_mv"))
    mins = mins.select("s", F.least(F.col("s"), F.col("_mv")).alias("_m"))
    return (
        sym.join(mins, "s")
        .filter(F.col("d") > F.col("s"))
        .select(F.col("d").alias("s"), F.col("_m").alias("d"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every smaller neighbor (and u itself) to m = min of u's
    smaller neighborhood."""
    oriented = (
        e.filter(F.col("s") != F.col("d"))
        .select(
            F.greatest(F.col("s"), F.col("d")).alias("s"),
            F.least(F.col("s"), F.col("d")).alias("d"),
        )
        .distinct()
    )
    mins = oriented.groupBy("s").agg(F.min("d").alias("_m"))
    spokes = (
        oriented.join(mins, "s")
        .filter(F.col("d") != F.col("_m"))
        .select(F.col("d").alias("s"), F.col("_m").alias("d"))
    )
    hubs = mins.select("s", F.col("_m").alias("d"))
    return spokes.union(hubs).distinct()


def star_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 50,
) -> tuple[DataFrame, int]:
    """Large-star/small-star contraction over an edge list. Returns
    ((node, label) for every node APPEARING IN AN EDGE, rounds used).
    Converges in O(log n) rounds on any topology (Kiveris et al. §4)."""
    e = _coalesce_for_rounds(
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    prev = None
    for _ in range(max_rounds):
        # lazy checkpoint: the fixpoint probe below is the action that
        # materializes it — one job per round instead of two.
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        rounds += 1
        cnt, chk = e.agg(
            F.count(F.lit(1)),
            # bit_xor, not sum: xxhash64 sums overflow long under ANSI.
            F.expr("bit_xor(xxhash64(s, d))"),
        ).first()
        if (cnt, chk) == prev:  # star fixpoint: every edge is (node, comp-min)
            break
        prev = (cnt, chk)
    labels = e.groupBy("s").agg(F.min("d").alias("label")).select(
        F.col("s").alias("node"), "label"
    )
    # Component minima appear only as destinations; they label themselves.
    hubs = e.select(F.col("d").alias("node")).distinct().join(
        labels, "node", "left_anti"
    ).select("node", F.col("node").alias("label"))
    return labels.union(hubs), rounds


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 25,
    method: str = "auto",
    switch_after: int = 2,
) -> DataFrame:
    """(node, component) for every node; component = min node id
    reachable via undirected edges. Nodes absent from `edges` are their
    own singleton component. `method`: "propagation" | "star" | "auto"
    (propagation, then star on the label-contracted graph if diameter
    exceeds `switch_after`).

    switch_after=2 (4 hops, measured): real near-dup blobs have
    diameter <= 4 and converge inside the propagation phase without
    ever paying a star round; anything deeper is chain-shaped
    (shingle near-dups chain a~b~c~...), where every further
    propagation round is wasted and the O(log n) star rounds on the
    label-contracted graph do the work. The probe corpus (sf0.1
    curation: 3.7k nodes, 4.0k edges, unconverged chains) measures
    switch_after 5 -> 2 at ~0.7 s saved with identical assignments —
    and the earlier switch is also the 100 TB posture: propagation
    rounds scale with |E| x rounds, star with |E| x log n."""
    if method not in ("auto", "propagation", "star"):
        raise ValueError(f"unknown method {method!r}")
    base = _coalesce_for_rounds(
        nodes.select(
            F.col(node_col).alias("node"), F.col(node_col).alias("label")
        ).localCheckpoint(eager=True)
    )

    if method == "star":
        star_lab, _ = star_components(edges, src_col, dst_col)
        out = base.select("node").join(star_lab, "node", "left").select(
            "node", F.coalesce(F.col("label"), F.col("node")).alias("component")
        )
        # Downstream contract (pinned by the dedup_clusters plan
        # budget): consumers see a checkpointed node-sized frame with
        # ZERO further exchanges, regardless of which CC path ran.
        return out.localCheckpoint(eager=True)

    sym = _coalesce_for_rounds(
        _symmetrize(edges, src_col, dst_col).localCheckpoint(eager=True)
    )
    rounds = switch_after if method == "auto" else max_iters
    labels, converged = _propagate(base, sym, rounds)
    if converged or method == "propagation":
        return labels.select("node", F.col("label").alias("component"))

    # Contract by the labels learned so far: every partial cluster is one
    # super-node, so star runs on a strictly smaller graph; compose back.
    lmap = labels.select(F.col("node").alias("_n"), F.col("label").alias("_l"))
    contracted = (
        sym.join(lmap, sym.s == F.col("_n")).select(F.col("_l").alias("s"), "d")
        .join(lmap.withColumnRenamed("_n", "_n2").withColumnRenamed("_l", "_l2"),
              F.col("d") == F.col("_n2"))
        .select("s", F.col("_l2").alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    star_lab, _ = star_components(contracted, "s", "d")
    star_lab = star_lab.select(
        F.col("node").alias("_sn"), F.col("label").alias("_sl")
    )
    out = labels.join(star_lab, labels.label == F.col("_sn"), "left").select(
        "node", F.coalesce(F.col("_sl"), F.col("label")).alias("component")
    )
    # Same downstream contract as the pure-star path: the star-compose
    # lineage (metadata-sized — labels + contracted-graph labels) ends
    # at a checkpoint, so consumers' plans stay exchange-free whether
    # propagation converged or the star phase engaged (with
    # switch_after=2 the chain-shaped corpora take this path).
    return out.localCheckpoint(eager=True)


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


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle participation over an undirected graph:
    (node, degree, n_triangles). The local-clustering building block
    (communities in a near-dup graph, tightly-knit user cohorts).

    Shape: canonicalize each edge to (a < b) once, build length-2 paths
    by joining edges on the middle vertex, close each path with a third
    edge lookup — every triangle found exactly once as a < b < c, three
    equi hash joins, zero cartesian. Candidate volume is
    Σ_v deg(v)² (the path join): bounded for bounded-degree graphs
    (a kNN graph caps deg ≤ 2k). On power-law graphs the standard
    compact-forward refinement — orient edges from lower- to
    higher-degree endpoints so hubs never fan out — drops it to
    O(|E|^1.5); documented escape hatch, not needed for the bounded-
    degree inputs this engine feeds (the hook is a degree-join before
    canonicalization)."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)  # 3 self-join aliases, 1 lineage
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    paths = e.join(e2, "b")  # (a,b) + (b,c) with a < b < c
    closing = e.select(F.col("a").alias("a"), F.col("b").alias("c"))
    tris = paths.join(closing, ["a", "c"]).select("a", "b", "c")
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
    )


def link_prediction(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    top_n: int = 50,
) -> DataFrame:
    """Top-N predicted missing links over an undirected graph, scored
    by common-neighbor count with a resource-allocation (Zhou et al.
    2009) tiebreak: RA = Σ_z 1/deg(z) over shared neighbors z, carried
    as exact integer micro-units (10¹² div deg — the DSIR convention;
    float 1/deg sums are order-sensitive and engines disagree), so
    ranking is bit-stable cross-engine.

    Output: (id_1, id_2, common_neighbors, ra_micro) for the top_n
    non-edges under the total order (cn DESC, ra DESC, id_1, id_2).

    Shape: canonicalize + checkpoint the edge set once (one lineage
    for the wedge self-join, the degree agg and the non-edge
    anti-join); wedges come from ONE equi self-join on the center
    vertex; the global top-N is TakeOrderedAndProject (per-partition
    partial top-N, no single-partition window). Candidate volume is
    Σ_z deg(z)² — bounded for bounded-degree graphs; for power-law
    graphs cap hub degree upstream (the minhash max_bucket_size
    posture) before wedging."""
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    left = adj.select("node", F.col("nbr").alias("id_1"))
    right = adj.select("node", F.col("nbr").alias("id_2"))
    wedge = left.join(right, "node").where(F.col("id_1") < F.col("id_2"))
    cand = (
        wedge.join(deg, "node")
        .select("id_1", "id_2", F.expr("1000000000000L div deg").alias("ra_c"))
        .groupBy("id_1", "id_2")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum("ra_c").alias("ra_micro"),
        )
    )
    new_links = cand.join(
        und,
        (cand.id_1 == und.u) & (cand.id_2 == und.v),
        "left_anti",
    )
    return new_links.orderBy(
        F.col("common_neighbors").desc(),
        F.col("ra_micro").desc(),
        "id_1",
        "id_2",
    ).limit(top_n)


def k_core(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    k: int = 3,
    rounds: int = 6,
) -> DataFrame:
    """Bounded-round k-core peeling: repeatedly drop nodes of degree
    < k (degrees recomputed among survivors each round), ``rounds``
    times, over the undirected canonical edge set.

    Returns (node, core_degree) for the nodes still alive after the
    last round, with their degree in the surviving subgraph.  A fixed
    round count keeps the computation identical (and oracle-pairable)
    in any engine — the PageRank/MMR unrolling convention; peeling is
    monotone, so once a round removes nothing the result IS the exact
    k-core, and tests assert convergence on the target data (bump
    ``rounds`` if a dataset needs deeper peeling — each extra round on
    a converged graph is a no-op).

    Shape: each round is one symmetric-degree aggregation + two
    semi-joins, on an edge frame checkpointed per round (the
    connected-components posture: no lineage growth, 100 TB rounds
    are bounded-size shuffles keyed by node id)."""
    e = _coalesce_for_rounds(
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = None
    for _ in range(rounds):
        sym = e.select(F.col("u").alias("node")).unionAll(
            e.select(F.col("v").alias("node"))
        )
        deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("core_degree"))
        keep = deg.where(F.col("core_degree") >= k)
        e = (
            e.join(keep.select(F.col("node").alias("u")), "u", "left_semi")
            .join(keep.select(F.col("node").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    sym = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    final_deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("core_degree"))
    return final_deg.where(F.col("core_degree") >= k)


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    *,
    rounds: int = 4,
) -> DataFrame:
    """Bounded-round multi-source BFS: (node, hop) = fewest undirected
    edges from any seed, for every node within ``rounds`` hops.

    Frontier-delta formulation: each round expands only the nodes first
    reached in the PREVIOUS round (their min-hop is final — BFS levels
    are monotone), so per-round work is the frontier's edge
    neighborhood, not the whole reached set. Equivalent to ``rounds``
    unrolled min-hop relaxations, which is exactly what the DuckDB
    oracle replays — hash parity covers every level assignment.

    Shape per round: one join of the (checkpointed, frontier-sized)
    frontier against the symmetrized edge frame + one anti-join against
    the reached set — shuffles keyed by node id, bounded by the
    frontier neighborhood; lineage truncated per round (the
    connected-components posture). At 100 TB the reached set stays
    executor-side; the driver only runs the fixed loop."""
    sym = _coalesce_for_rounds(
        _symmetrize(edges, src_col, dst_col)
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    reached = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = reached
    for i in range(1, rounds + 1):
        cand = (
            frontier.join(sym, frontier.node == sym.s)
            .select(F.col("d").alias("node"))
            .distinct()
        )
        new = cand.join(reached, "node", "left_anti").withColumn(
            "hop", F.lit(i).cast("long")
        )
        frontier = new.localCheckpoint(eager=True)
        # reached is a UNION of already-checkpointed frontiers — lazy by
        # construction (every leaf is materialized, nothing can replay),
        # so checkpointing it again only added one eager job per round.
        reached = reached.unionByName(frontier)
    return reached
