"""Plan-shape regression guard (VERDICT r01 item 10): the flagship
physical plans must keep the properties PLANS.md documents — broadcast
enrichment joins, no cartesian products, bounded exchanges. A silent
regression (a dim outgrowing the broadcast hint, a non-equi join
degenerating to nested loop) fails here before it ships.

Plans are inspected at sf0.001 — plan SHAPE is scale-invariant for these
queries because every broadcast is an explicit hint (not a stats
decision) and the join keys don't change with SF.
"""

from __future__ import annotations

import re

import pytest

from dod_etl_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _count(plan: str, op: str) -> int:
    # Formatted explain prints each operator twice (tree node "Op (N)" +
    # details heading "(N) Op"); count tree nodes only. The word boundary
    # keeps "Exchange" from matching "BroadcastExchange".
    return len(re.findall(rf"\b{op}\b[^\n(]*\(\d+\)", plan))


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        # OEE chain: dims broadcast; the one allowed Exchange is the ES
        # timeline-tiling window (input derivation, PLANS.md).
        ("oee_flagship", 1),
        # Bucketed interval join: broadcast equi join; the one shuffle is
        # the canonical-bucket dedup boundary.
        ("j3_j4_interval_grains", 1),
        ("a1_latest_per_key", 1),
        # Star joins broadcast; single-shuffle aggregate.
        ("q5_revenue_by_nation", 1),
        ("q1_pricing_summary", 1),
        # Correlated-min decorrelation: pair agg + candidate-set window.
        ("q2_min_cost_supplier", 2),
        # 7-way star, all dims broadcast, single group-by-year shuffle.
        ("q8_market_share", 1),
        # Pair agg + distinct before the broadcast semi-join.
        ("q20_excess_shipments", 2),
        # per-pair agg, per-order rollup, join alignment, final name agg.
        ("q21_sole_blame_supplier", 4),
        # Content-hash sample is a pure pushed filter: NO exchange.
        ("sample_docs_deterministic", 0),
        ("quality_topk_per_source", 1),
        ("token_budget_pack_docs", 1),
        # Map-only curation scans: regex scrub and token-ratio flag are
        # pure projections — any exchange is a regression.
        ("pii_scrub_docs", 0),
        ("repetition_ratio_docs", 0),
        # One shuffle on source; the literal cap must keep engaging
        # WindowGroupLimit (map-side top-k pruning before the exchange).
        ("domain_cap_docs", 1),
        # Chunking is explode-in-scan: map-only, any exchange is a
        # regression.
        ("chunk_docs_stride", 0),
        # Corpus report: the single group-by shuffle carries scalars
        # (counts/sums/percentile digests), never text.
        ("corpus_profile", 1),
        # In-group pair generation (no gram self-join): collect_set
        # shuffle + final pair aggregation.
        ("source_overlap_matrix", 2),
        ("quality_percentile_rank", 1),
        ("shard_assignment_stats", 1),
        # Time-RANGE frame: one window Exchange on user_id.
        ("value_trailing_1h", 1),
        # Linear-model inference is one higher-order array projection:
        # any exchange is a regression.
        ("classifier_score_docs", 0),
        # Per-source agg + single-row broadcast total.
        ("domain_mixture_plan", 1),
        # Single-shuffle funnel: groupBy(user) + sorted-array fold; the
        # 3-way self-join formulation would cost 3 fact shuffles.
        ("funnel_signup_purchase", 1),
        # Join-free cohort triangle: one (user_id) agg computing
        # min-day + day-set together, one post-explode agg.
        ("retention_cohorts", 2),
        # lag window on user_id + |types|^2 aggregate + tiny
        # normalizing window.
        ("event_transition_matrix", 3),
        # Quartile thresholds via broadcast percentile rows over the
        # materialized per-user frame; no global ntile sort.
        ("rfm_segments", 2),
        # session window + path agg reusing its partitioning; global
        # top-20 is TakeOrdered, not a sort exchange.
        ("top_session_paths", 2),
        # |types|-row moments broadcast back over the scan: the fact
        # table never shuffles for the z-score flag.
        ("value_zscore_outliers", 1),
        # Domain-cardinality rates broadcast back over the scan; the
        # only exchange is the single-row total aggregate.
        ("mixture_sample_docs", 1),
        ("mixture_upsample_docs", 1),
        # Rule battery is pure array arithmetic in the scan stage: any
        # exchange is a regression.
        ("gopher_rules_docs", 0),
        # Readability / blocklist signals are map-only regexp + array
        # scans: any exchange is a regression.
        ("readability_score_docs", 0),
        ("blocklist_score_docs", 0),
        # Single-shuffle fold aggregations / one window shuffle.
        ("ewma_user_value", 1),
        ("purchase_attribution", 1),
        # Schema-directed from_json in the scan stage; one aggregate.
        ("props_extract_agg", 1),
        # Two distinct-count aggregates; months-cardinality MAU
        # broadcast back onto the daily frame.
        ("dau_mau_stickiness", 4),
        # funnel fold shuffle + single-row summary aggregate.
        ("funnel_conversion_summary", 2),
        # SCD2 version window + tie-resolve agg + the single as-of
        # union window; never an events x versions non-equi fan-out.
        ("events_scd2_pit", 3),
        # Whole DQ suite compiles to ONE Aggregate; the two exchanges
        # are the multi-distinct Expand's partial/final pair.
        ("dq_checks_events", 2),
        # Winnowing is array arithmetic in the scan stage; the single
        # exchange is spread()'s local-parallelism repartition (no-op
        # at cluster scale).
        ("winnow_fingerprints_docs", 1),
        # Post-checkpoint: fp-bucket self-join + pair aggregation.
        ("winnow_dup_pairs", 2),
        # Model build (bigram agg + first-token rollup) + per-doc agg;
        # model joins broadcast at this SF, hash-partitioned at scale.
        ("lm_score_docs", 4),
        # One (source, bucket) count; grid/TVD run on metadata-sized
        # frames (broadcast totals).
        ("source_drift_tvd", 3),
        # PCA apply is literal arithmetic: any exchange is a regression.
        ("pca_project_embeddings", 0),
        # Band join: bucket equi join (3x fan-out) + residual filter,
        # one pair-count shuffle — never a cartesian theta join.
        ("value_band_pairs", 1),
        # CM sketch build (map-combined) + probe agg; the <= d·w-row
        # sketch joins broadcast.
        ("cm_heavy_tokens", 2),
        # Dataset card: ONE aggregation pass (multi-distinct Expand
        # partial/final) + inline() long format.
        ("dataset_card", 2),
        # Segment dedup: winner min(struct) agg + reassembly agg; the
        # per-doc segment count is map-only from the scan (a third
        # shuffle of the full segment stream is the regression), and
        # there is NO join back onto the segment stream (skew trap).
        ("segment_dedup_docs", 2),
        # ACF: one (user, type) window pass + one map-combined moment
        # aggregate; a per-type global sort is the regression.
        ("value_autocorrelation", 2),
        # BFS: every round ends at a checkpoint — consumers see zero
        # exchanges (the connected-components downstream contract).
        ("knn_bfs_hops", 0),
        # Golden record: survivorship agg + golden-field join; the CC
        # closure is behind its checkpoint boundary.
        ("entity_golden_record", 2),
        # PMI: both count frames checkpointed (corpus scanned exactly
        # twice, at checkpoint time); the two remaining exchanges are
        # the 1-row total aggregates over those vocab-bounded frames.
        ("pmi_collocations", 2),
        # Phrase search is a pure scan — phrases are plan literals, the
        # k-token window verifies in-array: any exchange is a
        # regression.
        ("phrase_match_docs", 0),
        # Heaps curve: three map-combined count branches + bucket-frame
        # full-outer joins and the cumulative window, all on
        # corpus/100-row frames.
        ("vocab_growth_docs", 7),
        # Zipf: count frame checkpointed (corpus scanned once); the two
        # exchanges are the 1-row total and the vocab-sized rank window
        # single-partition move.
        ("zipf_coverage_docs", 2),
        # Assortativity: post-checkpoint one degree count + two
        # shuffle joins of the NODE-sized degree frame onto the edge
        # ends (no broadcast hint — AQE broadcasts at small scale,
        # shuffles at 10^9 nodes) + 1-row moment aggregate.
        ("knn_assortativity", 5),
        # Source TVD: counts and totals checkpointed; vocab-sized pair
        # join broadcast; the one exchange is the pair aggregation.
        ("source_token_tvd", 1),
        # Burstiness: (doc,tok) count + per-token moments + 1-row doc
        # total, all map-combined.
        ("token_burstiness", 3),
        # Skipgram lift: pmi_collocations' checkpointed-counts shape
        # with the windowed pair frame (vocab^2 x window bounded).
        ("skipgram_lift", 2),
    ],
)
def test_no_scale_killers(spark, name, max_exchanges):
    plan = _plan(spark, name)
    assert _count(plan, "CartesianProduct") == 0, f"{name}: cartesian product"
    # knn_assortativity deliberately carries NO broadcast hint on its
    # node-sized degree frame (advisor r8): the initial plan may show
    # SMJ (AQE broadcasts at runtime when the side is small; at 10^9
    # nodes SMJ on s/d IS the intended shape, not a scale killer).
    if name != "knn_assortativity":
        assert _count(plan, "SortMergeJoin") == 0, f"{name}: unexpected SMJ"
    n_ex = _count(plan, "Exchange")
    assert n_ex <= max_exchanges, f"{name}: {n_ex} exchanges > {max_exchanges}\n{plan}"


@pytest.mark.parametrize(
    "name,max_exchanges,max_smj,max_bnlj",
    [
        # Broadcast enrichment + bucketed shift interval join (the BNLJ
        # is the 3-row shift dim broadcast with a non-equi ts predicate
        # — the correct plan for a tiny interval dim) + one
        # decimal-exact rollup (judge r5 item 3: was unguarded).
        ("oee_by_shift", 2, 0, 1),
        # Composed normalize->gate->dedup->decontaminate->cluster->
        # survive pipeline: the two SMJs are the big-big fingerprint
        # joins on the post-checkpoint corpus — the right shape when
        # neither side is broadcastable.
        ("curation_pipeline_docs", 5, 2, 0),
        # Band equi self-joins on checkpointed signatures: exactly one
        # exchange each; a second would mean the signature frame
        # re-shuffles per band.
        ("minhash_lsh_candidates", 1, 0, 0),
        # Production twin: xxhash64 + max_bucket_size cap; the cap's
        # window exchange lands before the checkpoint boundary, so the
        # visible budget matches the md5 twin.
        ("minhash_lsh_prod", 1, 0, 0),
        ("simhash_near_pairs", 1, 0, 0),
        # One signature pass feeds band join + both pair-side lookups.
        ("minhash_jaccard_est", 1, 0, 0),
        # 3 unrolled decimal-exact PageRank iterations over the kNN
        # graph: edges/degrees checkpointed once; per-iteration
        # contribution join + rank agg bound the exchange count.
        ("knn_pagerank", 8, 5, 0),
        # Cluster labels come off the checkpointed CC result: the plan
        # downstream of the checkpoint must stay exchange-free.
        ("dedup_clusters", 1, 0, 0),
        # Bucketed pair fan-out + WindowGroupLimit rank pruning.
        ("knn_graph_docs", 3, 0, 0),
        # Anti-join against the bucketed fingerprint store: the store
        # side must not re-shuffle (plan-pinned elsewhere); two
        # exchanges = new-corpus fp + pair agg.
        ("incremental_dedup_docs", 2, 0, 0),
        # Real-codec perceptual pairs: one band self-join exchange over
        # 60-bit fingerprints; pixels never cross an exchange.
        ("phash_near_dup_media", 1, 0, 0),
        # DSIR importance weights: both hashed-unigram models fit in ONE
        # bucket agg, totals are a scalar BNLJ broadcast (q11 pattern),
        # ratio table broadcasts into the per-doc fold; the 4th
        # exchange is the localCheckpoint read boundary. Text never
        # crosses an exchange (buckets + doc scalars only).
        ("dsir_weights_docs", 4, 0, 1),
        # BM25: tf agg + df-as-window-on-the-same-frame (tok) + scalar
        # (N, avgdl) agg + per-(query,doc) decimal score agg + top-k
        # window; the BNLJ is the 1-row corpus-stats broadcast (q11
        # pattern). Query terms broadcast-hash-join; posting rows carry
        # scalars only. WindowGroupLimit is asserted separately below.
        ("bm25_topk_docs", 5, 0, 1),
        # Hybrid RRF: BM25 arm (5 ex + scalar BNLJ) + dense arm
        # (broadcast probe crossJoin = 2nd BNLJ) + the full-outer
        # fusion of two n_queries*k frames — the one SMJ, on
        # metadata-sized inputs by construction (both arms top-k-pruned
        # before fusion).
        ("hybrid_rrf_topk", 10, 1, 2),
        # Deletion-neighborhood fuzzy join: equi self-join on the
        # checkpointed keyed frame; the one exchange is the pair
        # distinct. A cartesian levenshtein would show up here.
        ("fuzzy_name_pairs", 1, 0, 0),
        # PRF expansion: two BM25 rounds over the ONE checkpointed
        # posting frame; feedback set and both term frames broadcast
        # (the tiny-side left-anti would otherwise SMJ); the two BNLJ
        # are the per-round corpus-stats scalars.
        ("prf_expand_topk", 9, 0, 2),
        # Gaps-and-islands coverage merge: ONE hash exchange on
        # user_id — both window passes and the island aggregation
        # reuse the same partitioning.
        ("interval_coverage_events", 1, 0, 0),
        # ExactSubstr scrub: dup grams are a map-side-combined
        # groupBy(gh).count() + broadcast/hot-cold semi-join (r7
        # de-skew; the gram-stage shape itself is pinned in
        # test_substring.py since the dup-set checkpoint hides it
        # here); visible budget = doc_id span merge + base-vs-kept
        # alignment; the one SMJ is the doc-keyed big-big join of the
        # document table against its rebuilt kept-text — the correct
        # shape (kept text is corpus-sized at scale, never
        # broadcastable).
        ("exact_substring_scrub_docs", 3, 1, 0),
        # All-pairs KS: per-value counts + metadata-sized bucket
        # offsets + bucket-partitioned parallel prefix window + final
        # map-combined max — no global sort; the two BNLJ are the
        # scalar bounds/totals broadcasts (q11 pattern).
        ("source_ks_test", 8, 0, 2),
        # Link prediction: wedge self-join + degree attach + non-edge
        # anti-join over the CHECKPOINTED canonical edge set (graph
        # lineage never replays); global top-N is
        # TakeOrderedAndProject, not a single-partition window. The
        # SMJ are the edge-keyed big-big joins — correct at scale.
        ("knn_link_prediction", 5, 3, 0),
        # k-core tail plan (rounds are checkpointed; this pins the
        # final degree agg only — per-round shapes are the operator's
        # own semi-join + agg, lineage never grows).
        ("knn_kcore", 1, 0, 0),
        # Skyline: bucketed parallel-prefix MAX — the two BNLJ are the
        # scalar bounds + metadata offset broadcasts; the only
        # unpartitioned window runs on the B-row bucket frame.
        ("pareto_frontier_docs", 6, 0, 2),
        # r7 eval wave. Contamination matrix: distinct (source, gh)
        # checkpoint + bounded-fanout shingle self-join + pair agg
        # (the SMJ allowance is the big-big shingle join at scale;
        # sizes broadcast).
        ("source_overlap_jaccard", 4, 1, 0),
        # IR-eval triple: the BNLJ is the broadcast-query brute-force
        # arm (audited operator); metric joins run on n_queries rows.
        ("retrieval_label_eval", 4, 1, 1),
        # LSH measured recall: both ANN arms' plans plus two
        # metadata-sized metric joins.
        ("lsh_recall_eval", 9, 2, 2),
        # Fisher scores: one explode + two bucket aggs, scalars only.
        ("label_fisher_scores", 3, 0, 0),
        # Temperature mixture: sizes agg + scalar BNLJ (q11 pattern) +
        # per-source draw window.
        ("mixture_temperature_docs", 4, 0, 1),
        # A/B z-test: user fold + 2-row arm rollup + 1-row widen.
        ("conversion_ab_test", 3, 0, 0),
        # MAD screen: two grouped exact percentiles (broadcast back) +
        # counting pass, all keyed by event_type.
        ("value_mad_outliers", 4, 0, 0),
        # Neyman allocation: decimal stats agg + scalar BNLJ + draw
        # window (the mixture pattern).
        ("neyman_allocation_sample", 4, 0, 1),
        # Novelty: distinct (doc, gh) checkpoint + map-combined count +
        # df-bounded membership join + per-doc integer ratio.
        ("doc_novelty_scores", 4, 1, 0),
        # Quality-aware survivor: one max_by over the checkpointed
        # cluster assignment joined to the map-only quality scan.
        ("cluster_best_survivors", 3, 1, 0),
        # Chunk-granularity BM25: bm25_topk_docs' plan over the chunk
        # frame (tf agg + df window + scalar BNLJ + score agg + top-k).
        ("bm25_chunks_topk", 6, 0, 1),
        # r8. Hard-triplet mining: ONE broadcast-anchor corpus pass
        # (the BNLJ, brute_force_topk pattern) + the per-anchor
        # conditional aggregate — integer argmax keys, no window.
        ("hard_triplet_mining", 2, 0, 1),
        # KN bigram LM: bigram checkpoint feeds model build (c2 agg;
        # ctx/cont are per-key row counts OF c2, not corpus passes) +
        # scoring joins on the bigram key + per-doc fold; the BNLJ is
        # the 1-row Nbb scalar broadcast (q11 pattern).
        ("kn_lm_score_docs", 7, 0, 1),
        # r8 third session. Clustering coefficient = triangle_counts'
        # pinned shape (wedge joins on the checkpointed canonical edge
        # set; SMJ are the edge-keyed big-big joins, correct at scale)
        # + one integer projection.
        ("knn_clustering_coeff", 6, 3, 0),
        # Personalized PageRank: knn_pagerank's fixed-iteration shape
        # with the seed column riding the checkpointed node frame —
        # per-round one contribution agg + one node-keyed join (SMJ at
        # this SF where stats don't broadcast the rank frame).
        ("knn_ppr", 8, 5, 0),
        # Containment: checkpointed (doc, shingle) frame -> shingle
        # pair join + pair agg + broadcast size joins; both directions
        # derived from the one undirected intersection count (a second
        # pair join is the regression).
        ("containment_pairs_docs", 6, 0, 0),
        # r8 fourth session. Curation audit: the pipeline's own frames
        # re-joined per doc; the SMJ is the fp-keyed winner join-back
        # (corpus-sized both sides — correct at scale, AQE skew-split
        # handles a mega-duplicated fingerprint; a window over
        # norm_fp would hit the same reducer WITHOUT the skew
        # handling). Holdout/contamination flags broadcast; the
        # cluster assignment rides its checkpoint.
        ("curation_audit_docs", 4, 1, 0),
        ("curation_stage_attrition", 5, 1, 0),
    ],
)
def test_heavy_plan_budgets(spark, name, max_exchanges, max_smj, max_bnlj):
    """Budgets for the most expensive bench queries (judge r5 item 3):
    cartesian always forbidden; SMJ/BNLJ allowed only where it is the
    documented correct shape, at a pinned count."""
    plan = _plan(spark, name)
    assert _count(plan, "CartesianProduct") == 0, f"{name}: cartesian product"
    n_smj = _count(plan, "SortMergeJoin")
    assert n_smj <= max_smj, f"{name}: {n_smj} SMJ > {max_smj}\n{plan}"
    n_bnlj = _count(plan, "BroadcastNestedLoopJoin")
    assert n_bnlj <= max_bnlj, f"{name}: {n_bnlj} BNLJ > {max_bnlj}\n{plan}"
    n_ex = _count(plan, "Exchange")
    assert n_ex <= max_exchanges, f"{name}: {n_ex} exchanges > {max_exchanges}\n{plan}"


def test_oee_enrichment_is_broadcast(spark):
    plan = _plan(spark, "oee_flagship")
    assert _count(plan, "BroadcastHashJoin") >= 3  # PO + PQ + ES-bucket joins


def test_scans_prune_columns(spark):
    """Column pruning reaches the parquet scan: the lineitem read under
    q1 must not materialize all 16 columns."""
    plan = _plan(spark, "q1_pricing_summary")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in plan"
    cols = [c for c in m.group(1).split(",") if c]
    assert len(cols) <= 7, f"q1 lineitem scan reads {len(cols)} cols: {cols}"


def test_filter_pushdown_reaches_scan(spark):
    """q6-style predicate must appear in PushedFilters."""
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan).group(1)
    assert "IsNotNull" in pushed or "GreaterThan" in pushed, pushed


def test_q11_scalar_is_broadcast_not_cartesian(spark):
    """The Q11 total is a 1-row broadcast: BroadcastNestedLoopJoin with a
    single-row build side (legitimate scalar pattern), never a
    CartesianProduct, and the heavy side shuffles at most thrice
    (per-supplier agg, global total, re-join alignment)."""
    plan = _plan(spark, "q11_important_suppliers")
    assert _count(plan, "CartesianProduct") == 0
    assert _count(plan, "Exchange") <= 3
    assert _count(plan, "BroadcastNestedLoopJoin") <= 1


def test_topk_pushes_group_limit(spark):
    """stratified_topk must keep Spark's WindowGroupLimit (partial top-k
    below the exchange) — the property that bounds shuffle volume to
    k rows/group/mapper at any SF."""
    plan = _plan(spark, "quality_topk_per_source")
    assert "WindowGroupLimit" in plan


def test_domain_cap_window_group_limit(spark):
    """domain_cap_docs' literal cap must engage WindowGroupLimit so each
    map task prunes to <= cap rows per source before the shuffle."""
    plan = _plan(spark, "domain_cap_docs")
    assert "WindowGroupLimit" in plan


def test_bm25_group_limit(spark):
    """bm25_topk_docs' per-query top-k must engage WindowGroupLimit so
    each map task prunes to <= k candidate rows per query before the
    final exchange."""
    plan = _plan(spark, "bm25_topk_docs")
    assert "WindowGroupLimit" in plan


def test_tfidf_group_limit_and_shape(spark):
    """tfidf_top_terms: the per-doc top-3 cut must engage
    WindowGroupLimit, doc-frequency comes from a window over the SAME
    tf frame (a tf-df self-join would recompute the tokenize lineage
    twice — exactly 2 parquet scans allowed: the tf lineage + the
    1-row corpus count), and the exchange count stays bounded (tf agg,
    tok window, corpus count, final window)."""
    plan = _plan(spark, "tfidf_top_terms")
    assert "WindowGroupLimit" in plan
    assert _count(plan, "CartesianProduct") == 0
    assert len(re.findall(r"Scan parquet", plan.split("\n\n")[0])) <= 2, plan
    assert _count(plan, "Exchange") <= 4, plan


def test_quality_cut_scalar_broadcast(spark):
    """quality_cut_docs: the global p75 threshold must come back as a
    1-row broadcast (BroadcastNestedLoopJoin — the q11/q15 scalar
    pattern), never a cartesian; one aggregation exchange for the
    percentile, nothing else."""
    plan = _plan(spark, "quality_cut_docs")
    assert _count(plan, "CartesianProduct") == 0
    assert _count(plan, "BroadcastNestedLoopJoin") == 1
    assert _count(plan, "Exchange") <= 1, plan


def test_knn_graph_shape(spark):
    """knn_graph_docs: the per-vector top-k must engage WindowGroupLimit
    (map-side rank pruning before the rank exchange), no cartesian —
    the bucket self-join is the only pair generator."""
    plan = _plan(spark, "knn_graph_docs")
    assert _count(plan, "CartesianProduct") == 0
    assert "WindowGroupLimit" in plan
    assert _count(plan, "Exchange") <= 3, plan


def test_minhash_est_single_signature_pass(spark):
    """minhash_jaccard_est: the checkpointed signature frame feeds the
    band join AND both pair-side signature lookups — the shingle/md5
    lineage must not appear in the plan at all (it ran once at
    checkpoint time), and the joins stay equi (no cartesian)."""
    plan = _plan(spark, "minhash_jaccard_est")
    assert _count(plan, "CartesianProduct") == 0
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan
    assert "md5" not in plan, "signature lineage re-runs in the join plan"
    assert _count(plan, "Exchange") <= 4, plan


def test_corpus_diff_shape(spark):
    """corpus_diff: full-outer fingerprint join — big-big on doc_id, so
    SMJ is the CORRECT shape (broadcast would be wrong at scale); two
    exchanges (one per side), and only (id, fp) columns move: the text
    column must not appear in the join output schema."""
    plan = _plan(spark, "corpus_diff")
    assert _count(plan, "CartesianProduct") == 0
    assert _count(plan, "SortMergeJoin") == 1, plan
    assert _count(plan, "Exchange") <= 2, plan


def test_rarity_single_tokenize_pass(spark):
    """rarity_score_docs: the tf and scored checkpoints must absorb the
    tokenize lineage — the final plan reads NO parquet (measured
    without them: 4 scans / 11 exchanges, the broadcast aggregates
    each replaying the explode) and keeps one exchange (threshold
    agg); the decile thresholds come back broadcast, never a global
    sort."""
    plan = _plan(spark, "rarity_score_docs")
    assert _count(plan, "CartesianProduct") == 0
    assert "Scan parquet" not in plan.split("\n\n")[0], plan
    assert _count(plan, "Exchange") <= 1, plan


def test_incremental_dedup_shape(spark):
    """incremental_dedup_docs: the banded frame is checkpointed (one
    signature pass over all docs); the two remaining parquet scans are
    the disjoint corpus/incoming fingerprint projections. Anti-joins
    stay equi — no cartesian."""
    plan = _plan(spark, "incremental_dedup_docs")
    assert _count(plan, "CartesianProduct") == 0
    assert len(re.findall(r"Scan parquet", plan.split("\n\n")[0])) <= 2, plan
    assert _count(plan, "Exchange") <= 3, plan


def test_centroid_family_shapes(spark):
    """label_centroids: ONE aggregation exchange over the posexplode —
    partial sums combine map-side, vectors never shuffle whole.
    embedding_outliers: centroid frame broadcasts back (BHJ), the
    shortlist engages WindowGroupLimit."""
    plan = _plan(spark, "label_centroids")
    assert _count(plan, "Exchange") <= 1, plan
    assert _count(plan, "CartesianProduct") == 0
    plan = _plan(spark, "embedding_outliers")
    assert _count(plan, "BroadcastHashJoin") == 1, plan
    assert "WindowGroupLimit" in plan
    assert _count(plan, "Exchange") <= 3, plan


def test_contamination_report_broadcast(spark):
    """contamination_report: the holdout gram set is the broadcast side
    (corpus never shuffles); one aggregation exchange over the hits
    plus the broadcast build."""
    plan = _plan(spark, "contamination_report")
    assert _count(plan, "BroadcastHashJoin") == 1, plan
    assert _count(plan, "CartesianProduct") == 0
    assert _count(plan, "Exchange") <= 2, plan


def test_label_propagation_shape(spark):
    """knn_label_propagation: no cartesian; the majority vote is a
    max_by aggregation (no second vote window — a rank formulation
    would add a (vec_id, label) -> vec_id re-exchange); bounded
    exchanges on top of the knn-graph plan."""
    plan = _plan(spark, "knn_label_propagation")
    assert _count(plan, "CartesianProduct") == 0
    assert "max_by" in plan
    assert _count(plan, "Exchange") <= 8, plan


def test_pagerank_iterations_materialized(spark):
    """knn_pagerank: the edge frame must be checkpointed ONCE — the
    final plan re-reads it per iteration instead of replaying the
    bucket self-join lineage (no md5/bucket-join operators may appear),
    and each of the 3 rounds costs one join + one aggregation
    exchange."""
    plan = _plan(spark, "knn_pagerank")
    assert _count(plan, "CartesianProduct") == 0
    assert "Scan ExistingRDD" in plan  # checkpointed edges
    assert _count(plan, "Exchange") <= 10, plan



def test_hybrid_dedup_shape(spark):
    """hybrid_dedup_pairs: both generators stay blocked (no cartesian),
    and the provenance merge is one aggregation over pair scalars."""
    plan = _plan(spark, "hybrid_dedup_pairs")
    assert _count(plan, "CartesianProduct") == 0
    assert _count(plan, "Exchange") <= 6, plan


def test_winnow_decon_shape(spark):
    """winnow_decontaminate_docs: fingerprint lineage materialized once
    (checkpoint), rare-fp gate + holdout semi-joins stay bounded; the
    one SMJ (rare-fp alignment) is an acceptable signature-sized join,
    but a cartesian or an unbounded exchange count is a regression."""
    plan = _plan(spark, "winnow_decontaminate_docs")
    assert _count(plan, "CartesianProduct") == 0
    assert _count(plan, "Exchange") <= 6, plan
    assert _count(plan, "SortMergeJoin") <= 1, plan


def test_triangle_and_jaccard_join_shapes(spark):
    """knn_triangles: three bounded-degree self-joins (post-checkpoint
    SMJs on tiny canonical-edge frames are fine; a cartesian is not).
    jaccard_join_docs: prefix-bucket candidate join + verify joins —
    bounded exchanges, no cartesian, no nested loop."""
    for name, max_ex in (("knn_triangles", 7), ("jaccard_join_docs", 7)):
        plan = _plan(spark, name)
        assert _count(plan, "CartesianProduct") == 0, name
        assert _count(plan, "BroadcastNestedLoopJoin") == 0, name
        assert _count(plan, "Exchange") <= max_ex, (name, plan)


@pytest.mark.parametrize(
    "name,max_exchanges,max_bnlj",
    [
        # One max_by shuffle; tombstone filter is a scan-stage predicate.
        ("cdc_user_state", 1, 0),
        # Basket: (order,part) distinct + in-basket pair agg + frequency
        # rollups; the single-row order-count joins as a 1-row BNLJ
        # (legitimate scalar broadcast, q11 pattern).
        ("basket_part_pairs", 5, 1),
        # Six integer moments, one map-combined shuffle.
        ("value_hour_correlation", 1, 0),
        # Contingency grid: counts + metadata-sized row/col/total
        # rollups; 1-row totals join as scalar BNLJs.
        ("type_hour_chi2", 8, 2),
        # Two percentile passes with |types|-row broadcasts between.
        ("mad_outliers_by_type", 3, 0),
        # Train/test aggregations + types x 24 grid; scalar split-day
        # and n-days rows join as BNLJs.
        ("seasonal_forecast_backtest", 8, 4),
    ],
)
def test_stats_wave_shapes(spark, name, max_exchanges, max_bnlj):
    plan = _plan(spark, name)
    assert _count(plan, "CartesianProduct") == 0, name
    assert _count(plan, "SortMergeJoin") == 0, name
    assert _count(plan, "Exchange") <= max_exchanges, (name, plan)
    assert _count(plan, "BroadcastNestedLoopJoin") <= max_bnlj, (name, plan)
