"""Near-duplicate detection operators for document corpora: MinHash+LSH,
SimHash, and n-gram Jaccard — the dedup family a 100 TB training-data
pipeline runs before anything else.

Scale design notes
------------------
- MinHash: explode to (doc, shingle) pairs — the shuffle is on doc_id
  and is the irreducible cost; signatures are tiny afterwards. Band
  buckets then self-join on (band, band_hash): candidate pairs are
  produced by a hash join whose build side is only bucket collisions,
  never the full N² cross product.
- All hashing is md5-based (deterministic across engines/runs). Each
  shingle is md5-hashed ONCE; the K permutation values derive from that
  32-bit hash by affine mixing (a_k·h + b_k) mod P with P prime > 2^32 —
  a_k < 2^31 keeps every product < 2^63, so the arithmetic is exact in
  any engine's BIGINT (DuckDB raises on overflow rather than wrapping,
  so staying under 2^63 is a correctness requirement, not a nicety).
  This is ~K× cheaper than hashing K times per shingle — at 100 TB the
  md5 over the shingle stream IS the dominant CPU cost.
- SimHash: one explode over (doc, token) × n_bits positions, two
  aggregations — linear in corpus size, no pairwise work at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dod_etl_spark.catalog import spread
from dod_etl_spark.functions.scalar import stable_round
from dod_etl_spark.functions.text import char_ngrams, distinct_tokens, md5_prefix_long

# Smallest prime above 2^32; affine permutation modulus for MinHash.
MINHASH_PRIME = 4294967311


def minhash_perm_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_k, b_k) for the affine permutations. a_k is odd
    and < 2^31 (product with a 32-bit hash stays < 2^63); derived by
    Knuth multiplicative mixing so the same literals appear in the
    DuckDB oracle."""
    out = []
    for k in range(num_hashes):
        a = ((k + 1) * 2654435761) % (1 << 31) | 1
        b = ((k + 1) * 40503) % MINHASH_PRIME
        out.append((a, b))
    return out


def shingle_hash(shingle, hash_fn: str = "md5"):
    """32-bit-ranged shingle hash column.

    md5 (default): bit-identical in any engine — the ORACLE-CHECKABLE
    choice; every correctness pairing in queries/ uses it.
    xxhash64: Spark-native codegen'd hash — the PRODUCTION throughput
    choice when cross-engine replay isn't needed. Measured 1.5x
    end-to-end on sf0.1 minhash_candidates (2.40s -> 1.56s steady
    state); the gap grows with document length because the hash stream
    scales with shingle count while the band join does not. Identical
    dedup quality (both uniform on 32 bits).
    """
    if hash_fn == "md5":
        return md5_prefix_long(shingle)
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(shingle), F.lit(1 << 32)).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r} (md5|xxhash64)")


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_len: int = 5,
    hash_fn: str = "md5",
) -> DataFrame:
    """Wide per-document signature: (id, h0..h{K-1}), h_k BIGINT.

    One explode to (doc, shingle), ONE md5 per shingle, then ONE
    aggregation computing all K permutation minima as separate min()
    aggs over affine mixes of the shared hash — no K-way row
    multiplication and no K-way hashing; the partial (map-side)
    aggregation collapses each partition to one row per doc before the
    only shuffle. At 100 TB this is the difference between shuffling
    K×|shingles| rows and shuffling |docs| rows."""
    sh = spread(docs).select(
        F.col(id_col), F.explode(F.array_distinct(char_ngrams(F.col(text_col), shingle_len))).alias("shingle")
    ).withColumn("_h32", shingle_hash(F.col("shingle"), hash_fn))
    aggs = [
        F.min((F.lit(a) * F.col("_h32") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"h{k}")
        for k, (a, b) in enumerate(minhash_perm_params(num_hashes))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_bands(
    signatures: DataFrame,
    id_col: str = "doc_id",
    band_size: int = 2,
    num_hashes: int = 8,
) -> DataFrame:
    """(id, band, band_hash): LSH banding by joining band_size
    consecutive signature values with '_' (unambiguous for integers) — a
    shuffle-free unpivot (stack) of the wide signature frame."""
    n_bands = num_hashes // band_size
    pairs = ", ".join(
        f"{b}, concat_ws('_', {', '.join(f'h{b * band_size + i}' for i in range(band_size))})"
        for b in range(n_bands)
    )
    return signatures.select(
        id_col, F.expr(f"stack({n_bands}, {pairs}) AS (band, band_hash)")
    )


def minhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_len: int = 5,
    hash_fn: str = "md5",
    max_bucket_size: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Distinct candidate pairs (id_1 < id_2) sharing >= 1 LSH band, with
    the number of matching bands. `hash_fn="xxhash64"` is the production
    throughput mode (see shingle_hash); oracles pin the md5 default.

    `max_bucket_size` is the production skew guard: a degenerate bucket
    (boilerplate corpora collapse thousands of near-identical docs into
    one (band, band_hash)) contributes |bucket|^2 pairs to the self-join
    — one 1M-doc bucket is 10^12 pairs, a single-key job-killer at
    100 TB. Buckets larger than the cap are dropped from CANDIDATE
    generation (standard MinHashLSH practice; members that duplicated
    exactly are caught by exact dedup, and near-dups that large share
    many other buckets). None (default) disables the cap — the
    oracle-checked exhaustive mode.

    The banded frame is MATERIALIZED once (eager localCheckpoint)
    before the bucket self-join. Spark plans each join input
    independently and — measured, not assumed — neither static
    ReuseExchange nor AQE runtime stage reuse deduplicates the two
    alias subtrees here, so without the checkpoint the entire
    explode+md5+signature lineage executes TWICE; at 100 TB that
    doubles the dominant CPU cost (the md5 over the shingle stream).
    The checkpoint is |docs| x n_bands tiny rows and measures
    wall-neutral at sf0.1 (~3.7s either way — local cores hide the
    duplicate work; a saturated cluster does not). In-row pair
    generation (collect_list + transforms) was tried and REJECTED:
    degenerate buckets materialize |bucket|^2 structs inside one row
    (4.0s/7.7s at sf0.1, OOM-shaped at scale), while the join streams
    the fan-out and AQE splits hot buckets."""
    bands = minhash_bands(
        minhash_signatures(docs, id_col, text_col, num_hashes, shingle_len, hash_fn),
        id_col,
        band_size,
        num_hashes,
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window

        n_in_bucket = F.count(F.lit(1)).over(
            Window.partitionBy("band", "band_hash")
        )
        bands = bands.withColumn("_bn", n_in_bucket).filter(
            F.col("_bn") <= max_bucket_size
        ).drop("_bn")
    if materialize:
        # materialize=False keeps the full logical plan visible for
        # plan-inspection tests and explain tooling.
        bands = bands.localCheckpoint(eager=True)
    a = bands.select(F.col(id_col).alias("id_1"), "band", "band_hash")
    b = bands.select(F.col(id_col).alias("id_2"), "band", "band_hash")
    pairs = a.join(b, ["band", "band_hash"]).filter(F.col("id_1") < F.col("id_2"))
    return pairs.groupBy("id_1", "id_2").agg(F.count(F.lit(1)).alias("n_bands"))


def minhash_jaccard_est(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_len: int = 5,
    hash_fn: str = "md5",
    min_est: float = 0.0,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidate pairs WITH the MinHash Jaccard estimate: fraction
    of the K signature slots on which the two documents agree —
    E[agreement] = J(A,B), the property MinHash exists for.

    `max_bucket_size` is the same production skew guard as
    minhash_candidates (None = exhaustive oracle mode): candidate
    output is quadratic in per-bucket duplication
    (tools/scaling_probe.py), so production runs cap the bucket.

    This is the decision stage of a signature-only dedup pipeline:
    candidates come from the band join, the keep/drop call comes from
    the signature agreement — the corpus TEXT is never read again. At
    100 TB that matters: the n-gram Jaccard verifier re-shuffles
    shingle sets per candidate pair, while this joins K BIGINTs per
    side onto pairs that already exist. Resolution is 1/K (K=8 ->
    0.125 steps); raise num_hashes for a finer estimate, it only
    widens the signature row.

    The signature frame is materialized once (same measured
    rationale as minhash_candidates: no exchange reuse across
    self-join aliases) and feeds BOTH the band join and the two
    pair-side signature lookups, so the shingle/md5 stream runs once.
    """
    sigs = minhash_signatures(
        docs, id_col, text_col, num_hashes, shingle_len, hash_fn
    ).localCheckpoint(eager=True)
    bands = minhash_bands(sigs, id_col, band_size, num_hashes)
    if max_bucket_size is not None:
        from pyspark.sql import Window

        n_in_bucket = F.count(F.lit(1)).over(
            Window.partitionBy("band", "band_hash")
        )
        bands = bands.withColumn("_bn", n_in_bucket).filter(
            F.col("_bn") <= max_bucket_size
        ).drop("_bn")
    a = bands.select(F.col(id_col).alias("id_1"), "band", "band_hash")
    b = bands.select(F.col(id_col).alias("id_2"), "band", "band_hash")
    pairs = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )
    s1 = sigs.select(
        F.col(id_col).alias("id_1"), *[F.col(f"h{k}").alias(f"_a{k}") for k in range(num_hashes)]
    )
    s2 = sigs.select(
        F.col(id_col).alias("id_2"), *[F.col(f"h{k}").alias(f"_b{k}") for k in range(num_hashes)]
    )
    agree = sum(
        F.when(F.col(f"_a{k}") == F.col(f"_b{k}"), 1).otherwise(0)
        for k in range(num_hashes)
    )
    est = (agree.cast("double") / F.lit(float(num_hashes))).alias("jaccard_est")
    out = (
        pairs.join(s1, "id_1")
        .join(s2, "id_2")
        .select("id_1", "id_2", est)
    )
    if min_est > 0.0:
        out = out.filter(F.col("jaccard_est") >= min_est)
    return out


def simhash_fp(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 16,
    out_col: str | None = None,
) -> DataFrame:
    """n_bits-wide SimHash fingerprint over distinct lowercase tokens
    (n_bits multiple of 4, <= 60 so shifts stay in signed-64 range).

    bit_j(doc) = sign( Σ_tokens (2·bit_j(md5(token)) − 1) ) — the classic
    Charikar construction, md5-based for cross-engine determinism.
    Width is a discrimination knob: on heavily templated corpora 16 bits
    collide en masse and the near-pair output degenerates quadratic;
    32+ bits keep bucket sizes (and the candidate join) bounded."""
    out_col = out_col or f"simhash{n_bits}"
    # Token hash is at least 32 bits wide regardless of fingerprint
    # width (bit_j reads the LOW n_bits of the same 32-bit hash for any
    # n_bits <= 32, so narrowing the fingerprint never changes the bits
    # it does keep).
    toks = spread(docs).select(
        F.col(id_col), F.explode(distinct_tokens(F.col(text_col))).alias("token")
    ).withColumn("_h", md5_prefix_long(F.col("token"), max(n_bits, 32) // 4))
    # All bit-position sums as wide aggregations over the (doc, token)
    # rows — no n_bits× row multiplication, ONE shuffle with map-side
    # combine (integer ±1 sums are exact, so this is bit-identical to
    # the per-position formulation).
    aggs = [
        F.sum(F.expr(f"(shiftright(_h, {j}) & 1) * 2 - 1")).alias(f"_s{j}")
        for j in range(n_bits)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    fp_bits = [
        F.when(F.col(f"_s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
        for j in range(n_bits)
    ]
    fp_expr = fp_bits[0]
    for b in fp_bits[1:]:
        fp_expr = fp_expr + b
    return sums.select(F.col(id_col), fp_expr.alias(out_col))


def simhash16(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """16-bit SimHash (compact fingerprint; see simhash_fp)."""
    return simhash_fp(docs, id_col, text_col, n_bits=16)


def simhash_near_pairs(
    fingerprints: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "simhash16",
    max_hamming: int = 3,
    n_bands: int = 4,
    n_bits: int = 16,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance, band-blocked.

    Pigeonhole: two fingerprints within hamming distance (n_bands - 1)
    share at least one exact band — so candidates come from an equi
    self-join on (band, band_bits), never N². The exact hamming filter
    then runs on candidates only. For max_hamming >= n_bands the
    guarantee weakens (documented recall trade, standard practice).

    The fingerprint frame is materialized once (eager localCheckpoint)
    before the self-join — same rationale as minhash_candidates: no
    exchange/stage reuse fires across the two alias subtrees, so the
    explode + md5 + n_bits-aggregation lineage would execute once per
    side."""
    width = n_bits // n_bands
    mask = (1 << width) - 1
    fingerprints = fingerprints.localCheckpoint(eager=True)
    banded = fingerprints.select(
        F.col(id_col),
        F.col(fp_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn("band_bits", F.expr(f"shiftright({fp_col}, band * {width}) & {mask}"))
    a = banded.select(
        F.col(id_col).alias("id_1"), F.col(fp_col).alias("_fp1"), "band", "band_bits"
    )
    b = banded.select(
        F.col(id_col).alias("id_2"), F.col(fp_col).alias("_fp2"), "band", "band_bits"
    )
    # The hamming cut runs BEFORE the distinct: it is a per-row bit op
    # (row-order independent, so filter∘distinct == distinct∘filter)
    # and discards ~98% of the raw bucket fan-out, so the distinct's
    # exchange carries the surviving pairs only — on 16-bit
    # fingerprints the bucket join emits |bucket|^2-shaped volume and
    # this ordering is the difference between deduplicating millions
    # of rows and tens of thousands.
    hamming = F.bit_count(F.expr("_fp1 ^ _fp2"))
    return (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("id_1") < F.col("id_2"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_1", "id_2", "hamming")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    block_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.25,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs inside a
    blocking key (same `block_col` value). Blocking bounds the pairwise
    work to per-block cardinality — at scale the block key is an LSH
    bucket or minhash band, not a metadata column."""
    grams = spread(docs).select(
        F.col(id_col),
        F.col(block_col).alias("_block"),
        F.array_distinct(char_ngrams(F.col(text_col), n)).alias("_grams"),
    )
    a = grams.select(
        F.col(id_col).alias("id_1"), F.col("_block"), F.col("_grams").alias("_g1")
    )
    b = grams.select(
        F.col(id_col).alias("id_2"), F.col("_block"), F.col("_grams").alias("_g2")
    )
    pairs = a.join(b, "_block").filter(F.col("id_1") < F.col("id_2"))
    inter = F.size(F.array_intersect(F.col("_g1"), F.col("_g2"))).cast("double")
    union = (F.size(F.col("_g1")) + F.size(F.col("_g2"))).cast("double") - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", stable_round("jaccard", 4).alias("jaccard"))
    )


def minhash_cluster_edges(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_len: int = 5,
    hash_fn: str = "md5",
) -> DataFrame:
    """Connectivity-equivalent star contraction of the LSH candidate
    graph, for CLUSTERING consumers: per (band, band_hash) bucket,
    every member connects to the bucket minimum — k-1 edges where
    minhash_candidates emits the k(k-1)/2 verification pairs. The
    transitive closure is identical (a bucket is a clique either way;
    a star spans it), but the component step never materializes
    cliques: at sf0.1 this is ~20k edges instead of 2.9M pairs, and at
    100 TB it is the difference between edge volume ~ corpus size and
    edge volume ~ sum of squared bucket sizes. Window-min over the
    bucket (single shuffle), no join."""
    from pyspark.sql import Window

    bands = minhash_bands(
        minhash_signatures(docs, id_col, text_col, num_hashes, shingle_len, hash_fn),
        id_col,
        band_size,
        num_hashes,
    )
    bucket_min = F.min(id_col).over(Window.partitionBy("band", "band_hash"))
    return (
        bands.select(F.col(id_col).alias("id_1"), bucket_min.alias("id_2"))
        .filter(F.col("id_1") != F.col("id_2"))
        .distinct()
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS local fingerprinting scheme): hash every k-gram, slide a
    window of `window` consecutive hashes, select each window's
    MINIMUM, emit the distinct selected hashes per document.

    Guarantee: any shared substring of length >= k + window - 1
    between two documents yields at least one shared selected
    fingerprint — the property that makes this the standard primitive
    for plagiarism / contamination / copied-span detection, where
    MinHash (whole-document Jaccard) dilutes a short verbatim copy
    inside a long document.

    Windows are suffix-capped: the frame [pos, pos + window - 1] is
    clipped at the k-gram sequence end (slice() caps identically to a
    ROWS BETWEEN window, which is what the DuckDB oracle uses), so a
    document shorter than one window still emits its global minimum.
    Selection density is the textbook 2/(window+1).

    Scale: winnowing is PER-DOCUMENT LOCAL, so the whole selection is
    array arithmetic in the scan stage — hash the k-gram array once,
    slide the window with slice()+array_min(), dedup with
    array_distinct(), explode the selected set. ZERO exchanges (an
    explode + window-function formulation would shuffle the entire
    k-gram stream on doc_id for no semantic gain); output is
    ~2·|kgrams|/(window+1) rows of (id, BIGINT) — signature-sized,
    never corpus-sized.

    The hash array is materialized in its OWN projection before the
    window pass: if the md5 transform is inlined into the selection
    lambda, every slice re-evaluates the whole hash array — O(n²) md5
    per document instead of O(n). Measured at sf0.1: 41.6 s inlined
    vs 0.9 s materialized for the identical 558k-row output (the
    separate select is a real projection boundary; CollapseProject
    keeps it because the array is non-cheap and multiply-referenced).
    """
    hashes = F.transform(
        char_ngrams(F.col(text_col), k), lambda g: md5_prefix_long(g)
    )
    # NULL text yields a NULL hash array and would emit one junk
    # (id, NULL) fingerprint row — drop dirt at the scan, not in
    # every consumer (tests/test_dirty_corpus.py).
    step = (
        spread(docs)
        .filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), hashes.alias("_hs"))
    )
    sel = F.transform(
        F.sequence(F.lit(1), F.size(F.col("_hs"))),
        lambda i: F.array_min(F.slice(F.col("_hs"), i, window)),
    )
    return step.select(
        F.col(id_col), F.explode(F.array_distinct(sel)).alias("fp")
    )


def winnow_shared_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_shared: int = 3,
    max_bucket_size: int = 50,
) -> DataFrame:
    """Copied-span candidate pairs: documents sharing >= `min_shared`
    winnowed fingerprints, with the shared count as match evidence.

    The fingerprint self-join is bucketed by fp value — same shape as
    the LSH band join, candidates only ever come from hash-equal
    buckets. `max_bucket_size` drops fingerprints selected by more
    documents than the cap (corpus-wide boilerplate k-grams — the
    analog of stopword removal; a fingerprint shared by thousands of
    documents carries no pair evidence but |bucket|^2 join cost).
    The fingerprint frame is materialized once before the self-join
    (no exchange reuse across alias subtrees — same measured rationale
    as minhash_candidates)."""
    from pyspark.sql import Window as W

    fps = winnow_fingerprints(docs, id_col, text_col, k, window)
    n_in_bucket = F.count(F.lit(1)).over(W.partitionBy("fp"))
    fps = (
        fps.withColumn("_bn", n_in_bucket)
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
        .localCheckpoint(eager=True)
    )
    a = fps.select(F.col(id_col).alias("id_1"), "fp")
    b = fps.select(F.col(id_col).alias("id_2"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_1") < F.col("id_2"))
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def jaccard_similarity_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT token-set Jaccard self-join: every pair with
    J(x, y) >= threshold, via prefix filtering (the PPJoin family) —
    no LSH recall loss, no N² comparison.

    Prefix theorem: order every document's distinct tokens by one
    GLOBAL total order (ascending document frequency, rarest first —
    ties broken by the token itself); if J(x,y) >= t, the two sets
    share >= ceil(t·|x|) tokens, so they cannot avoid colliding within
    each one's first |x| − ceil(t·|x|) + 1 tokens. Joining on PREFIX
    tokens only is therefore complete — and the rarest-first order
    makes those prefix buckets the smallest available, which is what
    bounds the candidate volume (joining on a stopword would be the
    |bucket|² skew disaster).

    Exactness is the contrast with minhash_candidates: this finds
    every qualifying pair and verifies the true Jaccard (array
    intersection on the two sorted token sets); MinHash trades recall
    for a fixed signature size. Cost grows with how common the rarest
    shared token is — on corpora where every near-pair shares at
    least one moderately-rare token (text with any content words),
    candidates stay near-linear; on degenerate all-stopword corpora
    prefix filtering alone cannot help and LSH is the right tool.

    One tokenize pass feeds sizes, frequencies, prefixes and the
    verification arrays (materialized once)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    from pyspark.sql import Window as W

    tok = (
        spread(docs)
        .select(
            F.col(id_col),
            F.explode(distinct_tokens(F.col(text_col))).alias("token"),
        )
        .localCheckpoint(eager=True)
    )
    arrs = tok.groupBy(id_col).agg(
        F.sort_array(F.collect_list("token")).alias("_toks"),
        F.count(F.lit(1)).alias("_n"),
    )
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    ranked = tok.join(dfreq, "token").withColumn(
        "_pos",
        F.row_number().over(
            W.partitionBy(id_col).orderBy(F.col("_df"), F.col("token"))
        ),
    )
    n_doc = F.count(F.lit(1)).over(W.partitionBy(id_col))
    prefix = (
        ranked.withColumn("_nd", n_doc)
        .filter(
            F.col("_pos")
            <= F.col("_nd") - F.ceil(F.lit(threshold) * F.col("_nd")) + 1
        )
        .select(id_col, "token", "_nd")
    )
    a = prefix.select(F.col(id_col).alias("id_1"), "token", F.col("_nd").alias("_la"))
    b = prefix.select(F.col(id_col).alias("id_2"), "token", F.col("_nd").alias("_lb"))
    # Length filter (standard PPJoin pruning): J(x,y) >= t forces
    # t·|x| <= |y| <= |x|/t — drop size-incompatible pairs before the
    # distinct/verify stages pay for them.
    cand = (
        a.join(b, "token")
        .filter(
            (F.col("id_1") < F.col("id_2"))
            & (F.col("_lb") >= F.lit(threshold) * F.col("_la"))
            & (F.col("_la") >= F.lit(threshold) * F.col("_lb"))
        )
        .select("id_1", "id_2")
        .distinct()
    )
    a_arr = arrs.select(
        F.col(id_col).alias("id_1"), F.col("_toks").alias("_ta"), F.col("_n").alias("_na")
    )
    b_arr = arrs.select(
        F.col(id_col).alias("id_2"), F.col("_toks").alias("_tb"), F.col("_n").alias("_nb")
    )
    inter = F.size(F.array_intersect(F.col("_ta"), F.col("_tb")))
    jac = inter.cast("double") / (F.col("_na") + F.col("_nb") - inter).cast("double")
    return (
        cand.join(a_arr, "id_1")
        .join(b_arr, "id_2")
        .withColumn("jaccard", stable_round(jac, 4))
        .filter(
            inter.cast("double")
            >= F.lit(threshold) * (F.col("_na") + F.col("_nb") - inter).cast("double")
        )
        .select("id_1", "id_2", "jaccard")
    )
