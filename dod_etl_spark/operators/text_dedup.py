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
- All hashing is md5-based (deterministic across engines/runs); the
  per-permutation hash is md5(k || shingle) truncated to 16 hex chars,
  and min() over fixed-width hex strings == min() over the integers
  they encode, so signatures stay strings end-to-end (no bigint
  overflow concerns).
- SimHash: one explode over (doc, token) × 16 bit positions, two
  aggregations — linear in corpus size, no pairwise work at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import stable_round
from dod_etl_spark.functions.text import char_ngrams, distinct_tokens, md5_prefix_long


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_len: int = 5,
) -> DataFrame:
    """Wide per-document signature: (id, h0..h{K-1}).

    One explode to (doc, shingle), then ONE aggregation computing all K
    permutation minima as separate min() aggs — no K-way row
    multiplication, and the partial (map-side) aggregation collapses
    each partition to one row per doc before the only shuffle. At 100 TB
    this is the difference between shuffling K×|shingles| rows and
    shuffling |docs| rows."""
    sh = docs.select(
        F.col(id_col), F.explode(F.array_distinct(char_ngrams(F.col(text_col), shingle_len))).alias("shingle")
    )
    aggs = [
        F.min(
            F.substring(F.md5(F.concat(F.lit(str(k)), F.col("shingle")).cast("binary")), 1, 16)
        ).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_bands(
    signatures: DataFrame,
    id_col: str = "doc_id",
    band_size: int = 2,
    num_hashes: int = 8,
) -> DataFrame:
    """(id, band, band_hash): LSH banding by concatenating band_size
    consecutive signature columns — a shuffle-free unpivot (stack) of the
    wide signature frame."""
    n_bands = num_hashes // band_size
    pairs = ", ".join(
        f"{b}, concat({', '.join(f'h{b * band_size + i}' for i in range(band_size))})"
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
) -> DataFrame:
    """Distinct candidate pairs (id_1 < id_2) sharing >= 1 LSH band, with
    the number of matching bands."""
    bands = minhash_bands(
        minhash_signatures(docs, id_col, text_col, num_hashes, shingle_len),
        id_col,
        band_size,
        num_hashes,
    )
    a = bands.select(F.col(id_col).alias("id_1"), "band", "band_hash")
    b = bands.select(F.col(id_col).alias("id_2"), "band", "band_hash")
    pairs = a.join(b, ["band", "band_hash"]).filter(F.col("id_1") < F.col("id_2"))
    return pairs.groupBy("id_1", "id_2").agg(F.count(F.lit(1)).alias("n_bands"))


def simhash16(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """16-bit SimHash fingerprint over distinct lowercase tokens.

    bit_j(doc) = sign( Σ_tokens (2·bit_j(md5_32(token)) − 1) ) — the
    classic Charikar construction, md5-based for cross-engine
    determinism."""
    toks = docs.select(
        F.col(id_col), F.explode(distinct_tokens(F.col(text_col))).alias("token")
    ).withColumn("h32", md5_prefix_long(F.col("token")))
    # All 16 bit-position sums as wide aggregations over the (doc, token)
    # rows — no 16× row multiplication, ONE shuffle with map-side combine
    # (integer ±1 sums are exact, so this is bit-identical to the
    # per-position formulation).
    aggs = [
        F.sum(F.expr(f"(shiftright(h32, {j}) & 1) * 2 - 1")).alias(f"_s{j}")
        for j in range(16)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    fp_bits = [
        F.when(F.col(f"_s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
        for j in range(16)
    ]
    fp_expr = fp_bits[0]
    for b in fp_bits[1:]:
        fp_expr = fp_expr + b
    return sums.select(F.col(id_col), fp_expr.alias("simhash16"))


def simhash_near_pairs(
    fingerprints: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "simhash16",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance, band-blocked.

    Pigeonhole: two 16-bit fingerprints within hamming distance
    (n_bands - 1) share at least one exact 4-bit band — so candidates
    come from an equi self-join on (band, band_bits), never N². The
    exact hamming filter then runs on candidates only. For
    max_hamming >= n_bands the guarantee weakens (documented recall
    trade, standard practice)."""
    width = 16 // n_bands
    mask = (1 << width) - 1
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
    pairs = (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", "_fp1", "_fp2")
        .distinct()
    )
    hamming = F.bit_count(F.expr("_fp1 ^ _fp2"))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_1", "id_2", "hamming")
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
    grams = docs.select(
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
