"""Training-data pipeline queries: dedup family, text analysis,
similarity search — over the driver's documents/embeddings tables, each
with an exact DuckDB oracle (md5-based hashing keeps both engines
bit-identical)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dod_etl_spark.functions.text import (
    LANG_PRIORITY,
    STOPWORDS,
    distinct_tokens,
    n_tokens,
    punct_count,
    quality_score,
)
from dod_etl_spark.operators.similarity import brute_force_topk
from dod_etl_spark.operators.text_dedup import (
    minhash_candidates,
    minhash_cluster_edges,
    ngram_jaccard_pairs,
    simhash16,
)
from dod_etl_spark.functions.scalar import stable_round
from dod_etl_spark.queries.base import query, sround_sql, t

# --- Exact dedup -------------------------------------------------------------

_EXACT_DEDUP_ORACLE = """
SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


@query("dedup_exact_docs", _EXACT_DEDUP_ORACLE)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: one shuffle on the content hash; the
    canonical representative is min(doc_id)."""
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy(F.md5(F.col("text").cast("binary")).alias("fp")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


# --- Text statistics / quality ----------------------------------------------

_TEXT_STATS_ORACLE = f"""
SELECT doc_id,
       length(text) AS n_chars_actual,
       len(string_split(text, ' ')) AS n_tokens,
       len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
       {sround_sql('''least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
             * (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
                      / greatest(length(text), 1))''', 4)} AS quality
FROM documents
"""


@query("text_stats", _TEXT_STATS_ORACLE)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char/punctuation stats + heuristic quality
    score — pure column expressions, no UDFs."""
    docs = t(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        F.length(text).alias("n_chars_actual"),
        n_tokens(text).alias("n_tokens"),
        punct_count(text).alias("n_punct"),
        stable_round(quality_score(text), 4).alias("quality"),
    )


# --- Language ID (n-gram/stopword heuristic) ---------------------------------


def _lang_case_sql() -> str:
    # DuckDB list literal: ['the', 'and', ...]
    hit_exprs = {
        lang: "len(list_intersect(toks, [" + ", ".join(f"'{w}'" for w in words) + "]))"
        for lang, words in STOPWORDS.items()
    }
    cols = ",\n         ".join(f"{e} AS hits_{lang}" for lang, e in hit_exprs.items())
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in LANG_PRIORITY) + ")"
    case = "CASE " + " ".join(
        f"WHEN hits_{lang} = best THEN '{lang}'" for lang in LANG_PRIORITY
    ) + " END"
    return f"""
WITH toksed AS (
  SELECT doc_id, lang AS actual_lang,
         list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS toks
  FROM documents
),
hits AS (
  SELECT doc_id, actual_lang,
         {cols}
  FROM toksed
),
best AS (SELECT *, {best} AS best FROM hits)
SELECT doc_id, actual_lang, {case} AS predicted_lang
FROM best
"""


@query("lang_id_heuristic", _lang_case_sql())
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-hit argmax with fixed priority
    tiebreak (LANG_PRIORITY order)."""
    docs = t(spark, sf_dir, "documents")
    out = docs.select(
        "doc_id", F.col("lang").alias("actual_lang"), distinct_tokens(F.col("text")).alias("toks")
    )
    for lang, words in STOPWORDS.items():
        out = out.withColumn(
            f"hits_{lang}",
            F.size(F.array_intersect(F.col("toks"), F.array(*[F.lit(w) for w in words]))),
        )
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANG_PRIORITY])
    expr = None
    for lang in LANG_PRIORITY:
        cond = F.col(f"hits_{lang}") == best
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return out.select("doc_id", "actual_lang", expr.alias("predicted_lang"))


# --- MinHash + LSH near-dup candidates ---------------------------------------


def _minhash_oracle(
    num_hashes: int = 8,
    band_size: int = 2,
    table: str = "documents",
    text: str = "text",
) -> str:
    """Mirror of operators.text_dedup: one md5 per shingle, affine
    permutation mixes (same literal constants), '_'-joined band keys.
    `table`/`text` let composed oracles run the same minhash over a
    CTE (e.g. the post-gate post-dedup corpus) instead of raw
    documents."""
    from dod_etl_spark.operators.text_dedup import MINHASH_PRIME, minhash_perm_params

    mins = ",\n         ".join(
        f"min(({a} * h32 + {b}) % {MINHASH_PRIME}) AS h{k}"
        for k, (a, b) in enumerate(minhash_perm_params(num_hashes))
    )
    n_bands = num_hashes // band_size
    band_rows = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws('_', {hs}) AS band_hash FROM mh".format(
            b=b,
            hs=", ".join(
                f"CAST(h{b * band_size + i} AS VARCHAR)" for i in range(band_size)
            ),
        )
        for b in range(n_bands)
    )
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest([substr({text}, i, 5)
                   for i in range(1, greatest(length({text}) - 3, 2))]) AS shingle
    FROM {table}
  )
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h32 FROM sh
),
mh AS (
  SELECT doc_id,
         {mins}
  FROM hashed GROUP BY doc_id
),
bands AS (
  {band_rows}
)
SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS n_bands
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


@query("minhash_lsh_candidates", _minhash_oracle())
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8 perms)+LSH(4 bands of 2) candidate pairs
    (shingle→minhash→band→bucket-join; operators/text_dedup.py)."""
    docs = t(spark, sf_dir, "documents")
    return minhash_candidates(docs, num_hashes=8, band_size=2, shingle_len=5)


# --- n-gram Jaccard pairs ----------------------------------------------------

_JACCARD_ORACLE = f"""
WITH grams AS (
  SELECT doc_id, source,
         list_distinct([substr(text, i, 3)
                        for i in range(1, greatest(length(text) - 1, 2))]) AS g
  FROM documents
)
SELECT a.doc_id AS id_1, b.doc_id AS id_2,
       {sround_sql('''CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
             / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))''', 4)} AS jaccard
FROM grams a JOIN grams b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.25
"""


@query("ngram_jaccard_pairs", _JACCARD_ORACLE)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over source-blocked candidate pairs."""
    docs = t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, block_col="source", n=3, threshold=0.25)


# --- SimHash fingerprints ----------------------------------------------------

_SIMHASH_ORACLE = """
WITH toks AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS token
    FROM documents
  )
),
bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN ((('0x' || substr(md5(token), 1, 8))::BIGINT >> j) & 1) = 1
                  THEN 1 ELSE -1 END) AS s
  FROM toks CROSS JOIN (SELECT unnest(range(16)) AS j)
  GROUP BY doc_id, j
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash16
FROM bits GROUP BY doc_id
"""


@query("simhash_fingerprints", _SIMHASH_ORACLE)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document (Charikar construction, md5 bits)."""
    docs = t(spark, sf_dir, "documents")
    return simhash16(docs)


# --- Embedding cosine top-k --------------------------------------------------

_COSINE_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         {sround_sql('''CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) > 0
                    THEN list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                    ELSE 0.0 END''', 3)} AS cosine
  FROM q CROSS JOIN c
  WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= 5
"""


@query("cosine_topk", _COSINE_ORACLE)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 10 vectors — the exact
    baseline for ANN (operators/similarity.py; the LSH-bucketed variant
    is the scale path, tested separately)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(queries, emb, k=5)


# --- Document fingerprint (rolling-hash winnowing) ---------------------------

_FPRINT_ORACLE = """
WITH grams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest([substr(text, i, 8)
                   for i in range(1, greatest(length(text) - 6, 2))]) AS g
    FROM documents
  )
)
SELECT doc_id, min(substr(md5(g), 1, 16)) AS fingerprint, count(*) AS n_grams
FROM grams GROUP BY doc_id
"""


@query("doc_fingerprint", _FPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: min 8-gram hash + distinct
    gram count."""
    from dod_etl_spark.functions.text import char_ngrams

    from dod_etl_spark.catalog import spread

    docs = t(spark, sf_dir, "documents")
    grams = spread(docs).select(
        "doc_id", F.explode(F.array_distinct(char_ngrams(F.col("text"), 8))).alias("g")
    )
    return grams.groupBy("doc_id").agg(
        F.min(F.substring(F.md5(F.col("g").cast("binary")), 1, 16)).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_grams"),
    )


# --- SimHash hamming near-dup pairs ------------------------------------------

_SIMHASH_PAIRS_ORACLE = """
WITH toks AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS token
    FROM documents
  )
),
bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN ((('0x' || substr(md5(token), 1, 8))::BIGINT >> j) & 1) = 1
                  THEN 1 ELSE -1 END) AS s
  FROM toks CROSS JOIN (SELECT unnest(range(32)) AS j)
  GROUP BY doc_id, j
),
fp AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash32
  FROM bits GROUP BY doc_id
),
banded AS (
  SELECT doc_id, simhash32, b.x AS band,
         (simhash32 >> (b.x * 8)) & 255 AS band_bits
  FROM fp CROSS JOIN (SELECT unnest(range(4)) AS x) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2,
         a.simhash32 AS fp1, b.simhash32 AS fp2
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_bits = b.band_bits AND a.doc_id < b.doc_id
)
SELECT id_1, id_2, bit_count(xor(fp1, fp2)) AS hamming
FROM cand
WHERE bit_count(xor(fp1, fp2)) <= 3
"""


@query("simhash_near_pairs", _SIMHASH_PAIRS_ORACLE)
def simhash_near_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-blocked SimHash near-dup pairs (hamming <= 3 over 32 bits,
    4 bands of 8): pigeonhole blocking keeps the self-join linear in
    bucket sizes. 32-bit width (vs the 16-bit compact fingerprint)
    matters on templated corpora: 16 bits collide en masse and the pair
    output goes quadratic; 32 bits keeps candidates ~4× smaller here."""
    from dod_etl_spark.operators.text_dedup import simhash_fp, simhash_near_pairs

    docs = t(spark, sf_dir, "documents")
    fp = simhash_fp(docs, n_bits=32)
    return simhash_near_pairs(fp, fp_col="simhash32", n_bits=32, n_bands=4)


# --- Multimodal: binary columns + Arrow feature extraction -------------------

_MM_ORACLE = """
WITH digests AS (
  -- duckdb sha256 takes VARCHAR and hashes its UTF-8 bytes == Spark's
  -- sha2 over encode(text,'UTF-8')
  SELECT doc_id AS media_id, sha256(text) AS sha_hex FROM documents
),
bytes AS (
  SELECT media_id, sha_hex,
         [('0x' || substr(sha_hex, i * 2 + 1, 2))::BIGINT for i in range(16)] AS b16
  FROM digests
)
SELECT media_id,
       16 AS feature_dim,
       sqrt(CAST(list_sum([x * x for x in b16]) AS DOUBLE)) / 255.0 AS feature_norm,
       sha_hex AS content_sha
FROM bytes
"""


@query("multimodal_features", _MM_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents -> binary content column
    + typed metadata, decode stub + feature extraction via mapInPandas
    (Arrow batches). The fake decode is sha256, so the oracle can verify
    the FULL path including the Python stage byte-for-byte."""
    from dod_etl_spark.operators.multimodal import Codec, extract_features

    docs = t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("fake").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    return extract_features(media, Codec(fake=True), feature_dim=16)


_PHASH_MEDIA_ORACLE = """
WITH s AS (SELECT doc_id, doc_id % 8 AS cls FROM documents WHERE doc_id < 48)
SELECT a.doc_id AS id_1, b.doc_id AS id_2
FROM s a JOIN s b ON a.cls = b.cls AND a.doc_id < b.doc_id
"""


@query("phash_near_dup_media", _PHASH_MEDIA_ORACLE)
def phash_near_dup_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec perceptual near-dup, cross-engine checked: 48 docs
    render deterministic BMP scenes in 8 visual classes (gradient
    direction x disc position x inversion; per-doc noise + brightness
    shift makes every payload byte-unique), then
    phash_near_pairs(Codec(fake=False)) — stdlib BMP decode, box-cell
    average hash, banded blocking — must recover EXACTLY the
    within-class pairs. The oracle predicts those pairs from class
    arithmetic alone, so a hash-match proves the whole perceptual
    pipeline (decode -> aHash -> LSH banding -> hamming cut) separates
    near (<=2 bits, measured) from far (>=14 bits) media. max_hamming=5
    with n_bands=6 keeps the pigeonhole completeness guarantee.
    North-star binary-column family (SURVEY §1.3; no reference
    counterpart — its type surface stops at timestamps)."""
    from dod_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        Codec,
        phash_near_pairs,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 48).select("doc_id")

    def render(batches):
        import numpy as np
        import pandas as pd

        from dod_etl_spark.operators.media_codec import encode_bmp

        def scene_cls(doc_id: int, w: int = 64, h: int = 48) -> bytes:
            cls = doc_id % 8
            vert, slot, inv = bool(cls & 1), bool(cls & 2), bool(cls & 4)
            y, x = np.mgrid[0:h, 0:w]
            g = (y / (h - 1)) if vert else (x / (w - 1))
            img = 40 + 120 * g
            cx, cy = (0.75 if slot else 0.25) * w, 0.35 * h
            img[(x - cx) ** 2 + (y - cy) ** 2 < (min(w, h) * 0.22) ** 2] = 235
            if inv:
                img = 255 - img
            rng = np.random.default_rng(doc_id)
            img = img + rng.integers(-4, 5, img.shape) + (doc_id % 3) * 6
            return encode_bmp(np.clip(img, 0, 255).astype(np.uint8))

        meta = {
            "modality": "image",
            "format": "bmp",
            "width": 64,
            "height": 48,
            "duration_ms": None,
            "sample_rate": None,
        }
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "content": [
                        bytearray(scene_cls(int(d))) for d in pdf["doc_id"]
                    ],
                    "meta": [meta] * len(pdf),
                }
            )

    media = docs.mapInPandas(render, schema=MEDIA_SCHEMA)
    pairs = phash_near_pairs(media, Codec(fake=False), max_hamming=5, n_bands=6)
    return pairs.select("id_1", "id_2")


# --- Embedding-cosine near-dup pairs (dedup flavor) --------------------------

_EMB_NEAR_DUP_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n,
         (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
          + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
          + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
          + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
  FROM embeddings
),
scored AS (
  SELECT a.vec_id AS id_1, b.vec_id AS id_2,
         {sround_sql('''CASE WHEN a.n * b.n > 0
                    THEN list_dot_product(a.v, b.v) / (a.n * b.n)
                    ELSE 0.0 END''', 3)} AS cosine
  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_1, id_2, cosine FROM scored WHERE cosine >= 0.35
"""


@query("embedding_near_dup_pairs", _EMB_NEAR_DUP_ORACLE)
def embedding_near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup DEDUP (all pairs over a threshold, vs
    cosine_topk's per-query top-k): sign-bucket blocking on the first 4
    dims replaces the N² cross product with an equi self-join
    (operators/similarity.py). Threshold 0.35 is calibrated to the
    synthetic embeddings (random-ish vectors: in-bucket cosines top out
    ~0.51; real near-dup corpora would run 0.9+)."""
    from dod_etl_spark.operators.similarity import embedding_near_dup_pairs

    emb = t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.35, sign_dims=4)


# --- Token counting (whitespace + BPE-ish regex) -----------------------------

_BPE_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

_TOKEN_COUNTS_ORACLE = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
       {sround_sql(f'''CAST(length(text) AS DOUBLE)
             / greatest(len(regexp_extract_all(text, '{_BPE_RE}')), 1)''', 4)} AS chars_per_token
FROM documents
"""


@query("token_counts", _TOKEN_COUNTS_ORACLE)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish lexer
    regex (letter runs | single digits | single punctuation — the
    GPT-2-style pre-tokenizer shape), plus chars-per-token, the standard
    tokenizer-efficiency metric. Pure JVM regex — no tokenizer library
    on the hot path."""
    docs = t(spark, sf_dir, "documents")
    text = F.col("text")
    n_bpe = F.size(F.regexp_extract_all(text, F.lit(_BPE_RE), F.lit(0)))
    return docs.select(
        "doc_id",
        n_tokens(text).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        stable_round(
            F.length(text).cast("double") / F.greatest(n_bpe, F.lit(1)), 4
        ).alias("chars_per_token"),
    )


# --- ANN scale path: LSH-bucketed top-k --------------------------------------

# The deterministic pseudo-random hyperplanes (operators/similarity.py
# hyperplane_sign_bits) ARE SQL-expressible: component i of the seed-s
# hyperplane is ((i_1based * cs) % 2001 - 1000)/1000 with
# cs = s*2654435761 % 1000003 — DuckDB's indexed list_transform lambda
# is 1-based, matching Spark's transform (0-based) via (i+1).
_LSH_SEEDS = [1, 2, 3, 4]
_LSH_CS = [(s * 2654435761) % 1000003 for s in _LSH_SEEDS]


def _lsh_bucket_sql(v: str) -> str:
    bits = []
    for bit, cs in enumerate(_LSH_CS):
        proj = (
            f"list_dot_product({v}, list_transform({v}, "
            f"(x, i) -> ((i * {cs}) % 2001 - 1000) / 1000.0))"
        )
        bits.append(f"CASE WHEN {proj} > 0 THEN {1 << bit} ELSE 0 END")
    return "(" + " + ".join(bits) + ")"


_LSH_ANN_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n,
         {_lsh_bucket_sql("embedding::DOUBLE[]")} AS bucket
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {sround_sql('''CASE WHEN q.n * c.n > 0
                    THEN list_dot_product(q.v, c.v) / (q.n * c.n)
                    ELSE 0.0 END''', 3)} AS cosine
  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  WHERE q.vec_id < 10
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= 5
"""


@query("lsh_ann_topk", _LSH_ANN_ORACLE)
def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets — the 100 TB
    path (bounded bucket join instead of full cross product). The
    hyperplane construction is deterministic integer arithmetic, so the
    oracle replays it exactly (indexed list lambdas); recall vs brute
    force is additionally asserted in tests/test_similarity.py."""
    from dod_etl_spark.operators.similarity import lsh_bucketed_topk

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return lsh_bucketed_topk(queries_df, emb, k=5, n_bits=4)


# --- ANN scale path 2: IVF (inverted-file) top-k ------------------------------

_IVF_SIM = """CASE WHEN {an} * {bn} > 0
              THEN list_dot_product({av}, {bv}) / ({an} * {bn})
              ELSE 0.0 END"""

_IVF_ANN_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
  FROM embeddings
),
cent AS (SELECT vec_id AS cell, v AS cv, n AS cn FROM e WHERE vec_id < 8),
corpus_cells AS (
  SELECT vec_id, v, n, cell FROM (
    SELECT e.vec_id, e.v, e.n, cent.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_IVF_SIM.format(an="e.n", bn="cent.cn", av="e.v", bv="cent.cv")} DESC,
                      cent.cell
           ) AS crk
    FROM e CROSS JOIN cent
  ) WHERE crk = 1
),
query_cells AS (
  SELECT vec_id, v, n, cell FROM (
    SELECT e.vec_id, e.v, e.n, cent.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_IVF_SIM.format(an="e.n", bn="cent.cn", av="e.v", bv="cent.cv")} DESC,
                      cent.cell
           ) AS crk
    FROM e CROSS JOIN cent
    WHERE e.vec_id < 10
  ) WHERE crk <= 2
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {sround_sql(_IVF_SIM.format(an="q.n", bn="c.n", av="q.v", bv="c.v"), 3)} AS cosine
  FROM query_cells q JOIN corpus_cells c
    ON q.cell = c.cell AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= 5
"""


@query("ivf_ann_topk", _IVF_ANN_ORACLE)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: deterministic coarse quantizer (centroids
    = the 8 lowest-id vectors), corpus assigned to its best cell as a
    shuffle-free projection, queries probe their 2 best cells
    (operators/similarity.py ivf_topk). Every step is exact arithmetic
    shared with the oracle, so the full path is hash-checkable."""
    from dod_etl_spark.operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    return ivf_topk(emb.filter(F.col("vec_id") < 10), emb, k=5, n_cells=8, n_probe=2)


# --- SemDeDup: cluster-scoped semantic dedup ---------------------------------

_SEMDEDUP_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
  FROM embeddings
),
cent AS (SELECT vec_id AS cell, v AS cv, n AS cn FROM e WHERE vec_id < 8),
assigned AS (
  SELECT vec_id, v, n, cell FROM (
    SELECT e.vec_id, e.v, e.n, cent.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_IVF_SIM.format(an="e.n", bn="cent.cn", av="e.v", bv="cent.cv")} DESC,
                      cent.cell
           ) AS crk
    FROM e CROSS JOIN cent
  ) WHERE crk = 1
),
dominated AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {sround_sql(_IVF_SIM.format(an="a.n", bn="b.n", av="a.v", bv="b.v"), 3)} >= 0.35
)
SELECT vec_id, cell AS cell_id FROM assigned
WHERE vec_id NOT IN (SELECT vec_id FROM dominated)
"""


@query("semdedup_embeddings", _SEMDEDUP_ORACLE)
def semdedup_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): assign every embedding to its
    nearest coarse cell (deterministic lowest-8-id quantizer, the
    ivf_ann_topk replay trick), then within each cell drop every
    vector with an over-threshold cosine to a lower-id cellmate —
    keep-one-per-epsilon-ball with cell-bounded pair fan-out. Output
    is the SURVIVING corpus (vec_id, cell_id), the frame a curation
    pipeline feeds downstream. Same 0.35 calibration as
    embedding_near_dup_pairs on this synthetic corpus."""
    from dod_etl_spark.operators.similarity import semdedup

    emb = t(spark, sf_dir, "embeddings")
    return semdedup(emb, threshold=0.35, n_cells=8)


# --- Product-quantization ADC top-k -------------------------------------------

# The oracles rebuild the PQ index relationally: codebook[m][k] = the
# subspace-m slice of the vector with id k (the operator's deterministic
# seed), code assignment = argmin over the K entries of
# s·s - 2·s·c + c·c (ties -> smallest k), and ADC distance uses the
# reconstruction identity sum_m ||q_m - c_m||^2 = q·q - 2·q·r + r·r —
# all full-width sequential dots (list_dot_product's fold order), so the
# whole quantize-then-search path is hash-exact across engines. One
# parametric builder serves every (n_sub, n_codes, rerank) entry.

_ADC_DIST = """list_dot_product(qv, qv) - 2 * list_dot_product(qv, r)
                + list_dot_product(r, r)"""


def _pq_cb_ctes(n_sub: int, n_codes: int, src: str = "emb") -> str:
    """CTE text shared by every PQ oracle: seed codebooks, per-vector
    subspace slices, argmin code assignment, reconstruction — the
    relational replay of seed_pq_codebooks + pq_encode + _recon_expr."""
    ds = 64 // n_sub
    return f"""ms AS (SELECT unnest(range({n_sub})) AS m),
cb AS (
  SELECT m, vec_id AS kk, list_slice(v, m*{ds} + 1, m*{ds} + {ds}) AS c
  FROM {src} CROSS JOIN ms WHERE vec_id < {n_codes}
),
subs AS (
  SELECT vec_id, m, list_slice(v, m*{ds} + 1, m*{ds} + {ds}) AS s
  FROM {src} CROSS JOIN ms
),
best AS (
  SELECT vec_id, m, kk,
         row_number() OVER (
           PARTITION BY vec_id, m
           ORDER BY list_dot_product(s, s) - 2 * list_dot_product(s, c)
                    + list_dot_product(c, c), kk) AS rn
  FROM subs JOIN cb USING (m)
),
recon AS (
  SELECT b.vec_id, flatten(list(c ORDER BY b.m)) AS r
  FROM best b JOIN cb ON b.m = cb.m AND b.kk = cb.kk
  WHERE b.rn = 1 GROUP BY b.vec_id
)"""


def _rerank_tail(k: int, rerank: int, src: str = "emb") -> str:
    """Two-stage tail: the ADC ranking keeps k*rerank candidates, their
    raw vectors re-score with EXACT squared L2, exact rank wins — the
    relational replay of operators/pq._exact_rerank (rounded-ADC
    candidate boundary, neighbor-id ties at both stages)."""
    exact = sround_sql(
        """list_dot_product(qv, qv) - 2 * list_dot_product(qv, e2.v)
                + list_dot_product(e2.v, e2.v)""",
        3,
    )
    return f""",
exact AS (
  SELECT query_id, neighbor_id, {exact} AS dist
  FROM ranked JOIN {src} e2 ON ranked.neighbor_id = e2.vec_id
  WHERE rk <= {k * rerank}
),
reranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dist, neighbor_id) AS rk
  FROM exact
)
SELECT query_id, neighbor_id, dist, rk FROM reranked WHERE rk <= {k}"""


def _pq_adc_oracle(n_sub: int, n_codes: int, k: int = 5, rerank: int = 0) -> str:
    base = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_pq_cb_ctes(n_sub, n_codes)},
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 10),
scored AS (
  SELECT query_id, qv, rr.vec_id AS neighbor_id,
         {sround_sql(_ADC_DIST, 3)} AS dist
  FROM q CROSS JOIN recon rr WHERE query_id <> rr.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dist, neighbor_id) AS rk
  FROM scored
)"""
    if not rerank:
        return base + f"\nSELECT query_id, neighbor_id, dist, rk FROM ranked WHERE rk <= {k}"
    return base + _rerank_tail(k, rerank)


@query("pq_adc_topk", _pq_adc_oracle(n_sub=16, n_codes=64))
def pq_adc_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-5 (operators/pq.py): the corpus
    compresses to 16 small codes per vector against deterministic
    seed codebooks (16 subspaces x 64 codes — recall@5 0.48 at sf0.001
    vs 0.22 for the r9 8x16 config, tests/test_model_quality.py);
    queries stay full-precision and rank by asymmetric squared-L2 to
    the reconstructions. The third ANN scale path — LSH and IVF cut
    CANDIDATES, PQ cuts BYTES PER CANDIDATE — and the entire
    quantize-encode-search path is oracle-replayed hash-exact (vs
    ivf_kmeans_topk's rows-only trained twin)."""
    from dod_etl_spark.operators.pq import pq_adc_topk, seed_pq_index

    emb = t(spark, sf_dir, "embeddings")
    cbs, _, dim = seed_pq_index(emb, n_sub=16, n_codes=64)
    return pq_adc_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5, codebooks=cbs,
        n_sub=16, n_codes=64, dim=dim,
    )


@query("pq_rerank_topk", _pq_adc_oracle(n_sub=8, n_codes=16, rerank=8))
def pq_rerank_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage PQ serve (operators/pq._exact_rerank): coarse 8x16
    codes pick 40 ADC candidates per query, exact squared-L2 on just
    those raw vectors ranks the final 5 — recall@5 0.82 vs 0.22 for
    single-stage ADC on the same cheap codebooks (the FAISS refine
    posture: quantization error only picks the shortlist, never the
    winners). Candidates ride BROADCAST into the corpus re-probe, so
    the second stage moves |Q|*40 ids, not vectors; both stage
    boundaries are rounded-deterministic and the oracle replays the
    full two-stage path hash-exact."""
    from dod_etl_spark.operators.pq import pq_adc_topk, seed_pq_index

    emb = t(spark, sf_dir, "embeddings")
    cbs, _, dim = seed_pq_index(emb, n_sub=8, n_codes=16)
    return pq_adc_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5, codebooks=cbs,
        rerank=8, dim=dim,
    )


# --- PQ code-usage balance ------------------------------------------------------

# The quantization-health monitor (IvfVectorStore.cell_balance's PQ
# twin): a subspace whose corpus collapses onto few codes carries fewer
# effective bits — the codebook was trained on drifted data or the
# subspace dims are degenerate. One zero-shuffle encode + one
# map-combined aggregate; per-subspace used-code count and the max
# single-code share (1/K = perfectly balanced, 1.0 = that subspace
# contributes nothing).
_PQ_BALANCE_ORACLE = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_pq_cb_ctes(16, 64)},
counts AS (
  SELECT m, kk, count(*) AS n FROM best WHERE rn = 1 GROUP BY m, kk
)
SELECT CAST(m AS BIGINT) AS subspace,
       CAST(count(*) AS BIGINT) AS codes_used,
       CAST(sum(n) AS BIGINT) AS n_vecs,
       CAST(max(n) AS BIGINT) AS max_code_n
FROM counts GROUP BY m
"""


@query("pq_code_balance", _PQ_BALANCE_ORACLE)
def pq_code_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace PQ code-usage balance — the operational monitor a
    PQ index alerts on (codes_used << K or one dominant code = that
    subspace has stopped encoding information; retrain/rebuild, the
    cell_balance posture). Zero-shuffle encode + one map-combined
    aggregate; hash-exact oracle via the relational codebook rebuild."""
    from dod_etl_spark.operators.pq import pq_encode, seed_pq_index

    emb = t(spark, sf_dir, "embeddings")
    cbs, _, _ = seed_pq_index(emb, n_sub=16, n_codes=64)
    enc = pq_encode(emb, cbs)
    per_code = (
        enc.select(
            F.posexplode(F.col("codes")).alias("subspace", "code")
        )
        .groupBy("subspace", "code")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_code.groupBy("subspace").agg(
        F.count(F.lit(1)).cast("long").alias("codes_used"),
        F.sum("n").cast("long").alias("n_vecs"),
        F.max("n").cast("long").alias("max_code_n"),
    ).select(F.col("subspace").cast("long").alias("subspace"), "codes_used", "n_vecs", "max_code_n")


# --- IVF-PQ composed ANN -------------------------------------------------------

# The FAISS IndexIVFPQ posture: IVF cells prune candidates, PQ codes
# shrink them. Every stage is deterministic arithmetic the standalone
# oracles already replay (cosine cell argmax from _IVF_ANN_ORACLE, code
# argmin + reconstruction from _pq_adc_oracle), so the COMPOSED path is
# hash-exact too.


def _ivfpq_oracle(
    n_sub: int,
    n_codes: int,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    rerank: int = 0,
) -> str:
    base = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
  FROM embeddings
),
cent AS (SELECT vec_id AS cell, v AS cv, n AS cn FROM e WHERE vec_id < {n_cells}),
corpus_cell AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, cent.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_IVF_SIM.format(an="e.n", bn="cent.cn", av="e.v", bv="cent.cv")} DESC,
                      cent.cell
           ) AS crk
    FROM e CROSS JOIN cent
  ) WHERE crk = 1
),
query_cells AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, cent.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_IVF_SIM.format(an="e.n", bn="cent.cn", av="e.v", bv="cent.cv")} DESC,
                      cent.cell
           ) AS crk
    FROM e CROSS JOIN cent
    WHERE e.vec_id < 10
  ) WHERE crk <= {n_probe}
),
{_pq_cb_ctes(n_sub, n_codes, src="e")},
scored AS (
  SELECT q.vec_id AS query_id, q.v AS qv, cc.vec_id AS neighbor_id,
         {sround_sql('''list_dot_product(q.v, q.v) - 2 * list_dot_product(q.v, rr.r)
                + list_dot_product(rr.r, rr.r)''', 3)} AS dist
  FROM query_cells q
  JOIN corpus_cell cc ON q.cell = cc.cell AND q.vec_id <> cc.vec_id
  JOIN recon rr ON rr.vec_id = cc.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dist, neighbor_id) AS rk
  FROM scored
)"""
    if not rerank:
        return base + f"\nSELECT query_id, neighbor_id, dist, rk FROM ranked WHERE rk <= {k}"
    return base + _rerank_tail(k, rerank, src="e")


@query("ivfpq_topk", _ivfpq_oracle(n_sub=16, n_codes=64))
def ivfpq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-5 (operators/pq.py ivfpq_topk): the composed FAISS
    posture — 8 IVF cells prune candidates to ~n_probe/n_cells of the
    corpus, 16x64 PQ codes cut the surviving candidates to 16 small
    codes each (recall@5 0.48 at sf0.001 vs 0.28 for the r9 8x16
    config), and the asymmetric distance ranks the pruned set.
    Quantizer, codes, pruning, and ranking are ALL replayed
    relationally, so the whole composed index is hash-checked
    (candidate-count × candidate-width reduction, zero black boxes)."""
    from dod_etl_spark.operators.pq import ivfpq_topk, seed_pq_index

    emb = t(spark, sf_dir, "embeddings")
    cbs, cents, dim = seed_pq_index(emb, n_sub=16, n_codes=64, n_cells=8)
    return ivfpq_topk(
        emb.filter(F.col("vec_id") < 10),
        emb,
        k=5,
        n_cells=8,
        n_probe=2,
        codebooks=cbs,
        n_sub=16,
        n_codes=64,
        centroids=cents,
        dim=dim,
    )


@query("ivfpq_rerank_topk", _ivfpq_oracle(n_sub=8, n_codes=16, rerank=8))
def ivfpq_rerank_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage IVF-PQ serve: cells prune candidates, cheap 8x16 codes
    rank an ADC shortlist of 40 per query, exact squared-L2 on just the
    shortlist's raw vectors picks the final 5 — recall@5 0.80 at
    sf0.001 (vs 0.28 single-stage, ceiling 0.86 from 2-of-8 cell
    pruning; tests/test_model_quality.py). This is THE production
    vector-serve plan at 100 TB: candidate count cut by IVF, candidate
    width cut by PQ, and the only full-precision touches are |Q|*40
    broadcast-joined rows. Both stage boundaries rounded-deterministic;
    the oracle replays the complete three-layer index hash-exact."""
    from dod_etl_spark.operators.pq import ivfpq_topk, seed_pq_index

    emb = t(spark, sf_dir, "embeddings")
    cbs, cents, dim = seed_pq_index(emb, n_sub=8, n_codes=16, n_cells=8)
    return ivfpq_topk(
        emb.filter(F.col("vec_id") < 10),
        emb,
        k=5,
        n_cells=8,
        n_probe=2,
        codebooks=cbs,
        rerank=8,
        centroids=cents,
        dim=dim,
    )


# --- End-to-end training-data prep pipeline -----------------------------------

_PREP_ORACLE = """
WITH kept AS (
  SELECT doc_id, text FROM documents
  WHERE length(text) >= 100
    AND len(regexp_extract_all(text, '[.,!?;:]')) * 20 <= length(text)
),
survivors AS (
  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
)
SELECT k.doc_id AS doc_id,
       length(k.text) AS n_chars,
       len(string_split(k.text, ' ')) AS n_tokens
FROM kept k JOIN survivors s ON k.doc_id = s.doc_id
"""


@query("prep_pipeline_docs", _PREP_ORACLE)
def prep_pipeline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data prep path a pipeline user actually
    runs: quality gate -> exact dedup -> tokenize, as ONE declarative
    plan. The quality predicates are integer arithmetic (length floor +
    punctuation density via punct*20 <= chars), the dedup groups on
    md5(text) keeping the lowest doc_id (operators/dedup semantics), and
    the join back to the kept set is on the group's min — the whole
    thing is two shuffles (dedup groupBy + survivor join) regardless of
    corpus size, with every filter pushed to the scan."""
    docs = t(spark, sf_dir, "documents")
    text = F.col("text")
    kept = docs.filter(
        (F.length(text) >= 100) & (punct_count(text) * 20 <= F.length(text))
    ).select("doc_id", "text")
    survivors = kept.groupBy(F.md5(text.cast("binary")).alias("_fp")).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    return kept.join(survivors, "doc_id").select(
        "doc_id",
        F.length(text).cast("long").alias("n_chars"),
        n_tokens(text).cast("long").alias("n_tokens"),
    )


# --- ANN extensions: multi-probe LSH + k-means-refined IVF --------------------

_LSH_MULTIPROBE_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n,
         {_lsh_bucket_sql("embedding::DOUBLE[]")} AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id, v, n,
         unnest([bucket, xor(bucket, 1), xor(bucket, 2)]) AS probe
  FROM e WHERE vec_id < 10
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {sround_sql('''CASE WHEN q.n * c.n > 0
                    THEN list_dot_product(q.v, c.v) / (q.n * c.n)
                    ELSE 0.0 END''', 3)} AS cosine
  FROM q JOIN e c ON q.probe = c.bucket AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= 5
"""


@query("lsh_ann_multiprobe", _LSH_MULTIPROBE_ORACLE)
def lsh_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-5: each query also probes the Hamming-1
    buckets of its first two hyperplanes (query-side ×3 fan-out; the
    corpus is never replicated). The probe set is deterministic integer
    arithmetic, so the oracle replays it with xor() — recall dominance
    over single-probe is asserted in tests/test_similarity.py."""
    from dod_etl_spark.operators.similarity import lsh_bucketed_topk

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return lsh_bucketed_topk(queries_df, emb, k=5, n_bits=4, probe_bits=2)


@query("ivf_kmeans_topk")  # no static oracle: centroids come from Lloyd iterations
def ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5 with 2 Lloyd refinement iterations over the seed
    centroids (operators/similarity.kmeans_centroids: distributed
    assignment, decimal-exact per-cell means collected as metadata —
    the FAISS train/assign split). The refined centroids depend on the
    corpus, so no static SQL oracle exists; the driver records a
    rows-only check and tests/test_similarity.py pins recall >= the
    unrefined floor plus exact-score parity on overlapping pairs."""
    from dod_etl_spark.operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5, n_cells=8, n_probe=2, kmeans_iters=2
    )


# --- Deterministic curation: sampling / stratified top-k / budget packing ------

from dod_etl_spark.operators.sampling import (  # noqa: E402
    SAMPLE_BUCKETS,
    hash_bucket,
    hash_bucket_sql,
    hash_sample,
    stratified_topk,
    token_budget_pack,
)

# SQL mirrors of functions.text quality/token expressions (same literal
# arithmetic as _TEXT_STATS_ORACLE).
_N_TOKENS_SQL = "len(string_split(text, ' '))"
_QUALITY_SQL = """least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
       * (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
                / greatest(length(text), 1))"""

_SAMPLE_ORACLE = f"""
SELECT doc_id, source, {hash_bucket_sql('doc_id', 42)} AS bucket
FROM documents
WHERE {hash_bucket_sql('doc_id', 42)} < 2000
"""


@query("sample_docs_deterministic", _SAMPLE_ORACLE)
def sample_docs_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20% reproducible corpus sample (operators/sampling.hash_sample):
    the keep-decision is md5(content key), NOT rand()/df.sample(), so it
    is invariant to partitioning, AQE re-plans, and engine — a pure
    pushed-down filter, no shuffle."""
    docs = t(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.2, seed=42).select(
        "doc_id", "source", hash_bucket(F.col("doc_id"), 42).alias("bucket")
    )


_QUALITY_TOPK_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source, {_QUALITY_SQL} AS q FROM documents
), ranked AS (
  SELECT doc_id, source, q,
         row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS rnk
  FROM scored
)
SELECT doc_id, source, CAST(rnk AS BIGINT) AS rnk, {sround_sql('q', 4)} AS quality
FROM ranked WHERE rnk <= 10
"""


@query("quality_topk_per_source", _QUALITY_TOPK_ORACLE)
def quality_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified curation: the 10 highest-quality documents per source
    (operators/sampling.stratified_topk). One shuffle on source;
    WindowGroupLimit prunes to k rows per group map-side before the
    exchange."""
    docs = t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", quality_score(F.col("text")).alias("q")
    )
    return stratified_topk(scored, "source", "q", 10, "doc_id").select(
        "doc_id", "source", "rnk", stable_round("q", 4).alias("quality")
    )


_BUDGET_PACK_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source, {_N_TOKENS_SQL} AS n_toks, {_QUALITY_SQL} AS q
  FROM documents
), packed AS (
  SELECT doc_id, source, n_toks,
         CAST(sum(n_toks) OVER (
           PARTITION BY source ORDER BY q DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM scored
)
SELECT doc_id, source, n_toks, cum_tokens
FROM packed WHERE cum_tokens <= 2000
"""


@query("token_budget_pack_docs", _BUDGET_PACK_ORACLE)
def token_budget_pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-quota packing: fill each source's 2000-token budget with
    its best documents (operators/sampling.token_budget_pack) — greedy
    prefix-sum cut after a quality sort. One shuffle + one in-partition
    sort; the running sum is a frame-bounded window."""
    docs = t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        n_tokens(F.col("text")).alias("n_toks"),
        quality_score(F.col("text")).alias("q"),
    )
    return token_budget_pack(scored, "source", "q", "n_toks", 2000, "doc_id").select(
        "doc_id", "source", "n_toks", "cum_tokens"
    )


# --- Dedup clusters: transitive closure of near-dup pairs ----------------------

from dod_etl_spark.operators.graph import dedup_cluster_assignments  # noqa: E402

_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT id_1, id_2 FROM ({_minhash_oracle()})
), edges AS (
  SELECT id_1 AS s, id_2 AS d FROM pairs
  UNION ALL
  SELECT id_2 AS s, id_1 AS d FROM pairs
), reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node
)
SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
"""


@query("dedup_clusters", _CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: MinHash-LSH bucket-star edges
    (minhash_cluster_edges — connectivity-equivalent to the pairwise
    candidate cliques at ~1/100th the edge volume), connected
    components via min-label propagation (operators/graph.py), cluster
    id = min doc_id. The oracle computes the same closure over the full
    PAIR graph with a recursive CTE — same components by clique/star
    equivalence — an oracle-paired ITERATIVE algorithm. keep-one cut
    downstream: doc_id == cluster_id."""
    docs = t(spark, sf_dir, "documents")
    edges = minhash_cluster_edges(docs, num_hashes=8, band_size=2, shingle_len=5)
    return dedup_cluster_assignments(docs, edges)


# --- Embedding int8 quantization ----------------------------------------------

_QUANT_ORACLE = f"""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       {sround_sql("CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)", 6)}
         AS scale_absmax,
       CAST(list_sum(list_transform(embedding,
           x -> CAST(floor(x * 127.0
                / list_max(list_transform(embedding, y -> abs(y))) + 0.5) AS BIGINT)))
         AS BIGINT) AS q_checksum
FROM embeddings
"""


@query("embedding_quantize_int8", _QUANT_ORACLE)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector absmax int8 quantization — the bandwidth play at
    100 TB: 4 bytes -> 1 byte per dimension before any shuffle or ANN
    stage, dequantize with one scalar per vector. Pure array-expression
    projection (transform/array_max/aggregate, all codegen'd; no UDF,
    no shuffle). Emitted as (dim, scale, integer checksum) — scalars,
    so the cross-engine value hash is well-defined; floor-form rounding
    keeps ties deterministic in both engines."""
    emb = t(spark, sf_dir, "embeddings")
    mx = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x)))
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x * F.lit(127.0) / mx + F.lit(0.5)).cast("long"),
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        stable_round(mx.cast("double"), 6).alias("scale_absmax"),
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "q_checksum"
        ),
    )


# --- Decontamination + class balancing ----------------------------------------

_DECON_ORACLE = f"""
WITH holdout AS (
  SELECT md5(text) AS fp FROM documents
  WHERE {hash_bucket_sql('doc_id', 7)} < 1000
)
SELECT d.doc_id AS doc_id, d.source AS source
FROM documents d
WHERE {hash_bucket_sql('d.doc_id', 7)} >= 1000
  AND md5(d.text) NOT IN (SELECT fp FROM holdout)
"""


@query("decontaminate_train_docs", _DECON_ORACLE)
def decontaminate_train_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: drop any train document whose exact
    content fingerprint appears in the (hash-split) holdout — the step
    that keeps eval sets out of training corpora. Composition of the
    deterministic split (operators/sampling.split_train_holdout) with a
    broadcast LEFT ANTI on md5(text): the holdout fingerprint set is
    tiny relative to the corpus, so the anti join ships fingerprints,
    never documents. Near-dup decontamination = same shape over
    minhash_candidates/dedup_clusters edges instead of md5 equality."""
    from dod_etl_spark.operators.sampling import split_train_holdout

    docs = t(spark, sf_dir, "documents")
    train, holdout = split_train_holdout(docs, "doc_id", 0.1, seed=7)
    hold_fp = holdout.select(F.md5(F.col("text").cast("binary")).alias("fp")).distinct()
    clean = train.withColumn(
        "_fp", F.md5(F.col("text").cast("binary"))
    ).join(F.broadcast(hold_fp), F.col("_fp") == hold_fp.fp, "left_anti")
    return clean.select("doc_id", "source")


_BALANCE_ORACLE = f"""
WITH sized AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang
), floor_n AS (
  SELECT min(n) AS n_keep FROM sized
), ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '_bal'), doc_id) AS rnk
  FROM documents
)
SELECT r.doc_id AS doc_id, r.lang AS lang
FROM ranked r, floor_n
WHERE r.rnk <= floor_n.n_keep
"""


@query("balance_classes_docs", _BALANCE_ORACLE)
def balance_classes_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic class balancing: downsample every language to the
    smallest class's size, choosing rows by content-hash order (md5 of
    the salted key) — reproducible on any partitioning, no rand(). One
    shuffle for the per-class window + a 1-row broadcast for the floor;
    WindowGroupLimit cannot apply (the cut is data-dependent) but the
    md5 sort key is computed map-side."""
    docs = t(spark, sf_dir, "documents")
    floor_n = docs.groupBy("lang").count().agg(F.min("count").alias("n_keep"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("_bal"))), F.col("doc_id")
    )
    return (
        docs.withColumn("rnk", F.row_number().over(w))
        .join(F.broadcast(floor_n))
        .filter(F.col("rnk") <= F.col("n_keep"))
        .select("doc_id", "lang")
    )


# --- PII redaction -----------------------------------------------------------

# Patterns restricted to the RE2 ∩ Java-regex common dialect so both
# engines see identical matches. Applied in a fixed order (email, phone,
# ipv4) on the progressively-scrubbed text.
_PII_PATTERNS = [
    # url FIRST: an email or IP inside a URL belongs to the <URL>
    # placeholder, not to its own (the chain scrubs progressively)
    ("url", r"https?://[^ ]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\d{3}[-.]\d{3}[-.]\d{4}", "<PHONE>"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
]


def _pii_oracle() -> str:
    clean = "text"
    counts = []
    for name, pat, repl in _PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({clean}, '{pat}')) AS BIGINT) AS n_{name}"
        )
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return f"""
SELECT doc_id, {', '.join(counts)}, md5({clean}) AS clean_fp
FROM documents
"""


@query("pii_scrub_docs", _pii_oracle())
def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: emails / phone numbers / IPv4 literals are
    replaced with typed placeholder tokens, per-document match counts
    kept for audit. Pure codegen'd regexp_replace/regexp_count — no
    Python in the loop, linear scan, zero shuffles (grep-shaped at
    100 TB). The output carries md5(clean_text) instead of the scrubbed
    text so the fingerprint — not megabytes of text — crosses the wire.
    Behavior on PII-bearing text is pinned by tests/test_text_curation.py
    (the synthetic corpus contains no PII, so counts here are 0)."""
    docs = t(spark, sf_dir, "documents")
    clean = F.col("text")
    cols = [F.col("doc_id")]
    for name, pat, repl in _PII_PATTERNS:
        cols.append(F.regexp_count(clean, F.lit(pat)).cast("long").alias(f"n_{name}"))
        clean = F.regexp_replace(clean, pat, repl)
    return docs.select(*cols, F.md5(clean.cast("binary")).alias("clean_fp"))


# --- Luhn-validated card-number detection ------------------------------------

# Detection needs ARITHMETIC, not just a regex: a 16-digit run is a
# card number only if it passes the Luhn mod-10 checksum, and flagging
# every digit run would flood an audit with order ids and timestamps.
# The checksum is integer-only (double every second digit from the
# right, subtract 9 above 9, sum mod 10), so both engines compute it
# exactly — the whole detector is oracle hash-checkable.
_CARD_PAT = r"\d(?:[ -]?\d){12,18}"
# Spark SQL string literals process backslash escapes ('\d' -> 'd');
# DuckDB's don't. Double them for expressions spliced into Spark SQL.
_CARD_PAT_SPARK = _CARD_PAT.replace("\\", "\\\\")

# Digit-boundary guard: without it a 20+-digit contiguous run (order
# id, content hash) matches its first 19 digits as a card candidate,
# and a Luhn-lucky prefix (~10%) would FALSE-POSITIVE a compliance
# drop. RE2 (the DuckDB dialect) has no lookaround, so the guard is a
# PRE-SPLIT: blank runs of 20+ contiguous digits before extraction —
# same transform in both engines (DuckDB needs the 'g' flag; Spark
# replaces all matches by default). Documented residual: a 20+-digit
# run WITH separators ("1111-2222-...-9999" x6) still yields a
# 19-digit prefix candidate — expressing "not flanked by [ -]digit"
# needs lookaround neither engine pair shares.
_CARD_SRC = r"regexp_replace(text, '\d{20,}', '#', 'g')"
_CARD_SRC_SPARK = r"regexp_replace(text, '\\d{20,}', '#')"

_LUHN_ORACLE = f"""
WITH occ AS (
  SELECT doc_id, unnest(regexp_extract_all({_CARD_SRC}, '{_CARD_PAT}')) AS c
  FROM documents
),
norm AS (
  SELECT doc_id, regexp_replace(c, '[^0-9]', '', 'g') AS d FROM occ
),
uniq AS (SELECT DISTINCT d FROM norm),
digits AS (
  SELECT d, unnest(range(1, length(d) + 1)) AS i FROM uniq
),
lu AS (
  SELECT d,
         sum(CASE WHEN (length(d) - i) % 2 = 1
              THEN CASE WHEN 2 * CAST(substring(d, i, 1) AS INT) > 9
                        THEN 2 * CAST(substring(d, i, 1) AS INT) - 9
                        ELSE 2 * CAST(substring(d, i, 1) AS INT) END
              ELSE CAST(substring(d, i, 1) AS INT) END) % 10 = 0 AS ok
  FROM digits GROUP BY d
),
per_doc AS (
  SELECT n.doc_id,
         count(*) AS n_cand,
         sum(CASE WHEN lu.ok THEN 1 ELSE 0 END) AS n_valid
  FROM norm n JOIN lu USING (d) GROUP BY n.doc_id
)
SELECT doc_id,
       CAST(coalesce(p.n_cand, 0) AS BIGINT) AS n_card_candidates,
       CAST(coalesce(p.n_valid, 0) AS BIGINT) AS n_luhn_valid
FROM documents LEFT JOIN per_doc p USING (doc_id)
"""

# Spark evaluates per row with nested higher-order functions (the
# oracle unnests relationally — same arithmetic, different shape, which
# is exactly what the hash check proves equivalent).
_LUHN_VALID_EXPR = f"""
size(filter(
  transform(regexp_extract_all({_CARD_SRC_SPARK}, '{_CARD_PAT_SPARK}', 0),
            c -> regexp_replace(c, '[^0-9]', '')),
  d -> aggregate(
         transform(sequence(1, length(d)),
                   i -> CASE WHEN (length(d) - i) % 2 = 1
                             THEN IF(2 * CAST(substring(d, i, 1) AS INT) > 9,
                                     2 * CAST(substring(d, i, 1) AS INT) - 9,
                                     2 * CAST(substring(d, i, 1) AS INT))
                             ELSE CAST(substring(d, i, 1) AS INT) END),
         0, (a, x) -> a + x) % 10 = 0))
"""


@query("pii_card_numbers_docs", _LUHN_ORACLE)
def pii_card_numbers_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn-validated payment-card detection: per document, how many
    13-19-digit runs (optional single space/dash separators) appear,
    and how many pass the mod-10 checksum — the high-precision PII
    signal pii_scrub_docs' regexes can't express. ZERO exchanges: a
    pure codegen scan (regexp_extract_all + integer HOF fold per row);
    at 100 TB this is grep-plus-arithmetic over the corpus scan.
    Checksum behavior is pinned on real card-shaped fixtures AND
    against a pure-Python Luhn over random digit strings
    (tests/test_pii_luhn.py); the synthetic corpus exercises the
    zero/absent path."""
    docs = t(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        f"CAST(size(regexp_extract_all({_CARD_SRC_SPARK}, '{_CARD_PAT_SPARK}', 0))"
        " AS BIGINT) AS n_card_candidates",
        f"CAST(({_LUHN_VALID_EXPR}) AS BIGINT) AS n_luhn_valid",
    )


# --- Repetition-ratio quality signal ----------------------------------------

_REPETITION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
  FROM documents
)
SELECT doc_id,
       CAST(len(tk) AS BIGINT) AS n_toks,
       CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq,
       {sround_sql("1.0 - len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE)", 4)}
         AS rep_ratio,
       (1.0 - len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE)) >= 0.3
         AS is_repetitive
FROM toks
"""


@query("repetition_ratio_docs", _REPETITION_ORACLE)
def repetition_ratio_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/repetition quality signal: 1 - distinct/total token
    ratio, flagged at 0.3 (the CCNet/Gopher-style repetitious-text
    filter). All JVM array built-ins, zero shuffles — at 100 TB this is
    a map-only scan whose filter pushes into the same stage as the
    read."""
    docs = t(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    n_toks = F.size(tk).cast("long")
    n_uniq = F.size(F.array_distinct(tk)).cast("long")
    ratio = F.lit(1.0) - n_uniq / n_toks.cast("double")
    return docs.select(
        "doc_id",
        n_toks.alias("n_toks"),
        n_uniq.alias("n_uniq"),
        stable_round(ratio, 4).alias("rep_ratio"),
        (ratio >= 0.3).alias("is_repetitive"),
    )


# --- Per-domain frequency cap ------------------------------------------------

_DOMAIN_CAP = 15

_DOMAIN_CAP_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '_cap'), doc_id) AS rnk
  FROM documents
)
SELECT doc_id, source, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_DOMAIN_CAP}
"""


@query("domain_cap_docs", _DOMAIN_CAP_ORACLE)
def domain_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter domain capping (the web-corpus counterpart of class
    balancing): at most _DOMAIN_CAP (15) documents survive per source, chosen in
    content-hash order — deterministic under any partitioning, unlike
    rand(). The cap is a LITERAL, so Catalyst's WindowGroupLimit prunes
    each partition to the top rows map-side BEFORE the single source
    shuffle — at 100 TB the exchange carries ~cap×|domains| rows, not
    the corpus (contrast balance_classes_docs, whose data-dependent
    floor defeats the pushdown)."""
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("_cap"))), F.col("doc_id")
    )
    return (
        docs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _DOMAIN_CAP)
        .select("doc_id", "source", "rnk")
    )


# --- Fixed-length sequence packing -------------------------------------------

_SEQ_LEN = 512

_SEQ_PACK_ORACLE = f"""
WITH sized AS (
  SELECT doc_id, source, CAST({_N_TOKENS_SQL} AS BIGINT) AS n_toks
  FROM documents
), packed AS (
  SELECT doc_id, source, n_toks,
         CAST(sum(n_toks) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - n_toks AS start_tok
  FROM sized
)
SELECT doc_id, source, n_toks,
       CAST(floor(start_tok / {_SEQ_LEN}.0) AS BIGINT) AS bin_id,
       CAST(start_tok % {_SEQ_LEN} AS BIGINT) AS offset_in_bin
FROM packed
"""


@query("pack_sequences_docs", _SEQ_PACK_ORACLE)
def pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential packing of documents into fixed 512-token
    training windows, per source: each doc gets the bin (sequence id)
    and offset where its first token lands. Deterministic (doc_id
    order), one window shuffle per source — the streaming-friendly
    approximation of first-fit-decreasing that LLM data loaders use
    (docs spanning a boundary are split by the loader; the bin ids here
    decide shard placement). At 100 TB: exchange on source only, running
    sum is frame-bounded, no second shuffle."""
    docs = t(spark, sf_dir, "documents")
    tk = F.split(F.col("text"), " ")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = docs.select(
        "doc_id", "source", F.size(tk).cast("long").alias("n_toks")
    )
    start = (F.sum("n_toks").over(w) - F.col("n_toks")).alias("start_tok")
    packed = sized.select("doc_id", "source", "n_toks", start)
    return packed.select(
        "doc_id",
        "source",
        "n_toks",
        F.floor(F.col("start_tok") / _SEQ_LEN).cast("long").alias("bin_id"),
        (F.col("start_tok") % _SEQ_LEN).cast("long").alias("offset_in_bin"),
    )


# --- N-gram overlap decontamination ------------------------------------------

_NGRAM_DECON_N = 5  # token-gram length (13 in Gopher; 5 fits the corpus)

_NGRAM_DECON_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, source,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
  FROM documents
), grams AS (
  SELECT doc_id, source,
         unnest(list_transform(
           range(1, greatest(len(tk) - {_NGRAM_DECON_N - 1}, 1) + 1),
           i -> array_to_string(tk[i:i+{_NGRAM_DECON_N - 1}], ' '))) AS gram
  FROM tk
), hold_grams AS (
  SELECT DISTINCT gram FROM grams
  WHERE {{hold}} < 1000
), contaminated AS (
  SELECT DISTINCT g.doc_id FROM grams g JOIN hold_grams USING (gram)
  WHERE {{train}} >= 1000
)
SELECT d.doc_id AS doc_id, d.source AS source
FROM documents d
WHERE {{train_d}} >= 1000
  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
""".format(
    hold=hash_bucket_sql("doc_id", 7),
    train=hash_bucket_sql("g.doc_id", 7),
    train_d=hash_bucket_sql("d.doc_id", 7),
)


@query("ngram_decontaminate_docs", _NGRAM_DECON_ORACLE)
def ngram_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram overlap decontamination (the Gopher/GPT-3 protocol,
    exact-fingerprint decontamination's stronger sibling): a train doc
    is dropped if ANY of its token 5-grams appears in the holdout.
    Shape for 100 TB: the holdout gram set is distinct-compacted and
    BROADCAST; the train side explodes to grams map-side, semi-joins
    against the broadcast to find contaminated doc ids (small), and a
    final broadcast anti-join drops them — the corpus is never
    shuffled, only grams of the tiny holdout and the contaminated-id
    list cross the wire."""
    from dod_etl_spark.operators.sampling import split_train_holdout

    docs = t(spark, sf_dir, "documents")
    train, holdout = split_train_holdout(docs, "doc_id", 0.1, seed=7)

    def grams(df: DataFrame) -> DataFrame:
        tk = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
        n = _NGRAM_DECON_N
        idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - (n - 1), F.lit(1)))
        # gram assembled after the position explode (codegen) rather
        # than inside a transform() lambda (interpreted) — same strings
        return df.select(
            "doc_id", tk.alias("_tk"), F.explode(idx).alias("_i")
        ).select(
            "doc_id",
            F.concat_ws(" ", F.slice(F.col("_tk"), F.col("_i"), n)).alias(
                "gram"
            ),
        )

    hold_grams = grams(holdout).select("gram").distinct()
    contaminated = (
        grams(train)
        .join(F.broadcast(hold_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return train.join(F.broadcast(contaminated), "doc_id", "left_anti").select(
        "doc_id", "source"
    )


@query("minhash_lsh_prod")  # no oracle BY DESIGN: xxhash64 is Spark-private,
# so there is no cross-engine replay; correctness comes from the md5 twin
# (minhash_lsh_candidates, oracle-green) plus the mode-equality config test.
def minhash_lsh_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-mode MinHash+LSH with BOTH production knobs on:
    hashFn=xxhash64 (codegen'd JVM hash instead of md5) and
    max_bucket_size=64 (degenerate buckets dropped from candidate
    generation). The md5 twin (minhash_lsh_candidates) stays exhaustive
    because its DuckDB oracle pins the unguarded semantics.

    The cap is not optional at scale: tools/scaling_probe.py measured
    the UNGUARDED all-pairs surface at log-log slope 2.05 under 8x
    near-duplicate corpus replication (2.3s -> 172.6s) — candidate
    OUTPUT is inherently quadratic in per-bucket duplication, so the
    production posture caps the bucket and leaves mega-clusters to
    exact dedup + the star-edge cluster path (dedup_clusters, measured
    slope 0.12 on the same fixture). Bench note: this entry's delta vs
    the md5 twin now mixes the hash dividend AND the cap dividend."""
    docs = t(spark, sf_dir, "documents")
    return minhash_candidates(
        docs,
        num_hashes=8,
        band_size=2,
        shingle_len=5,
        hash_fn="xxhash64",
        max_bucket_size=64,
    )


# --- Text normalization ------------------------------------------------------

_NORMALIZE_ORACLE = """
SELECT doc_id,
       trim(regexp_replace(
         regexp_replace(lower(text), '[\\x00-\\x1F\\x7F]', '', 'g'),
         ' +', ' ', 'g')) AS norm_text,
       md5(trim(regexp_replace(
         regexp_replace(lower(text), '[\\x00-\\x1F\\x7F]', '', 'g'),
         ' +', ' ', 'g'))) AS norm_fp
FROM documents
"""


@query("normalize_text_docs", _NORMALIZE_ORACLE)
def normalize_text_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization before dedup/fingerprinting:
    casefold, strip control characters, collapse runs of spaces, trim.
    Without this, trivially-different encodings of the same document
    defeat exact dedup and skew MinHash shingles. Pure codegen'd
    regexp_replace chain, zero shuffles, map-only at any scale; the
    normalized fingerprint is what exact-dedup/decontamination keys
    should use. (Unicode NFC is deliberately out: Spark exposes no
    built-in normalizer, and a Python UDF here would put the slowest
    possible code on the hottest path — documents whose dedup needs
    NFC should normalize at ingest.)"""
    docs = t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[\\x00-\\x1F\\x7F]", ""),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.md5(norm.cast("binary")).alias("norm_fp"),
    )


# --- Overlapping token-window chunking ----------------------------------------

_CHUNK_W, _CHUNK_S = 64, 48  # window / stride (16-token overlap)

_CHUNK_ORACLE = f"""
WITH toksed AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), sized AS (
  SELECT doc_id, toks, greatest(len(toks), 1) AS n FROM toksed
), exploded AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, CAST(floor((n - 1) / {_CHUNK_S}.0) AS BIGINT))) AS i
  FROM sized
)
SELECT doc_id,
       i AS chunk_id,
       i * {_CHUNK_S} AS start_tok,
       CAST(len(list_slice(toks, i * {_CHUNK_S} + 1, i * {_CHUNK_S} + {_CHUNK_W})) AS BIGINT)
         AS n_chunk_toks,
       md5(array_to_string(list_slice(toks, i * {_CHUNK_S} + 1, i * {_CHUNK_S} + {_CHUNK_W}), ' '))
         AS chunk_fp
FROM exploded
"""


@query("chunk_docs_stride", _CHUNK_ORACLE)
def chunk_docs_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the step that turns documents
    into training windows (context-length W with stride S so no span is
    lost at a boundary). Pure map-side: tokenize, sequence+explode the
    chunk indices, slice the token array per chunk. ZERO shuffles at any
    scale — output volume is input x (1 + overlap fraction), and the
    explode fan-out stays inside the scan stage. Chunk identity is
    emitted as an md5 fingerprint (cross-engine replayable) rather than
    the chunk text, which is what a downstream cross-chunk dedup keys
    on anyway."""
    from dod_etl_spark.operators.chunking import chunk_tokens

    docs = t(spark, sf_dir, "documents")
    return chunk_tokens(docs, window=_CHUNK_W, stride=_CHUNK_S)


# --- Near-dup removal endpoint: surviving corpus -------------------------------

_SURVIVORS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT id_1, id_2 FROM ({_minhash_oracle()})
), edges AS (
  SELECT id_1 AS s, id_2 AS d FROM pairs
  UNION ALL
  SELECT id_2 AS s, id_1 AS d FROM pairs
), reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node
), assign AS (
  SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
)
SELECT cluster_id AS doc_id,
       count(*) AS n_members,
       count(*) - 1 AS n_removed
FROM assign GROUP BY cluster_id
"""


@query("dedup_survivors_docs", _SURVIVORS_ORACLE)
def dedup_survivors_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user-facing end of near-dup dedup: MinHash-LSH star edges ->
    connected components -> keep ONE representative per cluster
    (min doc_id == cluster id). Output is the surviving corpus with the
    per-survivor removal count — i.e. what you actually train on.
    Adds exactly one aggregation shuffle (on cluster_id) over
    dedup_clusters; at 100 TB the grouped frame carries two longs per
    document, not the text."""
    docs = t(spark, sf_dir, "documents")
    edges = minhash_cluster_edges(docs, num_hashes=8, band_size=2, shingle_len=5)
    assign = dedup_cluster_assignments(docs, edges)
    return assign.groupBy(F.col("cluster_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        (F.count(F.lit(1)) - F.lit(1)).alias("n_removed"),
    )


# --- Corpus profile report -----------------------------------------------------

_PROFILE_ORACLE = f"""
SELECT lang, source,
       count(*) AS n_docs,
       sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS total_tokens,
       {sround_sql("CAST(sum(n_chars) AS DOUBLE) / count(*)", 6)} AS avg_chars,
       {sround_sql("quantile_cont(n_chars, 0.50)", 6)} AS p50_chars,
       {sround_sql("quantile_cont(n_chars, 0.95)", 6)} AS p95_chars
FROM documents GROUP BY lang, source
"""


@query("corpus_profile", _PROFILE_ORACLE)
def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus report: doc/token volume and length
    distribution — the first query anyone runs on a new 100 TB crawl.
    One shuffle (the group-by); token counts and char sums aggregate as
    exact BIGINTs map-side, percentiles merge per-partition digests on
    the same exchange (no global sort). avg is computed as
    sum/count of integers — order-independent, bit-stable."""
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    p = F.expr("percentile(n_chars, array(0.50D, 0.95D))")
    return (
        docs.withColumn("_nt", F.size(toks).cast("long"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("total_tokens"),
            F.sum("n_chars").alias("_sc"),
            p.alias("_p"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "total_tokens",
            stable_round(
                F.col("_sc").cast("double") / F.col("n_docs").cast("double"), 6
            ).alias("avg_chars"),
            stable_round(F.col("_p")[0], 6).alias("p50_chars"),
            stable_round(F.col("_p")[1], 6).alias("p95_chars"),
        )
    )


# --- TF-IDF top terms per document ---------------------------------------------

_TFIDF_ORACLE = f"""
WITH tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
    FROM documents
  )
  GROUP BY doc_id, tok
), df AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
), scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) * (SELECT count(*) FROM documents) / df.df AS w
  FROM tf JOIN df USING (tok)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, tok ASC) AS rk
  FROM scored
)
SELECT doc_id, tok, tf, df, {sround_sql("w", 6)} AS weight
FROM ranked WHERE rk <= 3
"""


@query("tfidf_top_terms", _TFIDF_ORACLE)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by rational tf-idf weight
    (tf x N / df). The weight deliberately avoids ln(): integer-derived
    IEEE multiply/divide is bit-identical across engines, log is
    libm-dependent. Plan: explode -> (doc,tok) count [shuffle 1] ->
    doc-frequency as count() OVER (PARTITION BY tok) on the SAME tf
    frame [shuffle 2] — a tf-vs-df self-JOIN would recompute the whole
    explode+aggregate lineage twice (Spark plans each join input
    independently); the window form reads the tokenize pass once ->
    per-doc WindowGroupLimit top-3 [shuffle 3]. The term-frequency
    frame carries (doc_id, tok, count), never the text; ties break on
    tok ASC so the top-3 cut is total-order deterministic."""
    docs = t(spark, sf_dir, "documents")
    tok = F.explode(
        F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    ).alias("tok")
    tf = docs.select("doc_id", tok).groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("tok")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "w",
            F.col("tf").cast("double") * F.col("_n").cast("double") / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("w").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "tok", "tf", "df", stable_round(F.col("w"), 6).alias("weight"))
    )


# --- Cross-source contamination matrix -----------------------------------------

_OVERLAP_ORACLE = """
WITH grams AS (
  SELECT DISTINCT source, md5(gram) AS fp
  FROM (
    SELECT source,
           unnest(list_transform(
             generate_series(1, greatest(len(toks) - 4, 0)),
             i -> array_to_string(list_slice(toks, i, i + 4), ' '))) AS gram
    FROM (
      SELECT source,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    )
  )
)
SELECT a.source AS source_a, b.source AS source_b,
       count(*) AS n_shared_grams
FROM grams a JOIN grams b ON a.fp = b.fp AND a.source < b.source
GROUP BY a.source, b.source
"""


@query("source_overlap_matrix", _OVERLAP_ORACLE)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources copy each other: per source pair, the count of
    token 5-grams both contain — the contamination report that decides
    which crawl snapshots to drop or decontaminate first (same 5-gram
    protocol as ngram_decontaminate_docs). Instead of a gram-fp
    self-JOIN (which would recompute the whole tokenize+explode lineage
    for both inputs and hash-join on hot shared-gram keys), each gram
    groups its source set once (collect_set, one shuffle) and the
    unordered source pairs are generated INSIDE the group with array
    transforms — the LSH-bucket pairing shape. The grouped frame
    carries (fp, source array), never text; per-gram fan-out is bounded
    by n_sources^2, a constant, so the pair stream stays linear in
    vocabulary at 100 TB."""
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    grams = (
        docs.select("source", toks.alias("toks"))
        # sequence(1, n-4) must not run on n<5: Spark's sequence(1, 0)
        # DESCENDS ([1,0]) where the oracle's generate_series is empty.
        .where(F.size("toks") >= 5)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 4),
                    lambda i: F.array_join(F.slice("toks", i, 5), " "),
                )
            ).alias("gram"),
        )
        .select("source", F.md5(F.col("gram").cast("binary")).alias("fp"))
        .distinct()
    )
    by_gram = grams.groupBy("fp").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    ).where(F.size("ss") >= 2)
    # All i<j pairs from the sorted source array, generated in-row.
    pairs = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + F.lit(2), F.size("ss")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        by_gram.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


# --- Per-source quality percentile rank ----------------------------------------

_QRANK_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source,
         {sround_sql('''least(CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                     AS DOUBLE) / 100.0, 1.0)
           * (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
                    / greatest(length(text), 1))''', 6)} AS q
  FROM documents
)
SELECT doc_id, source, q,
       {sround_sql("percent_rank() OVER (PARTITION BY source ORDER BY q, doc_id)", 6)}
         AS q_rank
FROM scored
"""


@query("quality_percentile_rank", _QRANK_ORACLE)
def quality_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quality calibration: raw heuristic scores are not
    comparable between a curated source and a raw crawl, so curation
    thresholds should cut on the WITHIN-SOURCE percentile rank, not the
    raw score. One window shuffle on source; doc_id tiebreak makes the
    rank total-order deterministic. (percent_rank = (rank-1)/(n-1) is
    integer-derived IEEE division — bit-identical cross-engine.)"""
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    q = stable_round(
        F.least(F.size(toks).cast("double") / F.lit(100.0), F.lit(1.0))
        * (
            F.lit(1.0)
            - punct_count(F.col("text")).cast("double")
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ),
        6,
    )
    w = Window.partitionBy("source").orderBy(F.col("q").asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", q.alias("q"))
        .withColumn("q_rank", stable_round(F.percent_rank().over(w), 6))
    )


# --- Deterministic shard assignment --------------------------------------------

_N_SHARDS = 16

_SHARD_ORACLE = f"""
SELECT CAST(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % {_N_SHARDS} AS BIGINT)
         AS shard,
       count(*) AS n_docs,
       sum(n_chars) AS total_chars
FROM documents GROUP BY 1
"""


@query("shard_assignment_stats", _SHARD_ORACLE)
def shard_assignment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write-side endpoint: content-hash shard assignment for the
    final training corpus (shard = md5(text) mod N). Content-derived
    sharding is reproducible across engines and runs — rand() or
    monotonically_increasing_id() are neither — and balances shard
    sizes to the hash's uniformity, which this query measures. In
    production the assignment feeds write_partitioned/repartition(N,
    shard); here it aggregates to per-shard row/byte balance in one
    shuffle."""
    docs = t(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % _N_SHARDS
    )
    return docs.groupBy(shard.alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


# --- Semantic dedup survivors (SemDeDup-style, embedding space) ----------------

_SEM_SURVIVORS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT id_1, id_2 FROM ({_EMB_NEAR_DUP_ORACLE})
), sedges AS (
  SELECT id_1 AS s, id_2 AS d FROM pairs
  UNION ALL
  SELECT id_2 AS s, id_1 AS d FROM pairs
), reach(node, label) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.d, r.label FROM reach r JOIN sedges e ON e.s = r.node
), assign AS (
  SELECT node AS vec_id, min(label) AS cluster_id FROM reach GROUP BY node
)
SELECT cluster_id AS vec_id,
       count(*) AS n_members,
       count(*) - 1 AS n_removed
FROM assign GROUP BY cluster_id
"""


@query("semantic_dedup_survivors", _SEM_SURVIVORS_ORACLE)
def semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup in embedding space (the SemDeDup recipe, public:
    Abbas et al. 2023): cosine near-dup pairs from sign-bucket blocking
    -> transitive closure -> keep one representative per semantic
    cluster. The text twin (dedup_survivors_docs) catches lexical
    copies; this catches paraphrases and re-renderings that share no
    shingles. Same scale shape: blocked pair generation (never N^2),
    executor-resident component loop, one final scalar aggregation."""
    from dod_etl_spark.operators.similarity import embedding_near_dup_pairs

    emb = t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, threshold=0.35, sign_dims=4)
    assign = dedup_cluster_assignments(
        emb.select("vec_id"), pairs, id_col="vec_id"
    )
    return assign.groupBy(F.col("cluster_id").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        (F.count(F.lit(1)) - F.lit(1)).alias("n_removed"),
    )


# --- Global-percentile quality cut ---------------------------------------------

_QCUT_Q_EXPR = """least(CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
            AS DOUBLE) / 100.0, 1.0)
  * (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
           / greatest(length(text), 1))"""

_QCUT_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, {sround_sql(_QCUT_Q_EXPR, 6)} AS q FROM documents
), thr AS (
  SELECT {sround_sql("quantile_cont(q, 0.75)", 6)} AS t FROM scored
)
SELECT s.doc_id, s.q FROM scored s, thr WHERE s.q >= thr.t
"""


@query("quality_cut_docs", _QCUT_ORACLE)
def quality_cut_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the top quality quartile by GLOBAL exact percentile — the
    two-pass curation cut: one aggregation computes the corpus-wide
    p75 threshold (exact percentile, digest-merged on a single
    1-row-out shuffle), then the threshold broadcasts back over the
    scored scan as a 1-row BroadcastNestedLoopJoin (the scalar
    pattern q11/q15 pin). Rank-based cuts (percent_rank) need a full
    sort per partition key; a global scalar threshold needs none.
    Both engines compare the SAME rounded values, so the boundary is
    deterministic."""
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    q = stable_round(
        F.least(F.size(toks).cast("double") / F.lit(100.0), F.lit(1.0))
        * (
            F.lit(1.0)
            - punct_count(F.col("text")).cast("double")
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ),
        6,
    )
    scored = docs.select("doc_id", q.alias("q"))
    thr = scored.agg(
        stable_round(F.expr("percentile(q, 0.75D)"), 6).alias("t")
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .where(F.col("q") >= F.col("t"))
        .select("doc_id", "q")
    )


# --- Flagship composed curation pipeline ---------------------------------------

_CUR_NORM_SQL = """trim(regexp_replace(
         regexp_replace(lower(text), '[\\x00-\\x1F\\x7F]', '', 'g'),
         ' +', ' ', 'g'))"""

_CURATION_ORACLE = f"""
WITH RECURSIVE normed AS (
  SELECT doc_id,
         {_CUR_NORM_SQL} AS norm_text,
         {sround_sql(_QCUT_Q_EXPR, 6)} AS q
  FROM documents
), train AS (
  SELECT doc_id, norm_text FROM normed
  WHERE {hash_bucket_sql('doc_id', 7)} >= 1000 AND q >= 0.25
), kept AS (
  SELECT md5(norm_text) AS norm_fp,
         min(doc_id) AS doc_id,
         min(norm_text) AS norm_text
  FROM train GROUP BY md5(norm_text)
), holdout AS (
  SELECT DISTINCT md5(norm_text) AS norm_fp FROM normed
  WHERE {hash_bucket_sql('doc_id', 7)} < 1000
), decon AS (
  SELECT * FROM kept
  WHERE norm_fp NOT IN (SELECT norm_fp FROM holdout)
), pairs AS (
  SELECT id_1, id_2
  FROM ({_minhash_oracle(band_size=4, table="decon", text="norm_text")})
), cedges AS (
  SELECT id_1 AS s, id_2 AS d FROM pairs
  UNION ALL
  SELECT id_2 AS s, id_1 AS d FROM pairs
), reach(node, label) AS (
  SELECT doc_id, doc_id FROM decon
  UNION
  SELECT e.d, r.label FROM reach r JOIN cedges e ON e.s = r.node
), assign AS (
  SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
)
SELECT d.doc_id,
       len(list_filter(string_split(d.norm_text, ' '), x -> x <> '')) AS n_toks,
       d.norm_fp
FROM decon d JOIN assign a ON a.doc_id = d.doc_id
WHERE a.doc_id = a.cluster_id
"""


@query("curation_pipeline_docs", _CURATION_ORACLE)
def curation_pipeline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end batch curation pipeline, composed from the
    engine's own operators in the order a real 100 TB run executes
    them:

      normalize (casefold/control-strip/space-collapse, map-only)
      -> train split + quality gate (content-hash split, scored scan)
      -> exact dedup on the NORMALIZED fingerprint (one shuffle)
      -> benchmark decontamination (holdout norm-fps broadcast
         anti-join)
      -> MinHash near-dup clustering on normalized text (bucket-star
         edges -> connected components) -> keep one per cluster.

    Output is the surviving training corpus (doc_id, token count,
    normalized fingerprint). Every stage is the already-oracle-paired
    operator; the oracle composes the same stages as one recursive-CTE
    SQL statement, so the WHOLE pipeline is hash-checked end to end —
    not just its pieces. Scale shape: two scans of the corpus
    (normalize+score, holdout fps), then every shuffle carries
    fingerprints/ids, never text; the iterative closure runs on the
    post-dedup post-gate corpus only."""
    from dod_etl_spark.operators.text_dedup import minhash_cluster_edges as _edges

    docs = t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[\\x00-\\x1F\\x7F]", ""),
            " +",
            " ",
        )
    )
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    q = stable_round(
        F.least(F.size(toks).cast("double") / F.lit(100.0), F.lit(1.0))
        * (
            F.lit(1.0)
            - punct_count(F.col("text")).cast("double")
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ),
        6,
    )
    normed = docs.select(
        "doc_id", norm.alias("norm_text"), q.alias("q"),
        hash_bucket(F.col("doc_id"), 7).alias("_b"),
    )
    train = normed.where((F.col("_b") >= 1000) & (F.col("q") >= 0.25))
    kept = (
        train.groupBy(F.md5(F.col("norm_text").cast("binary")).alias("norm_fp"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("norm_text").alias("norm_text"),
        )
    )
    holdout = (
        normed.where(F.col("_b") < 1000)
        .select(F.md5(F.col("norm_text").cast("binary")).alias("norm_fp"))
        .distinct()
    )
    # Materialized once: the post-gate post-dedup corpus feeds the
    # minhash edge derivation, the component node list, AND the final
    # survivor join — without the checkpoint the scan + normalize +
    # dedup + anti-join lineage executes three times (measured ~7.0 s
    # -> ~5.5 s at sf0.1; the rest is the minhash edge pass + CC
    # rounds). Rows are the deduped survivors only.
    decon = kept.join(F.broadcast(holdout), "norm_fp", "left_anti").localCheckpoint(
        eager=True
    )
    edges = _edges(decon, text_col="norm_text", num_hashes=8, band_size=4, shingle_len=5)
    assign = dedup_cluster_assignments(decon.select("doc_id"), edges)
    survivors = assign.where(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    ntoks = F.size(
        F.filter(F.split(F.col("norm_text"), " "), lambda x: x != "")
    ).cast("long")
    return decon.join(survivors, "doc_id").select(
        "doc_id", ntoks.alias("n_toks"), "norm_fp"
    )


# --- Chunk-level boilerplate detection -----------------------------------------

_CHUNK_DEDUP_ORACLE = f"""
WITH chunks AS (
  SELECT doc_id, chunk_fp FROM ({_CHUNK_ORACLE})
)
SELECT chunk_fp,
       count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs,
       min(doc_id) AS first_doc_id
FROM chunks
GROUP BY chunk_fp
HAVING count(DISTINCT doc_id) >= 2
"""


@query("chunk_dedup_stats", _CHUNK_DEDUP_ORACLE)
def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level boilerplate detection (the CCNet-style span
    dedup): token windows repeated across >= 2 DISTINCT documents,
    found by grouping the map-only chunker's fingerprints. Headers,
    footers, and license blocks that document-level dedup can never
    see show up here. One aggregation shuffle carrying (fp, ids) —
    the chunk text never leaves the scan stage. Downstream removal is
    an anti-join of chunks against this frame."""
    from dod_etl_spark.operators.chunking import chunk_tokens

    docs = t(spark, sf_dir, "documents")
    chunks = chunk_tokens(docs, window=_CHUNK_W, stride=_CHUNK_S)
    return (
        chunks.groupBy("chunk_fp")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .where(F.col("n_docs") >= 2)
    )


# --- kNN graph (all-pairs approximate nearest neighbors) ---------------------

_KNN_GRAPH_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n,
         (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
          + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
          + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
          + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
  FROM embeddings
),
scored AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         {sround_sql('''CASE WHEN a.n * b.n > 0
                    THEN list_dot_product(a.v, b.v) / (a.n * b.n)
                    ELSE 0.0 END''', 3)} AS cosine
  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
)
SELECT vec_id, neighbor_id, cosine,
       row_number() OVER (PARTITION BY vec_id
                          ORDER BY cosine DESC, neighbor_id) AS rk
FROM scored
QUALIFY rk <= 3
"""


@query("knn_graph_docs", _KNN_GRAPH_ORACLE)
def knn_graph_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate all-pairs kNN GRAPH: every vector's top-3 cosine
    neighbors among its sign-bucket cohabitants
    (operators/similarity.py knn_graph). Unlike cosine_topk (small
    broadcastable query set), every row is a query, so bucket blocking
    is the only N²-free shape — the backbone input for SemDeDup-style
    cluster pruning, diversity sampling, and label propagation."""
    from dod_etl_spark.operators.similarity import knn_graph

    emb = t(spark, sf_dir, "embeddings")
    return knn_graph(emb, k=3, sign_dims=4)


# --- MinHash Jaccard estimate (signature-only dedup decision) ----------------


def _minhash_est_oracle(num_hashes: int = 8, band_size: int = 2) -> str:
    """Candidate pairs + signature-agreement Jaccard estimate: the
    _minhash_oracle CTE chain, then the K-slot agreement fraction
    joined back onto the distinct band-join pairs."""
    from dod_etl_spark.operators.text_dedup import MINHASH_PRIME, minhash_perm_params

    mins = ",\n         ".join(
        f"min(({a} * h32 + {b}) % {MINHASH_PRIME}) AS h{k}"
        for k, (a, b) in enumerate(minhash_perm_params(num_hashes))
    )
    n_bands = num_hashes // band_size
    band_rows = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws('_', {hs}) AS band_hash FROM mh".format(
            b=b,
            hs=", ".join(
                f"CAST(h{b * band_size + i} AS VARCHAR)" for i in range(band_size)
            ),
        )
        for b in range(n_bands)
    )
    agree = " + ".join(
        f"(CASE WHEN a.h{k} = b.h{k} THEN 1 ELSE 0 END)" for k in range(num_hashes)
    )
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest([substr(text, i, 5)
                   for i in range(1, greatest(length(text) - 3, 2))]) AS shingle
    FROM documents
  )
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h32 FROM sh
),
mh AS (
  SELECT doc_id,
         {mins}
  FROM hashed GROUP BY doc_id
),
bands AS (
  {band_rows}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
SELECT p.id_1, p.id_2,
       CAST(({agree}) AS DOUBLE) / {float(num_hashes)} AS jaccard_est
FROM pairs p
JOIN mh a ON a.doc_id = p.id_1
JOIN mh b ON b.doc_id = p.id_2
"""


@query("minhash_jaccard_est", _minhash_est_oracle())
def minhash_jaccard_est_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DECISION stage of signature-only dedup: LSH candidate pairs
    with the MinHash Jaccard estimate (fraction of the 8 signature
    slots in agreement — E[agreement] = J). The corpus text is never
    read again after the signature pass: keep/drop calls join K
    BIGINTs per side, vs the n-gram verifier's per-pair shingle-set
    re-shuffle (operators/text_dedup.py minhash_jaccard_est)."""
    from dod_etl_spark.operators.text_dedup import minhash_jaccard_est

    docs = t(spark, sf_dir, "documents")
    return minhash_jaccard_est(docs, num_hashes=8, band_size=2, shingle_len=5)


# --- Corpus snapshot diff ----------------------------------------------------

_CORPUS_DIFF_ORACLE = """
WITH o_v AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 8 = 5
                  THEN substr(text, 1, greatest(length(text) - 1, 0))
                  ELSE text END) AS fp
  FROM documents WHERE doc_id % 10 != 3
),
n_v AS (
  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 10 != 7
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       o.fp AS old_fp, n.fp AS new_fp
FROM o_v o FULL OUTER JOIN n_v n ON o.doc_id = n.doc_id
WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.fp != n.fp
"""


@query("corpus_diff", _CORPUS_DIFF_ORACLE)
def corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two corpus versions by content
    fingerprint (operators/dedup.py snapshot_diff): added / removed /
    changed doc ids with both fingerprints — the incremental-ingestion
    primitive deciding what to re-embed / re-tokenize / re-index.

    The two versions are carved deterministically from `documents`
    (old: doc_id%10!=3, with doc_id%8==5 texts truncated by one char —
    "since edited"; new: doc_id%10!=7), so the oracle sees identical
    inputs. Only (id, 16-byte md5) rows move through the full-outer
    join; unchanged rows are filtered out so output stays
    delta-sized."""
    from dod_etl_spark.operators.dedup import snapshot_diff

    docs = t(spark, sf_dir, "documents")
    old_text = F.when(
        F.col("doc_id") % 8 == 5,
        F.expr("substr(text, 1, greatest(length(text) - 1, 0))"),
    ).otherwise(F.col("text"))
    old = docs.where(F.col("doc_id") % 10 != 3).select(
        "doc_id", F.md5(old_text.cast("binary")).alias("fp")
    )
    new = docs.where(F.col("doc_id") % 10 != 7).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("fp")
    )
    return snapshot_diff(old, new, id_col="doc_id", fp_col="fp").where(
        F.col("status") != "unchanged"
    )


# --- Token-rarity scoring (importance-sampling primitive) --------------------

_RARITY_ORACLE = f"""
WITH inst AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM inst GROUP BY doc_id, tok
), cnt AS (
  SELECT doc_id, tok, tf, sum(tf) OVER (PARTITION BY tok) AS cnt,
         (SELECT count(*) FROM inst) AS total
  FROM tf
), scored AS (
  SELECT doc_id,
         sum(tf) AS n_toks,
         {sround_sql(
             "CAST(sum(CAST(CAST(tf AS DOUBLE) * (CAST(total AS DOUBLE) / CAST(cnt AS DOUBLE)) AS DECIMAL(27,6))) AS DOUBLE) / CAST(sum(tf) AS DOUBLE)",
             6,
         )} AS rarity
  FROM cnt GROUP BY doc_id
), thr AS (
  SELECT [{", ".join(sround_sql(f"quantile_cont(rarity, {p/10.0})", 6) for p in range(1, 10))}] AS ts
  FROM scored
)
SELECT s.doc_id, s.n_toks, s.rarity,
       1 + len(list_filter(thr.ts, t -> s.rarity >= t)) AS decile
FROM scored s, thr
"""


@query("rarity_score_docs", _RARITY_ORACLE)
def rarity_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-rarity scoring + global decile bucketing — the
    importance-sampling primitive (DSIR-style data selection, rarity
    curricula): a document's score is the mean inverse corpus
    frequency of its token instances, rational (total/cnt) not
    ln-based so both engines compute bit-identical IEEE ops.

    Shape: the MODEL is the vocab-bounded per-token corpus count
    (one map-combined groupBy(tok) over the occurrence stream),
    checkpointed once — the corpus total derives from it by a 1-row
    aggregate, so nothing corpus-scale is ever materialized (the old
    form checkpointed the (doc,tok) tf frame — corpus-scale — and
    shuffled it again through a sum() OVER (PARTITION BY tok)).
    Per-doc scoring is then: explode -> (doc,tok) tf [shuffle 1] ->
    broadcast join of the token counts (vocab-bounded; beyond the
    broadcast cap it degrades to a hash join on the same key) ->
    per-doc decimal-exact mean [shuffle 2], materialized (1 row/doc)
    -> the nine decile thresholds come back as ONE broadcast row
    (percentile array; the quality_cut scalar pattern) — a global
    ntile() would sort the corpus on a single partition."""
    docs = t(spark, sf_dir, "documents")
    tok = F.explode(
        F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    ).alias("tok")
    inst = docs.select("doc_id", tok)
    bytok = (
        inst.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    total = bytok.agg(F.sum("cnt").alias("_total"))
    tf = inst.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    cnt = tf.join(F.broadcast(bytok), "tok").crossJoin(F.broadcast(total))
    w_inst = (
        F.col("tf").cast("double")
        * (F.col("_total").cast("double") / F.col("cnt").cast("double"))
    ).cast("decimal(27,6)")
    scored = cnt.groupBy("doc_id").agg(
        F.sum("tf").alias("n_toks"),
        stable_round(
            F.sum(w_inst).cast("double") / F.sum("tf").cast("double"), 6
        ).alias("rarity"),
    ).localCheckpoint(eager=True)
    ps = ", ".join(f"{p / 10.0}D" for p in range(1, 10))
    thr = scored.agg(
        F.expr(
            f"transform(percentile(rarity, array({ps})), "
            "t -> floor(t * 1000000 + 0.5) / 1000000)"
        ).alias("ts")
    )
    decile = F.lit(1) + F.size(
        F.filter(F.col("ts"), lambda tv: F.col("rarity") >= tv)
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .select("doc_id", "n_toks", "rarity", decile.alias("decile"))
    )


# --- Incremental cross-corpus dedup ------------------------------------------


def _incremental_dedup_oracle(num_hashes: int = 8, band_size: int = 2) -> str:
    from dod_etl_spark.operators.text_dedup import MINHASH_PRIME, minhash_perm_params

    mins = ",\n         ".join(
        f"min(({a} * h32 + {b}) % {MINHASH_PRIME}) AS h{k}"
        for k, (a, b) in enumerate(minhash_perm_params(num_hashes))
    )
    n_bands = num_hashes // band_size
    band_rows = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws('_', {hs}) AS band_hash FROM mh".format(
            b=b,
            hs=", ".join(
                f"CAST(h{b * band_size + i} AS VARCHAR)" for i in range(band_size)
            ),
        )
        for b in range(n_bands)
    )
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest([substr(text, i, 5)
                   for i in range(1, greatest(length(text) - 3, 2))]) AS shingle
    FROM documents
  )
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h32 FROM sh
),
mh AS (
  SELECT doc_id,
         {mins}
  FROM hashed GROUP BY doc_id
),
bands AS (
  {band_rows}
),
fps AS (
  SELECT doc_id, md5(text) AS fp FROM documents
),
band_dups AS (
  SELECT DISTINCT b.doc_id
  FROM bands b JOIN bands c ON b.band = c.band AND b.band_hash = c.band_hash
  WHERE b.doc_id % 5 != 0 AND c.doc_id % 5 = 0
)
SELECT i.doc_id, i.fp
FROM fps i
WHERE i.doc_id % 5 != 0
  AND i.fp NOT IN (SELECT fp FROM fps WHERE doc_id % 5 = 0)
  AND i.doc_id NOT IN (SELECT doc_id FROM band_dups)
"""


@query("incremental_dedup_docs", _incremental_dedup_oracle(band_size=4))
def incremental_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: an incoming batch checked against
    the ALREADY-INGESTED corpus — exact (md5 anti-join) then near-dup
    (any shared MinHash LSH band with a corpus doc) — emitting only
    the incoming docs that survive both. This is the batch twin of
    streaming/dedup_store.py's forever-dedup: at 100 TB the corpus
    side is a stored signature/fingerprint table (bucketed on the
    band hash / fp), so only the new batch is ever re-hashed.

    Versions are carved deterministically from `documents` (corpus:
    doc_id%5==0, incoming: the rest); the banded frame is computed in
    ONE pass over all docs (checkpointed, same rationale as
    minhash_candidates) and split — not two signature passes.
    Incoming-vs-incoming duplicates are out of scope by contract
    (dedup_exact_docs / minhash pipelines own within-batch dedup)."""
    from dod_etl_spark.operators.text_dedup import minhash_bands, minhash_signatures

    docs = t(spark, sf_dir, "documents")
    is_corpus = F.col("doc_id") % 5 == 0
    fps = docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("fp"))
    corpus_fp = fps.where(is_corpus).select("fp").distinct()
    inc = fps.where(~is_corpus)
    exact_surv = inc.join(corpus_fp, "fp", "left_anti")
    bands = minhash_bands(
        minhash_signatures(docs, num_hashes=8, shingle_len=5), band_size=4, num_hashes=8
    ).localCheckpoint(eager=True)
    corpus_bands = bands.where(is_corpus).select("band", "band_hash")
    band_dups = (
        bands.where(~is_corpus)
        .join(corpus_bands, ["band", "band_hash"], "left_semi")
        .select("doc_id")
        .distinct()
    )
    return exact_surv.join(band_dups, "doc_id", "left_anti").select("doc_id", "fp")


# --- Embedding class centroids + prototypicality outliers --------------------

_CENTROID_EX_CTE = """ex AS (
  SELECT vec_id, label,
         unnest([{'i': i, 'v': embedding[i]::DOUBLE}
                 for i in range(1, len(embedding)+1)], recursive := true)
  FROM embeddings
)"""

_CENTROID_ORACLE = f"""
WITH {_CENTROID_EX_CTE}
SELECT label, i,
       {sround_sql("CAST(sum(CAST(v AS DECIMAL(27,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)} AS centroid
FROM ex GROUP BY label, i
"""


@query("label_centroids", _CENTROID_ORACLE)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids: posexplode to (label, dim, value)
    and ONE aggregation with map-side combine — the shuffle carries
    |labels|x|dims| partial sums per map task, never vectors. The
    decimal-cast sum makes the mean order-independent (double sums are
    not), so both engines agree bit-for-bit. Centroids are the
    metadata-sized model for prototypicality scoring, mislabel
    screening, and class-balanced pruning."""
    emb = t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select("label", (F.col("pos") + 1).alias("i"), F.col("v").cast("double").alias("v"))
    return ex.groupBy("label", "i").agg(
        stable_round(
            F.sum(F.col("v").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("centroid")
    )


_OUTLIER_ORACLE = f"""
WITH {_CENTROID_EX_CTE},
cent AS (
  SELECT label, i,
         {sround_sql("CAST(sum(CAST(v AS DECIMAL(27,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)} AS centroid
  FROM ex GROUP BY label, i
),
d AS (
  SELECT vec_id, ex.label,
         {sround_sql("sqrt(CAST(sum(CAST((v - centroid) * (v - centroid) AS DECIMAL(27,6))) AS DOUBLE))", 6)} AS dist
  FROM ex JOIN cent ON ex.label = cent.label AND ex.i = cent.i
  GROUP BY vec_id, ex.label
)
SELECT label, vec_id, dist,
       row_number() OVER (PARTITION BY label ORDER BY dist DESC, vec_id) AS rk
FROM d
QUALIFY rk <= 5
"""


@query("embedding_outliers", _OUTLIER_ORACLE)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototypicality outlier screen: each class's top-5 vectors by
    euclidean distance to their OWN class centroid — the standard
    mislabel/anomaly shortlist before training. The centroid frame
    (|labels|x|dims| rows) broadcasts back onto the exploded scan;
    per-vector distances are one decimal-exact aggregation; the
    shortlist cut rides WindowGroupLimit. Vectors shuffle once
    (dim-exploded, grouped back by vec_id) — no pairwise work
    anywhere."""
    emb = t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select(
        "vec_id", "label", (F.col("pos") + 1).alias("i"),
        F.col("v").cast("double").alias("v"),
    )
    cent = ex.groupBy("label", "i").agg(
        stable_round(
            F.sum(F.col("v").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("centroid")
    )
    diff = F.col("v") - F.col("centroid")
    d = (
        ex.join(F.broadcast(cent), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            stable_round(
                F.sqrt(F.sum((diff * diff).cast("decimal(27,6)")).cast("double")), 6
            ).alias("dist")
        )
    )
    w = Window.partitionBy("label").orderBy(F.col("dist").desc(), F.col("vec_id"))
    return (
        d.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("label", "vec_id", "dist", "rk")
    )


# --- Contamination audit report ----------------------------------------------

_CONTAM_REPORT_ORACLE = f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           range(1, greatest(len(tk) - {_NGRAM_DECON_N - 1}, 1) + 1),
           i -> array_to_string(tk[i:i+{_NGRAM_DECON_N - 1}], ' '))) AS gram
  FROM tk
)
SELECT h.doc_id,
       count(DISTINCT tr.doc_id) AS n_train_docs,
       count(DISTINCT h.gram) AS n_shared_grams
FROM grams h JOIN grams tr ON h.gram = tr.gram
WHERE {hash_bucket_sql("h.doc_id", 7)} < 1000
  AND {hash_bucket_sql("tr.doc_id", 7)} >= 1000
GROUP BY h.doc_id
"""


@query("contamination_report", _CONTAM_REPORT_ORACLE)
def contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AUDIT twin of ngram_decontaminate_docs: per HOLDOUT document,
    how many train docs share at least one token 5-gram and how many
    of the holdout doc's distinct grams are compromised — the evidence
    a decontamination run should ship with. Same split (hash bucket
    seed 7), same gram construction. The holdout gram set (tiny side)
    broadcasts with its doc ids; the train side explodes map-side and
    joins against it — the corpus never shuffles, the one exchange
    aggregates (holdout_doc, train_doc, gram) hits."""
    from dod_etl_spark.operators.sampling import split_train_holdout

    docs = t(spark, sf_dir, "documents")
    train, holdout = split_train_holdout(docs, "doc_id", 0.1, seed=7)
    n = _NGRAM_DECON_N

    def grams(df: DataFrame) -> DataFrame:
        tk = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
        idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - (n - 1), F.lit(1)))
        g = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tk, i, n)))
        return df.select("doc_id", F.explode(F.array_distinct(g)).alias("gram"))

    h = grams(holdout).withColumnRenamed("doc_id", "_hid")
    tr = grams(train).withColumnRenamed("doc_id", "_tid")
    return (
        tr.join(F.broadcast(h), "gram")
        .groupBy(F.col("_hid").alias("doc_id"))
        .agg(
            F.countDistinct("_tid").alias("n_train_docs"),
            F.countDistinct("gram").alias("n_shared_grams"),
        )
    )


# --- Cluster size histogram --------------------------------------------------

_CLUSTER_HIST_ORACLE = f"""
WITH assign AS ({_CLUSTERS_ORACLE})
SELECT cluster_size, count(*) AS n_clusters
FROM (
  SELECT cluster_id, count(*) AS cluster_size FROM assign GROUP BY cluster_id
)
GROUP BY cluster_size
"""


@query("cluster_size_histogram", _CLUSTER_HIST_ORACLE)
def cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster size distribution — the one-page answer to "how
    duplicated is this corpus?" (and the skew early-warning: a mega
    cluster here predicts degenerate LSH buckets downstream). Two
    scalar aggregations over the dedup_clusters assignment frame; the
    histogram is |distinct sizes| rows."""
    docs = t(spark, sf_dir, "documents")
    edges = minhash_cluster_edges(docs, num_hashes=8, band_size=2, shingle_len=5)
    assign = dedup_cluster_assignments(docs, edges)
    sizes = assign.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(F.count(F.lit(1)).alias("n_clusters"))


# --- Per-dimension embedding statistics --------------------------------------

_DIM_STATS_ORACLE = f"""
WITH {_CENTROID_EX_CTE},
agg AS (
  SELECT i,
         CAST(sum(CAST(v AS DECIMAL(27,6))) AS DOUBLE) AS s,
         CAST(sum(CAST(v * v AS DECIMAL(27,6))) AS DOUBLE) AS sq,
         CAST(count(*) AS DOUBLE) AS n
  FROM ex GROUP BY i
)
SELECT i, {sround_sql("s / n", 6)} AS mean_v,
       {sround_sql("sq / n - (s / n) * (s / n)", 6)} AS var_v,
       row_number() OVER (ORDER BY {sround_sql("sq / n - (s / n) * (s / n)", 6)} DESC, i) AS var_rank
FROM agg
"""


@query("embedding_dim_stats", _DIM_STATS_ORACLE)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance of the embedding corpus, ranked by
    variance — the principled input for LSH blocking-key selection:
    sign_bucket should read HIGH-variance components (a near-zero-
    variance dim puts everything in one bucket half). One map-side-
    combined aggregation over the posexplode (decimal-exact sums, so
    the variance is order-independent); the rank window runs over
    |dims| rows — driver-scale, not data-scale."""
    emb = t(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode(F.col("embedding")).alias("pos", "v")).select(
        (F.col("pos") + 1).alias("i"), F.col("v").cast("double").alias("v")
    )
    agg = ex.groupBy("i").agg(
        F.sum(F.col("v").cast("decimal(27,6)")).cast("double").alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(27,6)")).cast("double").alias("sq"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    mean_v = stable_round(F.col("s") / F.col("n"), 6)
    var_v = stable_round(
        F.col("sq") / F.col("n") - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n")), 6
    )
    w = Window.orderBy(var_v.desc(), F.col("i"))
    return agg.select(
        "i", mean_v.alias("mean_v"), var_v.alias("var_v"),
        F.row_number().over(w).alias("var_rank"),
    )


# --- Scalar-quantized (int8) similarity search -------------------------------

_SQ_QUANT_EXPR = """list_transform(embedding,
           x -> floor(x * 127.0
                / list_max(list_transform(embedding, y -> abs(y))) + 0.5))"""

_SQ_TOPK_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, {_SQ_QUANT_EXPR} AS qv
  FROM embeddings WHERE vec_id < 10
),
c AS (
  SELECT vec_id AS neighbor_id, {_SQ_QUANT_EXPR} AS cv
  FROM embeddings
),
scored AS (
  SELECT query_id, neighbor_id,
         {sround_sql('''CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) > 0
                    THEN list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                    ELSE 0.0 END''', 3)} AS cosine_q
  FROM q CROSS JOIN c
  WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, cosine_q,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine_q DESC, neighbor_id) AS rk
FROM scored
QUALIFY rk <= 5
"""


@query("sq_int8_topk", _SQ_TOPK_ORACLE)
def sq_int8_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cosine_topk's scalar-quantized twin (operators/similarity.py
    sq_int8_topk): absmax-int8 vectors, scales cancel out of the
    cosine, every score integer-derived and bit-identical cross-engine
    — proof the quantized index is portable between builder and
    server. 1 byte/dim through the scan instead of 4 is the 100 TB
    bandwidth dividend; ranking quality vs the float baseline is
    pinned in tests/test_similarity.py."""
    from dod_etl_spark.operators.similarity import sq_int8_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return sq_int8_topk(queries, emb, k=5)


# --- Per-source duplication report -------------------------------------------

_DUP_RATE_ORACLE = f"""
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_unique,
       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dups,
       {sround_sql("CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE) / count(*)", 6)} AS dup_rate
FROM documents
GROUP BY source
"""


@query("dedup_rate_by_source", _DUP_RATE_ORACLE)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources are polluting the corpus: per-source exact-dup
    rate (docs minus distinct fingerprints). The actionable curation
    report — a high-dup source gets capped (domain_cap_docs) or
    re-crawled. One aggregation; the distinct-count shuffles (source,
    16-byte fp), never text. At warehouse scale the exact distinct
    swaps for the HLL sketch path (functions/sketches.py) at
    |sources| x lgK cost."""
    docs = t(spark, sf_dir, "documents")
    fp = F.md5(F.col("text").cast("binary"))
    n = F.count(F.lit(1))
    nu = F.countDistinct(fp)
    return docs.groupBy("source").agg(
        n.alias("n_docs"),
        nu.alias("n_unique"),
        (n - nu).cast("long").alias("n_dups"),
        stable_round((n - nu).cast("double") / n.cast("double"), 6).alias("dup_rate"),
    )


# --- Keep-BEST-per-cluster survivor selection --------------------------------

_KEEP_BEST_ORACLE = f"""
WITH assign AS ({_CLUSTERS_ORACLE}),
scored AS (
  SELECT a.cluster_id, a.doc_id, {sround_sql(_QUALITY_SQL, 6)} AS q
  FROM assign a JOIN documents d ON a.doc_id = d.doc_id
),
ranked AS (
  SELECT cluster_id, doc_id, q,
         row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, doc_id) AS rnk,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM scored
)
SELECT cluster_id, doc_id AS best_doc_id, n_members, q AS best_quality
FROM ranked WHERE rnk = 1
"""


@query("keep_best_per_cluster", _KEEP_BEST_ORACLE)
def keep_best_per_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection that keeps the HIGHEST-QUALITY member of each
    near-dup cluster — the curation-correct policy (keep-min-id keeps
    whichever was crawled first; this keeps the best copy of the
    boilerplate-mangled variants). Cluster assignments come from the
    same LSH-edge connected components as dedup_clusters; the argmax
    is one max_by aggregation over (assignment ⋈ quality) — quality is
    computed in the scan, text never joins."""
    docs = t(spark, sf_dir, "documents")
    edges = minhash_cluster_edges(docs, num_hashes=8, band_size=2, shingle_len=5)
    assign = dedup_cluster_assignments(docs, edges)
    scored = assign.join(
        docs.select(
            "doc_id", stable_round(quality_score(F.col("text")), 6).alias("q")
        ),
        "doc_id",
    )
    pick = F.max_by(
        F.struct(F.col("doc_id"), F.col("q")),
        # argmax on (q, -doc_id): highest quality, smallest id on ties
        F.struct(F.col("q"), (-F.col("doc_id")).alias("_nid")),
    ).alias("_best")
    return (
        scored.groupBy("cluster_id")
        .agg(pick, F.count(F.lit(1)).alias("n_members"))
        .select(
            "cluster_id",
            F.col("_best.doc_id").alias("best_doc_id"),
            "n_members",
            F.col("_best.q").alias("best_quality"),
        )
    )


# --- Boilerplate span removal (chunk-level strip + reassembly) ----------------

_BP_W = 32  # disjoint windows: stride == window, so reassembly is exact

_BP_REMOVE_ORACLE = f"""
WITH toksed AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), sized AS (
  SELECT doc_id, toks, greatest(len(toks), 1) AS n FROM toksed
), exploded AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, CAST(floor((n - 1) / {_BP_W}.0) AS BIGINT))) AS i
  FROM sized
), fp AS (
  SELECT doc_id, i AS chunk_id,
         array_to_string(list_slice(toks, i * {_BP_W} + 1, i * {_BP_W} + {_BP_W}), ' ') AS chunk_text,
         md5(array_to_string(list_slice(toks, i * {_BP_W} + 1, i * {_BP_W} + {_BP_W}), ' ')) AS chunk_fp
  FROM exploded
), bp AS (
  SELECT chunk_fp FROM fp GROUP BY chunk_fp HAVING count(DISTINCT doc_id) >= 2
), kept AS (
  SELECT doc_id, chunk_id, chunk_text FROM fp
  WHERE chunk_fp NOT IN (SELECT chunk_fp FROM bp)
), rebuilt AS (
  SELECT doc_id,
         array_to_string(list(chunk_text ORDER BY chunk_id), ' ') AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), totals AS (
  SELECT doc_id, count(*) AS n_chunks FROM fp GROUP BY doc_id
)
SELECT t.doc_id,
       md5(coalesce(r.clean_text, '')) AS clean_fp,
       coalesce(r.n_kept, 0) AS n_kept_chunks,
       t.n_chunks - coalesce(r.n_kept, 0) AS n_removed_chunks
FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
"""


@query("remove_boilerplate_docs", _BP_REMOVE_ORACLE)
def remove_boilerplate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style SPAN removal, end to end: disjoint 32-token chunks
    (stride == window, so stripping chunks and re-joining the
    survivors reconstructs the document exactly), chunks repeated
    across >= 2 distinct documents are dropped, and each document is
    REBUILT from its kept chunks in order — emitted as the rebuilt
    text's fingerprint plus kept/removed counts (scalars; the driver
    hash stays cheap). A doc that is pure boilerplate rebuilds to ''.

    The boilerplate VOTE result (duplicated fps — aggregate-bounded)
    is materialized once; the chunk frame itself is recomputed by its
    consumers (vote build, reassembly, per-doc totals — each a
    map-only tokenize), never checkpointed at corpus-text scale. The
    boilerplate fingerprint set broadcasts (16-byte fps); reassembly
    is one shuffle carrying kept chunk texts — the irreducible payload
    of a TRANSFORM op (the report twin chunk_dedup_stats moves
    fingerprints only)."""
    from dod_etl_spark.operators.chunking import chunk_tokens

    docs = t(spark, sf_dir, "documents")
    # The chunk frame carries chunk TEXT — corpus-scale; materializing
    # it is a spill bomb at 100 TB. Checkpoint the boilerplate-vote
    # RESULT instead (duplicated fps only — aggregate-bounded) and let
    # each chunk consumer re-run the map-only tokenize lineage.
    chunks = chunk_tokens(docs, window=_BP_W, stride=_BP_W, keep_text=True)
    bp = (
        chunks.groupBy("chunk_fp")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("chunk_fp")
        .localCheckpoint(eager=True)
    )
    kept = chunks.join(F.broadcast(bp), "chunk_fp", "left_anti")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))),
        lambda s: s["chunk_text"],
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(ordered, " ").alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.md5(F.coalesce(F.col("clean_text"), F.lit("")).cast("binary")).alias("clean_fp"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept_chunks"),
        (F.col("n_chunks") - F.coalesce(F.col("n_kept"), F.lit(0))).cast("long").alias(
            "n_removed_chunks"
        ),
    )


# --- Hashed-feature linear classifier scoring --------------------------------

# fastText-style quality-classifier INFERENCE: the model is a broadcast
# artifact (a weight vector over hashed bag-of-words features); scoring
# is a pure projection. The weight table here is a deterministic stand-in
# for a trained model's parameters — integer milli-weights so the
# per-document sum is exact integer arithmetic in any engine (a float
# dot product would hash-diverge on summation order).
_CLF_D = 64  # hashed feature buckets (real models use 1-10M; D is a knob)


def _clf_weights() -> list[int]:
    # Deterministic LCG over the bucket index: integer weights in
    # [-1000, 1000] (milli-units). Stands in for trained parameters.
    return [((i * 2654435761 + 1013904223) % 2001) - 1000 for i in range(_CLF_D)]


def _clf_idx_sql_duck(tk: str) -> str:
    return f"((('0x' || substr(md5({tk}), 1, 8))::BIGINT % {_CLF_D}) + 1)"


_CLF_W_LIST = ", ".join(str(w) for w in _clf_weights())

_CLF_ORACLE = f"""
SELECT doc_id,
       len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_toks,
       CAST(coalesce(list_sum(list_transform(
           list_filter(string_split(lower(text), ' '), x -> x <> ''),
           tk -> [{_CLF_W_LIST}][{_clf_idx_sql_duck('tk')}])), 0) AS BIGINT) AS score_milli,
       {sround_sql(
           f'''CAST(coalesce(list_sum(list_transform(
               list_filter(string_split(lower(text), ' '), x -> x <> ''),
               tk -> [{_CLF_W_LIST}][{_clf_idx_sql_duck('tk')}])), 0) AS DOUBLE)
               / (1000.0 * greatest(len(list_filter(string_split(lower(text), ' '), x -> x <> '')), 1))''',
           6,
       )} AS score,
       coalesce(list_sum(list_transform(
           list_filter(string_split(lower(text), ' '), x -> x <> ''),
           tk -> [{_CLF_W_LIST}][{_clf_idx_sql_duck('tk')}])), 0) > 0 AS label_positive
FROM documents
"""


@query("classifier_score_docs", _CLF_ORACLE)
def classifier_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear classifier scoring (fastText-style quality
    filter inference): token -> md5 hash bucket -> milli-weight lookup,
    summed per document; positive-sum documents carry the keep label.

    Scale shape: ZERO shuffles — the whole score is one higher-order
    array expression inside the projection (filter/transform/aggregate
    over split()), so it rides the parquet scan with column pruning and
    runs JVM-side at 100 TB with no Python and no explode fan-out.
    A real trained model swaps `_clf_weights` for its parameter vector
    (broadcast once; D in the millions is still one literal/broadcast
    array — FAISS-style model-as-metadata, like ivf centroids).

    No reference counterpart (sanctioned LLM-pipeline extension:
    quality scoring, BASELINE.json north-star)."""
    docs = t(spark, sf_dir, "documents")
    toks_sql = "filter(split(lower(text), ' '), x -> x != '')"
    idx_sql = (
        f"CAST((CAST(conv(substring(md5(CAST(tk AS BINARY)), 1, 8), 16, 10) AS BIGINT)"
        f" % {_CLF_D}) + 1 AS INT)"
    )
    milli_sql = (
        f"aggregate({toks_sql}, 0L,"
        f" (acc, tk) -> acc + CAST(element_at(array({_CLF_W_LIST}), {idx_sql}) AS BIGINT))"
    )
    return docs.select(
        "doc_id",
        F.expr(f"size({toks_sql})").alias("n_toks"),
        F.expr(milli_sql).alias("score_milli"),
        stable_round(
            F.expr(milli_sql).cast("double")
            / (F.lit(1000.0) * F.greatest(F.expr(f"size({toks_sql})"), F.lit(1))),
            6,
        ).alias("score"),
        (F.expr(milli_sql) > 0).alias("label_positive"),
    )


# --- Domain-mixture rebalancing plan -----------------------------------------

_MIXTURE_ORACLE = """
WITH per AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
           AS actual_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(actual_tokens) AS BIGINT) AS total_tokens,
         count(*) AS n_sources
  FROM per
)
SELECT p.source, p.n_docs, p.actual_tokens,
       CAST(t.total_tokens // t.n_sources AS BIGINT) AS target_tokens,
       {rate} AS sample_rate,
       {epochs} AS epochs
FROM per p CROSS JOIN tot t
""".format(
    rate=sround_sql(
        "least(1.0, CAST(t.total_tokens // t.n_sources AS DOUBLE) / p.actual_tokens)", 6
    ),
    epochs=sround_sql(
        "CAST(t.total_tokens // t.n_sources AS DOUBLE) / p.actual_tokens", 6
    ),
)


@query("domain_mixture_plan", _MIXTURE_ORACLE)
def domain_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing plan: per-source token inventory plus
    the sampling rate / epoch multiplier that moves the corpus to a
    UNIFORM token share per source (the target-weights vector is a
    parameter; uniform is the oracle-pinned default). epochs > 1 means
    the source must be upsampled (repeated) to hit its share — the
    DoReMi/Pile-style mixture knob computed from the data itself.

    Scale shape: one map-side-combined groupBy(source) over the scan
    (token counts are integer-exact), then a single-row global total
    broadcast back over the per-source frame — the same two-pass
    aggregate-then-broadcast shape as quality_cut; no window over the
    corpus, nothing driver-side. Source cardinality is domains
    (thousands), so the per-source frame is metadata-sized at 100 TB."""
    docs = t(spark, sf_dir, "documents")
    # Materialize the per-source frame ONCE (it is domain-cardinality,
    # i.e. metadata-sized): without this, `tot` re-derives it from the
    # raw scan and the corpus is read + tokenized twice.
    per = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.expr("size(filter(split(text, ' '), x -> x != ''))"))
            .cast("long")
            .alias("actual_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    tot = per.agg(
        F.sum("actual_tokens").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    target = F.expr("total_tokens div n_sources").cast("long")
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("target_tokens", target)
        .select(
            "source",
            "n_docs",
            "actual_tokens",
            "target_tokens",
            stable_round(
                F.least(
                    F.lit(1.0),
                    F.col("target_tokens").cast("double") / F.col("actual_tokens"),
                ),
                6,
            ).alias("sample_rate"),
            stable_round(
                F.col("target_tokens").cast("double") / F.col("actual_tokens"), 6
            ).alias("epochs"),
        )
    )


# --- kNN label propagation ------------------------------------------------------

_LABELPROP_ORACLE = f"""
WITH graph AS ({_KNN_GRAPH_ORACLE}),
votes AS (
  SELECT g.vec_id, l.label, count(*) AS n_votes
  FROM graph g JOIN embeddings l ON g.neighbor_id = l.vec_id
  GROUP BY g.vec_id, l.label
),
best AS (
  SELECT vec_id, label AS predicted_label, n_votes,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY n_votes DESC, label) AS rn
  FROM votes
)
SELECT b.vec_id, t.label AS true_label, b.predicted_label, b.n_votes,
       CAST(b.predicted_label = t.label AS INT) AS agree
FROM best b JOIN embeddings t USING (vec_id)
WHERE rn = 1
"""


@query("knn_label_propagation", _LABELPROP_ORACLE)
def knn_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label vote over the kNN graph: each vector's
    predicted label is the majority among its top-3 approximate
    neighbors (tie -> smallest label), with an agreement flag against
    the stored label — the mislabel screen / pseudo-labeling primitive
    (the graph twin of embedding_outliers' centroid-distance screen).

    Shape on top of knn_graph's bucket-blocked plan: the neighbor-label
    attach joins the (vec_id, label) projection — k rows per node,
    labels only, never vectors; the majority vote is ONE max_by
    aggregation per node (no second window exchange: the rank
    formulation would re-partition by (vec_id, label) then again by
    vec_id)."""
    from dod_etl_spark.operators.similarity import knn_graph

    emb = t(spark, sf_dir, "embeddings")
    labels = emb.select("vec_id", "label")
    graph = knn_graph(emb, k=3, sign_dims=4)
    votes = (
        graph.join(
            labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
        )
        .groupBy("vec_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    best = votes.groupBy("vec_id").agg(
        F.max_by(
            F.struct("label", "n_votes"),
            F.struct(F.col("n_votes"), (-F.col("label")).alias("neg")),
        ).alias("b")
    )
    return best.join(labels, "vec_id").select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.col("b.label").alias("predicted_label"),
        F.col("b.n_votes").alias("n_votes"),
        (F.col("b.label") == F.col("label")).cast("int").alias("agree"),
    )


# --- Fixed-iteration PageRank over the kNN graph --------------------------------
#
# 3 unrolled power-iteration steps, damping 0.85, uniform start.  Every
# per-node sum of incoming rank/degree contributions goes through
# DECIMAL(27,12) (order-independent), so each iteration's rank vector is
# bit-identical in any engine and the final rounded ranks hash-match.

_PR_DAMP = "0.85"
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    prev = "r0"
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f"""r{i} AS (
  SELECT n.vec_id,
         0.15 + {_PR_DAMP} * coalesce(CAST(sum(
             CAST(p.rank / d.deg AS DECIMAL(27,12))) AS DOUBLE), 0.0) AS rank
  FROM nodes n
  LEFT JOIN graph g ON g.neighbor_id = n.vec_id
  LEFT JOIN {prev} p ON p.vec_id = g.vec_id
  LEFT JOIN deg d ON d.vec_id = g.vec_id
  GROUP BY n.vec_id
)"""
        )
        prev = f"r{i}"
    chain = ",\n".join(steps)
    return f"""
WITH graph AS ({_KNN_GRAPH_ORACLE}),
nodes AS (SELECT vec_id FROM embeddings),
deg AS (SELECT vec_id, count(*) AS deg FROM graph GROUP BY vec_id),
r0 AS (SELECT vec_id, 1.0 AS rank FROM nodes),
{chain}
SELECT vec_id, {sround_sql("rank", 6)} AS rank
FROM {prev}
"""


@query("knn_pagerank", _pagerank_oracle())
def knn_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the approximate kNN graph — the
    diversity/importance weight for graph-based curation (high-rank =
    central/redundant region, low-rank = periphery), and the iterative-
    dataflow pattern beyond connected components: a FIXED number of
    power-iteration rounds, each one join + one decimal-exact
    aggregation over the MATERIALIZED edge frame (graph + degrees are
    localCheckpoint'ed once — 3N edges carrying (src, dst, deg, rank)
    scalars, never vectors; without it every round would replay the
    bucket self-join lineage)."""
    from dod_etl_spark.operators.similarity import knn_graph

    from dod_etl_spark.operators.graph import _coalesce_for_rounds

    emb = t(spark, sf_dir, "embeddings")
    nodes = emb.select("vec_id")
    edges = (
        knn_graph(emb, k=3, sign_dims=4)
        .select(F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst"))
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # data-proportional partitioning for the iterative rounds (the CC
    # de-noise fix): tiny working frames stop scheduling ~64 near-empty
    # tasks per iteration; large graphs are unaffected.
    ed = _coalesce_for_rounds(edges.join(deg, "src").localCheckpoint(eager=True))
    rank = nodes.select("vec_id", F.lit(1.0).alias("rank"))
    for _ in range(_PR_ITERS):
        contrib = (
            ed.join(rank.withColumnRenamed("vec_id", "src"), "src")
            .select(
                F.col("dst"),
                (F.col("rank") / F.col("deg")).cast("decimal(27,12)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("double").alias("in_sum"))
        )
        rank = nodes.join(
            contrib.withColumnRenamed("dst", "vec_id"), "vec_id", "left"
        ).select(
            "vec_id",
            (
                F.lit(0.15)
                + F.lit(float(_PR_DAMP)) * F.coalesce(F.col("in_sum"), F.lit(0.0))
            ).alias("rank"),
        )
    return rank.select("vec_id", stable_round("rank", 6).alias("rank"))


# --- Mixture-plan-driven deterministic sampling ---------------------------------
#
# Makes domain_mixture_plan ACTIONABLE: the per-source sampling rate it
# computes is applied as a content-hash Bernoulli cut, so the
# rebalanced corpus is reproducible on any cluster/partitioning/engine
# (rand() is not). Upsampling sources (rate clamps at 1.0) keep every
# row — their epochs>1 repetition happens at training time.

_MIX_SAMPLE_SEED = 7

_MIX_SAMPLE_ORACLE = f"""
WITH per AS (
  SELECT source,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
           AS actual_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(actual_tokens) AS BIGINT) AS total_tokens,
         count(*) AS n_sources
  FROM per
), rates AS (
  SELECT p.source,
         least(1.0, CAST(t.total_tokens // t.n_sources AS DOUBLE) / p.actual_tokens)
           AS rate
  FROM per p CROSS JOIN tot t
)
SELECT d.doc_id, d.source,
       {hash_bucket_sql("doc_id", _MIX_SAMPLE_SEED)} AS bucket,
       {sround_sql("r.rate", 6)} AS sample_rate
FROM documents d JOIN rates r USING (source)
WHERE {hash_bucket_sql("doc_id", _MIX_SAMPLE_SEED)}
      < CAST(floor(r.rate * {SAMPLE_BUCKETS}) AS BIGINT)
"""


@query("mixture_sample_docs", _MIX_SAMPLE_ORACLE)
def mixture_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """domain_mixture_plan composed with hash_sample: keep each doc iff
    its content bucket falls under its source's uniform-share rate.

    Scale shape: the rates frame is domain-cardinality (metadata-sized)
    and broadcast back, so the corpus scan is filtered in place — ONE
    map-side-combined per-source aggregate, no fact shuffle, no
    rand()."""
    docs = t(spark, sf_dir, "documents")
    per = (
        docs.groupBy("source")
        .agg(
            F.sum(F.expr("size(filter(split(text, ' '), x -> x != ''))"))
            .cast("long")
            .alias("actual_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    tot = per.agg(
        F.sum("actual_tokens").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    rates = per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0),
            F.expr("total_tokens div n_sources").cast("double")
            / F.col("actual_tokens"),
        ).alias("rate"),
    )
    bucket = hash_bucket(F.col("doc_id"), _MIX_SAMPLE_SEED)
    cut = F.floor(F.col("rate") * SAMPLE_BUCKETS).cast("long")
    return (
        docs.join(F.broadcast(rates), "source")
        .where(bucket < cut)
        .select(
            "doc_id",
            "source",
            bucket.alias("bucket"),
            stable_round("rate", 6).alias("sample_rate"),
        )
    )


# --- Gopher-style quality rule flags ---------------------------------------------
#
# The rule battery (Rae et al.'s Gopher heuristics, adapted to
# newline-free synthetic docs): word-count bounds, mean word length
# bounds, max single-token share, and stopword presence.  Every rule is
# integer/rational arithmetic over the token array — map-only, rules
# evaluate in the scan stage, and the conjunction is a pushable
# predicate for downstream curation.

_GOPHER_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
  FROM documents
), m AS (
  SELECT doc_id,
         len(tk) AS n_words,
         list_sum(list_transform(tk, x -> len(x))) AS n_chars,
         list_max(list_transform(list_distinct(tk),
                  d -> len(list_filter(tk, x -> x = d)))) AS top_tok_n,
         len(list_filter(tk, x -> x IN ('the', 'a', 'of', 'to', 'and'))) > 0
           AS has_stopword
  FROM toks
)
SELECT doc_id, n_words,
       CAST(n_chars AS DOUBLE) / n_words AS mean_word_len,
       CAST(top_tok_n AS DOUBLE) / n_words AS top_token_share,
       CAST(has_stopword AS INT) AS has_stopword,
       CAST(n_words >= 10 AND n_words <= 100000
            AND (CAST(n_chars AS DOUBLE) / n_words) >= 2.0
            AND (CAST(n_chars AS DOUBLE) / n_words) <= 12.0
            AND (CAST(top_tok_n AS DOUBLE) / n_words) <= 0.25
            AND has_stopword AS INT) AS passes_gopher
FROM m
WHERE n_words > 0
"""


@query("gopher_rules_docs", _GOPHER_ORACLE)
def gopher_rules_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule battery. All ratios are single divisions of
    exact integers (no rounding needed — both engines compute the same
    IEEE quotient); the top-token share runs over the distinct-token
    array (vocabulary-sized per doc), never a groupBy."""
    docs = t(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    d = docs.select("doc_id", tk.alias("tk")).where(F.size("tk") > 0)
    n_words = F.size("tk").cast("long")
    n_chars = F.aggregate(
        F.transform("tk", lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    top_tok_n = F.array_max(
        F.transform(
            F.array_distinct("tk"),
            lambda dd: F.size(F.filter("tk", lambda x: x == dd)).cast("long"),
        )
    )
    stop = F.lit(["the", "a", "of", "to", "and"])
    has_stop = F.size(F.filter("tk", lambda x: F.array_contains(stop, x))) > 0
    mean_len = n_chars.cast("double") / n_words
    top_share = top_tok_n.cast("double") / n_words
    passes = (
        (n_words >= 10)
        & (n_words <= 100000)
        & (mean_len >= 2.0)
        & (mean_len <= 12.0)
        & (top_share <= 0.25)
        & has_stop
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        top_share.alias("top_token_share"),
        has_stop.cast("int").alias("has_stopword"),
        passes.cast("int").alias("passes_gopher"),
    )


# --- Mixture-plan epoch realization (upsampling) ---------------------------------
#
# mixture_sample_docs realizes the DOWNSAMPLING half of the mixture
# plan (rate clamps at 1.0); this realizes the UPSAMPLING half: a
# source with epochs = 2.3 emits every doc twice plus a deterministic
# 30% third copy — the materialized repetition a trainer without an
# epoch-weighting dataloader needs.  Copy counts are content-hash
# decisions, so the expanded corpus is reproducible anywhere.

_MIX_UP_SEED = 11

_MIX_UPSAMPLE_ORACLE = f"""
WITH per AS (
  SELECT source,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
           AS actual_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(actual_tokens) AS BIGINT) AS total_tokens,
         count(*) AS n_sources
  FROM per
), rates AS (
  SELECT p.source,
         CAST(t.total_tokens // t.n_sources AS DOUBLE) / p.actual_tokens AS epochs
  FROM per p CROSS JOIN tot t
)
SELECT d.doc_id, d.source,
       unnest(generate_series(1,
         CAST(floor(r.epochs) AS BIGINT)
         + CASE WHEN {hash_bucket_sql("d.doc_id", _MIX_UP_SEED)}
                     < CAST(floor((r.epochs - floor(r.epochs)) * {SAMPLE_BUCKETS})
                            AS BIGINT)
                THEN 1 ELSE 0 END)) AS copy
FROM documents d JOIN rates r USING (source)
"""


@query("mixture_upsample_docs", _MIX_UPSAMPLE_ORACLE)
def mixture_upsample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, copy) rows realizing each source's epoch
    multiplier: floor(epochs) full copies + one fractional copy decided
    by content hash.  Scale shape: identical to mixture_sample — the
    rates frame broadcasts, the explode is map-side in the scan stage,
    and output volume equals the mixture plan's token budget by
    construction."""
    docs = t(spark, sf_dir, "documents")
    per = (
        docs.groupBy("source")
        .agg(
            F.sum(F.expr("size(filter(split(text, ' '), x -> x != ''))"))
            .cast("long")
            .alias("actual_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    tot = per.agg(
        F.sum("actual_tokens").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    rates = per.crossJoin(F.broadcast(tot)).select(
        "source",
        (
            F.expr("total_tokens div n_sources").cast("double")
            / F.col("actual_tokens")
        ).alias("epochs"),
    )
    bucket = hash_bucket(F.col("doc_id"), _MIX_UP_SEED)
    frac_cut = F.floor(
        (F.col("epochs") - F.floor("epochs")) * SAMPLE_BUCKETS
    ).cast("long")
    k = (
        F.floor("epochs").cast("long")
        + F.when(bucket < frac_cut, F.lit(1)).otherwise(F.lit(0))
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .select(
            "doc_id",
            "source",
            F.explode(
                F.when(k >= 1, F.sequence(F.lit(1).cast("long"), k)).otherwise(
                    F.array().cast("array<long>")
                )
            ).alias("copy"),
        )
    )


# --- Hybrid lexical + semantic dedup pairs ----------------------------------------
#
# Production near-dup pipelines run BOTH detectors: MinHash-LSH catches
# verbatim/boilerplate overlap that embeddings smooth over; embedding
# cosine catches paraphrases lexical shingles miss.  This emits the
# union of the two oracle-paired pair generators with provenance, the
# input a combined CC clustering (or an audit of detector overlap)
# consumes.

_HYBRID_ORACLE = f"""
WITH lex AS (
  SELECT id_1, id_2 FROM ({_minhash_oracle()})
), e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n,
         (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
          + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
          + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
          + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
  FROM embeddings
), sem AS (
  SELECT a.vec_id AS id_1, b.vec_id AS id_2
  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE {sround_sql('''CASE WHEN a.n * b.n > 0
                  THEN list_dot_product(a.v, b.v) / (a.n * b.n)
                  ELSE 0.0 END''', 3)} >= 0.35
)
SELECT id_1, id_2,
       CASE WHEN is_lex AND is_sem THEN 'both'
            WHEN is_lex THEN 'lexical' ELSE 'semantic' END AS via
FROM (
  SELECT id_1, id_2,
         bool_or(src = 'lex') AS is_lex, bool_or(src = 'sem') AS is_sem
  FROM (
    SELECT id_1, id_2, 'lex' AS src FROM lex
    UNION ALL
    SELECT id_1, id_2, 'sem' AS src FROM sem
  ) GROUP BY id_1, id_2
)
"""


@query("hybrid_dedup_pairs", _HYBRID_ORACLE)
def hybrid_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of the MinHash-LSH and embedding-cosine pair generators
    with per-pair provenance ('lexical' | 'semantic' | 'both').  Both
    inputs are the engine's existing blocked generators (no new pair
    shapes); the merge is one aggregation over (id_1, id_2) scalars —
    at 100 TB the union frame carries two longs + a tag per candidate
    pair, nothing corpus-sized."""
    from dod_etl_spark.operators.similarity import embedding_near_dup_pairs

    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    lex = minhash_candidates(
        docs, num_hashes=8, band_size=2, shingle_len=5
    ).select("id_1", "id_2", F.lit("lex").alias("src"))
    sem = embedding_near_dup_pairs(emb, threshold=0.35, sign_dims=4).select(
        "id_1", "id_2", F.lit("sem").alias("src")
    )
    merged = (
        lex.unionByName(sem)
        .groupBy("id_1", "id_2")
        .agg(
            F.max(F.col("src") == "lex").alias("is_lex"),
            F.max(F.col("src") == "sem").alias("is_sem"),
        )
    )
    return merged.select(
        "id_1",
        "id_2",
        F.when(F.col("is_lex") & F.col("is_sem"), "both")
        .when(F.col("is_lex"), "lexical")
        .otherwise("semantic")
        .alias("via"),
    )


# --- ExactSubstr-style repeated-substring scrub (Lee et al. 2022) -------------

_SUBSTR_L = 30

_SUBSTR_SCRUB_ORACLE = f"""
WITH g0 AS (
  SELECT doc_id,
         unnest([{{'pos': i, 'gh': substr(md5(substr(text, i, {_SUBSTR_L})), 1, 16)}}
                 for i in range(1, greatest(length(text) - {_SUBSTR_L - 2}, 1))]) AS u
  FROM documents
),
g AS (SELECT doc_id, u.pos AS pos, u.gh AS gh FROM g0),
dup AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY gh) AS c FROM g
  ) WHERE c > 1
),
sp AS (SELECT doc_id, pos AS s, pos + {_SUBSTR_L - 1} AS e FROM dup),
fl AS (
  SELECT doc_id, s, e,
         CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w + 1
              THEN 1 ELSE 0 END AS ni
  FROM sp
  WINDOW w AS (PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl AS (
  SELECT doc_id, s, e,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM fl
),
merged AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM isl GROUP BY doc_id, island),
gaps0 AS (
  SELECT m.doc_id, m.s, m.e, d.text,
         lead(m.s) OVER (PARTITION BY m.doc_id ORDER BY m.s) AS ns,
         row_number() OVER (PARTITION BY m.doc_id ORDER BY m.s) AS rk
  FROM merged m JOIN documents d USING (doc_id)
),
gaps AS (
  SELECT doc_id, text, 1 AS gap_start, s - 1 AS gap_end
  FROM gaps0 WHERE rk = 1 AND s > 1
  UNION ALL
  SELECT doc_id, text, e + 1, coalesce(ns - 1, length(text))
  FROM gaps0 WHERE e + 1 <= coalesce(ns - 1, length(text))
),
kept AS (
  SELECT doc_id,
         string_agg(substr(text, gap_start, gap_end - gap_start + 1), ''
                    ORDER BY gap_start) AS kt,
         CAST(sum(gap_end - gap_start + 1) AS BIGINT) AS kc
  FROM gaps GROUP BY doc_id
),
ps AS (
  SELECT doc_id, count(*) AS n_dup_spans,
         CAST(sum(e - s + 1) AS BIGINT) AS removed_chars
  FROM merged GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(ps.n_dup_spans, 0) AS n_dup_spans,
       coalesce(ps.removed_chars, 0) AS removed_chars,
       coalesce(k.kc, CASE WHEN ps.doc_id IS NULL
                           THEN length(d.text) ELSE 0 END) AS kept_chars,
       substr(md5(coalesce(k.kt, CASE WHEN ps.doc_id IS NULL
                                      THEN d.text ELSE '' END)), 1, 16) AS kept_hash
FROM documents d
LEFT JOIN ps USING (doc_id)
LEFT JOIN kept k ON d.doc_id = k.doc_id
"""


@query("exact_substring_scrub_docs", _SUBSTR_SCRUB_ORACLE)
def exact_substring_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup, the Spark-distributable formulation (Lee et
    al. 2022 use a suffix array; operators/substring.py scans length-L
    windows instead): every maximal region of corpus-repeated text
    (window L=30, within- OR cross-document) is removed from each
    document, and the output summarizes the scrub — span count,
    removed/kept chars, and md5[:16] of the REBUILT kept text, which
    the oracle reconstructs independently via string_agg over the
    complement gaps, so the hash check proves the whole span-merge +
    complement + rebuild chain end to end. Complements winnowing
    (detects shared spans between pairs) by actually excising
    corpus-wide verbatim repetition. Scale: gram rows carry (hash16,
    doc_id, pos) only — text never crosses the duplicate-counting
    exchange; everything after is keyed by doc_id."""
    from dod_etl_spark.operators.substring import scrub_repeated_substrings

    docs = t(spark, sf_dir, "documents")
    return scrub_repeated_substrings(docs, gram_len=_SUBSTR_L, hash_mode="md5")


@query("exact_substring_scrub_prod")
def exact_substring_scrub_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of exact_substring_scrub_docs: xxhash64 gram
    hashing instead of the oracle-replayable md5 prefix (the
    minhash_lsh_prod convention — DuckDB has no xxhash64, so this twin
    is rows-only by design while the md5 twin carries the hash-checked
    oracle). Same operator, same skew guard, same spans modulo hash
    collisions (output equality across hash modes is pinned by
    tests/test_substring.py); measured ~1.6x faster at sf0.1 because
    the de-skewed two-pass structure pays the gram hash twice and
    xxhash64 is the cheaper stream."""
    from dod_etl_spark.operators.substring import scrub_repeated_substrings

    docs = t(spark, sf_dir, "documents")
    return scrub_repeated_substrings(docs, gram_len=_SUBSTR_L, hash_mode="xxhash64")


# --- Link prediction over the kNN graph -----------------------------------------

_LINKPRED_ORACLE = f"""
WITH graph AS ({_KNN_GRAPH_ORACLE}),
und AS (
  SELECT DISTINCT least(vec_id, neighbor_id) AS u,
         greatest(vec_id, neighbor_id) AS v
  FROM graph WHERE vec_id <> neighbor_id
),
adj AS (
  SELECT u AS node, v AS nbr FROM und
  UNION ALL
  SELECT v AS node, u AS nbr FROM und
),
deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY node),
wedge AS (
  SELECT a.nbr AS id_1, b.nbr AS id_2, a.node AS node
  FROM adj a JOIN adj b ON a.node = b.node AND a.nbr < b.nbr
),
cand AS (
  SELECT id_1, id_2, count(*) AS common_neighbors,
         CAST(sum(1000000000000 // d.deg) AS BIGINT) AS ra_micro
  FROM wedge w JOIN deg d USING (node)
  GROUP BY id_1, id_2
)
SELECT c.id_1, c.id_2, c.common_neighbors, c.ra_micro
FROM cand c
LEFT JOIN und e ON c.id_1 = e.u AND c.id_2 = e.v
WHERE e.u IS NULL
ORDER BY c.common_neighbors DESC, c.ra_micro DESC, c.id_1, c.id_2
LIMIT 50
"""


@query("knn_link_prediction", _LINKPRED_ORACLE)
def knn_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 predicted missing links in the approximate kNN graph
    (operators/graph.py link_prediction): common-neighbor count with a
    resource-allocation tiebreak in exact integer micro-units
    (Σ 10¹² div deg(z) — float 1/deg sums are order-sensitive, the
    DSIR/ra convention keeps ranking bit-stable cross-engine). The
    semantic-dedup companion: a high-scoring non-edge is a near-dup
    pair the sign-bucket blocking missed — link prediction IS the
    recall-repair pass over the blocked ANN graph. Scale: one wedge
    self-join on the center vertex (Σ deg² bounded for degree-bounded
    kNN graphs), anti-join against the checkpointed edge set, and a
    TakeOrderedAndProject top-N — no single-partition window."""
    from dod_etl_spark.operators.graph import link_prediction
    from dod_etl_spark.operators.similarity import knn_graph

    emb = t(spark, sf_dir, "embeddings")
    edges = knn_graph(emb, k=3, sign_dims=4).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return link_prediction(edges, top_n=50)


# --- k-core decomposition over the kNN graph -------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 6


def _kcore_oracle() -> str:
    steps = []
    prev = "e0"
    for i in range(1, _KCORE_ROUNDS + 1):
        # MATERIALIZED: each round references the previous one three
        # times — inlined CTEs would replay the knn-graph subtree
        # 3^rounds times (DuckDB actually exhausts file handles).
        steps.append(
            f"""d{i} AS MATERIALIZED (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM {prev} UNION ALL SELECT v AS node FROM {prev}
  ) GROUP BY node
),
s{i} AS (SELECT node FROM d{i} WHERE deg >= {_KCORE_K}),
e{i} AS MATERIALIZED (
  SELECT u, v FROM {prev}
  WHERE u IN (SELECT node FROM s{i}) AND v IN (SELECT node FROM s{i})
)"""
        )
        prev = f"e{i}"
    chain = ",\n".join(steps)
    return f"""
WITH graph AS ({_KNN_GRAPH_ORACLE}),
e0 AS MATERIALIZED (
  SELECT DISTINCT least(vec_id, neighbor_id) AS u,
         greatest(vec_id, neighbor_id) AS v
  FROM graph WHERE vec_id <> neighbor_id
),
{chain}
SELECT node, CAST(deg AS BIGINT) AS core_degree FROM (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM {prev} UNION ALL SELECT v AS node FROM {prev}
  ) GROUP BY node
) WHERE deg >= {_KCORE_K}
"""


@query("knn_kcore", _kcore_oracle())
def knn_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the approximate kNN graph via bounded-round peeling
    (operators/graph.py k_core, 6 unrolled rounds — the PageRank/MMR
    fixed-iteration convention, so the oracle replays the EXACT same
    computation in chained CTEs and the hash check covers every
    round's removal decisions). The k-core isolates the densely
    connected region of the near-dup graph — the redundancy hotspot a
    curation pass should downsample hardest, one level stronger than
    a degree cut (which a single hub survives) — and converges on
    this data (pinned in tests/test_graph.py: one extra round removes
    nothing). Scale: each round is one symmetric degree agg + two
    semi-joins on a per-round checkpointed edge frame — bounded
    shuffles keyed by node id, no lineage growth."""
    from dod_etl_spark.operators.graph import k_core
    from dod_etl_spark.operators.similarity import knn_graph

    emb = t(spark, sf_dir, "embeddings")
    edges = knn_graph(emb, k=3, sign_dims=4).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return k_core(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS).select(
        F.col("node").alias("node"), F.col("core_degree")
    )


# --- Pareto-frontier curation cut ------------------------------------------------

_PARETO_ORACLE = """
WITH m AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(list_filter(string_split(lower(text), ' '),
                                            x -> x <> ''))) AS BIGINT)
           AS distinct_tokens
  FROM documents
)
SELECT a.doc_id, a.n_tokens, a.distinct_tokens FROM m a
WHERE NOT EXISTS (
  SELECT 1 FROM m b
  WHERE b.n_tokens >= a.n_tokens AND b.distinct_tokens >= a.distinct_tokens
    AND (b.n_tokens > a.n_tokens OR b.distinct_tokens > a.distinct_tokens)
)
"""


@query("pareto_frontier_docs", _PARETO_ORACLE)
def pareto_frontier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents on the (token count, distinct-token count) Pareto
    frontier (operators/sampling.py pareto_frontier) — the
    multi-objective curation cut two marginal top-k filters can't
    express: a doc can clear both marginal thresholds yet be dominated
    on BOTH axes by one better doc. The oracle is the textbook NOT
    EXISTS dominance definition, so parity proves the windowed skyline
    decomposition (bucketed parallel-prefix MAX, no global sort)
    implements exactly it."""
    from dod_etl_spark.operators.sampling import pareto_frontier

    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    m = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("distinct_tokens"),
    )
    return pareto_frontier(m, "n_tokens", "distinct_tokens")


# --- Curation audit: per-document drop attribution -----------------------------

_AUDIT_ORACLE = f"""
WITH RECURSIVE normed AS (
  SELECT doc_id,
         {_CUR_NORM_SQL} AS norm_text,
         {sround_sql(_QCUT_Q_EXPR, 6)} AS q,
         {hash_bucket_sql('doc_id', 7)} AS b
  FROM documents
), fp AS (
  SELECT doc_id, norm_text, q, b, md5(norm_text) AS norm_fp FROM normed
), train AS (
  SELECT * FROM fp WHERE b >= 1000 AND q >= 0.25
), win AS (
  SELECT norm_fp, min(doc_id) AS win_doc FROM train GROUP BY norm_fp
), holdout AS (
  SELECT DISTINCT norm_fp FROM fp WHERE b < 1000
), kept AS (
  SELECT norm_fp, min(doc_id) AS doc_id, min(norm_text) AS norm_text
  FROM train GROUP BY norm_fp
), decon AS (
  SELECT * FROM kept WHERE norm_fp NOT IN (SELECT norm_fp FROM holdout)
), pairs AS (
  SELECT id_1, id_2
  FROM ({{minhash}})
), cedges AS (
  SELECT id_1 AS s, id_2 AS d FROM pairs
  UNION ALL
  SELECT id_2 AS s, id_1 AS d FROM pairs
), reach(node, label) AS (
  SELECT doc_id, doc_id FROM decon
  UNION
  SELECT e.d, r.label FROM reach r JOIN cedges e ON e.s = r.node
), assign AS (
  SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
)
SELECT f.doc_id,
       CASE WHEN f.b < 1000 THEN 'holdout_split'
            WHEN f.q < 0.25 THEN 'quality_gate'
            WHEN f.doc_id <> w.win_doc THEN 'exact_dup'
            WHEN f.norm_fp IN (SELECT norm_fp FROM holdout) THEN 'decontaminated'
            WHEN a.cluster_id <> f.doc_id THEN 'near_dup'
            ELSE 'kept' END AS reason
FROM fp f
LEFT JOIN win w ON w.norm_fp = f.norm_fp
LEFT JOIN assign a ON a.doc_id = f.doc_id
"""


def _audit_oracle() -> str:
    return _AUDIT_ORACLE.format(
        minhash=_minhash_oracle(band_size=4, table="decon", text="norm_text")
    )


def _audit_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document audit of the flagship curation pipeline: every doc
    labeled with the FIRST stage that removed it (stage predicates and
    winner rules byte-identical to curation_pipeline_docs), or 'kept'.
    Priority: holdout_split > quality_gate > exact_dup >
    decontaminated > near_dup > kept — the pipeline's own execution
    order, so sum(reason='kept') == the pipeline's output cardinality
    (pinned in tests/test_curation_audit.py)."""
    from dod_etl_spark.operators.text_dedup import minhash_cluster_edges as _edges

    docs = t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[\\x00-\\x1F\\x7F]", ""),
            " +",
            " ",
        )
    )
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    q = stable_round(
        F.least(F.size(toks).cast("double") / F.lit(100.0), F.lit(1.0))
        * (
            F.lit(1.0)
            - punct_count(F.col("text")).cast("double")
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ),
        6,
    )
    # Checkpointed once WITHOUT the text column: the audit reads this
    # frame from three branches (holdout fps, the train gate feeding
    # the winner rule, final attribution join) — without the checkpoint
    # the normalize+md5 corpus scan replays per branch (measured ~1.6x
    # the whole audit at sf0.1). Materializing norm_text here would be
    # a corpus-text write (the 100 TB spill bomb); the one branch that
    # needs text (the winner/kept aggregation) re-runs the map-only
    # normalize over the scan instead.
    fp = docs.select(
        "doc_id",
        q.alias("q"),
        hash_bucket(F.col("doc_id"), 7).alias("_b"),
        F.md5(norm.cast("binary")).alias("norm_fp"),
    ).localCheckpoint(eager=True)

    holdout = (
        fp.where(F.col("_b") < 1000).select("norm_fp").distinct()
    )
    # ONE aggregation serves both the winner rule and the kept corpus
    # (win_doc IS kept's min(doc_id) — the old form ran the same
    # groupBy(norm_fp) over train twice). Text rides only this branch:
    # a second map-only normalize pass over the scan, gated to train.
    kept = (
        docs.select(
            "doc_id",
            norm.alias("norm_text"),
            q.alias("q"),
            hash_bucket(F.col("doc_id"), 7).alias("_b"),
        )
        .where((F.col("_b") >= 1000) & (F.col("q") >= 0.25))
        .groupBy(F.md5(F.col("norm_text").cast("binary")).alias("norm_fp"))
        .agg(
            F.min("doc_id").alias("doc_id"), F.min("norm_text").alias("norm_text")
        )
        .localCheckpoint(eager=True)
    )
    win = kept.select("norm_fp", F.col("doc_id").alias("win_doc"))
    decon = kept.join(F.broadcast(holdout), "norm_fp", "left_anti")
    edges = _edges(
        decon, text_col="norm_text", num_hashes=8, band_size=4, shingle_len=5
    )
    assign = dedup_cluster_assignments(decon.select("doc_id"), edges)

    contaminated = F.broadcast(
        holdout.select("norm_fp", F.lit(1).alias("_in_holdout"))
    )
    reason = (
        F.when(F.col("_b") < 1000, F.lit("holdout_split"))
        .when(F.col("q") < 0.25, F.lit("quality_gate"))
        .when(F.col("doc_id") != F.col("win_doc"), F.lit("exact_dup"))
        .when(F.col("_in_holdout").isNotNull(), F.lit("decontaminated"))
        .when(F.col("cluster_id") != F.col("doc_id"), F.lit("near_dup"))
        .otherwise(F.lit("kept"))
    )
    return (
        fp.join(win, "norm_fp", "left")
        .join(contaminated, "norm_fp", "left")
        .join(assign, "doc_id", "left")
        .select("doc_id", reason.alias("reason"))
    )


@query("curation_audit_docs", _audit_oracle())
def curation_audit_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why did the pipeline drop my document? — the explainability
    query every production curation run needs (a takedown dispute, a
    recall investigation, a gate-tuning loop all start here). One row
    per CORPUS document with the first-removing stage, replaying
    curation_pipeline_docs' exact predicates; the oracle recomputes
    the same attribution through the recursive-closure SQL, so the
    whole decision surface is hash-checked, not just the survivor
    set. Scale shape: the stage flags are the pipeline's own frames
    re-joined (winner rule on the fp-keyed shuffle, holdout and
    contamination flags broadcast, cluster assignment behind its
    checkpoint); the audit adds joins of metadata-sized or fp-keyed
    frames, never a new corpus shuffle."""
    return _audit_frame(spark, sf_dir)


_ATTRITION_ORACLE = f"""
WITH audit AS ({{audit}})
SELECT reason, CAST(count(*) AS BIGINT) AS n_docs
FROM audit GROUP BY reason
"""


@query(
    "curation_stage_attrition",
    _ATTRITION_ORACLE.format(audit=_audit_oracle()),
)
def curation_stage_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline funnel: documents lost per stage (the number a
    curation dashboard plots per crawl). Derived from the per-doc
    audit by one vocabulary-of-stages-sized aggregation."""
    return (
        _audit_frame(spark, sf_dir)
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
