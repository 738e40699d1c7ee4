"""Round-8 fourth-session surface: corpus lexicon statistics — PMI
collocations, exact phrase search, and vocabulary-growth (Heaps) curves.

Beyond the reference's MES surface (its text handling stops at JSON
field extraction, stp/DataTransformer.scala); these are the published
corpus-linguistics recipes a training-data pipeline runs on every new
crawl, re-expressed Spark-first with exact DuckDB oracles:

- PMI collocations (Church & Hanks 1990): which word pairs co-occur
  far above chance — the classic signal for multi-word expressions and
  for spotting templated/boilerplate corpora before training.
- Exact phrase search (positional-postings semantics, Manning et al.
  IR ch. 2): batch form is a pure scan — every doc checks its own
  token array, zero exchanges; the serve-time analog would intersect
  PostingStore posting lists (streaming/posting_store.py).
- Heaps-law vocabulary growth (Heaps 1978): distinct types vs corpus
  size, the curve that says whether a crawl is still contributing new
  vocabulary or has gone asymptotic (dedup/quality regression signal).

Cross-engine determinism: association scores are exact-integer lifts
(truncated ratio in ppm via DECIMAL `div` / HUGEINT `//` — verified
identical truncation semantics for in-range positives), never libm
log; positions and counts are BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dod_etl_spark.queries.base import query, t

# --- shared tokenization ------------------------------------------------------


def _words(col: F.Column) -> F.Column:
    """Whitespace tokens, empties dropped — string_split parity with
    the DuckDB oracles (consecutive spaces yield empties on both
    engines; both filter them)."""
    return F.filter(F.split(F.lower(col), " "), lambda x: x != "")


def _bigram_structs(w: F.Column) -> F.Column:
    """Adjacent-pair structs from a token array, scan-stage (no
    posexplode self-join): transform-with-index pairs each token with
    its successor, try_element_at nulls the final sentinel out."""
    return F.filter(
        F.transform(
            w,
            lambda x, i: F.struct(
                x.alias("w1"), F.try_element_at(w, i + F.lit(2)).alias("w2")
            ),
        ),
        lambda s: s["w2"].isNotNull(),
    )


# --- PMI collocations ---------------------------------------------------------

_PMI_MIN_COUNT = 5

_PMI_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
uni AS (SELECT unnest(w) AS tok FROM toks),
uc AS (SELECT tok, count(*) AS c FROM uni GROUP BY 1),
tot AS (SELECT sum(c) AS n FROM uc),
bg AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM toks, unnest(range(1, len(w))) AS t(i)
),
bc AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2),
btot AS (SELECT sum(c_xy) AS m FROM bc)
SELECT bc.w1, bc.w2, bc.c_xy, u1.c AS c_x, u2.c AS c_y,
       CAST(
         (CAST(bc.c_xy AS HUGEINT) * n * n * 1000000)
         // (CAST(m AS HUGEINT) * u1.c * u2.c)
       AS BIGINT) AS lift_ppm
FROM bc
JOIN uc u1 ON bc.w1 = u1.tok
JOIN uc u2 ON bc.w2 = u2.tok
CROSS JOIN tot CROSS JOIN btot
WHERE bc.c_xy >= {_PMI_MIN_COUNT}
"""


@query("pmi_collocations", _PMI_ORACLE)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram association: every adjacent pair seen >= 5 times
    with its exact counts and lift = p(x,y)/(p(x)p(y)) in ppm
    (PMI = ln(lift) is a monotone transform, so ranking by lift IS
    ranking by PMI — emitted as a truncated integer ratio because ln is
    libm-dependent across engines while DECIMAL `div` and HUGEINT `//`
    truncate identically). Plan: one corpus scan per count branch
    (unigram agg, bigram agg — both map-side combinable into
    vocab-bounded frames; corpus text never crosses an exchange), the
    unigram frame re-joined twice by broadcast (vocab-sized by
    construction), totals as broadcast 1-row frames derived from the
    count frames, NOT extra corpus passes. Exact-integer form is valid
    to N ~ 3e9 tokens per partition-of-analysis (c_xy*N^2*1e6 <=
    DECIMAL(38)); a 100 TB corpus computes per-shard lifts the same
    way, or drops a common 10^k from num/den first (costs only ppm
    precision), before a final merge of exact counts."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _words(F.col("text")).alias("w"))

    # Checkpoint both count frames (vocab- and vocab^2-bounded): the
    # totals and the two broadcast re-joins below would otherwise each
    # replay the corpus tokenize+aggregate lineage (5 scans; with the
    # checkpoints the corpus is scanned exactly twice).
    uni = (
        toks.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = uni.agg(F.sum("c").alias("_n"))
    bg = (
        toks.select(F.explode(_bigram_structs(F.col("w"))).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .localCheckpoint(eager=True)
    )
    btot = bg.agg(F.sum("c_xy").alias("_m"))

    return (
        bg.where(F.col("c_xy") >= _PMI_MIN_COUNT)
        .join(
            F.broadcast(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_x"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_y"))),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            "c_xy",
            "c_x",
            "c_y",
            F.expr(
                "CAST(c_xy AS DECIMAL(38,0)) * _n * _n * 1000000"
                " div (CAST(_m AS DECIMAL(38,0)) * c_x * c_y)"
            ).alias("lift_ppm"),
        )
    )


# --- Exact phrase search ------------------------------------------------------

# Plan literals: phrases chosen from the corpus generator's vocabulary
# so every SF has matches (trigram frequencies 6-8 at sf0.01).
_PHRASES = (
    "slow hash batch",
    "part filter scan",
    "window fast query",
    "customer join window",
)


def _phrase_values_sql() -> str:
    rows = ", ".join(f"('{p}')" for p in _PHRASES)
    return f"(VALUES {rows}) AS v(phrase)"


_PHRASE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
ph AS (SELECT phrase, string_split(phrase, ' ') AS pw FROM {_phrase_values_sql()}),
m AS (
  SELECT t.doc_id, ph.phrase,
         list_filter(range(1, len(w) + 1), i -> w[i:i + len(pw) - 1] = pw) AS pos
  FROM toks t CROSS JOIN ph
)
SELECT doc_id, phrase,
       CAST(len(pos) AS BIGINT) AS n_matches,
       CAST(pos[1] AS BIGINT) AS first_pos
FROM m WHERE len(pos) > 0
"""


def _phrase_match_struct(w: F.Column, phrase: str) -> F.Column:
    """Match count + first 1-based token position of `phrase` in the
    token array `w` — computed as CODEGEN string ops, not in-array
    higher-order functions: the tokens re-join single-spaced, and a
    pure-lookahead regex `(?= \\Qphrase\\E )` over the space-wrapped
    string tests every character position (zero-width, so overlapping
    occurrences like "a a" in "a a a" both count — the same semantics
    the in-array form had). first_pos = the number of spaces in the
    prefix up to the first match (each token is preceded by exactly
    one space in the wrapped form). The earlier transform/filter
    implementation was interpreted (HOFs fall out of whole-stage
    codegen) and degraded ~3-10x under executor heap pressure in long
    sessions; regexp_count/regexp_instr stay in codegen."""
    joined = F.concat(F.lit(" "), F.array_join(w, " "), F.lit(" "))
    pat = F.lit(f"(?= \\Q{phrase}\\E )")
    n = F.regexp_count(joined, pat)
    first_char = F.regexp_instr(joined, pat)
    prefix = F.substring(joined, 1, first_char)
    first_tok = (
        F.length(prefix) - F.length(F.regexp_replace(prefix, " ", ""))
    ).cast("long")
    return F.struct(
        F.lit(phrase).alias("phrase"),
        n.cast("long").alias("n_matches"),
        F.when(n > 0, first_tok).alias("first_pos"),
    )


@query("phrase_match_docs", _PHRASE_ORACLE)
def phrase_match_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-word phrase search: for each (doc, phrase) with at
    least one occurrence, the match count and first 1-based token
    position. Positional-postings semantics (Manning et al. IR ch. 2)
    in batch form, computed as CODEGEN string ops: the token array
    re-joins single-spaced and a zero-width lookahead regex
    `(?= \\Qphrase\\E )` over the space-wrapped string counts every
    occurrence (regexp_count) and locates the first (regexp_instr →
    space-count of the prefix = 1-based token position); see
    _phrase_match_struct. ZERO exchanges: phrases are plan literals,
    no join, no aggregation; at 100 TB this is a pure map over the
    corpus scan and the output is match-sparse. The serve-time twin
    for ad-hoc phrases (PositionalPostingStore.phrase_search)
    intersects posting lists on (tok, doc_id) and verifies offsets —
    index-pruned instead of scan-everything, same match semantics."""
    docs = t(spark, sf_dir, "documents")
    # Tokenize in a SEPARATE projection and reference the column: each
    # phrase's struct re-reads `w` (one array_join per phrase), and
    # inlining the tokenize expression would re-split the text once per
    # read (measured 21x slower in the interpreted-HOF era; still a
    # per-phrase re-split today). CollapseProject keeps the boundary
    # because the alias is non-cheap and multiply-referenced.
    toks = docs.select("doc_id", _words(F.col("text")).alias("w"))
    w = F.col("w")
    arr = F.array(*[_phrase_match_struct(w, p) for p in _PHRASES])
    return (
        toks.select("doc_id", F.explode(arr).alias("m"))
        .select("doc_id", "m.phrase", "m.n_matches", "m.first_pos")
        .where(F.col("n_matches") > 0)
    )


# --- Heaps-law vocabulary growth ----------------------------------------------

_GROWTH_BUCKET_DOCS = 100

_GROWTH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
u AS (
  SELECT tok, min(doc_id) AS fd
  FROM (SELECT doc_id, unnest(w) AS tok FROM toks) GROUP BY 1
),
ub AS (SELECT fd // {_GROWTH_BUCKET_DOCS} AS bucket, count(*) AS nu FROM u GROUP BY 1),
bgf AS (
  SELECT w1, w2, min(doc_id) AS fd
  FROM (
    SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
    FROM toks, unnest(range(1, len(w))) AS t(i)
  ) GROUP BY 1, 2
),
bb AS (SELECT fd // {_GROWTH_BUCKET_DOCS} AS bucket, count(*) AS nb FROM bgf GROUP BY 1),
tb AS (
  SELECT doc_id // {_GROWTH_BUCKET_DOCS} AS bucket, sum(len(w)) AS nt
  FROM toks GROUP BY 1
),
j AS (
  SELECT bucket, coalesce(nt, 0) AS nt, coalesce(nu, 0) AS nu, coalesce(nb, 0) AS nb
  FROM tb FULL JOIN ub USING (bucket) FULL JOIN bb USING (bucket)
)
SELECT bucket,
  CAST(sum(nt) OVER cum AS BIGINT) AS cum_tokens,
  CAST(sum(nu) OVER cum AS BIGINT) AS cum_uni_types,
  CAST(sum(nb) OVER cum AS BIGINT) AS cum_bi_types
FROM j
WINDOW cum AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query("vocab_growth_docs", _GROWTH_ORACLE)
def vocab_growth_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth in doc_id ingest order: per
    100-document bucket, cumulative token volume and cumulative
    distinct unigram AND bigram types. The curve's shape is the
    is-this-crawl-still-novel signal (a flattening type curve under a
    growing token curve = the corpus has gone templated — exactly this
    synthetic corpus's regime, 31 unigram types from bucket 0, bigram
    types still accreting). Scale shape: "distinct types so far" is
    NOT a running distinct-count — each type contributes one row at
    its min(doc_id) first occurrence (map-side combinable agg), so the
    cumulative curve is a prefix-sum over the BUCKET frame, which is
    corpus_size/100 rows — the global-order window runs on a
    metadata-sized frame (the quantile-store serve posture), never on
    the corpus. Three count branches off one tokenized scan; text
    never crosses an exchange."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _words(F.col("text")).alias("w"))
    b = _GROWTH_BUCKET_DOCS

    uni_b = (
        toks.select("doc_id", F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("fd"))
        .groupBy(F.expr(f"fd div {b}").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("nu"))
    )
    bi_b = (
        toks.select("doc_id", F.explode(_bigram_structs(F.col("w"))).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.min("doc_id").alias("fd"))
        .groupBy(F.expr(f"fd div {b}").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    tok_b = (
        toks.select(
            F.expr(f"doc_id div {b}").alias("bucket"),
            F.size("w").cast("long").alias("_nt"),
        )
        .groupBy("bucket")
        .agg(F.sum("_nt").alias("nt"))
    )

    # Union + re-aggregate instead of full-outer joins: same bucket
    # frame, no join (a metadata-sized SMJ is harmless but pointless).
    zero = F.lit(0).cast("long")
    joined = (
        tok_b.select("bucket", F.col("nt").cast("long").alias("nt"), zero.alias("nu"), zero.alias("nb"))
        .unionByName(
            uni_b.select("bucket", zero.alias("nt"), F.col("nu").cast("long").alias("nu"), zero.alias("nb"))
        )
        .unionByName(
            bi_b.select("bucket", zero.alias("nt"), zero.alias("nu"), F.col("nb").cast("long").alias("nb"))
        )
        .groupBy("bucket")
        .agg(F.sum("nt").alias("nt"), F.sum("nu").alias("nu"), F.sum("nb").alias("nb"))
    )
    # Single-partition window: the bucket frame is corpus/100 rows
    # (metadata-sized at any SF that fits a cluster).
    cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "bucket",
        F.sum("nt").over(cum).cast("long").alias("cum_tokens"),
        F.sum("nu").over(cum).cast("long").alias("cum_uni_types"),
        F.sum("nb").over(cum).cast("long").alias("cum_bi_types"),
    )


# --- Zipf rank-frequency coverage ---------------------------------------------

_ZIPF_ORACLE = """
WITH toks AS (
  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
uc AS (SELECT tok, count(*) AS c FROM (SELECT unnest(w) AS tok FROM toks) GROUP BY 1),
tot AS (SELECT sum(c) AS n FROM uc),
r AS (
  SELECT tok, c,
         row_number() OVER (ORDER BY c DESC, tok ASC) AS rank,
         sum(c) OVER (ORDER BY c DESC, tok ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM uc
)
SELECT CAST(rank AS BIGINT) AS rank, tok, c,
       CAST((CAST(cum AS HUGEINT) * 1000000) // n AS BIGINT) AS coverage_ppm
FROM r CROSS JOIN tot
"""


@query("zipf_coverage_docs", _ZIPF_ORACLE)
def zipf_coverage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency table with cumulative token coverage: for
    each type in frequency order (ties on tok ASC — total-order
    deterministic), its rank, exact count, and the ppm of all corpus
    tokens covered by ranks 1..r. The coverage curve answers the
    curation question "how many types carry 90% of the tokens" — a
    head-heavy curve means templated text; the integer division is the
    cross-engine-exact DSIR convention. Plan: one map-combined count
    aggregate (corpus scanned once; checkpointed so the total is
    derived without a rescan), then rank + prefix sum as a
    single-partition window over the VOCAB-sized frame — types, not
    tokens (the Heaps curve above shows why that's bounded)."""
    docs = t(spark, sf_dir, "documents")
    uni = (
        docs.select(F.explode(_words(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = uni.agg(F.sum("c").alias("_n"))
    w = Window.orderBy(F.col("c").desc(), F.col("tok").asc())
    return (
        uni.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum", F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "tok",
            "c",
            F.expr("CAST(cum AS DECIMAL(38,0)) * 1000000 div _n").alias(
                "coverage_ppm"
            ),
        )
    )


# --- Cross-source token-distribution TVD --------------------------------------

_STVD_ORACLE = """
WITH toks AS (
  SELECT source, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
c AS (
  SELECT source, tok, count(*) AS c
  FROM (SELECT source, unnest(w) AS tok FROM toks) GROUP BY 1, 2
),
n AS (SELECT source, sum(c) AS n FROM c GROUP BY 1),
m AS (
  SELECT a.source AS source_a, b.source AS source_b,
         sum(abs(CAST(a.c AS HUGEINT) * nb.n - CAST(b.c AS HUGEINT) * na.n)) AS mm,
         sum(a.c) AS ma, sum(b.c) AS mb
  FROM c a
  JOIN c b ON a.tok = b.tok AND a.source < b.source
  JOIN n na ON na.source = a.source
  JOIN n nb ON nb.source = b.source
  GROUP BY 1, 2
),
grid AS (
  SELECT na.source AS source_a, nb.source AS source_b,
         na.n AS na, nb.n AS nb
  FROM n na CROSS JOIN n nb WHERE na.source < nb.source
)
SELECT source_a, source_b,
       CAST(
         ((coalesce(mm, 0) + CAST(na - coalesce(ma, 0) AS HUGEINT) * nb
           + CAST(nb - coalesce(mb, 0) AS HUGEINT) * na)
          * 1000000) // (2 * CAST(na AS HUGEINT) * nb)
       AS BIGINT) AS tvd_ppm
FROM grid LEFT JOIN m USING (source_a, source_b)
"""


@query("source_token_tvd", _STVD_ORACLE)
def source_token_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total variation distance between each source pair's UNIGRAM
    distribution, as an exact integer: TVD = sum|p_a - p_b|/2 =
    sum|c_a*N_b - c_b*N_a| / (2*N_a*N_b) — the numerator is a BIGINT
    sum, the single division is the truncated-ppm convention, so the
    headline drift number (is source X's language different from
    source Y's?) is bit-identical cross-engine with NO float
    accumulation (source_drift_tvd's events twin documents the
    decimal swap past ~1e9 counts; same note applies). Tokens present
    in only one source are folded in CLOSED FORM — (N_a - matched_a)
    contributes at probability 0 on the other side — so the pair join
    only carries the vocabulary intersection. Plan: one (source, tok)
    count (map-combined), totals derived from it; the pair join and
    everything after run on the sources x vocab frame (metadata-sized:
    rule 3, global decisions come back as broadcast rows)."""
    docs = t(spark, sf_dir, "documents")
    c = (
        docs.select("source", F.explode(_words(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    # Checkpoint the per-source totals too: they are referenced four
    # times below (two joins on each of na/nb) and would otherwise
    # re-aggregate per reference.
    n = (
        c.groupBy("source")
        .agg(F.sum("c").alias("n"))
        .localCheckpoint(eager=True)
    )
    a = c.select(F.col("source").alias("source_a"), "tok", F.col("c").alias("ca"))
    b = c.select(F.col("source").alias("source_b"), "tok", F.col("c").alias("cb"))
    na = n.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    nb = n.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    m = (
        a.join(F.broadcast(b), "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(
                F.abs(
                    F.col("ca").cast("decimal(38,0)") * F.col("nb")
                    - F.col("cb").cast("decimal(38,0)") * F.col("na")
                )
            ).alias("mm"),
            F.sum("ca").alias("ma"),
            F.sum("cb").alias("mb"),
        )
    )
    # The matched aggregate only sees pairs sharing >= 1 token — a pair
    # with DISJOINT vocabularies (TVD exactly 1) would vanish from an
    # inner-join shape, so the full pair grid comes from the totals
    # frame and the matched sums default to zero (fixture-pinned).
    grid = na.crossJoin(F.broadcast(nb)).where(
        F.col("source_a") < F.col("source_b")
    )
    return (
        grid.join(F.broadcast(m), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.expr(
                "CAST(((coalesce(mm, CAST(0 AS DECIMAL(38,0))))"
                " + CAST(na - coalesce(ma, 0) AS DECIMAL(38,0)) * nb"
                " + CAST(nb - coalesce(mb, 0) AS DECIMAL(38,0)) * na) * 1000000"
                " div (2 * CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"
            ).alias("tvd_ppm"),
        )
    )


# --- Token burstiness (Fano factor) -------------------------------------------

_BURST_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
dc AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(w) AS tok FROM toks) GROUP BY 1, 2
),
nd AS (SELECT count(*) AS n FROM documents),
m AS (
  SELECT tok, count(*) AS n_docs_with, sum(c) AS sx,
         sum(CAST(c AS HUGEINT) * c) AS sxx
  FROM dc GROUP BY 1
)
SELECT tok, CAST(n_docs_with AS BIGINT) AS n_docs_with, CAST(sx AS BIGINT) AS sx,
       CAST(((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) * 1000000)
            // (CAST(n AS HUGEINT) * sx) AS BIGINT) AS fano_ppm
FROM m CROSS JOIN nd
"""


@query("token_burstiness", _BURST_ORACLE)
def token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token burstiness as the Fano factor (variance/mean of the
    per-document count, zeros included — Church & Gale 1995: content
    words are bursty, function words Poisson-like; in curation a
    suddenly-bursty token flags template injection). With integer
    moment sums over the (doc, tok) count frame the factor is
    (n*sxx - sx^2)/(n*sx) exactly — emitted in truncated ppm
    (Poisson = 1_000_000; above = bursty), zero float ops. Documents
    NOT containing the token enter in closed form (they add zero to
    both moments; n is the corpus total). Plan: one (doc, tok) count,
    one per-token moment aggregate (both map-combined), the 1-row doc
    total broadcast — two shuffles of scalar rows, text never moves."""
    docs = t(spark, sf_dir, "documents")
    dc = (
        docs.select("doc_id", F.explode(_words(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nd = docs.agg(F.count(F.lit(1)).alias("_n"))
    m = dc.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n_docs_with"),
        F.sum("c").alias("sx"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sxx"),
    )
    return m.crossJoin(F.broadcast(nd)).select(
        "tok",
        F.col("n_docs_with").cast("long").alias("n_docs_with"),
        F.col("sx").cast("long").alias("sx"),
        F.expr(
            "CAST(((CAST(_n AS DECIMAL(38,0)) * sxx"
            " - CAST(sx AS DECIMAL(38,0)) * sx) * 1000000)"
            " div (CAST(_n AS DECIMAL(38,0)) * sx) AS BIGINT)"
        ).alias("fano_ppm"),
    )


# --- Skipgram (windowed) co-occurrence lift -----------------------------------

_SG_WINDOW = 2
_SG_MIN_COUNT = 5

_SG_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
uni AS (SELECT unnest(w) AS tok FROM toks),
uc AS (SELECT tok, count(*) AS c FROM uni GROUP BY 1),
tot AS (SELECT sum(c) AS n FROM uc),
sg AS (
  SELECT w[i] AS w1, w[i + d] AS w2
  FROM toks,
       unnest(range(1, len(w) + 1)) AS t(i),
       unnest(range(1, {_SG_WINDOW} + 1)) AS o(d)
  WHERE i + d <= len(w)
),
sc AS (SELECT w1, w2, count(*) AS c_xy FROM sg GROUP BY 1, 2),
stot AS (SELECT sum(c_xy) AS m FROM sc)
SELECT sc.w1, sc.w2, sc.c_xy, u1.c AS c_x, u2.c AS c_y,
       CAST(
         (CAST(sc.c_xy AS HUGEINT) * n * n * 1000000)
         // (CAST(m AS HUGEINT) * u1.c * u2.c)
       AS BIGINT) AS lift_ppm
FROM sc
JOIN uc u1 ON sc.w1 = u1.tok
JOIN uc u2 ON sc.w2 = u2.tok
CROSS JOIN tot CROSS JOIN stot
WHERE sc.c_xy >= {_SG_MIN_COUNT}
"""


def _skipgram_structs(w: F.Column, window: int) -> F.Column:
    """All (w[i], w[i+d]) pairs for d in 1..window, scan-stage: one
    transform-with-index per offset, concatenated — the word2vec-style
    co-occurrence context, directed left-to-right (each unordered pair
    within the window is counted once per orientation occurrence)."""
    def _pair_at(d: int):
        # two-parameter lambda EXACTLY (pyspark derives the HOF arity
        # from the Python signature; a default-arg third parameter
        # makes it a 3-arg lambda transform() rejects — the inverse of
        # the _shift_by footgun, same rule: close over the offset).
        def f(x: F.Column, i: F.Column) -> F.Column:
            return F.struct(
                x.alias("w1"),
                F.try_element_at(w, i + F.lit(d + 1)).alias("w2"),
            )

        return f

    parts = []
    for d in range(1, window + 1):
        parts.append(
            F.filter(
                F.transform(w, _pair_at(d)),
                lambda s: s["w2"].isNotNull(),
            )
        )
    return F.concat(*parts)


@query("skipgram_lift", _SG_ORACLE)
def skipgram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed co-occurrence association (the word2vec/GloVe context
    statistic): every ordered token pair within +/-2 positions seen
    >= 5 times, with the same exact-integer lift the adjacent-pair
    PMI query emits — near-window association catches collocations
    with an intervening word ("slow ... batch") that bigram PMI
    misses. NB: the transform lambdas are two-parameter
    (element, index) and CLOSE OVER the offset — a default-arg third
    parameter would change the Python arity and make transform()
    reject the lambda (see _pair_at's inline comment; inverse of the
    _shift_by footgun in streaming/posting_store).
    Same plan as pmi_collocations: two checkpointed count passes
    (pair frame bounded by vocab^2 x window), vocab-bounded broadcast
    re-joins, 1-row totals."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _words(F.col("text")).alias("w"))

    uni = (
        toks.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = uni.agg(F.sum("c").alias("_n"))
    sg = (
        toks.select(F.explode(_skipgram_structs(F.col("w"), _SG_WINDOW)).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .localCheckpoint(eager=True)
    )
    stot = sg.agg(F.sum("c_xy").alias("_m"))

    return (
        sg.where(F.col("c_xy") >= _SG_MIN_COUNT)
        .join(
            F.broadcast(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_x"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_y"))),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(stot))
        .select(
            "w1",
            "w2",
            "c_xy",
            "c_x",
            "c_y",
            F.expr(
                "CAST(c_xy AS DECIMAL(38,0)) * _n * _n * 1000000"
                " div (CAST(_m AS DECIMAL(38,0)) * c_x * c_y)"
            ).alias("lift_ppm"),
        )
    )
