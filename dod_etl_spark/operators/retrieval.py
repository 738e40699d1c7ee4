"""Lexical (sparse) retrieval: BM25 top-k over the document corpus.

The missing sibling of the dense-ANN family (operators/similarity.py):
training-data curation uses BM25 retrieval for eval-set
decontamination sweeps (retrieve-then-audit), targeted corpus
inspection ("show me what the corpus says about X"), and as the
lexical arm of hybrid lexical+dense mining. Okapi BM25 (Robertson et
al., TREC-3) — public formula.

Plan shape (all JVM built-ins, no UDFs):

  scan docs -> explode lowered tokens      (tokenize once, dl carried)
  -> groupBy (doc_id, tok): tf             [shuffle 1, map-combined]
  -> count() OVER (PARTITION BY tok): df   [shuffle 2] -- window on the
     SAME frame, not a tf-vs-df self-join, so the tokenize lineage
     runs once (same rationale as tfidf_top_terms)
  -> broadcast-join the exploded query terms (tiny)     [no shuffle]
  -> crossJoin(broadcast(corpus stats))    (scalar N, avgdl)
  -> groupBy (query_id, doc_id): decimal-exact score    [shuffle 3]
  -> per-query row_number top-k            [shuffle 4, WindowGroupLimit]

At 100 TB the posting frame carries (doc_id, tok, tf, dl) scalars —
never the text; the per-query candidate set after the terms join is
sum of posting-list lengths for the query vocabulary, not the corpus.

Determinism: `rational_idf=True` replaces ln((N-df+.5)/(df+.5)+1) with
the rational (N-df+.5)/(df+.5) — integer-derived IEEE multiply/divide
is bit-identical across engines while ln() is libm-dependent (same
trade tfidf_top_terms documents). Scores aggregate as DECIMAL(27,6)
(order-independent), and the top-k cut ranks on the EXACT decimal with
doc_id tiebreak, so the returned set is total-order deterministic.

Reference parity: none (no text surface in the reference) —
LLM-pipeline extension per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import stable_round


def doc_tokens(text_col: str):
    """Non-empty lowered whitespace tokens — THE tokenization every
    BM25 surface shares (batch operator, posting store, oracles)."""
    return F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")


def query_terms(
    queries: DataFrame,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """(query_id, tok) — DISTINCT terms per query (set semantics)."""
    q_toks = F.array_distinct(doc_tokens(query_text_col))
    return queries.select(
        F.col(query_id_col).alias("query_id"), F.explode(q_toks).alias("tok")
    )


def bm25_score_and_rank(
    joined: DataFrame,
    stats: DataFrame,
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
    rational_idf: bool = False,
    exclude_self: bool = False,
) -> DataFrame:
    """Shared BM25 scoring core: `joined` carries one row per
    (query_id, doc_id, tok) hit with (tf, dl, df); `stats` is the
    1-row (n_docs, avgdl) frame (broadcast). Aggregates contributions
    as DECIMAL(27,6) (order-independent) and ranks the exact decimal
    with doc_id tiebreak — total-order deterministic on any engine,
    whatever built the posting rows (batch tokenize or the persistent
    PostingStore)."""
    n = F.col("n_docs").cast("double")
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    raw_idf = (n - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
    idf = raw_idf if rational_idf else F.log(raw_idf + F.lit(1.0))
    tf_sat = (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dld / F.col("avgdl")))
    )
    contrib = idf * tf_sat

    scored = (
        joined.crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib.cast("decimal(27,6)")).alias("_score_dec"))
    )
    if exclude_self:
        scored = scored.where(F.col("doc_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_score_dec").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "rank",
            stable_round(F.col("_score_dec").cast("double"), 4).alias("score"),
        )
    )


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """(posting, stats): the BM25 index frames. posting = one row per
    (doc_id, tok) with (tf, dl, df) — df computed as a window over the
    SAME tf frame so the tokenize lineage runs once; stats = the 1-row
    (n_docs, avgdl) frame. Shared by the one-shot operator (bm25_topk)
    and the PRF expansion (prf_expand_topk), and mirrored by the
    PostingStore's bucketed tables."""
    toks = doc_tokens(text_col)
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        F.explode(toks).alias("tok"),
    )
    tf = exploded.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    posting = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("tok")))
    stats = docs.select(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.sum(F.size(toks).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    return posting, stats


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    rational_idf: bool = False,
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k documents per query by Okapi BM25.

    Returns (query_id, doc_id, rank, score): rank 1..k per query over
    documents sharing >=1 term with the query, score rounded to 4
    digits (ranking happens on the exact decimal aggregate, before
    rounding). Query terms are DISTINCT per query (set semantics —
    standard for short keyword queries). `exclude_self` drops
    doc_id == query_id before ranking — for probe-document queries
    (similar-document retrieval), same convention as
    similarity.brute_force_topk."""
    posting, stats = build_postings(docs, id_col, text_col)
    terms = query_terms(queries, query_id_col, query_text_col)
    joined = posting.join(F.broadcast(terms), "tok")
    return bm25_score_and_rank(
        joined, stats, k, k1, b, rational_idf, exclude_self
    )


def prf_expand_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k_fb: int = 3,
    m_expand: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    rational_idf: bool = False,
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (the RM3 shape,
    Lavrenko & Croft relevance models): round 1 retrieves the k_fb
    BM25-best documents per query, the m_expand most frequent NEW terms
    across that feedback set join the query vocabulary (sum-tf weight,
    lexicographic tiebreak — integer arithmetic, no rounding needed),
    and round 2 re-scores with the expanded term set. Recall machinery:
    a query missing the corpus's phrasing still retrieves documents
    sharing vocabulary with its top results.

    The posting frame is built ONCE and eagerly checkpointed — it feeds
    the round-1 join, the feedback tf lookup, and the round-2 join, and
    Spark would otherwise re-run the tokenize+aggregate lineage for
    each consumer. Everything downstream of the index is
    metadata-sized: feedback is n_queries x k_fb rows, term selection
    is one aggregation over the feedback docs' postings."""
    posting, stats = build_postings(docs)
    posting = posting.localCheckpoint(eager=True)
    terms0 = query_terms(queries)

    r1 = bm25_score_and_rank(
        posting.join(F.broadcast(terms0), "tok"), stats, k_fb, k1, b, rational_idf
    ).select("query_id", "doc_id")

    fb = (
        F.broadcast(r1)  # n_queries x k_fb rows vs the corpus-sized index
        .join(posting, "doc_id")
        .join(F.broadcast(terms0), ["query_id", "tok"], "left_anti")
        .groupBy("query_id", "tok")
        .agg(F.sum("tf").alias("_fb_w"))
    )
    wfb = Window.partitionBy("query_id").orderBy(
        F.col("_fb_w").desc(), F.col("tok").asc()
    )
    fb_terms = (
        fb.withColumn("_rn", F.row_number().over(wfb))
        .where(F.col("_rn") <= m_expand)
        .select("query_id", "tok")
    )
    expanded = terms0.unionByName(fb_terms).distinct()

    return bm25_score_and_rank(
        posting.join(F.broadcast(expanded), "tok"), stats, k, k1, b, rational_idf
    )


def rrf_fuse(
    lexical: DataFrame,
    dense: DataFrame,
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09) of a
    lexical and a dense ranked list — the standard hybrid-retrieval
    combiner, and in curation the hybrid near-dup miner (BM25 arm
    catches lexical overlap paraphrased embeddings miss; dense arm
    catches paraphrase BM25 misses).

    Inputs carry (query_id, doc_id, rank); a doc absent from one arm
    contributes 0 from that arm (standard RRF). rrf = 1/(c+rank_lex) +
    1/(c+rank_dense) — integer-derived IEEE division and one fixed-order
    addition, bit-identical on any engine; the fused cut ranks on
    (rrf DESC, doc_id ASC), total-order deterministic. Both arms are
    top-k-pruned (tiny: n_queries x k rows), so the fusion join and
    final window are metadata-sized at any corpus scale — the heavy
    lifting happened inside each arm."""
    lx = lexical.select(
        "query_id", "doc_id", F.col("rank").cast("long").alias("_r_lex")
    )
    dn = dense.select(
        "query_id", "doc_id", F.col("rank").cast("long").alias("_r_dense")
    )
    fused = lx.join(dn, ["query_id", "doc_id"], "full_outer")
    cd = F.lit(float(c))
    rrf = F.coalesce(
        F.lit(1.0) / (cd + F.col("_r_lex").cast("double")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (cd + F.col("_r_dense").cast("double")), F.lit(0.0)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_rrf").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("_rrf", rrf)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "rank",
            F.coalesce(F.col("_r_lex"), F.lit(-1).cast("long")).alias("lex_rank"),
            F.coalesce(F.col("_r_dense"), F.lit(-1).cast("long")).alias("dense_rank"),
            stable_round(F.col("_rrf"), 6).alias("rrf"),
        )
    )
