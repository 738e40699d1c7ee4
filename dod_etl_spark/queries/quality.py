"""Data-quality / provenance-analytics queries: declarative constraint
suites (Deequ-style), winnowing fingerprints (MOSS), bigram-LM
fluency scoring, and per-source distribution drift — each with an
exact DuckDB oracle.

These extend the batch-gate posture of the reference's per-row
quarantine split (`stp/EventEnricher`) to TABLE-level admission
control, and extend the dedup family with the local-fingerprint
(copied-span) detector whole-document MinHash cannot provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dod_etl_spark.operators import dq
from dod_etl_spark.operators.text_dedup import (
    winnow_fingerprints,
    winnow_shared_pairs,
)
from dod_etl_spark.queries.base import query, sround_sql, t

# --- Declarative data-quality constraint suite -------------------------------

_EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]

_DQ_ORACLE = f"""
WITH m AS (
  SELECT CAST(count(*) AS DOUBLE) AS row_count,
         CASE WHEN count(*) = 0 THEN 1.0
              ELSE CAST(count(user_id) AS DOUBLE) / count(*) END AS comp_user,
         CASE WHEN count(*) = 0 THEN 1.0
              ELSE CAST(count(value) AS DOUBLE) / count(*) END AS comp_value,
         CASE WHEN count(*) = 0 THEN 1.0
              ELSE CAST(count(DISTINCT event_id) AS DOUBLE) / count(*) END AS uniq_event,
         CASE WHEN count(*) = 0 THEN 1.0
              ELSE CAST(count(DISTINCT user_id) AS DOUBLE) / count(*) END AS uniq_user,
         CAST(min(value) AS DOUBLE) AS min_value,
         CAST(max(value) AS DOUBLE) AS max_value,
         CASE WHEN count(*) = 0 THEN 1.0
              ELSE CAST(count(*) FILTER (event_type IN
                   ('click','view','signup','purchase','error')) AS DOUBLE)
                   / count(*) END AS in_set_type,
         CASE WHEN count(*) = 0 THEN 1.0
              ELSE CAST(count(*) FILTER (props LIKE '{{%') AS DOUBLE)
                   / count(*) END AS props_shape
  FROM events
)
SELECT * FROM (
  SELECT 'row_count' AS check_name, {sround_sql('row_count', 6)} AS metric,
         CASE WHEN row_count >= 1 THEN 1 ELSE 0 END AS passed FROM m
  UNION ALL
  SELECT 'completeness(user_id)', {sround_sql('comp_user', 6)},
         CASE WHEN comp_user >= 1.0 THEN 1 ELSE 0 END FROM m
  UNION ALL
  SELECT 'completeness(value)', {sround_sql('comp_value', 6)},
         CASE WHEN comp_value >= 1.0 THEN 1 ELSE 0 END FROM m
  UNION ALL
  SELECT 'uniqueness(event_id)', {sround_sql('uniq_event', 6)},
         CASE WHEN uniq_event >= 1.0 THEN 1 ELSE 0 END FROM m
  UNION ALL
  SELECT 'uniqueness(user_id)', {sround_sql('uniq_user', 6)},
         CASE WHEN uniq_user >= 0.9 THEN 1 ELSE 0 END FROM m
  UNION ALL
  SELECT 'min(value)', {sround_sql('min_value', 6)},
         CASE WHEN min_value >= 0.0 THEN 1 ELSE 0 END FROM m
  UNION ALL
  SELECT 'max(value)', {sround_sql('max_value', 6)},
         CASE WHEN max_value <= 500.0 THEN 1 ELSE 0 END FROM m
  UNION ALL
  SELECT 'in_set(event_type)', {sround_sql('in_set_type', 6)},
         CASE WHEN in_set_type >= 1.0 THEN 1 ELSE 0 END FROM m
  UNION ALL
  SELECT 'props_json_shape', {sround_sql('props_shape', 6)},
         CASE WHEN props_shape >= 1.0 THEN 1 ELSE 0 END FROM m
)
"""


@query("dq_checks_events", _DQ_ORACLE)
def dq_checks_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch admission-control suite over the events table: nine
    constraints, ONE aggregation pass, |suite| output rows. The
    uniqueness(user_id) >= 0.9 row fails by design on this data —
    pinning that the report carries failures instead of throwing."""
    events = t(spark, sf_dir, "events")
    suite = [
        dq.row_count(lo=1),
        dq.completeness("user_id"),
        dq.completeness("value"),
        dq.uniqueness("event_id"),
        dq.uniqueness("user_id", min_ratio=0.9),
        dq.min_value("value", lo=0.0),
        dq.max_value("value", hi=500.0),
        dq.in_set("event_type", _EVENT_TYPES),
        dq.satisfies("props_json_shape", F.col("props").startswith("{"), 1.0),
    ]
    return dq.run_checks(events, suite).withColumnRenamed("constraint", "check_name")


# --- Winnowing fingerprints (MOSS local fingerprinting) ----------------------

# Positional k-grams in DuckDB: generate_series can't take lateral
# column args, so positions ride a struct-list comprehension (range end
# +1: DuckDB range() is exclusive, Spark sequence() inclusive).
_WINNOW_GRAMS_CTE = """grams AS (
  SELECT doc_id, u['pos'] AS pos, u['gram'] AS gram FROM (
    SELECT doc_id,
           unnest([{'pos': i, 'gram': substr(text, i, 8)}
                   for i in range(1, greatest(length(text) - 7, 1) + 1)]) AS u
    FROM documents
  )
)"""

_WINNOW_FPS_SQL = f"""
WITH {_WINNOW_GRAMS_CTE},
hashed AS (
  SELECT doc_id, pos, ('0x' || substr(md5(gram), 1, 8))::BIGINT AS h
  FROM grams
),
sel AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM hashed
)
SELECT DISTINCT doc_id, fp FROM sel
"""


@query("winnow_fingerprints_docs", _WINNOW_FPS_SQL)
def winnow_fingerprints_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed (k=8, w=4) fingerprint set per document — selection
    density 2/(w+1), any shared substring >= 11 chars guaranteed to
    collide. See operators.text_dedup.winnow_fingerprints."""
    docs = t(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, k=8, window=4)


_WINNOW_PAIRS_SQL = f"""
WITH {_WINNOW_GRAMS_CTE},
hashed AS (
  SELECT doc_id, pos, ('0x' || substr(md5(gram), 1, 8))::BIGINT AS h
  FROM grams
),
sel AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM hashed
),
fps AS (SELECT DISTINCT doc_id, fp FROM sel),
capped AS (
  SELECT doc_id, fp FROM (
    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS bn FROM fps
  ) WHERE bn <= 50
)
SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS n_shared
FROM capped a JOIN capped b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 3
"""


@query("winnow_dup_pairs", _WINNOW_PAIRS_SQL)
def winnow_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copied-span candidate pairs: >= 3 shared winnowed fingerprints,
    boilerplate fingerprints (bucket > 50 docs) dropped before the
    self-join — see operators.text_dedup.winnow_shared_pairs."""
    docs = t(spark, sf_dir, "documents")
    return winnow_shared_pairs(docs, k=8, window=4, min_shared=3, max_bucket_size=50)


# --- Bigram-LM fluency scoring ----------------------------------------------

_LM_SCORE_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
  FROM documents
),
bg AS (
  SELECT doc_id, unnest([tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))]) AS bigram
  FROM toks WHERE len(tk) >= 2
),
c2 AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram),
c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
scored AS (
  SELECT b.doc_id, (c2.c2 * 1000000) // c1.c1 AS milli
  FROM bg b
  JOIN c2 USING (bigram)
  JOIN c1 ON split_part(b.bigram, ' ', 1) = c1.w1
)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(sum(milli) // count(*) AS BIGINT) AS avg_milliprob
FROM scored GROUP BY doc_id
"""


@query("lm_score_docs", _LM_SCORE_SQL)
def lm_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-style fluency scoring with a corpus-trained bigram MLE
    model: score(doc) = mean over adjacent token pairs of
    P(w2|w1) = c(w1 w2)/c(w1 ·), carried as floor-millionths BIGINTs
    so every step is exact integer arithmetic (cross-engine
    bit-identical; float log-prob sums would diverge on order).

    Train and apply are the same two shuffles a 100 TB run needs: one
    groupBy(bigram) with map-side combine builds the model, the
    per-occurrence stream joins back on the bigram key (AQE broadcasts
    the model side while it fits; at web-corpus vocabulary it degrades
    to a hash-partitioned join on the same key — no new shape). The
    MODEL (bigram counts, vocab^2-bounded) is materialized once; the
    per-occurrence bigram stream is recomputed by each of its two
    consumers — a map-only tokenize+explode — rather than materialized
    at corpus x positions scale."""
    docs = t(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    toks = docs.select("doc_id", tk.alias("tk")).filter(F.size("tk") >= 2)
    # bigrams are assembled AFTER the position explode (a codegen
    # projection), not inside a transform() lambda (interpreted
    # CodegenFallback) — the gram_rows lesson; same rows, same strings.
    bg = toks.select(
        "doc_id",
        "tk",
        F.explode(F.sequence(F.lit(1), F.size("tk") - 1)).alias("_i"),
    ).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.element_at(F.col("tk"), F.col("_i")),
            F.element_at(F.col("tk"), F.col("_i") + 1),
        ).alias("bigram"),
    )
    # The checkpoint sits on the AGGREGATED counts (vocab^2-bounded),
    # not on the exploded per-occurrence stream: materializing bg is a
    # corpus x positions write — a spill bomb at 100 TB — while both of
    # its consumers only re-run a map-only tokenize+explode lineage
    # (model build once, scoring once). c1 derives from c2, so the
    # whole model hangs off this one bounded frame.
    c2 = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=True)
    )
    c1 = (
        c2.withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    scored = (
        bg.join(c2, "bigram")
        .withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .join(c1, "w1")
        .select("doc_id", F.expr("(c2 * 1000000) div c1").alias("milli"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr("sum(milli) div count(1)").cast("long").alias("avg_milliprob"),
    )


# --- Per-source distribution drift (total variation distance) ----------------

_DRIFT_SQL = f"""
WITH b AS (
  SELECT source, n_chars // 50 AS bucket, count(*) AS n_sb
  FROM documents GROUP BY 1, 2
),
tot AS (SELECT bucket, sum(n_sb) AS n_b FROM b GROUP BY 1),
s AS (SELECT source, sum(n_sb) AS n_s FROM b GROUP BY 1),
g AS (SELECT sum(n_sb) AS n FROM b),
grid AS (
  SELECT s.source, t.bucket, s.n_s, t.n_b, g.n
  FROM s CROSS JOIN tot t CROSS JOIN g
),
j AS (
  SELECT grid.*, coalesce(b.n_sb, 0) AS n_sb
  FROM grid LEFT JOIN b USING (source, bucket)
),
acc AS (
  SELECT source, max(n_s) AS n_docs,
         sum(abs(n_sb * (n - n_s) - (n_b - n_sb) * n_s)) AS num,
         max(n_s * (n - n_s)) AS den
  FROM j GROUP BY source
)
SELECT source, n_docs,
       {sround_sql('CAST(num AS DOUBLE) / (2.0 * den)', 6)} AS tvd
FROM acc
"""


@query("source_drift_tvd", _DRIFT_SQL)
def source_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift screen: per source, the total variation
    distance between ITS document-length histogram (fixed 50-char
    buckets) and the histogram of the REST of the corpus — the
    source-level "does this crawl look different" alarm a mixture
    pipeline checks before admitting a new snapshot.

    Exactness at scale: the inner sum is kept in cross-multiplied
    BIGINTs, |n_sb·(n−n_s) − (n_b−n_sb)·n_s|, so the only floating
    division happens ONCE per source after aggregation — deterministic
    on any partitioning and engine. (Beyond ~10^9 docs per term the
    cross products approach 2^63; swap the sum to DECIMAL(38,0) then
    — same plan, wider accumulator.) One scan -> one tiny
    (source × bucket) aggregate; the grid/join/TVD all run on
    metadata-sized frames."""
    docs = t(spark, sf_dir, "documents")
    b = (
        docs.select("source", F.expr("n_chars div 50").alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("n_sb"))
        .localCheckpoint(eager=True)
    )
    tot = b.groupBy("bucket").agg(F.sum("n_sb").alias("n_b"))
    s = b.groupBy("source").agg(F.sum("n_sb").alias("n_s"))
    g = b.agg(F.sum("n_sb").alias("n"))
    grid = s.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(g))
    j = grid.join(b, ["source", "bucket"], "left").withColumn(
        "n_sb", F.coalesce(F.col("n_sb"), F.lit(0))
    )
    term = F.abs(
        F.col("n_sb") * (F.col("n") - F.col("n_s"))
        - (F.col("n_b") - F.col("n_sb")) * F.col("n_s")
    )
    acc = j.groupBy("source").agg(
        F.max("n_s").alias("n_docs"),
        F.sum(term).alias("num"),
        F.max(F.col("n_s") * (F.col("n") - F.col("n_s"))).alias("den"),
    )
    from dod_etl_spark.functions.scalar import stable_round

    return acc.select(
        "source",
        "n_docs",
        stable_round(F.col("num").cast("double") / (2.0 * F.col("den")), 6).alias(
            "tvd"
        ),
    )


# --- PCA projection (rows-only: eigenvectors are numpy-derived) --------------


@query("pca_project_embeddings", None)
def pca_project_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-dim PCA projection of the embeddings table — fit is one
    moment-accumulation shuffle + a driver-side 64x64 eigh; apply is a
    zero-shuffle literal-arithmetic projection (operators/projection).
    Rows-only by design: the eigenbasis has no static SQL oracle (same
    standing as ivf_kmeans_topk's trained centroids); numpy-agreement,
    orthonormality, and partition-invariance are pytest-pinned in
    tests/test_projection.py."""
    from dod_etl_spark.functions.scalar import stable_round
    from dod_etl_spark.operators.projection import pca_fit, pca_project

    emb = t(spark, sf_dir, "embeddings")
    model = pca_fit(emb, "embedding", k=8)
    out = pca_project(emb, model, "embedding", "proj")
    return out.select(
        "vec_id",
        F.transform(F.col("proj"), lambda x: stable_round(x, 4)).alias("proj"),
    )


# --- Winnowing span decontamination ------------------------------------------

_WINNOW_DECON_SQL = f"""
WITH {_WINNOW_GRAMS_CTE},
hashed AS (
  SELECT doc_id, pos, ('0x' || substr(md5(gram), 1, 8))::BIGINT AS h
  FROM grams
),
sel AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM hashed
),
fps0 AS (SELECT DISTINCT doc_id, fp FROM sel),
rare AS (
  SELECT fp FROM (SELECT fp, count(*) AS n FROM fps0 GROUP BY fp) WHERE n <= 2
),
fps AS (SELECT fps0.* FROM fps0 JOIN rare USING (fp)),
split AS (
  SELECT doc_id,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_7'), 1, 8))::BIGINT
          % 10000) < 1000 AS is_holdout
  FROM documents
),
hold_fps AS (
  SELECT DISTINCT fp FROM fps JOIN split USING (doc_id) WHERE is_holdout
),
train_hits AS (
  SELECT f.doc_id, count(*) AS n_shared
  FROM fps f
  JOIN split s USING (doc_id)
  JOIN hold_fps h USING (fp)
  WHERE NOT s.is_holdout
  GROUP BY f.doc_id
)
SELECT s.doc_id
FROM split s
LEFT JOIN train_hits t USING (doc_id)
WHERE NOT s.is_holdout AND coalesce(t.n_shared, 0) < 2
"""


@query("winnow_decontaminate_docs", _WINNOW_DECON_SQL)
def winnow_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-level decontamination: drop train documents sharing >= 2
    RARE winnowed fingerprints with the (hash-split) holdout — catches
    a copied >=11-char span embedded in otherwise-novel text, which
    whole-document md5 (decontaminate_train_docs) and fixed 5-gram
    membership (ngram_decontaminate_docs) both dilute. Same split as
    the md5 variant (sampling.split_train_holdout, seed 7, 10%).

    Evidence is idf-gated: only fingerprints appearing in <= 2
    documents corpus-wide count — a span shared by half the corpus is
    boilerplate, not contamination (on template-heavy corpora like
    this testdata, ungated span evidence flags EVERY train doc,
    which is the degenerate all-contaminated answer).

    Shape at 100 TB: the rare-fp filter is one groupBy(fp) over
    signature-sized pairs; holdout fingerprints are a DISTINCT
    projection of the (tiny) holdout split, broadcast into a semi-join
    against the train fingerprint stream; the corpus text is read once
    (winnowing), documents themselves never shuffle — only
    (doc_id, fp) pairs."""
    from dod_etl_spark.operators.sampling import split_train_holdout

    docs = t(spark, sf_dir, "documents")
    train, holdout = split_train_holdout(docs, "doc_id", 0.1, seed=7)
    # Materialized once: the fingerprint frame feeds the rarity count,
    # the holdout projection, and the train stream — without the
    # checkpoint the scan+md5+winnow lineage executes three times.
    fps0 = winnow_fingerprints(docs, k=8, window=4).localCheckpoint(eager=True)
    rare = (
        fps0.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= 2)
        .select("fp")
    )
    fps = fps0.join(rare, "fp")
    hold_ids = holdout.select("doc_id")
    train_ids = train.select("doc_id")
    hold_fps = (
        fps.join(F.broadcast(hold_ids), "doc_id").select("fp").distinct()
    )
    train_fps = fps.join(F.broadcast(train_ids), "doc_id")
    hits = (
        train_fps.join(F.broadcast(hold_fps), "fp")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    return train_ids.join(hits, "doc_id", "left_anti")


# --- Numeric band (epsilon) join ---------------------------------------------

_BAND_PAIRS_SQL = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT a.event_type, count(*) AS n_pairs
FROM v a JOIN v b
  ON a.event_type = b.event_type
 AND a.event_id < b.event_id
 AND abs(a.cents - b.cents) <= 2
GROUP BY a.event_type
"""


@query("value_band_pairs", _BAND_PAIRS_SQL)
def value_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance matching: count event pairs of the same type whose
    values agree within 2 cents — the band-join family (sensor
    reconciliation / price matching). Values are stable-rounded to
    integer cents FIRST so the bucket decomposition is exact integer
    arithmetic (float bucket edges could drop a boundary pair that the
    oracle's direct |a-b| predicate keeps). The N² theta join the
    oracle runs becomes a 3x-fanout equi hash join + residual filter
    (operators/band_join.py) — bounded candidate volume at any scale."""
    from dod_etl_spark.operators.band_join import band_join

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    a = ev.select(
        F.col("event_id").alias("id_a"), "event_type", F.col("cents").alias("va")
    )
    b = ev.select(
        F.col("event_id").alias("id_b"), "event_type", F.col("cents").alias("vb")
    )
    pairs = band_join(a, b, "va", "vb", eps=2, on=["event_type"]).filter(
        F.col("id_a") < F.col("id_b")
    )
    return pairs.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_pairs"))


# --- Triangle counts over the kNN graph --------------------------------------

# Reuse the exact kNN-graph derivation the knn_graph_docs oracle pins,
# then canonicalize to undirected a<b edges and close length-2 paths.
from dod_etl_spark.queries.llm import _KNN_GRAPH_ORACLE  # noqa: E402

_TRIANGLES_SQL = f"""
WITH graph AS ({_KNN_GRAPH_ORACLE}),
und AS (
  SELECT DISTINCT least(vec_id, neighbor_id) AS a,
                  greatest(vec_id, neighbor_id) AS b
  FROM graph WHERE vec_id <> neighbor_id
),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
  ) GROUP BY node
),
tris AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e1.b = e2.a
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
per_node AS (
  SELECT node, count(*) AS n_triangles FROM (
    SELECT a AS node FROM tris
    UNION ALL SELECT b AS node FROM tris
    UNION ALL SELECT c AS node FROM tris
  ) GROUP BY node
)
SELECT d.node, d.degree, coalesce(p.n_triangles, 0) AS n_triangles
FROM deg d LEFT JOIN per_node p USING (node)
"""


@query("knn_triangles", _TRIANGLES_SQL)
def knn_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the (undirected) kNN graph — the
    local-density signal that separates tight semantic clusters from
    chains; three equi joins on a bounded-degree graph
    (operators/graph.triangle_counts)."""
    from dod_etl_spark.operators.graph import triangle_counts
    from dod_etl_spark.operators.similarity import knn_graph

    emb = t(spark, sf_dir, "embeddings")
    g = knn_graph(emb, k=3, sign_dims=4)
    return triangle_counts(g, "vec_id", "neighbor_id")


# --- Exact Jaccard similarity join (prefix filtering / PPJoin family) --------

_JACCARD_JOIN_SQL = f"""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS token
  FROM documents
),
sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS i
  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_1, i.id_2,
       {sround_sql('CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i)', 4)} AS jaccard
FROM inter i
JOIN sz sa ON i.id_1 = sa.doc_id
JOIN sz sb ON i.id_2 = sb.doc_id
WHERE CAST(i.i AS DOUBLE) >= 0.8 * (sa.n + sb.n - i.i)
"""


@query("jaccard_join_docs", _JACCARD_JOIN_SQL)
def jaccard_join_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard >= 0.8 self-join via prefix filtering (the PPJoin
    family, operators/text_dedup.jaccard_similarity_join). The oracle
    computes ground truth with an unfiltered all-shared-token join, so
    this parity row ALSO proves prefix-filter completeness: a single
    pair missed by the prefix optimization would hash-mismatch."""
    from dod_etl_spark.operators.text_dedup import jaccard_similarity_join

    docs = t(spark, sf_dir, "documents")
    return jaccard_similarity_join(docs, threshold=0.8)


# --- Count-Min heavy-hitter tokens -------------------------------------------

_CM_DEPTH, _CM_WIDTH, _CM_MIN = 4, 1024, 50


def _cm_bucket_sql(expr: str, j: str) -> str:
    return (
        f"(('0x' || substr(md5({expr} || '_cm' || {j}), 1, 8))::BIGINT % {_CM_WIDTH})"
    )


_CM_HEAVY_SQL = f"""
WITH occ AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS token
  FROM documents
),
pairs AS (
  SELECT j.d AS depth, {_cm_bucket_sql('token', 'j.d')} AS bucket
  FROM occ CROSS JOIN (SELECT unnest(range({_CM_DEPTH})) AS d) j
),
sketch AS (
  SELECT depth, bucket, count(*) AS cnt FROM pairs GROUP BY depth, bucket
),
toks AS (SELECT DISTINCT token FROM occ),
probes AS (
  SELECT t.token, j.d AS depth, {_cm_bucket_sql('t.token', 'j.d')} AS bucket
  FROM toks t CROSS JOIN (SELECT unnest(range({_CM_DEPTH})) AS d) j
)
SELECT p.token, min(coalesce(s.cnt, 0)) AS est
FROM probes p LEFT JOIN sketch s USING (depth, bucket)
GROUP BY p.token
HAVING min(coalesce(s.cnt, 0)) >= {_CM_MIN}
"""


@query("cm_heavy_tokens", _CM_HEAVY_SQL)
def cm_heavy_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy-hitter tokens via a Count-Min sketch
    (functions/sketches.cm_sketch): the sketch is depth x width
    counters built with ONE map-side-combined aggregation (bounded
    state at any cardinality — the 100 TB path when an exact
    groupBy(token) would shuffle web-scale vocabulary), probed per
    distinct token, thresholded at est >= 50. The construction is
    deterministic md5 arithmetic, so — unlike HLL — the whole sketch
    AND its estimates are hash-checked against the oracle exactly."""
    from dod_etl_spark.functions.sketches import cm_estimate, cm_sketch

    docs = t(spark, sf_dir, "documents")
    occ = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
        ).alias("token")
    ).localCheckpoint(eager=True)  # feeds sketch build AND distinct probes
    sketch = cm_sketch(occ, "token", depth=_CM_DEPTH, width=_CM_WIDTH)
    toks = occ.distinct()
    est = cm_estimate(sketch, toks, "token", depth=_CM_DEPTH, width=_CM_WIDTH)
    return est.filter(F.col("est") >= _CM_MIN)


# --- CUSUM change-point detection --------------------------------------------

_CUSUM_SQL = """
WITH c AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS hr, count(*) AS c
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, count(*) AS n_buckets, sum(c) AS t
  FROM c GROUP BY 1
),
e AS (
  SELECT c.event_type, c.hr,
         c.c * tot.n_buckets - tot.t - (tot.t // 3) AS excess, tot.t
  FROM c JOIN tot USING (event_type)
),
p0 AS (
  SELECT event_type, hr, t,
         sum(excess) OVER (PARTITION BY event_type ORDER BY hr
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS psum
  FROM e
),
p AS (
  SELECT event_type, hr, t, psum,
         min(psum) OVER (PARTITION BY event_type ORDER BY hr
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS pmin
  FROM p0
),
s AS (
  SELECT event_type, t, psum - least(0, pmin) AS cusum FROM p
)
SELECT event_type,
       count(*) AS n_buckets,
       CAST(sum(CASE WHEN cusum > 5 * t THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
       max(cusum) AS max_cusum
FROM s GROUP BY event_type
"""


@query("cusum_changepoints", _CUSUM_SQL)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point screen per event type over hourly
    counts — the rate-shift alarm (traffic spike, broken producer) the
    per-row z-score cannot see because it accumulates SUSTAINED small
    drift. Exact integer arithmetic throughout: the drift term is
    scaled by the bucket count (c_t·N − T, so "excess over the mean"
    needs no division), and the recurrence s_t = max(0, s_{t-1} + e_t)
    is computed in CLOSED FORM as prefix-sum minus running prefix-min
    — two window passes over the tiny (type, hour) aggregate, no
    per-row fold, no float. The standard CUSUM allowance (~mean/3 per
    bucket, integer T div 3 in scaled units) absorbs random-walk
    noise; alarm when the statistic exceeds 5·T (five hourly means of
    sustained excess). On this uniform synthetic data every type
    correctly reports ZERO alarms — detection power on an injected
    rate shift is pinned in tests/test_dq.py."""
    from pyspark.sql import Window as W

    events = t(spark, sf_dir, "events")
    c = events.groupBy(
        "event_type", F.expr("unix_millis(ts) div 3600000").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"), F.sum("c").alias("t")
    )
    e = c.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hr",
        "t",
        (
            F.col("c") * F.col("n_buckets")
            - F.col("t")
            - F.expr("t div 3")
        ).alias("excess"),
    )
    w = W.partitionBy("event_type").orderBy("hr").rowsBetween(W.unboundedPreceding, 0)
    p = e.withColumn("psum", F.sum("excess").over(w)).withColumn(
        "pmin", F.min(F.col("psum")).over(w)
    )
    s = p.withColumn("cusum", F.col("psum") - F.least(F.lit(0), F.col("pmin")))
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.col("cusum") > 5 * F.col("t")).cast("long")).alias("n_alarms"),
        F.max("cusum").alias("max_cusum"),
    )


# --- Dataset card: one-command corpus report ---------------------------------

_DATASET_CARD_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, source, n_chars,
         len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_toks,
         md5(text) AS fp
  FROM documents
),
base AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(n_toks) AS DOUBLE) AS n_tokens,
         CAST(sum(n_chars) AS DOUBLE) AS n_chars,
         CAST(count(DISTINCT fp) AS DOUBLE) AS n_unique,
         CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
         CAST(count(DISTINCT source) AS DOUBLE) AS n_sources
  FROM toks
)
SELECT 'n_docs' AS metric, {sround_sql('n_docs', 4)} AS value FROM base
UNION ALL SELECT 'n_tokens', {sround_sql('n_tokens', 4)} FROM base
UNION ALL SELECT 'n_chars', {sround_sql('n_chars', 4)} FROM base
UNION ALL SELECT 'n_langs', {sround_sql('n_langs', 4)} FROM base
UNION ALL SELECT 'n_sources', {sround_sql('n_sources', 4)} FROM base
UNION ALL SELECT 'mean_doc_tokens',
    {sround_sql('n_tokens / n_docs', 4)} FROM base
UNION ALL SELECT 'exact_dup_rate',
    {sround_sql('1.0 - n_unique / n_docs', 4)} FROM base
"""


@query("dataset_card", _DATASET_CARD_SQL)
def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-command dataset card: corpus size, vocabulary-bearing
    token volume, language/source spread, mean document length, and
    the exact-duplicate rate — the header block of a dataset
    datasheet, as ONE aggregation pass (multi-distinct Expand) emitted
    in long (metric, value) format via inline(). Deeper sections stay
    their own queries (corpus_profile, dedup_rate_by_source,
    source_drift_tvd, gopher_rules_docs): at 100 TB you want to run —
    and re-run — each section independently."""
    from dod_etl_spark.functions.scalar import stable_round
    from dod_etl_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    n_toks = F.size(F.filter(tokens(F.lower(F.col("text"))), lambda x: x != ""))
    base = docs.select(
        n_toks.alias("n_toks"),
        "n_chars",
        "lang",
        "source",
        F.md5(F.col("text").cast("binary")).alias("fp"),
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("n_toks").cast("double").alias("n_tokens"),
        F.sum("n_chars").cast("double").alias("n_chars"),
        F.count_distinct("fp").cast("double").alias("n_unique"),
        F.count_distinct("lang").cast("double").alias("n_langs"),
        F.count_distinct("source").cast("double").alias("n_sources"),
    )
    rows = F.array(
        *[
            F.struct(F.lit(name).alias("metric"), stable_round(expr, 4).alias("value"))
            for name, expr in [
                ("n_docs", F.col("n_docs")),
                ("n_tokens", F.col("n_tokens")),
                ("n_chars", F.col("n_chars")),
                ("n_langs", F.col("n_langs")),
                ("n_sources", F.col("n_sources")),
                ("mean_doc_tokens", F.col("n_tokens") / F.col("n_docs")),
                ("exact_dup_rate", F.lit(1.0) - F.col("n_unique") / F.col("n_docs")),
            ]
        ]
    )
    return base.select(F.inline(rows))


# --- CDC apply with deletes (oracle pairing for operators/dedup.apply_cdc) ---

_CDC_STATE_SQL = """
WITH ranked AS (
  SELECT user_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, {v} AS last_value, epoch_ms(ts) AS last_ts_ms
FROM ranked WHERE rn = 1 AND event_type <> 'error'
""".format(v=sround_sql("value", 4))


@query("cdc_user_state", _CDC_STATE_SQL)
def cdc_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events stream replayed as a CDC feed through
    operators/dedup.apply_cdc: every event upserts its user's state,
    'error' events are tombstones — users whose LAST event errored
    vanish from the snapshot. The oracle derives the same survivor set
    with max_by, so the delete-aware merge (max-version-wins +
    tombstone filter) is hash-checked, not just unit-tested."""
    from dod_etl_spark.functions.scalar import stable_round
    from dod_etl_spark.operators.dedup import apply_cdc

    events = t(spark, sf_dir, "events")
    changes = events.select(
        "user_id",
        F.col("value").alias("last_value"),
        F.unix_millis("ts").alias("last_ts_ms"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    base = changes.limit(0).drop("op")
    state = apply_cdc(base, changes, ["user_id"], ["ts", "event_id"])
    return state.select(
        "user_id", stable_round(F.col("last_value"), 4).alias("last_value"), "last_ts_ms"
    )


# --- Market-basket association (part co-occurrence with lift) ----------------

_BASKET_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
freq AS (SELECT l_partkey, count(*) AS n_ord FROM li GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_both
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
)
SELECT p.part_a, p.part_b, p.n_both,
       {sround_sql('CAST(p.n_both AS DOUBLE) * n.n_orders / (fa.n_ord * fb.n_ord)', 4)}
         AS lift
FROM pairs p
JOIN freq fa ON p.part_a = fa.l_partkey
JOIN freq fb ON p.part_b = fb.l_partkey
CROSS JOIN n
"""


@query("basket_part_pairs", _BASKET_SQL)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: parts co-purchased in >= 2
    orders, scored by lift = P(a,b)/(P(a)·P(b)) — the classic
    recommendation/assortment primitive. Pair generation is the
    in-basket self-join (fan-out bounded by basket size², ~C(4,2) per
    TPC-H order — the same bounded-group shape as the interval join's
    buckets, never an all-parts N²); part frequencies broadcast back
    onto the surviving pairs; lift's one double division runs on
    integer operands (exact cross-engine). The (order, part) frame is
    materialized once and feeds the pair join and the frequency
    rollup."""
    from dod_etl_spark.functions.scalar import stable_round

    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = li.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    freq = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_ord"))
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("n_ord").alias("_na"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("n_ord").alias("_nb"))
    out = (
        pairs.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .crossJoin(F.broadcast(n))
    )
    lift = stable_round(
        F.col("n_both").cast("double")
        * F.col("n_orders")
        / (F.col("_na") * F.col("_nb")),
        4,
    )
    return out.select("part_a", "part_b", "n_both", lift.alias("lift"))


# --- Statistical functions: exact correlation & chi-square -------------------

_CORR_SQL = f"""
WITH m AS (
  SELECT event_type,
         count(*) AS n,
         sum(epoch_ms(ts) // 3600000 % 24) AS sx,
         sum((epoch_ms(ts) // 3600000 % 24) * (epoch_ms(ts) // 3600000 % 24)) AS sxx,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sy,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
             * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS syy,
         sum((epoch_ms(ts) // 3600000 % 24)
             * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sxy
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       {sround_sql('''CAST(n * sxy - sx * sy AS DOUBLE)
           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
           / sqrt(CAST(n * syy - sy * sy AS DOUBLE))''', 6)} AS corr_hour_value
FROM m
"""


@query("value_hour_correlation", _CORR_SQL)
def value_hour_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between hour-of-day and value per event type
    — computed from INTEGER moment sums (hours and value-cents), so the
    only floating ops are the final two sqrts and divisions on exact
    operands: deterministic on any partitioning/engine, where a naive
    corr() over doubles is order-dependent. One map-side-combined
    aggregation; at 100 TB the shuffle carries six BIGINTs per type."""
    from dod_etl_spark.functions.scalar import stable_round

    events = t(spark, sf_dir, "events")
    x = F.expr("unix_millis(ts) div 3600000 % 24")
    y = F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
    m = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    corr = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
        / F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    )
    return m.select(
        "event_type", "n", stable_round(corr, 6).alias("corr_hour_value")
    )


_CHI2_SQL = f"""
WITH o AS (
  SELECT event_type, epoch_ms(ts) // 3600000 % 24 AS hr, count(*) AS obs
  FROM events GROUP BY 1, 2
),
rt AS (SELECT event_type, sum(obs) AS row_n FROM o GROUP BY 1),
ct AS (SELECT hr, sum(obs) AS col_n FROM o GROUP BY 1),
g AS (SELECT sum(obs) AS n FROM o),
grid AS (
  SELECT rt.event_type, ct.hr, rt.row_n, ct.col_n, g.n
  FROM rt CROSS JOIN ct CROSS JOIN g
),
j AS (
  SELECT grid.*, coalesce(o.obs, 0) AS obs
  FROM grid LEFT JOIN o USING (event_type, hr)
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       {sround_sql('''CAST(sum(CAST(
         CAST(n * obs - row_n * col_n AS DOUBLE)
         * CAST(n * obs - row_n * col_n AS DOUBLE)
         / (CAST(row_n AS DOUBLE) * col_n * n) AS DECIMAL(27,6))) AS DOUBLE)''', 4)} AS chi2
FROM j
"""


@query("type_hour_chi2", _CHI2_SQL)
def type_hour_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for event_type × hour-of-day:
    Σ (O−E)²/E over the full contingency grid (absent cells included
    via the row×col outer grid), algebraically rearranged so the
    squared term is an exact integer (n·obs − row_n·col_n) — one
    double division per cell, summed over a |types|×24 grid that is
    metadata-sized at any corpus scale. The per-cell double terms are
    summed with a deterministic order via the single-partition grid
    (|cells| ≤ 120 rows), so the result is engine-stable."""
    from dod_etl_spark.functions.scalar import stable_round

    events = t(spark, sf_dir, "events")
    o = events.groupBy(
        "event_type", F.expr("unix_millis(ts) div 3600000 % 24").alias("hr")
    ).agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("event_type").agg(F.sum("obs").alias("row_n"))
    ct = o.groupBy("hr").agg(F.sum("obs").alias("col_n"))
    g = o.agg(F.sum("obs").alias("n"))
    grid = rt.crossJoin(F.broadcast(ct)).crossJoin(F.broadcast(g))
    j = grid.join(o, ["event_type", "hr"], "left").withColumn(
        "obs", F.coalesce(F.col("obs"), F.lit(0))
    )
    diff = (F.col("n") * F.col("obs") - F.col("row_n") * F.col("col_n")).cast("double")
    term = (
        diff * diff / (F.col("row_n").cast("double") * F.col("col_n") * F.col("n"))
    )
    # Decimal-exact, order-independent accumulation of the per-cell
    # double terms (cell count is tiny; the cast is belt-and-braces for
    # engines that would otherwise sum in arbitrary order).
    acc = F.sum(term.cast("decimal(27,6)")).cast("double")
    return j.agg(
        F.count(F.lit(1)).alias("n_cells"), stable_round(acc, 4).alias("chi2")
    )


# --- Robust outliers: median absolute deviation ------------------------------

_MAD_SQL = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, med.m,
         quantile_cont(abs(e.value - med.m), 0.5) AS mad
  FROM events e JOIN med USING (event_type)
  GROUP BY e.event_type, med.m
)
SELECT e.event_type,
       {sround_sql('mad.m', 6)} AS median_value,
       {sround_sql('mad.mad', 6)} AS mad,
       CAST(sum(CASE WHEN abs(e.value - mad.m) > 3.0 * mad.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       count(*) AS n
FROM events e JOIN mad USING (event_type)
GROUP BY e.event_type, mad.m, mad.mad
"""


@query("mad_outliers_by_type", _MAD_SQL)
def mad_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen: |v − median| > 3·MAD per event type —
    immune to the outliers themselves, unlike the z-score screen whose
    mean/stddev the outliers inflate (value_zscore_outliers' documented
    blind spot). Two exact-percentile passes (median, then median of
    absolute deviations — MAD is not algebraic, the second pass is
    irreducible) with the |types|-row medians broadcast back between
    them; the fact table never shuffles — only the two percentile
    aggregations do, with per-partition digests merging map-side."""
    from dod_etl_spark.functions.scalar import stable_round

    events = t(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("m")
    )
    dev = events.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type", "m").agg(
        F.expr("percentile(abs(value - m), 0.5D)").alias("mad")
    )
    flagged = events.join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type", "m", "mad").agg(
        F.sum(
            (F.abs(F.col("value") - F.col("m")) > 3.0 * F.col("mad")).cast("long")
        ).alias("n_outliers"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "event_type",
        stable_round(F.col("m"), 6).alias("median_value"),
        stable_round(F.col("mad"), 6).alias("mad"),
        "n_outliers",
        "n",
    )


# --- Seasonal-naive forecast backtest ----------------------------------------

_FORECAST_SQL = """
WITH e AS (
  SELECT event_type,
         epoch_ms(ts) // 86400000 AS day,
         epoch_ms(ts) // 3600000 % 24 AS hod
  FROM events
),
split AS (SELECT max(day) AS test_day FROM e),
train AS (SELECT * FROM e, split WHERE day < test_day),
test AS (SELECT * FROM e, split WHERE day = test_day),
n_days AS (SELECT count(DISTINCT day) AS nd FROM train),
types AS (SELECT DISTINCT event_type FROM e),
grid AS (
  SELECT t.event_type, h.hod
  FROM types t CROSS JOIN (SELECT unnest(range(24)) AS hod) h
),
f AS (
  SELECT event_type, hod, count(*) AS c FROM train GROUP BY 1, 2
),
a AS (
  SELECT event_type, hod, count(*) AS c FROM test GROUP BY 1, 2
),
cells AS (
  SELECT g.event_type, g.hod,
         (coalesce(f.c, 0) * 1000) // n_days.nd AS fc_milli,
         coalesce(a.c, 0) * 1000 AS ac_milli
  FROM grid g
  LEFT JOIN f USING (event_type, hod)
  LEFT JOIN a USING (event_type, hod)
  CROSS JOIN n_days
)
SELECT event_type,
       (SELECT nd FROM n_days) AS n_train_days,
       CAST(sum(abs(ac_milli - fc_milli)) // 24 AS BIGINT) AS mae_milli,
       CAST(sum(fc_milli) AS BIGINT) AS forecast_total_milli,
       CAST(sum(ac_milli) AS BIGINT) AS actual_total_milli
FROM cells GROUP BY event_type
"""


@query("seasonal_forecast_backtest", _FORECAST_SQL)
def seasonal_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecasting with a holdout backtest: predict the
    LAST day's hourly event counts per type from the per-(type,
    hour-of-day) training mean, score by MAE over the full 24-cell
    grid (absent hours count as zero on both sides). Counts ride as
    integer millis (count·1000 div n_days), so forecast, actuals and
    MAE are exact integers end to end — reproducible on any engine.
    Shape: two (type, hod) aggregations + a types×24 metadata grid;
    the fact table is scanned twice (train/test split by day) and
    never joined row-to-row."""
    events = t(spark, sf_dir, "events")
    e = events.select(
        "event_type",
        F.expr("unix_millis(ts) div 86400000").alias("day"),
        F.expr("unix_millis(ts) div 3600000 % 24").alias("hod"),
    ).localCheckpoint(eager=True)
    split = e.agg(F.max("day").alias("test_day"))
    ej = e.crossJoin(F.broadcast(split))
    train = ej.filter(F.col("day") < F.col("test_day"))
    test = ej.filter(F.col("day") == F.col("test_day"))
    n_days = train.agg(F.count_distinct("day").alias("nd"))
    types = e.select("event_type").distinct()
    hods = spark.range(24).select(F.col("id").alias("hod"))
    grid = types.crossJoin(F.broadcast(hods))
    f = train.groupBy("event_type", "hod").agg(F.count(F.lit(1)).alias("fc"))
    a = test.groupBy("event_type", "hod").agg(F.count(F.lit(1)).alias("ac"))
    cells = (
        grid.join(f, ["event_type", "hod"], "left")
        .join(a, ["event_type", "hod"], "left")
        .crossJoin(F.broadcast(n_days))
        .select(
            "event_type",
            "nd",
            F.expr("(coalesce(fc, 0) * 1000) div nd").alias("fc_milli"),
            (F.coalesce(F.col("ac"), F.lit(0)) * 1000).alias("ac_milli"),
        )
    )
    return cells.groupBy("event_type").agg(
        F.max("nd").alias("n_train_days"),
        F.expr("sum(abs(ac_milli - fc_milli)) div 24").cast("long").alias("mae_milli"),
        F.sum("fc_milli").cast("long").alias("forecast_total_milli"),
        F.sum("ac_milli").cast("long").alias("actual_total_milli"),
    )


# --- Source concentration (inequality metrics) -------------------------------

_CONCENTRATION_SQL = f"""
WITH s AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
r AS (
  SELECT n,
         row_number() OVER (ORDER BY n, source) AS i,
         count(*) OVER () AS k,
         sum(n) OVER () AS total
  FROM s
),
g AS (
  SELECT max(k) AS k, max(total) AS total,
         sum((2 * i - k - 1) * n) AS gini_num,
         sum(CASE WHEN i > k - 1 THEN n ELSE 0 END) AS top1,
         sum(CASE WHEN i > k - 5 THEN n ELSE 0 END) AS top5
  FROM r
)
SELECT CAST(k AS BIGINT) AS n_sources,
       CAST(total AS BIGINT) AS n_docs,
       {sround_sql('CAST(gini_num AS DOUBLE) / (CAST(k AS DOUBLE) * total)', 6)} AS gini,
       {sround_sql('CAST(top1 AS DOUBLE) / total', 6)} AS top1_share,
       {sround_sql('CAST(top5 AS DOUBLE) / total', 6)} AS top5_share
FROM g
"""


@query("source_concentration", _CONCENTRATION_SQL)
def source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus concentration report: Gini coefficient of per-source
    document counts plus top-1/top-5 source shares — the "is this
    corpus dominated by a handful of crawls" screen that motivates
    domain caps and mixture rebalancing. The inequality sum runs on
    the |sources|-row aggregate (rank window over metadata, never the
    corpus); Gini numerator Σ(2i−k−1)·n_i is exact integers, one
    division at the end. Ties in source size are ordered by source
    name so the rank — and therefore the hash — is deterministic."""
    from pyspark.sql import Window as W

    from dod_etl_spark.functions.scalar import stable_round

    docs = t(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    w = W.orderBy("n", "source")
    r = s.select(
        "n",
        F.row_number().over(w).alias("i"),
    )
    k_total = r.agg(F.count(F.lit(1)).alias("k"), F.sum("n").alias("total"))
    j = r.crossJoin(F.broadcast(k_total))
    g = j.agg(
        F.max("k").alias("k"),
        F.max("total").alias("total"),
        F.sum((2 * F.col("i") - F.col("k") - 1) * F.col("n")).alias("gini_num"),
        F.sum(F.when(F.col("i") > F.col("k") - 1, F.col("n")).otherwise(0)).alias("top1"),
        F.sum(F.when(F.col("i") > F.col("k") - 5, F.col("n")).otherwise(0)).alias("top5"),
    )
    return g.select(
        F.col("k").cast("long").alias("n_sources"),
        F.col("total").cast("long").alias("n_docs"),
        stable_round(
            F.col("gini_num").cast("double")
            / (F.col("k").cast("double") * F.col("total")),
            6,
        ).alias("gini"),
        stable_round(F.col("top1").cast("double") / F.col("total"), 6).alias("top1_share"),
        stable_round(F.col("top5").cast("double") / F.col("total"), 6).alias("top5_share"),
    )


# --- Priority sampling (weighted, deterministic) -----------------------------

_PRIORITY_SQL = """
WITH scored AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_5'), 1, 8))::BIGINT
          % 4294967296) + 1 AS h
  FROM documents
),
p AS (
  SELECT doc_id, weight, (weight * 4294967296) // h AS prio FROM scored
),
ranked AS (
  SELECT doc_id, weight, prio,
         row_number() OVER (ORDER BY prio DESC, doc_id) AS rn
  FROM p
),
tau AS (SELECT prio AS t FROM ranked WHERE rn = 51)
SELECT r.doc_id, r.weight,
       CAST(greatest(r.weight, tau.t) AS BIGINT) AS est_weight
FROM ranked r CROSS JOIN tau WHERE r.rn <= 50
"""


@query("priority_sample_docs", _PRIORITY_SQL)
def priority_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted 50-document priority sample by character count —
    deterministic (content-hash priorities, exact integer arithmetic)
    with unbiased subset-sum estimators (operators/sampling.
    priority_sample; unbiasedness pinned across seeds in
    tests/test_sampling.py)."""
    from dod_etl_spark.operators.sampling import priority_sample

    docs = t(spark, sf_dir, "documents")
    return priority_sample(docs, "doc_id", "n_chars", k=50, seed=5)


# --- DSIR importance resampling ----------------------------------------------

_DSIR_TARGET_SQL = "(lang = 'en' AND source = 'src1')"

_DSIR_WEIGHTS_CTE = """
toks AS (
  SELECT doc_id, (lang = 'en' AND source = 'src1') AS is_t,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
  FROM documents
),
occ AS (
  SELECT doc_id, is_t,
         (('0x' || substr(md5(CAST(tok AS VARCHAR) || '_7'), 1, 8))::BIGINT
          % 256) AS bucket
  FROM toks
),
p AS (SELECT bucket, count(*) AS pb FROM occ WHERE is_t GROUP BY 1),
q AS (SELECT bucket, count(*) AS qb FROM occ WHERE NOT is_t GROUP BY 1),
pt AS (SELECT coalesce(sum(pb), 0) AS praw FROM p),
qt AS (SELECT coalesce(sum(qb), 0) AS qraw FROM q),
r AS (
  SELECT q.bucket,
         ((coalesce(p.pb, 0) + 1) * (qt.qraw + 256) * 1000000)
         // ((q.qb + 1) * (pt.praw + 256)) AS micro
  FROM q LEFT JOIN p USING (bucket) CROSS JOIN pt CROSS JOIN qt
),
w AS (
  SELECT o.doc_id, count(*) AS n_toks,
         CAST(sum(r.micro) // count(*) AS BIGINT) AS avg_microratio
  FROM occ o JOIN r USING (bucket) WHERE NOT o.is_t GROUP BY 1
)
"""

_DSIR_WEIGHTS_SQL = f"""
WITH {_DSIR_WEIGHTS_CTE}
SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks, avg_microratio FROM w
"""


def _dsir_weights_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dod_etl_spark.operators.sampling import dsir_importance_weights

    docs = t(spark, sf_dir, "documents")
    is_target = (F.col("lang") == "en") & (F.col("source") == "src1")
    return dsir_importance_weights(
        docs, "doc_id", "text", is_target, n_buckets=256, seed=7
    )


@query("dsir_weights_docs", _DSIR_WEIGHTS_SQL)
def dsir_weights_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): per candidate doc,
    the mean hashed-unigram likelihood ratio against a designated
    target slice (en/src1 stands in for the paper's curated corpus),
    in exact integer micro-units — see
    operators.sampling.dsir_importance_weights for the arithmetic and
    the 100 TB shape (two metadata-sized bucket models broadcast; one
    groupBy(doc) fold)."""
    return _dsir_weights_frame(spark, sf_dir)


_DSIR_SELECT_SQL = f"""
WITH {_DSIR_WEIGHTS_CTE},
scored AS (
  SELECT doc_id, CAST(greatest(avg_microratio, 1) AS BIGINT) AS weight,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_11'), 1, 8))::BIGINT
          % 4294967296) + 1 AS h
  FROM w
),
p2 AS (SELECT doc_id, weight, (weight * 4294967296) // h AS prio FROM scored),
ranked AS (
  SELECT doc_id, weight, prio,
         row_number() OVER (ORDER BY prio DESC, doc_id) AS rn
  FROM p2
),
tau AS (SELECT prio AS t FROM ranked WHERE rn = 51)
SELECT r.doc_id, r.weight,
       CAST(greatest(r.weight, tau.t) AS BIGINT) AS est_weight
FROM ranked r CROSS JOIN tau WHERE r.rn <= 50
"""


@query("dsir_select_docs", _DSIR_SELECT_SQL)
def dsir_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR end to end: importance weights (dsir_weights_docs) feed a
    deterministic weighted priority sample of 50 documents — the
    paper's Gumbel top-k resample swapped for Duffield-Lund-Thorup
    priority sampling, which draws the same
    probability-proportional-to-weight sample with exact integer
    arithmetic AND yields unbiased subset-sum estimators (est_weight),
    so the selected mixture's token mass is measurable without a
    second pass. Selection hashes are content-derived: the same corpus
    selects the same documents on any engine or partitioning."""
    from dod_etl_spark.operators.sampling import priority_sample

    weights = _dsir_weights_frame(spark, sf_dir).select(
        "doc_id", F.greatest(F.col("avg_microratio"), F.lit(1)).alias("w")
    )
    return priority_sample(weights, "doc_id", "w", k=50, seed=11)


# --- BM25 lexical retrieval (Okapi, rational-idf deterministic mode) ----------

_BM25_QUERIES = [
    (1, "table scan filter"),
    (2, "window agg stream"),
    (3, "customer order join"),
]

_BM25_VALUES = ", ".join(
    f"(CAST({qid} AS BIGINT), '{tok}')"
    for qid, text in _BM25_QUERIES
    for tok in text.split(" ")
)

_BM25_CONTRIB = """
  ((CAST(s.n_docs AS DOUBLE) - CAST(p.df AS DOUBLE) + 0.5)
     / (CAST(p.df AS DOUBLE) + 0.5))
  * ((CAST(p.tf AS DOUBLE) * 2.2)
     / (CAST(p.tf AS DOUBLE)
        + 1.2 * (0.25 + 0.75 * (CAST(p.dl AS DOUBLE) / s.avgdl))))
"""

_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
  FROM documents
),
posting AS (
  SELECT doc_id, tok, count(*) AS tf, max(dl) AS dl
  FROM (SELECT doc_id, len(ts) AS dl, unnest(ts) AS tok FROM toks)
  GROUP BY doc_id, tok
),
withdf AS (SELECT *, count(*) OVER (PARTITION BY tok) AS df FROM posting),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(len(ts)) AS DOUBLE) / count(*) AS avgdl
  FROM toks
),
q(query_id, tok) AS (VALUES {_BM25_VALUES}),
scored AS (
  SELECT q.query_id, p.doc_id,
         sum(CAST(({_BM25_CONTRIB}) AS DECIMAL(27,6))) AS sdec
  FROM withdf p JOIN q USING (tok) CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, sdec,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sdec DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, doc_id, rank, {sround_sql('CAST(sdec AS DOUBLE)', 4)} AS score
FROM ranked WHERE rank <= 10
"""


@query("bm25_topk_docs", _BM25_ORACLE)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 per keyword query — the lexical arm of the
    retrieval family (dense ANN: cosine_topk/lsh/ivf). Curation uses
    this shape for retrieve-then-audit decontamination sweeps and
    targeted corpus inspection. Rational-idf mode: ln() is
    libm-dependent across engines (same trade tfidf_top_terms
    documents), so the oracle-checked variant keeps the idf a rational
    function of (N, df); scores aggregate as DECIMAL(27,6) and the
    top-k cut ranks on the exact decimal with doc_id tiebreak — the
    returned set is total-order deterministic, partition-invariant.
    Plan: tokenize once -> (doc,tok) tf [1 shuffle] -> df as a window
    on the same frame [1 shuffle] -> broadcast query terms + scalar
    stats -> per-(query,doc) decimal sum [1 shuffle] -> WindowGroupLimit
    top-k [1 shuffle]. Posting rows carry scalars only, never text."""
    from dod_etl_spark.operators.retrieval import bm25_topk

    docs = t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        _BM25_QUERIES, "query_id long, query_text string"
    )
    return bm25_topk(docs, queries, k=10, rational_idf=True)


# --- Hybrid retrieval: RRF fusion of the BM25 and dense-cosine arms ----------

_HYBRID_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
  FROM documents
),
posting AS (
  SELECT doc_id, tok, count(*) AS tf, max(dl) AS dl
  FROM (SELECT doc_id, len(ts) AS dl, unnest(ts) AS tok FROM toks)
  GROUP BY doc_id, tok
),
withdf AS (SELECT *, count(*) OVER (PARTITION BY tok) AS df FROM posting),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(len(ts)) AS DOUBLE) / count(*) AS avgdl
  FROM toks
),
q AS (
  SELECT doc_id AS query_id, unnest(list_distinct(ts)) AS tok
  FROM toks WHERE doc_id < 3
),
lex_scored AS (
  SELECT q.query_id, p.doc_id,
         sum(CAST(({_BM25_CONTRIB}) AS DECIMAL(27,6))) AS sdec
  FROM withdf p JOIN q USING (tok) CROSS JOIN stats s
  GROUP BY 1, 2
),
lexk AS (
  SELECT * FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sdec DESC, doc_id ASC) AS r
    FROM lex_scored WHERE doc_id <> query_id
  ) WHERE r <= 10
),
dq AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       FROM embeddings WHERE vec_id < 3),
dc AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS cv FROM embeddings),
dense_scored AS (
  SELECT query_id, doc_id,
         {sround_sql('''CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) > 0
                    THEN list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                    ELSE 0.0 END''', 3)} AS cosine
  FROM dq CROSS JOIN dc WHERE query_id <> doc_id
),
densek AS (
  SELECT * FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, doc_id) AS r
    FROM dense_scored
  ) WHERE r <= 10
),
fused AS (
  SELECT query_id, doc_id, l.r AS r_lex, d.r AS r_dense,
         coalesce(1.0 / (60.0 + CAST(l.r AS DOUBLE)), 0.0)
           + coalesce(1.0 / (60.0 + CAST(d.r AS DOUBLE)), 0.0) AS rrf
  FROM lexk l FULL OUTER JOIN densek d USING (query_id, doc_id)
),
ranked AS (
  SELECT query_id, doc_id, r_lex, r_dense, rrf,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf DESC, doc_id ASC) AS rank
  FROM fused
)
SELECT query_id, doc_id, rank,
       coalesce(r_lex, -1) AS lex_rank, coalesce(r_dense, -1) AS dense_rank,
       {sround_sql('rrf', 6)} AS rrf
FROM ranked WHERE rank <= 10
"""


@query("hybrid_rrf_topk", _HYBRID_ORACLE)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid similar-document retrieval for 3 probe documents:
    reciprocal-rank fusion (1/(60+r), SIGIR'09) of the BM25 lexical arm
    (probe text as the query, self excluded) and the dense cosine arm
    (probe embedding, vec_id <-> doc_id by the testdata convention) —
    the hybrid near-dup miner: lexical overlap the embeddings miss,
    paraphrase BM25 misses. Each arm top-k-prunes BEFORE fusion, so the
    fusion join and final window see n_queries x k rows (metadata-sized
    at any corpus scale); rrf is integer-derived IEEE arithmetic in one
    fixed association order — bit-identical cross-engine; all ranking
    is (score DESC, doc_id ASC) total-order deterministic. Docs absent
    from an arm carry that arm's rank as -1 in the output."""
    from dod_etl_spark.operators.retrieval import bm25_topk, rrf_fuse
    from dod_etl_spark.operators.similarity import brute_force_topk

    docs = t(spark, sf_dir, "documents")
    probes = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    lex = bm25_topk(docs, probes, k=10, rational_idf=True, exclude_self=True)
    emb = t(spark, sf_dir, "embeddings")
    dense = brute_force_topk(emb.where(F.col("vec_id") < 3), emb, k=10).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rk").alias("rank"),
    )
    return rrf_fuse(lex, dense, k=10)


# --- MMR diversified top-k (unrolled greedy, oracle-mirrored) -----------------

_MMR_LAM = 0.7
_MMR_POOL, _MMR_SELECT = 15, 5

_MMR_COS = """CASE WHEN sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})) > 0
       THEN list_dot_product({a}, {b})
            / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))
       ELSE 0.0 END"""


def _mmr_oracle() -> str:
    # repr() keeps the double literals bit-identical to the Python
    # floats the Spark plan uses (1.0 - 0.7 is NOT the double 0.3).
    lam, div = repr(_MMR_LAM), repr(1.0 - _MMR_LAM)
    mmr_expr = sround_sql(f"{lam} * rel - {div} * maxsim", 6)
    parts = [
        f"""WITH dq AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       FROM embeddings WHERE vec_id < 3),
dc AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
cand AS (
  SELECT query_id, neighbor_id, cosine FROM (
    SELECT query_id, neighbor_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rk
    FROM (
      SELECT query_id, neighbor_id,
             {sround_sql(_MMR_COS.format(a="qv", b="cv"), 3)} AS cosine
      FROM dq CROSS JOIN dc WHERE query_id <> neighbor_id
    )
  ) WHERE rk <= {_MMR_POOL}
),
rel AS (SELECT query_id, neighbor_id AS doc_id, cosine AS rel FROM cand),
pairsim AS (
  SELECT r1.query_id, r1.doc_id AS id_a, r2.doc_id AS id_b,
         {sround_sql(_MMR_COS.format(a="e1.embedding::DOUBLE[]", b="e2.embedding::DOUBLE[]"), 3)} AS sim
  FROM rel r1
  JOIN rel r2 ON r1.query_id = r2.query_id AND r1.doc_id <> r2.doc_id
  JOIN embeddings e1 ON e1.vec_id = r1.doc_id
  JOIN embeddings e2 ON e2.vec_id = r2.doc_id
),
s1 AS (
  SELECT query_id, doc_id, CAST(1 AS BIGINT) AS step,
         {sround_sql(f"{lam} * rel", 6)} AS mmr_score
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, doc_id) AS rn FROM rel)
  WHERE rn = 1
),
sel1 AS (SELECT query_id, doc_id FROM s1)"""
    ]
    for i in range(2, _MMR_SELECT + 1):
        parts.append(
            f""",
m{i} AS (
  SELECT r.query_id, r.doc_id, max(r.rel) AS rel, max(p.sim) AS maxsim
  FROM rel r
  JOIN sel{i - 1} s ON s.query_id = r.query_id
  JOIN pairsim p ON p.query_id = r.query_id AND p.id_a = r.doc_id
                AND p.id_b = s.doc_id
  WHERE NOT EXISTS (SELECT 1 FROM sel{i - 1} x
                    WHERE x.query_id = r.query_id AND x.doc_id = r.doc_id)
  GROUP BY 1, 2
),
s{i} AS (
  SELECT query_id, doc_id, CAST({i} AS BIGINT) AS step, mmr AS mmr_score FROM (
    SELECT query_id, doc_id, mmr,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY mmr DESC, doc_id) AS rn
    FROM (SELECT query_id, doc_id, {mmr_expr} AS mmr FROM m{i})
  ) WHERE rn = 1
),
sel{i} AS (SELECT * FROM sel{i - 1}
           UNION ALL SELECT query_id, doc_id FROM s{i})"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT * FROM s{i}" for i in range(1, _MMR_SELECT + 1)
    )
    return "".join(parts) + "\n" + union


@query("mmr_diverse_topk", _mmr_oracle())
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 per probe vector from a 15-candidate
    cosine pool (operators/similarity.mmr_topk): greedy
    lam*rel - (1-lam)*max-sim-to-selected, unrolled into 5 dataframe
    stages over per-query metadata-sized frames; the oracle unrolls the
    SAME 5 steps in SQL, so the greedy argmax sequence itself is
    hash-checked cross-engine (rounded scores, doc_id tiebreaks,
    repr()-exact lambda literals)."""
    from dod_etl_spark.operators.similarity import mmr_topk

    emb = t(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 3)
    return mmr_topk(
        probes, emb, k_pool=_MMR_POOL, k_select=_MMR_SELECT, lam=_MMR_LAM
    )


# --- BPE tokenizer training: the first N merge rules --------------------------

_BPE_N = 6


def _bpe_oracle(n_merges: int = _BPE_N) -> str:
    head = """WITH v0 AS (
  SELECT word, count(*) AS freq,
         ' ' || array_to_string(
           list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)),
           ' ') || ' ' AS repr
  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
        FROM documents)
  GROUP BY word
)"""
    parts = [head]
    for k in range(1, n_merges + 1):
        parts.append(
            f""",
p{k} AS (
  SELECT syms[j + 1] AS left_sym, syms[j + 2] AS right_sym,
         CAST(sum(freq) AS BIGINT) AS pair_count
  FROM (SELECT freq, list_filter(string_split(repr, ' '), x -> x <> '') AS syms
        FROM v{k - 1}) t,
       unnest(range(greatest(len(syms) - 1, 0))) AS u(j)
  GROUP BY 1, 2
),
m{k} AS (SELECT * FROM p{k}
         ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1),
v{k} AS (
  SELECT word, freq,
         replace(repr, ' ' || m.left_sym || ' ' || m.right_sym || ' ',
                       ' ' || m.left_sym || m.right_sym || ' ') AS repr
  FROM v{k - 1} CROSS JOIN m{k} m
)"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS step, left_sym, right_sym, pair_count FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return "".join(parts) + "\n" + union


@query("bpe_merges_docs", _bpe_oracle())
def bpe_merges_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 6 BPE merge rules learned over the corpus
    (operators/tokenizer.bpe_merges, Sennrich et al. 2016): per round,
    adjacent symbol-pair counts weighted by word frequency aggregate
    over the VOCAB frame (corpus collapses to distinct words once),
    the argmax is a 1-row TakeOrdered with lexicographic tiebreak, and
    the merge applies as one replace() over the separator-delimited
    symbol string — left-to-right non-overlapping in both engines, so
    the oracle unrolls the same 6 rounds in SQL and the learned RULE
    SEQUENCE itself is hash-checked."""
    from dod_etl_spark.operators.tokenizer import bpe_merges

    docs = t(spark, sf_dir, "documents")
    return bpe_merges(docs, n_merges=_BPE_N)


# --- Leakage-safe split: near-dup clusters never straddle train/holdout -------

_LS_SEED, _LS_CUT = 7, 1000  # holdout_fraction 0.10 of SAMPLE_BUCKETS


def _ls_oracle() -> str:
    # Reuse dedup_clusters' recursive-CTE oracle verbatim as the
    # cluster source (one definition of the LSH signature convention),
    # then hash the CLUSTER id with the sampling module's md5 bucket.
    from dod_etl_spark.queries.llm import _CLUSTERS_ORACLE

    return f"""
WITH clusters AS ({_CLUSTERS_ORACLE})
SELECT doc_id, cluster_id,
       CASE WHEN (('0x' || substr(md5(CAST(cluster_id AS VARCHAR) || '_{_LS_SEED}'), 1, 8))::BIGINT
                  % 10000) < {_LS_CUT}
            THEN 'holdout' ELSE 'train' END AS split
FROM clusters
"""


@query("leakage_safe_split_docs", _ls_oracle())
def leakage_safe_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/holdout split that can never leak a near-duplicate across
    the boundary: the split decision hashes the CLUSTER id (connected
    components over the MinHash-LSH star edges, same machinery as
    dedup_clusters), so every member of a near-dup cluster lands on
    the same side — doc-keyed hash splits (split_train_holdout on
    doc_id) keep exact dups together only when they share the key;
    near-dups with different ids straddle, and the held-out eval set
    silently overlaps training. One extra aggregation over the cluster
    assignment frame; the split itself is a scan-stage hash filter."""
    from dod_etl_spark.operators.graph import dedup_cluster_assignments
    from dod_etl_spark.operators.sampling import SAMPLE_BUCKETS, hash_bucket
    from dod_etl_spark.operators.text_dedup import minhash_cluster_edges

    docs = t(spark, sf_dir, "documents")
    edges = minhash_cluster_edges(docs, num_hashes=8, band_size=2, shingle_len=5)
    clusters = dedup_cluster_assignments(docs, edges)
    side = F.when(
        hash_bucket(F.col("cluster_id"), _LS_SEED) < _LS_CUT, F.lit("holdout")
    ).otherwise(F.lit("train"))
    return clusters.select("doc_id", "cluster_id", side.alias("split"))


# --- Fuzzy entity matching: exact edit-distance-1 pairs ------------------------

_FUZZY_ORACLE = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part)
SELECT a.name AS name_1, b.name AS name_2,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= 1
"""


@query("fuzzy_name_pairs", _FUZZY_ORACLE)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance-1 name pairs via deletion-neighborhood
    blocking (operators/fuzzy.py, the SymSpell construction): the
    oracle is the UNFILTERED all-pairs levenshtein join, so this parity
    row is a completeness PROOF for the blocking — one pair missed by
    the neighborhood join would hash-mismatch (the
    jaccard_join_docs pattern). Both engines' levenshtein() agree on
    integers, so no rounding machinery is needed."""
    from dod_etl_spark.operators.fuzzy import fuzzy_pairs

    part = t(spark, sf_dir, "part")
    return fuzzy_pairs(part, "p_name", max_distance=1)


_FUZZY2_ORACLE = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part)
SELECT a.name AS name_1, b.name AS name_2,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= 2
"""


@query("fuzzy_name_pairs_d2", _FUZZY2_ORACLE)
def fuzzy_name_pairs_d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The d=2 SymSpell generalization: 2-deletion neighborhoods (keys
    = self + 1- and 2-char deletions), same unfiltered-oracle
    completeness proof at the wider radius."""
    from dod_etl_spark.operators.fuzzy import fuzzy_pairs

    part = t(spark, sf_dir, "part")
    return fuzzy_pairs(part, "p_name", max_distance=2)


# --- Phonetic blocking (American Soundex) --------------------------------------

from dod_etl_spark.functions.text import soundex_sql  # noqa: E402


def _phonetic_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT DISTINCT unnest(string_split(p_name, ' ')) AS tok FROM part
),
coded AS (
  SELECT tok, {soundex_sql('tok', 'duckdb')} AS code
  FROM toks WHERE tok <> ''
)
SELECT a.code AS code, a.tok AS tok_1, b.tok AS tok_2,
       CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS lev
FROM coded a JOIN coded b ON a.code = b.code AND a.tok < b.tok
"""


@query("phonetic_token_pairs", _phonetic_oracle())
def phonetic_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sound-alike token pairs by American Soundex blocking — the
    classic record-linkage blocking key (Odell/Russell; every MDM
    system ships it) and the complement to SymSpell edit-distance
    blocking: 'chocolate'/'chocolade' is d=1, but 'smith'/'smythe' is
    d=2 with zero shared deletions while their codes collide at S530.
    Both engines evaluate the SAME generated SQL text
    (functions/text.soundex_sql), so the whole phonetic key — not just
    the pair list — is hash-checked. Scale: one distinct-token pass,
    then a self-join blocked on the code; fan-out is bounded per block
    by the phonetic space (<= 26*7^3 codes), never all-pairs. The
    levenshtein column is deliberately UNFILTERED: downstream ER picks
    its own verify radius."""
    part = t(spark, sf_dir, "part")
    toks = (
        part.select(F.explode(F.split(F.col("p_name"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    coded = toks.selectExpr("tok", soundex_sql("tok", "spark") + " AS code")
    a = coded.selectExpr("code", "tok AS tok_1")
    b = coded.selectExpr("code AS code_b", "tok AS tok_2")
    return (
        a.join(b, (F.col("code") == F.col("code_b")) & (F.col("tok_1") < F.col("tok_2")))
        .select(
            "code",
            "tok_1",
            "tok_2",
            F.levenshtein("tok_1", "tok_2").cast("long").alias("lev"),
        )
    )


# --- PRF query expansion (RM3-lite, two chained BM25 rounds) -------------------

_PRF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
  FROM documents
),
posting AS (
  SELECT doc_id, tok, count(*) AS tf, max(dl) AS dl
  FROM (SELECT doc_id, len(ts) AS dl, unnest(ts) AS tok FROM toks)
  GROUP BY doc_id, tok
),
withdf AS (SELECT *, count(*) OVER (PARTITION BY tok) AS df FROM posting),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(len(ts)) AS DOUBLE) / count(*) AS avgdl
  FROM toks
),
q0(query_id, tok) AS (VALUES {_BM25_VALUES}),
s1 AS (
  SELECT q.query_id, p.doc_id,
         sum(CAST(({_BM25_CONTRIB}) AS DECIMAL(27,6))) AS sdec
  FROM withdf p JOIN q0 q USING (tok) CROSS JOIN stats s
  GROUP BY 1, 2
),
r1 AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sdec DESC, doc_id ASC) AS rk
    FROM s1
  ) WHERE rk <= 3
),
fb AS (
  SELECT r.query_id, p.tok, sum(p.tf) AS w
  FROM r1 r JOIN posting p ON p.doc_id = r.doc_id
  WHERE NOT EXISTS (SELECT 1 FROM q0
                    WHERE q0.query_id = r.query_id AND q0.tok = p.tok)
  GROUP BY 1, 2
),
fbtop AS (
  SELECT query_id, tok FROM (
    SELECT query_id, tok,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY w DESC, tok ASC) AS rn
    FROM fb
  ) WHERE rn <= 3
),
q1 AS (SELECT query_id, tok FROM q0 UNION SELECT query_id, tok FROM fbtop),
s2 AS (
  SELECT q.query_id, p.doc_id,
         sum(CAST(({_BM25_CONTRIB}) AS DECIMAL(27,6))) AS sdec
  FROM withdf p JOIN q1 q USING (tok) CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, sdec,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sdec DESC, doc_id ASC) AS rank
  FROM s2
)
SELECT query_id, doc_id, rank, {sround_sql('CAST(sdec AS DOUBLE)', 4)} AS score
FROM ranked WHERE rank <= 10
"""


@query("prf_expand_topk", _PRF_ORACLE)
def prf_expand_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback expansion (RM3 shape): round-1 BM25
    top-3 per query feed the 3 most frequent NEW terms (sum-tf weight,
    integer-exact) into the query vocabulary; round 2 re-scores with
    the expanded set. Both rounds, the feedback aggregation, and the
    term cut are mirrored in one chained SQL oracle — the full PRF
    pipeline is hash-checked, not just its pieces. The posting frame
    is built once and checkpointed (it feeds three consumers)."""
    from dod_etl_spark.operators.retrieval import prf_expand_topk

    docs = t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        _BM25_QUERIES, "query_id long, query_text string"
    )
    return prf_expand_topk(docs, queries, k=10, k_fb=3, m_expand=3, rational_idf=True)


# --- Two-sample Kolmogorov–Smirnov across event types --------------------------


def _ks_oracle() -> str:
    """Global-window ECDF formulation (the oracle may serialize; the
    engine side uses the bucketed parallel-prefix construction)."""
    from itertools import combinations

    n = len(_EVENT_TYPES)
    csel = ",\n         ".join(
        f"sum(CASE WHEN event_type = '{g}' THEN c ELSE 0 END) AS c{i}"
        for i, g in enumerate(_EVENT_TYPES)
    )
    ksel = ",\n         ".join(
        f"sum(c{i}) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING"
        f" AND CURRENT ROW) AS k{i}"
        for i in range(n)
    )
    tsel = ", ".join(f"sum(c{i}) AS t{i}" for i in range(n))
    arms = "\n  UNION ALL ".join(
        f"""SELECT '{_EVENT_TYPES[a]}' AS group_a, '{_EVENT_TYPES[b]}' AS group_b,
         t.t{a} AS n_a, t.t{b} AS n_b,
         coalesce((SELECT max(abs(k{a} * t.t{b} - k{b} * t.t{a})) FROM cum), 0) AS d_num
  FROM tot t"""
        for a, b in combinations(range(n), 2)
    )
    return f"""
WITH c AS (
  SELECT value, event_type, count(*) AS c FROM events GROUP BY 1, 2
),
p AS (
  SELECT value,
         {csel}
  FROM c GROUP BY value
),
cum AS (
  SELECT value,
         {ksel}
  FROM p
),
tot AS (SELECT {tsel} FROM p),
pairs AS (
  {arms}
)
SELECT group_a, group_b, n_a, n_b, d_num,
       {sround_sql('''CASE WHEN n_a > 0 AND n_b > 0
            THEN CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
            ELSE 0.0 END''', 6)} AS ks_d
FROM pairs
"""


@query("source_ks_test", _ks_oracle())
def source_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs two-sample Kolmogorov–Smirnov over the value
    distributions of the five event types (operators/stats.py
    ks_matrix): the drift detector source_drift_tvd can't provide —
    TVD over fixed histogram bins is resolution-limited, KS compares
    the FULL empirical CDFs. Integer-exact: the per-value gap is
    cross-multiplied (|C_a·n_b − C_b·n_a|) so the only float op is the
    final division. Scale: NO global sort/window — per-value counts
    (one exchange), a broadcast scalar, a metadata-sized per-bucket
    offset frame, and a bucket-partitioned parallel window build the
    exact global ECDF (the parallel-prefix pattern); the oracle uses
    the serial global-window formulation, so parity also proves the
    bucketed decomposition correct."""
    from dod_etl_spark.operators.stats import ks_matrix

    events = t(spark, sf_dir, "events")
    return ks_matrix(events, "event_type", "value", _EVENT_TYPES)


from dod_etl_spark.operators.sampling import hash_bucket_sql


# --- Interpolated Kneser-Ney bigram LM (round 8) -----------------------------

# Discount D = 3/4; multiplying P_KN through by 4*c1*Nbb makes every
# term an exact integer:
#   P(w2|w1) = max(c12 - D, 0)/c1 + D * N1+(w1,.)/c1 * N1+(.,w2)/N1+(..)
#            = [max(4*c12 - 3, 0)*Nbb + 3*N1w1*Ncw2] / (4*c1*Nbb)
# carried as floor-millionths BIGINTs, the lm_score_docs convention —
# no float log anywhere, so cross-engine hash parity is exact.
# Integer-range note: the numerator needs 4e6*c12*Nbb < 2^63; at
# web scale (c12, Nbb ~ 1e9+) the oracle-replayable integer form is
# the validation mode and production would carry DOUBLE log-probs.
_KN_SEED = 99
_KN_TRAIN_CUT = 2_000  # bucket >= cut -> train (80%); all docs scored

_KN_LM_ORACLE = f"""
WITH toksed AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk,
         {hash_bucket_sql('doc_id', _KN_SEED)} AS _b
  FROM documents
),
bg AS (
  SELECT doc_id, _b >= {_KN_TRAIN_CUT} AS is_train,
         split_part(bigram, ' ', 1) AS w1,
         split_part(bigram, ' ', 2) AS w2
  FROM (
    SELECT doc_id, _b,
           unnest([tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))]) AS bigram
    FROM toksed WHERE len(tk) >= 2
  )
),
c2 AS (
  SELECT w1, w2, count(*) AS c2 FROM bg WHERE is_train GROUP BY w1, w2
),
ctx AS (
  SELECT w1, CAST(sum(c2) AS BIGINT) AS c1, count(*) AS n1 FROM c2 GROUP BY w1
),
cont AS (
  SELECT w2, count(*) AS nc FROM c2 GROUP BY w2
),
nbb AS (SELECT count(*) AS nbb FROM c2),
scored AS (
  SELECT b.doc_id,
         CASE WHEN x.c1 IS NOT NULL THEN
           ((greatest(4 * coalesce(p.c2, 0) - 3, 0) * n.nbb
             + 3 * x.n1 * coalesce(k.nc, 0)) * 1000000)
           // (4 * x.c1 * n.nbb)
         ELSE (coalesce(k.nc, 0) * 1000000) // n.nbb END AS micro,
         CASE WHEN x.c1 IS NULL THEN 1 ELSE 0 END AS oov_ctx
  FROM bg b
  LEFT JOIN c2 p ON p.w1 = b.w1 AND p.w2 = b.w2
  LEFT JOIN ctx x ON x.w1 = b.w1
  LEFT JOIN cont k ON k.w2 = b.w2
  CROSS JOIN nbb n
)
SELECT doc_id,
       count(*) AS n_bigrams,
       CAST(sum(oov_ctx) AS BIGINT) AS n_oov_ctx,
       CAST(sum(micro) // count(*) AS BIGINT) AS avg_microprob
FROM scored GROUP BY doc_id
"""


@query("kn_lm_score_docs", _KN_LM_ORACLE)
def kn_lm_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring — the CCNet-style fluency
    filter, upgraded from the MLE bigram model (lm_score_docs): the
    model trains on the 80% content-hash train split and scores ALL
    documents, so holdout docs exercise the smoothing paths — an
    unseen bigram under a seen context falls back to the discounted
    continuation probability N1+(.,w2)/N1+(..), and an unseen context
    scores as pure continuation (n_oov_ctx counts those occurrences:
    the OOV-rate curation signal). Probabilities are exact integer
    millionths (see the derivation above) — no float log, no
    cross-engine drift.

    Scale shape: the MODEL materializes once (the distinct-bigram
    count frame, vocab^2-bounded) while the per-occurrence bigram
    stream is recomputed map-only by its two consumers; the model is
    three map-combined aggregations off that ONE checkpointed frame
    (ctx and cont are per-key row counts of c2, not second corpus
    passes); Nbb rides as a broadcast 1-row
    scalar; scoring joins on the bigram key (AQE broadcasts the model
    while it fits, hash join on the same key beyond — the
    lm_score_docs shape)."""
    from dod_etl_spark.operators.sampling import hash_bucket

    docs = t(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    toks = docs.select(
        "doc_id",
        tk.alias("tk"),
        (hash_bucket(F.col("doc_id"), _KN_SEED) >= _KN_TRAIN_CUT).alias("is_train"),
    ).filter(F.size("tk") >= 2)
    # (w1, w2) taken straight from the token array after the position
    # explode — the old form built "w1 w2" inside a transform() lambda
    # (interpreted) and split it back with split_part; tokens are
    # split-on-space non-empty so the round-trip was the identity, and
    # the explode-first projection whole-stage-compiles.
    # No checkpoint on the per-occurrence stream: its two consumers
    # (model build, scoring) each re-run a map-only tokenize+explode;
    # materializing bg would be a corpus x positions write — the wrong
    # trade at 100 TB. The MODEL frame (c2, vocab^2-bounded) below is
    # the one that checkpoints.
    bg = toks.select(
        "doc_id",
        "is_train",
        "tk",
        F.explode(F.sequence(F.lit(1), F.size("tk") - 1)).alias("_i"),
    ).select(
        "doc_id",
        "is_train",
        F.element_at(F.col("tk"), F.col("_i")).alias("w1"),
        F.element_at(F.col("tk"), F.col("_i") + 1).alias("w2"),
    )
    c2 = (
        bg.where("is_train")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=True)
    )
    ctx = c2.groupBy("w1").agg(
        F.sum("c2").cast("long").alias("c1"), F.count(F.lit(1)).alias("n1")
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("nc"))
    nbb = F.broadcast(c2.agg(F.count(F.lit(1)).alias("nbb")))
    scored = (
        bg.join(c2, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(nbb)
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN c1 IS NOT NULL THEN "
                "((greatest(4 * coalesce(c2, 0) - 3, 0) * nbb "
                "  + 3 * n1 * coalesce(nc, 0)) * 1000000) "
                "div (4 * c1 * nbb) "
                "ELSE (coalesce(nc, 0) * 1000000) div nbb END"
            ).alias("micro"),
            F.expr("CASE WHEN c1 IS NULL THEN 1 ELSE 0 END").alias("oov_ctx"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("oov_ctx").cast("long").alias("n_oov_ctx"),
        F.expr("sum(micro) div count(1)").cast("long").alias("avg_microprob"),
    )


# --- Multinomial class-affinity classifier (log-free NB) ---------------------

_NB_CLASSIFY_SQL = """
WITH toks AS (
  SELECT doc_id, source AS cls,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
  FROM documents
),
counts AS (SELECT cls, tok, count(*) AS c FROM toks GROUP BY 1, 2),
totals AS (SELECT cls, sum(c) AS t_c FROM counts GROUP BY 1),
vocab AS (SELECT DISTINCT tok FROM counts),
vs AS (SELECT count(*) AS v FROM vocab),
grid AS (
  SELECT t.cls, vb.tok,
         ((coalesce(c.c, 0) + 1) * 1000000) // (t.t_c + vs.v) AS micro
  FROM vocab vb CROSS JOIN totals t CROSS JOIN vs
  LEFT JOIN counts c ON c.cls = t.cls AND c.tok = vb.tok
),
aff AS (
  SELECT dt.doc_id, g.cls,
         sum(g.micro) // count(*) AS micro_affinity
  FROM (SELECT doc_id, tok FROM toks) dt JOIN grid g USING (tok)
  GROUP BY 1, 2
),
pred AS (
  SELECT doc_id, cls, micro_affinity,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY micro_affinity DESC, cls) AS rk
  FROM aff
)
SELECT p.doc_id AS doc_id, p.cls AS pred_cls,
       CAST(p.micro_affinity AS BIGINT) AS micro_affinity,
       d.source AS true_cls,
       CAST((p.cls = d.source) AS INT) AS correct
FROM pred p JOIN documents d USING (doc_id) WHERE p.rk = 1
"""


@query("nb_source_classifier", _NB_CLASSIFY_SQL)
def nb_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained source classifier (operators/classify.py): the
    multinomial naive-Bayes discriminant in the package's log-free
    exact-integer form — add-one-smoothed per-(class, token)
    micro-likelihoods ((c+1)*1e6 div (T_c+V)), documents scored
    against every class by MEAN per-token micro-likelihood, argmax
    with lexicographic tiebreak, true class retained so accuracy /
    confusion are one groupBy away. This is the quality/domain
    classifier seat of a curation stack (fastText-style scorer) with
    the training pass expressed relationally: the likelihood grid is
    vocab x |classes| (vocab-bounded shuffle), scoring fans each token
    occurrence by the small class count, every aggregate map-combines.
    No libm log crosses engines (pmi_collocations rule), so the
    geometric mean becomes an arithmetic mean — ranking quality
    pinned separately in tests/test_classify.py."""
    from dod_etl_spark.operators.classify import nb_classify

    docs = t(spark, sf_dir, "documents")
    return nb_classify(docs, "source")


# --- CCNet perplexity bucketing ----------------------------------------------

_CCNET_BUCKETS_SQL = f"""
WITH kn AS ({_KN_LM_ORACLE}),
tiled AS (
  SELECT doc_id, n_bigrams, n_oov_ctx, avg_microprob,
         ntile(3) OVER (ORDER BY avg_microprob DESC, doc_id) AS tile
  FROM kn
)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(avg_microprob AS BIGINT) AS avg_microprob,
       CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         AS ppl_bucket
FROM tiled
"""


@query("ccnet_ppl_buckets", _CCNET_BUCKETS_SQL)
def ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's perplexity bucketing (Wenzek et al. 2020): every
    document labeled head/middle/tail by LM-fluency tertile — the
    standard quality-tiered corpus split (train on head+middle, weight
    or drop tail). Built ON the kn_lm_score_docs scores (higher mean
    per-token micro-probability = lower perplexity = head); tertile
    cut via ntile over the total order (score DESC, doc_id), identical
    in both engines. One extra single-partition window over the
    doc-level score frame — the corpus-scale cost stays in the KN
    scorer; at 100 TB the tertile boundary would come from a quantile
    sketch instead of a global sort, the documented trade for an
    oracle-exact cut here."""
    kn = kn_lm_score_docs(spark, sf_dir)
    w = Window.orderBy(F.col("avg_microprob").desc(), F.col("doc_id"))
    return (
        kn.withColumn("tile", F.ntile(3).over(w))
        .select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.col("avg_microprob").cast("long").alias("avg_microprob"),
            F.when(F.col("tile") == 1, "head")
            .when(F.col("tile") == 2, "middle")
            .otherwise("tail")
            .alias("ppl_bucket"),
        )
    )


_NB_CONFUSION_SQL = f"""
WITH pred AS ({_NB_CLASSIFY_SQL})
SELECT true_cls, pred_cls, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY true_cls, pred_cls
"""


@query("nb_confusion_matrix", _NB_CONFUSION_SQL)
def nb_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix over nb_source_classifier's predictions —
    the evaluation artifact a classifier-gated curation run reports.
    One map-combined count over the prediction frame; the cost is the
    classifier itself."""
    return (
        nb_source_classifier(spark, sf_dir)
        .groupBy("true_cls", "pred_cls")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
