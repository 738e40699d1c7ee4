"""Product quantization (PQ) for approximate nearest neighbor search.

Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011) — the FAISS IndexPQ design. The embedding space
splits into M contiguous subspaces; each subspace gets its own K-entry
codebook; a vector compresses to M small codes (here one byte each).
Search is ASYMMETRIC distance computation (ADC): the query stays
full-precision and is compared against the quantized corpus, so the
only approximation error is on the corpus side.

Why this is the third ANN scale path (alongside LSH buckets and IVF
cells, operators/similarity.py): LSH and IVF shrink the CANDIDATE SET
per query; PQ shrinks the BYTES PER CANDIDATE. At 100 TB the corpus
scan/shuffle is dominated by moving D floats per row (64 dims = 256 B);
PQ moves M bytes (8 B here, 32× less) and reconstructs distance from
codebooks that are plan literals. The three composition points:

- encode is a ZERO-SHUFFLE projection (codes are pure expressions over
  the vector column with the codebooks as in-expression array
  Literals — one bulk byte transfer to the JVM, no SQL text to parse;
  see _encode_codes_col for the measured alternatives);
- training is k-means per subspace with the same contract as
  kmeans_centroids: assignment distributed, the update step collects
  only M*K*ds numbers (metadata) to the driver — FAISS trains its
  quantizers the same way, the corpus never moves;
- ADC scoring reads codes + literal codebooks only. This module scores
  via the reconstruction identity so the DuckDB oracle can replay it
  EXACTLY: because the subspaces tile the dimensions in order,
  sum_m ||q_m - c_m||^2 = q·q - 2·q·recon + recon·recon where recon is
  the concatenation of the chosen centroids — three full-width
  sequential dots, the same left-to-right double fold the oracle's
  list_dot_product computes (proven hash-identical in cosine_topk).

Determinism: the seed codebook for subspace m is the sub-slice of the
K lowest-id corpus vectors (same id-stable convention as
seed_centroids), code assignment breaks distance ties on the smallest
code, and every sum is a fixed-order double fold — so the whole
operator, training included (decimal-exact means), is replayable in
ANSI SQL and cross-engine hash-exact.

Reference parity note: the reference engine (Scala/Beam/H2, see
SURVEY.md §2) has no vector search at all; this belongs to the
LLM-training-data surface the brief adds on top (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dod_etl_spark.catalog import spread
from dod_etl_spark.functions.scalar import stable_round
from dod_etl_spark.operators.similarity import _probe_dim, dot

Codebooks = list[list[list[float]]]  # [m][k][j] -> centroid value


def _seq_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):  # sequential fold — engines' summation order
        acc = acc + x * y
    return acc


def seed_pq_codebooks(
    corpus: DataFrame,
    n_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebooks:
    """Deterministic seed: codebook[m][k] = subspace-m slice of the
    vector whose id is k (the n_codes lowest ids) — id-stable across
    engines, so the oracle can rebuild the identical codebooks
    relationally. Collects n_codes rows (metadata-sized)."""
    dim = _probe_dim(corpus, vec_col)
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    ds = dim // n_sub
    rows = (
        corpus.filter(F.col(id_col) < n_codes)
        .select(F.col(id_col).alias("k"), F.col(vec_col).alias("v"))
        .collect()
    )
    byid = {int(r["k"]): [float(x) for x in r["v"]] for r in rows}
    return [
        [byid[k][m * ds : (m + 1) * ds] for k in sorted(byid)]
        for m in range(n_sub)
    ]


def seed_pq_index(
    corpus: DataFrame,
    n_sub: int = 8,
    n_codes: int = 16,
    n_cells: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[Codebooks, list[tuple[int, list[float]]], int]:
    """(codebooks, coarse centroids, dim) from ONE metadata collect.

    seed_pq_codebooks + seed_centroids + _probe_dim each run their own
    driver job (a filtered collect / a first()); a PQ or IVF-PQ query
    build paid 3-4 such jobs before any real work — pure per-build
    scheduling latency at any data scale. The selections are nested
    (centroid ids < n_cells <= codebook ids < n_codes, dim from any
    vector), so one collect of the n_codes lowest-id vectors serves
    all three with IDENTICAL values: codebook[m][k] is the subspace-m
    slice of the k-th lowest id, a centroid is (id, vector) for
    id < n_cells, dim is the uniform vector width."""
    if n_cells > n_codes:
        raise ValueError(f"n_cells {n_cells} > n_codes {n_codes}")
    rows = (
        corpus.filter(F.col(id_col) < n_codes)
        .select(F.col(id_col).alias("k"), F.col(vec_col).alias("v"))
        .collect()
    )
    byid = {int(r["k"]): [float(x) for x in r["v"]] for r in rows}
    if not byid:
        raise ValueError(f"no rows with {id_col} < {n_codes} to seed from")
    dim = len(next(iter(byid.values())))
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    ds = dim // n_sub
    cbs = [
        [byid[k][m * ds : (m + 1) * ds] for k in sorted(byid)]
        for m in range(n_sub)
    ]
    cents = [(k, byid[k]) for k in sorted(byid) if k < n_cells]
    return cbs, cents, dim


def _np_dbl_lit(values: list[float]):
    """One `array<double>` plan Literal from a Python float list with a
    SINGLE bulk byte transfer to the JVM. The slow alternatives this
    replaces, all measured on the r10 16x64 codebooks:

    - rendering the values as SQL text: ~240 KB of CAST('…' AS DOUBLE)
      per encode, ~2.3 s of driver parse+analyze per plan;
    - `F.lit(list)`: recurses into per-element py4j `lit` calls —
      thousands of driver round-trips, ~12 s;
    - `F.lit(ndarray)`: PySpark's NumpyArrayConverter still populates
      the Java array ELEMENT-WISE over py4j (~17 ms per 256-double
      literal, ~2 s across a query's 48+ literals).

    Here the doubles cross py4j once as a `bytearray` (py4j ships
    bytes in one message) and are bulk-decoded JVM-side via
    ByteBuffer.asDoubleBuffer().get(double[]) — ~3 ms per literal.
    Big-endian f8 preserves the exact IEEE bits, so the arithmetic
    downstream is unchanged. Falls back to the ndarray path when no
    py4j gateway exists (e.g. Spark Connect)."""
    import numpy as np
    from pyspark import SparkContext
    from pyspark.sql.column import Column

    gw = SparkContext._gateway
    if gw is None:  # pragma: no cover - classic py4j mode everywhere here
        return F.lit(np.asarray(values, dtype="float64"))
    cache = _np_dbl_lit.__dict__.setdefault("_handles", {})
    h = cache.get(id(gw))
    if h is None:
        h = (
            gw.jvm.java.nio.ByteBuffer,
            gw.jvm.org.apache.spark.sql.functions,
            gw.jvm.double,
        )
        cache.clear()  # one live gateway at a time; drop stale handles
        cache[id(gw)] = h
    bb, fns, jdouble = h
    data = bytearray(np.asarray(values, dtype=">f8").tobytes())
    buf = bb.wrap(data).asDoubleBuffer()
    arr = gw.new_array(jdouble, len(values))
    buf.get(arr)
    return Column(fns.lit(arr))


def _encode_codes_col(codebooks: Codebooks, vec_col: str):
    """The `codes` array Column (referencing the precomputed
    per-subspace self-dot columns `_sd{m}`).

    d(s, c_k) = s·s - 2·s·c_k + c_k·c_k with every dot a left-to-right
    fold (matches DuckDB's list_dot_product on the slice); ties break
    on the smallest k via the struct sort. The full codebook set rides
    INSIDE the expression as ONE flat `array<double>` Literal (subspace
    m entry k at [(m*K + k)*ds, …+ds)) plus one flat self-dot Literal,
    and all M argmins come from one nested `transform` — an
    M- and K-independent expression tree, bit-identical arithmetic to
    the unrolled form (the lambda body is the same left-to-right
    multiply-add over the same doubles).

    Why this shape (all three alternatives measured, r10 16x64):
    - rendered SQL text: ~240 KB of CAST('…' AS DOUBLE) per encode,
      ~2 s driver parse+analyze per plan at ANY data scale (~0.6 s
      warm) — pure driver overhead;
    - literals as PROJECTED columns referenced by a compact expression:
      the projection MATERIALIZES ~16x1024 doubles per corpus row —
      measured 2.5x slower end to end;
    - one Column-API expression PER SUBSPACE: ~600 py4j round-trips of
      lambda construction, ~1.5 s driver time.
    One nested transform + two bulk literals ≈ 60 py4j calls."""
    n_sub = len(codebooks)
    n_codes = len(codebooks[0])
    ds = len(codebooks[0][0])
    v = F.col(vec_col)
    cbf = _np_dbl_lit([x for cb in codebooks for c in cb for x in c])
    ccf = _np_dbl_lit([_seq_dot(c, c) for cb in codebooks for c in cb])
    # Iterating the transform OVER the self-dot array (rather than a
    # sequence() of subspace ids) makes the array the lambda input, so
    # each _sd sum is evaluated once per row — the inlined-column form
    # would re-evaluate it per code candidate.
    sds = F.array(*[F.col(f"_sd{m}") for m in range(n_sub)])

    def per_subspace(sd, m):
        def entry(cc, k):
            base = (m * n_codes + k) * ds
            # left-to-right fold of the subspace slice against entry k
            acc = F.element_at(v, m * ds + 1).cast("double") * F.element_at(
                cbf, base + 1
            )
            for j in range(1, ds):
                acc = acc + F.element_at(v, m * ds + (j + 1)).cast(
                    "double"
                ) * F.element_at(cbf, base + (j + 1))
            return F.struct(
                (sd - F.lit(2) * acc + cc).alias("d"),
                k.alias("k"),
            )

        return F.element_at(
            F.array_sort(
                F.transform(F.slice(ccf, m * n_codes + 1, n_codes), entry)
            ),
            1,
        ).getField("k")

    return F.transform(sds, per_subspace)


def pq_encode(
    df: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id[, extra_cols], codes array<int>) — ZERO exchanges: code
    assignment is a pure projection with the codebooks as
    in-expression array Literals (one nested transform; see
    _encode_codes_col for why not SQL text and not per-subspace Column
    trees). At scale this runs inside the corpus scan stage; the
    output is M small ints per row, the 32x scan-compression PQ exists
    for."""
    n_sub = len(codebooks)
    ds = len(codebooks[0][0])
    extra = list(extra_cols or [])
    sd = [
        " + ".join(
            f"CAST({vec_col}[{m * ds + j}] AS DOUBLE) * CAST({vec_col}[{m * ds + j}] AS DOUBLE)"
            for j in range(ds)
        )
        for m in range(n_sub)
    ]
    staged = df.selectExpr(
        id_col,
        vec_col,
        *extra,
        *[f"({sd[m]}) AS _sd{m}" for m in range(n_sub)],
    )
    keep = ([id_col, vec_col] if keep_vec else [id_col]) + extra
    return staged.select(
        *keep, _encode_codes_col(codebooks, vec_col).alias("codes")
    )


def train_pq_codebooks(
    corpus: DataFrame,
    n_sub: int = 8,
    n_codes: int = 16,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebooks:
    """Lloyd refinement of the seed codebooks, all subspaces in one
    distributed pass per iteration: encode (projection, zero shuffle),
    then ONE map-combined groupBy over (subspace, code) producing
    decimal-exact elementwise sums — M*K*ds numbers collected to the
    driver (metadata; k-means' own contract). Empty cells keep their
    previous centroid. iters=0 returns the seed unchanged."""
    dim = _probe_dim(corpus, vec_col)
    ds = dim // n_sub
    cbs = seed_pq_codebooks(corpus, n_sub, n_codes, id_col, vec_col)
    if iters <= 0:
        return cbs
    body = spread(corpus)
    for _ in range(iters):
        enc = pq_encode(body, cbs, id_col, vec_col, keep_vec=True)
        # one row per (vector, subspace): the M-fold explode keeps the
        # update a single shuffle instead of M jobs
        sub = enc.select(
            F.posexplode(
                F.array(*[
                    F.struct(
                        F.col("codes").getItem(m).alias("code"),
                        F.slice(F.col(vec_col), m * ds + 1, ds).alias("s"),
                    )
                    for m in range(len(cbs))
                ])
            ).alias("m", "e")
        ).select("m", F.col("e.code").alias("code"), F.col("e.s").alias("s"))
        aggs = [F.count(F.lit(1)).alias("_cnt")] + [
            F.sum(
                F.col("s").getItem(j).cast("double").cast("decimal(30,9)")
            ).alias(f"_s{j}")
            for j in range(ds)
        ]
        rows = sub.groupBy("m", "code").agg(*aggs).collect()
        refined = {
            (int(r["m"]), int(r["code"])): [
                float(r[f"_s{j}"]) / int(r["_cnt"]) for j in range(ds)
            ]
            for r in rows
        }
        cbs = [
            [refined.get((m, k), c) for k, c in enumerate(cb)]
            for m, cb in enumerate(cbs)
        ]
    return cbs


def _recon_col(codebooks: Codebooks, codes_col: str = "codes"):
    """Column for the reconstructed vector: the chosen centroid per
    subspace, concatenated in subspace order — each a ds-wide slice of
    ONE flat codebook Literal (subspace m entry k at [(m*K + k)*ds,
    …+ds)), addressed by the code; `flatten(transform(...))` over the
    subspace range is the same left-to-right concat as the old
    per-subspace element_at chain. In-expression Literals for the same
    reasons as _encode_codes_col (no SQL text to parse, no per-row
    literal-column materialization, no py4j storm)."""
    n_sub = len(codebooks)
    n_codes = len(codebooks[0])
    ds = len(codebooks[0][0])
    rbf = _np_dbl_lit([x for cb in codebooks for c in cb for x in c])
    codes = F.col(codes_col)
    # One `codes` reference PER SUBSPACE (not one reference inside a
    # lambda): CollapseProject inlines a single-use non-cheap alias
    # into its consumer, and inside a transform lambda that would
    # re-evaluate the entire encode argmin once per subspace —
    # measured 30x slower. Sixteen references keep the projection
    # boundary, so codes materializes once per row (the winnowing
    # multiply-referenced-array lesson).
    parts = [
        F.slice(
            rbf, (m * n_codes + F.element_at(codes, m + 1)) * ds + 1, ds
        )
        for m in range(n_sub)
    ]
    return F.concat(*parts)


def _exact_rerank(
    scored: DataFrame,
    corpus: DataFrame,
    k: int,
    n_cand: int,
    dim: int,
    id_col: str,
    vec_col: str,
    round_digits: int,
) -> DataFrame:
    """Two-stage ANN serve (the standard FAISS refine step): keep the
    top n_cand candidates per query by ASYMMETRIC (quantized) distance,
    then re-score just those candidates with EXACT squared L2 on their
    raw vectors and return the exact top-k.

    Recall stops being bounded by quantization error and becomes
    candidate recall@n_cand — measured 0.22 -> 0.82 at n_cand=8k on the
    synthetic corpus (docs/SCALE.md round-10 table). Scale shape: the
    candidate frame is |Q|*n_cand rows of ids (query-bounded, tiny) and
    rides BROADCAST into the corpus scan, so the raw vectors of only
    the candidates ever leave the scan — the corpus-side bytes stay
    codes-first, which is the whole PQ dividend. Candidate selection
    uses the ROUNDED ADC distance with neighbor-id ties, so the stage
    boundary is deterministic and the oracle replays it exactly."""
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    cand = (
        scored.withColumn("_ark", F.row_number().over(w_adc))
        .filter(F.col("_ark") <= n_cand)
        .select("query_id", "neighbor_id", "_qv", "_qq")
    )
    raw = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")
    )
    d = (
        F.col("_qq")
        - F.lit(2.0) * dot(F.col("_qv"), F.col("_v"), dim)
        + dot(F.col("_v"), F.col("_v"), dim)
    )
    exact = raw.join(F.broadcast(cand), "neighbor_id").withColumn(
        "dist", stable_round(d, round_digits)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "dist", "rk")
    )


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    codebooks: Codebooks | None = None,
    n_sub: int = 8,
    n_codes: int = 16,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 3,
    rerank: int = 0,
    dim: int | None = None,
) -> DataFrame:
    """ADC top-k by squared L2: for each query (full precision), the k
    corpus vectors with the smallest asymmetric distance to their PQ
    reconstruction; ties break on neighbor id.

    dist(q, v) = q·q - 2·q·recon(v) + recon(v)·recon(v) — equal to
    sum_m ||q_m - c_{v,m}||^2 because the subspaces tile the dims, and
    expressed as three full-width sequential dots so the oracle's
    list_dot_product replays it bit-exactly.

    Plan shape = brute_force_topk's (broadcast queries, per-query
    window top-k: ONE exchange), but the corpus side carries M bytes of
    codes instead of D floats past the encode projection — at 100 TB
    the scan stays, the shuffle/candidate bytes drop 32x. Recall is
    bounded by quantization error only (no candidate pruning); compose
    with IVF cells for the FAISS IVF-PQ posture when N/k ratios demand
    candidate cuts too.

    rerank > 0 engages the two-stage serve (_exact_rerank): ADC picks
    k*rerank candidates, exact L2 on just their raw vectors ranks the
    final k — the production posture when recall matters more than the
    second (tiny, broadcast-pinned) corpus probe."""
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, n_sub, n_codes, iters, id_col, vec_col
        )
    if dim is None:  # callers with seed_pq_index pass it: one less job
        dim = _probe_dim(corpus, vec_col)
    enc = pq_encode(spread(corpus), codebooks, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        _recon_col(codebooks).alias("_r"),
    )
    q = queries.selectExpr(
        f"{id_col} AS query_id", f"{vec_col} AS _qv"
    ).withColumn("_qq", dot(F.col("_qv"), F.col("_qv"), dim))
    d = (
        F.col("_qq")
        - F.lit(2.0) * dot(F.col("_qv"), F.col("_r"), dim)
        + dot(F.col("_r"), F.col("_r"), dim)
    )
    scored = (
        F.broadcast(q)
        .crossJoin(enc)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dist", stable_round(d, round_digits))
    )
    if rerank > 0:
        return _exact_rerank(
            scored, corpus, k, k * rerank, dim, id_col, vec_col, round_digits
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "dist", "rk")
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_cells: int = 8,
    n_probe: int = 2,
    codebooks: Codebooks | None = None,
    n_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 3,
    rerank: int = 0,
    centroids: list[tuple[int, list[float]]] | None = None,
    dim: int | None = None,
) -> DataFrame:
    """IVF-PQ: the FAISS IndexIVFPQ composition — IVF cells cut the
    CANDIDATE COUNT (each query scores ~n_probe/n_cells of the corpus),
    PQ codes cut the CANDIDATE WIDTH (M bytes instead of D floats) —
    the posture a 100 TB vector corpus actually ships with, assembled
    from this package's two primitives with no new moving parts:

    - corpus: coarse cell assignment (literal-centroid projection,
      operators/similarity._cell_assigner — the ivf_topk path) then PQ
      encode then reconstruction, ALL zero-exchange scan-stage work;
    - queries: probe their n_probe best cells (same assigner), ride a
      broadcast into the cell-pruned join;
    - scoring: asymmetric squared-L2 to the reconstruction (the
      pq_adc_topk identity: three sequential full-width dots), ranked
      ascending with neighbor-id ties.

    Every stage (cosine cell argmax, code argmin, ADC distance) is the
    deterministic arithmetic its standalone oracle already replays, so
    the COMPOSED index is hash-exact against a relational DuckDB
    oracle too — quantizer, codes, pruning and ranking all checked.
    Quantizes raw vectors (FAISS by_residual=false); residual encoding
    is the documented refinement (codebooks trained on v - centroid,
    recon = centroid + pq_recon), same plan shape."""
    from dod_etl_spark.operators.similarity import (
        _cell_assigner,
        _probe_dim,
        seed_centroids,
    )

    if dim is None:  # callers with seed_pq_index pass it: one less job
        dim = _probe_dim(corpus, vec_col)
    cents = (
        centroids
        if centroids is not None
        else seed_centroids(corpus, n_cells, id_col, vec_col)
    )
    if codebooks is None:
        codebooks = seed_pq_codebooks(corpus, n_sub, n_codes, id_col, vec_col)
    with_cells = _cell_assigner(cents, dim, id_col, vec_col)

    c = with_cells(spread(corpus), "neighbor_id", "_cv", "_cn", 1)
    cand = pq_encode(
        c.selectExpr(f"neighbor_id AS {id_col}", "cell_id", f"_cv AS {vec_col}"),
        codebooks,
        id_col=id_col,
        vec_col=vec_col,
        extra_cols=["cell_id"],
    ).select(
        F.col(id_col).alias("neighbor_id"),
        "cell_id",
        _recon_col(codebooks).alias("_r"),
    )
    q = with_cells(queries, "query_id", "_qv", "_qn", n_probe).withColumn(
        "_qq", dot(F.col("_qv"), F.col("_qv"), dim)
    )
    d = (
        F.col("_qq")
        - F.lit(2.0) * dot(F.col("_qv"), F.col("_r"), dim)
        + dot(F.col("_r"), F.col("_r"), dim)
    )
    scored = (
        F.broadcast(q)
        .join(cand, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dist", stable_round(d, round_digits))
    )
    if rerank > 0:
        return _exact_rerank(
            scored, corpus, k, k * rerank, dim, id_col, vec_col, round_digits
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "dist", "rk")
    )
