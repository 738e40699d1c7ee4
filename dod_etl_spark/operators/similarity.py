"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; `lsh_bucketed_topk` is
the scale path: random-hyperplane LSH buckets shrink the candidate set
from N to N/2^bits per query, trading recall for a bounded join.

All vector math is native Spark (zip_with/aggregate on array columns,
computed in double) — JVM-side, no Python in the loop. A Pandas-UDF
variant would batch via Arrow but the built-in expressions vectorize
fine and keep the DuckDB oracle exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double summation — matches the oracle's
    list_dot_product on DOUBLE[] element order exactly."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    da, db = _to_double(a), _to_double(b)
    denom = norm(da) * norm(db)
    return F.when(denom > 0, dot(da, db) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 3,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus — one pass over the corpus, no shuffle of the big side; the
    per-query top-k window runs on the tiny (n_queries × N) result.

    Ranking is on the ROUNDED similarity with id tiebreak, so ordering
    is stable across engines/float paths."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.withColumn(
        "cosine", F.round(cosine(F.col("_qv"), F.col("_cv")), round_digits)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def hyperplane_sign_bits(vec: Column, seeds: list[int]) -> Column:
    """LSH bucket id from deterministic pseudo-random hyperplanes: for
    seed s, hyperplane component i is derived from a hash of (s, i) —
    here a cheap integer mix — and the bit is sign(v·h). Engine-portable
    and seed-stable."""
    bucket = F.lit(0).cast("long")
    for bit, seed in enumerate(seeds):
        comp = F.transform(
            vec,
            lambda x, i: x.cast("double")
            * (((i + 1) * (seed * 2654435761 % 1000003) % 2001 - 1000) / 1000.0),
        )
        proj = F.aggregate(comp, F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(proj > 0, F.lit(1 << bit).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 4,
    round_digits: int = 3,
) -> DataFrame:
    """Approximate top-k: equi-join on the LSH bucket, exact cosine +
    top-k within the bucket. At 100 TB the bucket join is a plain hash
    join on a long key; recall is tuned by n_bits (and multi-probe, left
    as a union over neighboring buckets)."""
    seeds = list(range(1, n_bits + 1))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        hyperplane_sign_bits(F.col(vec_col), seeds).alias("_bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        hyperplane_sign_bits(F.col(vec_col), seeds).alias("_bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine(F.col("_qv"), F.col("_cv")), round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )
