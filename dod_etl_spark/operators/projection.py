"""PCA dimensionality reduction for embedding columns — the
train-small / apply-distributed pattern (same shape as IVF's k-means:
the MODEL is metadata, the corpus never leaves executors).

Why PCA in a training-data engine: 64-float embeddings dominate the
byte volume of a curated corpus; most ANN/clustering screens
(semantic dedup, diversity sampling, drift detection) survive an 8-16
dim projection that cuts shuffle and scan bytes 4-8x. PCA also feeds
whitening for sign-bucket LSH (decorrelated dims make random
hyperplanes more discriminative).

Scale design
------------
- FIT is one scan + ONE map-side-combined shuffle of (d + d(d+1)/2 + 1)
  partial sums per partition (count, per-dim sums, upper-triangle
  raw-moment sums): for d=64 that's 2,145 doubles per partition —
  constant-size state, any corpus size. The d x d covariance eigen-
  decomposition happens on the DRIVER on a d x d matrix (microseconds;
  FAISS trains its quantizers the same way).
- Component signs are canonicalized (largest-|loading| entry positive)
  so the model is deterministic up to eigenvalue ties.
- APPLY is a zero-shuffle projection: components become literal
  arithmetic (element_at chains, codegen'd) — no UDF, no Python on
  the hot path, same posture as operators/similarity._dot_sql.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _moment_slots(dim: int) -> int:
    return 1 + dim + dim * (dim + 1) // 2


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8, dim: int | None = None) -> dict:
    """Fit a PCA model: returns {"mean": [d], "components": [k][d],
    "explained_var": [k], "dim": d, "k": k}.

    One aggregation pass accumulates [count, Σv_i, Σ v_i·v_j (i<=j)]
    as a single flattened array (posexplode + groupBy(pos) with
    map-side combine), then the d x d eigenproblem is solved driver-
    side with numpy."""
    import numpy as np

    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("pca_fit on an empty frame")
        dim = first["d"]
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    prods = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.transform(
                F.sequence(i, F.lit(dim)),
                lambda j: F.element_at(v, i) * F.element_at(v, j),
            ),
        )
    )
    flat = F.concat(F.array(F.lit(1.0)), v, prods)
    sums = (
        df.select(F.posexplode(flat).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum("x").alias("s"))
        .collect()
    )
    acc = np.zeros(_moment_slots(dim))
    for r in sums:
        acc[r["pos"]] = r["s"]
    n = acc[0]
    if n < 2:
        raise ValueError(f"pca_fit needs >=2 rows, got {n}")
    mean = acc[1 : 1 + dim] / n
    m2 = np.zeros((dim, dim))
    idx = 1 + dim
    for i in range(dim):
        for j in range(i, dim):
            m2[i, j] = m2[j, i] = acc[idx]
            idx += 1
    cov = m2 / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for c in order:
        e = evecs[:, c]
        # Canonical sign: the largest-|loading| coordinate is positive.
        pivot = int(np.argmax(np.abs(e)))
        if e[pivot] < 0:
            e = -e
        comps.append(e.tolist())
    return {
        "mean": mean.tolist(),
        "components": comps,
        "explained_var": [float(max(evals[c], 0.0)) for c in order],
        "dim": dim,
        "k": k,
    }


def _proj_expr(vec_col: str, mean: list[float], comp: list[float]) -> Column:
    """dot(v - mean, e) as literal arithmetic: dot(v, e) - dot(mean, e).
    The constant term folds; the variable term is a codegen'd
    multiply-add chain."""
    const = sum(m * w for m, w in zip(mean, comp))
    terms = " + ".join(
        f"CAST(element_at({vec_col}, {i + 1}) AS DOUBLE) * {w!r}"
        for i, w in enumerate(comp)
    )
    return F.expr(f"({terms}) - ({const!r})")


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Append `out_col`: array<double> of length model["k"] — the
    centered projection onto the principal components. Pure column
    expressions; zero shuffle, zero Python on the data path."""
    proj = F.array(
        *[_proj_expr(vec_col, model["mean"], c) for c in model["components"]]
    )
    return df.withColumn(out_col, proj)


def pca_fit_project(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    out_col: str = "proj",
) -> DataFrame:
    model = pca_fit(df, vec_col, k)
    return pca_project(df, model, vec_col, out_col)
