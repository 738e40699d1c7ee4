"""PCA fit/project contracts (operators/projection.py): agreement with
a driver-side numpy reference, orthonormality, variance ordering,
partition invariance, and the zero-shuffle apply plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dod_etl_spark.operators.projection import pca_fit, pca_fit_project, pca_project


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(11)
    # Anisotropic cloud: variance concentrated in a few directions.
    basis = rng.normal(size=(6, 6))
    scales = np.array([5.0, 3.0, 1.0, 0.3, 0.1, 0.05])
    data = rng.normal(size=(300, 6)) * scales @ basis
    rows = [(int(i), [float(x) for x in row]) for i, row in enumerate(data)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    return df, data


def _np_pca(data, k):
    mean = data.mean(axis=0)
    cov = np.cov(data.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for c in order:
        e = evecs[:, c]
        if e[np.argmax(np.abs(e))] < 0:
            e = -e
        comps.append(e)
    return mean, np.array(comps), evals[order]


def test_pca_fit_matches_numpy(spark, vecs):
    df, data = vecs
    model = pca_fit(df, k=3)
    mean, comps, evals = _np_pca(data, 3)
    assert np.allclose(model["mean"], mean, atol=1e-8)
    assert np.allclose(model["components"], comps, atol=1e-6)
    assert np.allclose(model["explained_var"], evals, rtol=1e-6)


def test_pca_variance_ordering_and_orthonormal(spark, vecs):
    df, _ = vecs
    model = pca_fit(df, k=4)
    ev = model["explained_var"]
    assert all(a >= b for a, b in zip(ev, ev[1:]))
    C = np.array(model["components"])
    assert np.allclose(C @ C.T, np.eye(4), atol=1e-8)


def test_pca_projection_values(spark, vecs):
    df, data = vecs
    model = pca_fit(df, k=2)
    out = {
        r["vec_id"]: r["proj"]
        for r in pca_project(df, model).select("vec_id", "proj").collect()
    }
    mean, comps, _ = _np_pca(data, 2)
    expect = (data - mean) @ comps.T
    got = np.array([out[i] for i in range(len(data))])
    assert np.allclose(got, expect, atol=1e-6)


def test_pca_partition_invariance(spark, vecs):
    df, _ = vecs
    a = pca_fit(df.repartition(3), k=2)
    b = pca_fit(df.repartition(17), k=2)
    assert np.allclose(a["mean"], b["mean"], atol=1e-9)
    assert np.allclose(a["components"], b["components"], atol=1e-7)


def test_pca_apply_is_zero_shuffle(spark, vecs):
    df, _ = vecs
    model = pca_fit(df, k=2)
    plan = (
        pca_project(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "pythonUDF" not in plan.lower(), plan


def test_pca_projection_compresses_for_knn(spark, vecs):
    """Top-2 projection preserves >80% of total variance on the
    anisotropic cloud — the property that makes projected ANN screens
    meaningful."""
    df, data = vecs
    model = pca_fit(df, k=2)
    total = np.cov(data.T, bias=True).trace()
    assert sum(model["explained_var"]) / total > 0.8


def test_pca_fit_project_roundtrip(spark, vecs):
    df, _ = vecs
    out = pca_fit_project(df, k=2)
    assert out.schema["proj"].dataType.simpleString() == "array<double>"
    assert out.count() == 300
    first = out.select(F.size("proj").alias("s")).first()
    assert first["s"] == 2


def test_pca_empty_and_tiny_frames(spark):
    empty = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<DOUBLE>")
    with pytest.raises(ValueError):
        pca_fit(empty)
    one = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id LONG, embedding ARRAY<DOUBLE>")
    with pytest.raises(ValueError):
        pca_fit(one)
