"""Distributed PCA (operators/linalg.py) vs a single-machine numpy
reference, plus the spectral invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from multi_task_offensive_language_detection_spark.operators import linalg


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(17)
    # anisotropic cloud: variance concentrated in a few directions
    basis = rng.standard_normal((8, 8))
    scales = np.array([10, 6, 3, 1, 0.5, 0.2, 0.1, 0.05])
    x = rng.standard_normal((400, 8)) * scales @ basis
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(7)  # several partitions → several partials
    return x, df


def test_pca_matches_numpy_reference(data, spark):
    x, df = data
    k = 3
    model = linalg.pca_fit(df, "embedding", k)
    # reference: numpy eigh on the exact covariance
    mean = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    ref = evecs[:, order].T
    for j in range(k):
        i = np.argmax(np.abs(ref[j]))
        if ref[j, i] < 0:
            ref[j] = -ref[j]
    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["components"], ref, atol=1e-8)
    assert np.allclose(model["explained_var"], np.sort(evals)[::-1][:k], atol=1e-9)


def test_pca_projection_variance_equals_eigenvalues(data, spark):
    x, df = data
    model = linalg.pca_fit(df, "embedding", 3)
    proj = np.stack(
        [
            r["pca"]
            for r in linalg.pca_project(df, "embedding", model)
            .orderBy("vec_id")
            .collect()
        ]
    )
    # per-axis variance of the projections = the eigenvalues; axes uncorrelated
    got_var = proj.var(axis=0)
    assert np.allclose(got_var, model["explained_var"], atol=1e-8)
    c = np.cov(proj.T, bias=True)
    off = c - np.diag(np.diag(c))
    assert np.abs(off).max() < 1e-8
    # components orthonormal
    cc = model["components"] @ model["components"].T
    assert np.allclose(cc, np.eye(3), atol=1e-10)


def test_pca_empty_frame_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        linalg.pca_fit(df, "embedding", 2)


def test_pca_fixture_matches_independent_numpy(spark):
    """Drift guard for the pinned oracle backing embedding_pca_project
    (tools/build_pinned_oracles.py): the committed pc0..pc3 columns must
    equal a from-scratch numpy PCA (full-matrix covariance + eigh + the
    pinned sign convention — no engine code) of the sf0.001 embeddings,
    within the fixture's 1e-4 rounding. Fails after any PCA kernel
    change: regenerate via `python tools/build_pinned_oracles.py`."""
    import os

    import pandas as pd

    sf = "/root/testdata/sf0.001"
    fx_path = os.path.join(
        os.path.dirname(__file__), "fixtures", "data", "pca_projections.parquet"
    )
    if not os.path.isdir(sf):
        pytest.skip("testdata not present")
    emb = pd.read_parquet(os.path.join(sf, "embeddings.parquet"))
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    sig = int(
        (emb["vec_id"] * np.floor(x[:, 0] * 1000).astype(np.int64)).sum()
    )
    fx = pd.read_parquet(fx_path)
    fx = fx[fx["corpus_sig"] == sig].sort_values("vec_id").reset_index(drop=True)
    assert len(fx) == len(emb), "fixture slice missing for sf0.001"
    mean = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    comps = evecs[:, order].T
    for j in range(4):
        i = np.argmax(np.abs(comps[j]))
        if comps[j, i] < 0:
            comps[j] = -comps[j]
    ref = (x[np.argsort(emb["vec_id"].to_numpy())] - mean) @ comps.T
    got = fx[["pc0", "pc1", "pc2", "pc3"]].to_numpy()
    assert np.allclose(got, ref, atol=2e-4)


def test_partial_moments_one_row_per_partition(data, spark):
    """The distributed pass must emit ≤1 partial per PARTITION (not per
    Arrow batch) — the 100 TB driver-safety property, now enforced even
    when maxRecordsPerBatch forces many batches per partition."""
    x, df = data
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("n", T.LongType()),
                T.StructField("s", T.ArrayType(T.DoubleType())),
                T.StructField("g", T.ArrayType(T.DoubleType())),
            ]
        )
        parts = (
            df.select("embedding")
            .mapInPandas(linalg._partial_moments("embedding"), schema)
            .collect()
        )
        assert len(parts) <= df.rdd.getNumPartitions()
        assert sum(p["n"] for p in parts) == len(x)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
