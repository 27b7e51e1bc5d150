"""Distributed linear algebra over embedding columns — PCA via
tree-aggregated second-moment statistics.

The canonical tall-skinny pattern (n rows ≫ d dims, here d = 64):
- one distributed pass computes per-Arrow-batch partials
  (count, Σv, Σ v·vᵀ) — each partial is a single tiny row (d² doubles ≈
  32 KB), so the driver collects #batches rows, never the data;
- the driver sums partials, forms the covariance, and runs a d×d
  eigendecomposition (microseconds at d=64 — this is NOT a distributed
  bottleneck, exactly how Spark MLlib's PCA splits the work);
- projection broadcasts the (d×k) component matrix into one pandas UDF
  doing a single matrix multiply per batch — one Arrow pass, no
  per-component expression chain (interpreted HOF dot products would
  re-walk the array k times).

Sign convention: each component is flipped so its largest-magnitude
coordinate is positive — eigenvectors are sign-ambiguous and a pinned
convention keeps results reproducible across runs and libraries.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _partial_moments(vec_col: str):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(m)],
                    "s": [m.sum(axis=0).tolist()],
                    "g": [(m.T @ m).ravel().tolist()],
                }
            )

    return fn


def pca_fit(df: DataFrame, vec_col: str, k: int) -> dict:
    """Fit PCA; returns {mean, components (k×d), explained_var (k),
    total_var} as numpy arrays. One distributed pass + an O(d³) driver
    step."""
    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("g", T.ArrayType(T.DoubleType())),
        ]
    )
    parts = df.select(vec_col).mapInPandas(_partial_moments(vec_col), schema).collect()
    if not parts:
        raise ValueError("pca_fit on an empty frame")
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    d = len(s)
    g = np.sum([np.asarray(p["g"]).reshape(d, d) for p in parts], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    # pinned sign: largest-|coordinate| entry of each component positive
    for j in range(comps.shape[0]):
        i = np.argmax(np.abs(comps[j]))
        if comps[j, i] < 0:
            comps[j] = -comps[j]
    return {
        "mean": mean,
        "components": comps,
        "explained_var": np.maximum(evals[order], 0.0),
        "total_var": float(np.maximum(evals, 0.0).sum()),
    }


def pca_project(
    df: DataFrame, vec_col: str, model: dict, out_col: str = "pca"
) -> DataFrame:
    """Attach the k-dim projection (v − mean) · componentsᵀ as
    array<double> — one Arrow-batched matrix multiply."""
    mean = model["mean"].copy()
    comps = model["components"].copy()

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _proj(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            m = np.stack(s.to_numpy()).astype(np.float64)
            out = (m - mean) @ comps.T
            yield pd.Series(list(out))

    return df.withColumn(out_col, _proj(F.col(vec_col)))
