"""Distributed linear algebra over embedding columns — PCA via
tree-aggregated second-moment statistics.

The canonical tall-skinny pattern (n rows ≫ d dims, here d = 64):
- one distributed pass computes per-PARTITION partials (count, Σv,
  Σ v·vᵀ) — accumulated across the Arrow-batch iterator, one tiny row
  (d² doubles ≈ 32 KB) per partition — which a Spark-side element-wise
  sum reduces to a single flat vector, so the driver collects 1+d+d²
  scalars regardless of row count or partition count;
- the driver forms the covariance from that vector and runs a d×d
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


def embeddings_sig_agg(vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact-integer content signature of an embeddings table —
    sum(vec_id * floor(embedding[0] * 1000)) — shared by the
    embedding_pca_project driver check and its pinned-fixture builder
    (tools/build_pinned_oracles.py). Row counts collide across testdata
    scale factors, so the signature is content-based; float32 * 1000 in
    double then floor is exact in both Spark and DuckDB (the DuckDB
    mirror indexes embedding[1], lists being 1-based there)."""
    return (
        F.sum(
            F.col(id_col)
            * F.floor(F.col(vec_col).getItem(0).cast("double") * 1000).cast("long")
        )
        .cast("long")
    )


def _partial_moments(vec_col: str):
    """ONE partial row per PARTITION (not per Arrow batch): the (n, Σv,
    Σvvᵀ) accumulators fold across the iterator, so a 10^12-row table at
    10k-row batches still yields only #partitions rows downstream."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = g = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += len(m)
            if s is None:
                s = m.sum(axis=0)
                g = m.T @ m
            else:
                s += m.sum(axis=0)
                g += m.T @ m
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
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
    parts = df.select(vec_col).mapInPandas(_partial_moments(vec_col), schema)
    # Spark-side reduce BEFORE any collect: pack each partition's partial
    # into one flat vector [n, Σv, Σvvᵀ] and sum element-wise via
    # posexplode+groupBy — a shuffle of #partitions × (1+d+d²) scalars,
    # then the driver collects 1+d+d² tiny (pos, val) rows total. n rides
    # as a double (exact below 2^53 rows).
    summed = (
        parts.select(
            F.posexplode(
                F.concat(F.array(F.col("n").cast("double")), "s", "g")
            ).alias("pos", "val")
        )
        .groupBy("pos")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    if not summed:
        raise ValueError("pca_fit on an empty frame")
    flat = np.empty(len(summed))
    for r in summed:
        flat[r["pos"]] = r["val"]
    d = int(round((-1 + (4 * len(flat) - 3) ** 0.5) / 2))  # len = 1+d+d²
    n = int(round(flat[0]))
    s = flat[1 : 1 + d]
    g = flat[1 + d :].reshape(d, d)
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
