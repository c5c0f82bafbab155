"""Distributed PCA via partition-wise Gram accumulation — the classic
big-data shape for low-dimensional embeddings: each partition reduces
its rows to one (count, sum-vector, X^T X Gram) partial, the partials
merge associatively, and the tiny d×d eigenproblem solves on the
driver (d=64 here: a 32 KB matrix — O(d³) ≈ 260k flops, nothing).

This is how Spark MLlib's RowMatrix.computePrincipalComponents works
internally (treeAggregate of Gram partials); re-built here on
mapInPandas so the mechanics are explicit and testable. At 100 TB the
data pass is map-only + one 4096-double-per-partition reduce — no
shuffle of the vectors themselves, ever.

Determinism note: partial sums merge in partition order, so the last
ulp of the covariance can differ across partition layouts. Results are
therefore rows-only for the driver's oracle; property tests pin the
eigen-spectrum against an exact single-machine numpy reference within
1e-8 relative.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_partials(df: DataFrame, col: str, d: int) -> DataFrame:
    """One row per partition: (n, sum[d], gram[d*d]) — the sufficient
    statistics for mean and covariance."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(d)
        g = np.zeros((d, d))
        for pdf in batches:
            if pdf.empty:  # mapInPandas can deliver empty Arrow batches
                continue
            x = np.vstack(pdf[col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return df.select(col).mapInPandas(
        build, f"n long, s array<double>, g array<double>"
    )


def covariance(partials: list, d: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Merge partial rows → (mean, covariance, n)."""
    n = sum(p["n"] for p in partials)
    s = np.sum([np.asarray(p["s"]) for p in partials], axis=0)
    g = np.sum([np.asarray(p["g"]).reshape(d, d) for p in partials], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return mean, cov, n


def pca_spectrum(df: DataFrame, col: str, d: int, k: int):
    """Top-k (eigenvalue, explained-variance-ratio, eigenvector) of the
    covariance. Eigenvector signs normalized so the largest-magnitude
    component is positive (eigh's sign is otherwise arbitrary)."""
    rows = [r.asDict() for r in gram_partials(df, col, d).collect()]
    mean, cov, n = covariance(rows, d)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    vals_k = vals[order]
    vecs_k = vecs[:, order]
    for j in range(vecs_k.shape[1]):
        i = int(np.argmax(np.abs(vecs_k[:, j])))
        if vecs_k[i, j] < 0:
            vecs_k[:, j] = -vecs_k[:, j]
    total = float(vals.sum())
    return vals_k, vals_k / total, vecs_k, n
