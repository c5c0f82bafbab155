"""Mergeable t-digest quantile sketch (Dunning & Ertl, arXiv:1902.04023)
as a Spark composition: per-partition partial digests via mapInPandas,
then a single merge + interpolated quantile read-out.

Why not just approx_percentile: Spark's built-in (a15) answers the same
question, but the POINT here is the mergeable-sketch *pattern* — the
shape every distributed sketch (t-digest, KLL, HLL, theta) runs at
100 TB: a bounded-size partial per partition, an associative merge, and
a tiny final state — so percentiles over a petabyte cost one narrow
shuffle of ~(centroids × partitions) rows, never a sort of the data.

Determinism: centroid construction consumes values in sorted order and
the scale-function cut rule has no RNG, so the digest is a pure
function of the multiset per partition and of the partition layout;
tests pin rank-error bounds (|est_rank - true_rank| ≤ eps), not exact
values, since the layout is an execution detail.

The scale function is the canonical k1(q) = (δ/2π)·asin(2q−1):
centroids near the median absorb ~4/δ of the mass, tail centroids
stay near-singleton — that asymmetry is what makes t-digest's extreme
quantiles (p99.9) accurate where equi-depth histograms smear them.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CENTROID_SCHEMA = "mean double, weight double"


def _k1(q: float, delta: float) -> float:
    q = min(1.0, max(0.0, q))
    return delta / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)


def _compress(means: np.ndarray, weights: np.ndarray, delta: float):
    """One merge pass over (mean-sorted) weighted points — the
    merging-digest algorithm: extend the current centroid while the
    k1-scale span stays ≤ 1, else cut."""
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    acc_m, acc_w, seen = 0.0, 0.0, 0.0
    k_lo = _k1(0.0, delta)
    for m, w in zip(means, weights):
        q_hi = (seen + acc_w + w) / total
        if acc_w > 0.0 and _k1(q_hi, delta) - k_lo > 1.0:
            out_m.append(acc_m / acc_w)
            out_w.append(acc_w)
            seen += acc_w
            acc_m, acc_w = 0.0, 0.0
            k_lo = _k1(seen / total, delta)
        acc_m += m * w
        acc_w += w
    if acc_w > 0.0:
        out_m.append(acc_m / acc_w)
        out_w.append(acc_w)
    return np.asarray(out_m), np.asarray(out_w)


def partial_digests(df: DataFrame, col: str, delta: int = 100) -> DataFrame:
    """(mean, weight) centroid rows, ≤ ~δ per input partition."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vals = []
        for pdf in batches:
            v = pdf[col].to_numpy(dtype=np.float64)
            vals.append(v[~np.isnan(v)])
        if not vals:
            return
        v = np.sort(np.concatenate(vals))
        if v.size == 0:
            return
        m, w = _compress(v, np.ones_like(v), float(delta))
        yield pd.DataFrame({"mean": m, "weight": w})

    return df.select(F.col(col).alias(col)).mapInPandas(build, _CENTROID_SCHEMA)


def merge_quantiles(
    partials: DataFrame, quantiles: list[float], delta: int = 100
) -> DataFrame:
    """Merge all partial digests and read out interpolated quantiles.

    The merge input is tiny (≤ δ rows per upstream partition), so a
    single-group applyInPandas is the right physical shape — the same
    reduction any sketch union uses. Returns (q, est, n_centroids).
    """
    qs = sorted(quantiles)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["mean"].to_numpy(), kind="stable")
        m = pdf["mean"].to_numpy()[order]
        w = pdf["weight"].to_numpy()[order]
        m, w = _compress(m, w, float(delta))
        total = w.sum()
        # centroid midpoints in cumulative-rank space
        cum = np.cumsum(w) - w / 2.0
        ranks = np.asarray(qs) * total
        est = np.interp(ranks, cum, m, left=m[0], right=m[-1])
        return pd.DataFrame(
            {"q": qs, "est": est, "n_centroids": int(len(m))}
        )

    return (
        partials.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            lambda pdf: merge(pdf.drop(columns=["g"])),
            "q double, est double, n_centroids int",
        )
    )


def tdigest_quantiles(
    df: DataFrame, col: str, quantiles: list[float], delta: int = 100
) -> DataFrame:
    return merge_quantiles(partial_digests(df, col, delta), quantiles, delta)
