"""Vector math over ArrayType(FloatType) embedding columns (SURVEY.md §2.9).

All expressions are JVM-side higher-order functions (zip_with /
aggregate / transform) — no Python UDFs in the hot path. Accumulation is
sequential left-to-right in double precision, which is bit-identical to
DuckDB's list_transform+list_sum (verified), so oracle twins need no
rounding on these values.

Scale notes (100 TB): dot/norm are narrow per-row ops inside whole-stage
codegen; the brute-force pair scan is O(n²) and exists as the
correctness anchor — the scale path is LSH bucketing (operators/lsh.py)
with exact re-rank on candidates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    """Σ aᵢ² in double precision."""
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from a precomputed-norm join — avoids recomputing norms per
    pair in the O(n²) scan."""
    return dot(a, b) / (norm_a * norm_b)


# DuckDB twins of the same expressions (same sequential double math).
def duck_sq_norm(col: str) -> str:
    return f"list_sum(list_transform({col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"


def duck_dot(a: str, b: str, dims: int = 64) -> str:
    return (
        f"list_sum(list_transform(range(1, {dims + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )
