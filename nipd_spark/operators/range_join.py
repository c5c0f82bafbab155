"""Bucketed range join (SURVEY.md §2.3 J8, §4.3).

Point-in-interval joins (variant pos ∈ [region.start, region.end] — BED
intersect [PK]) have no native equi path in Spark: a raw non-equi join
plans as BroadcastNestedLoopJoin, O(n·m). This operator turns it into a
hash join:

  1. points get ``bucket = floor(point / width)``
  2. intervals explode to every bucket they span
     (``sequence(floor(lo/w), floor(hi/w))``)
  3. equi-join on bucket (+ any extra equi keys, e.g. chrom)
  4. residual filter ``lo <= point < hi`` (or closed bounds)

Scale notes (100 TB): shuffle is equi-keyed on bucket → ordinary hash
join with AQE skew handling; width should be ≈ median interval length
so intervals explode to O(1) buckets. A point matching k intervals is
emitted k times (same as the naive join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    width: float,
    extra_keys: list[str] | None = None,
    closed_hi: bool = False,
) -> DataFrame:
    """Join each point row to every interval row with lo <= point < hi
    (or <= hi when closed_hi). Columns from both sides are kept."""
    extra_keys = extra_keys or []
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / width))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / width), F.floor(F.col(hi_col) / width)
            )
        ),
    )
    hi_pred: Column = (
        F.col(point_col) <= F.col(hi_col)
        if closed_hi
        else F.col(point_col) < F.col(hi_col)
    )
    joined = p.join(iv, ["__bucket", *extra_keys], "inner")
    return joined.filter((F.col(point_col) >= F.col(lo_col)) & hi_pred).drop(
        "__bucket"
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    width: float,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Interval-INTERVAL overlap join (closed bounds: overlap iff
    a.lo <= b.hi AND b.lo <= a.hi) — BED intersect over two region sets,
    where bucketed_range_join above handles point-in-region.

    Both sides explode to every bucket they span and equi-join on
    bucket (+ extra keys). A pair overlapping k shared buckets would be
    emitted k times; instead of a distinct shuffle, each pair is
    emitted ONLY in its owner bucket — the one containing
    max(a.lo, b.lo), which every overlapping pair has exactly one of
    (the overlap's left edge lies in both intervals, hence in both
    sides' bucket ranges). Dedup is therefore a free residual filter.

    Scale notes (100 TB): equi-keyed shuffle on (bucket, keys) → hash
    join with AQE skew splitting; width ≈ median interval length keeps
    the explode factor O(1) per row. Output volume equals the true
    overlap count — same as the naive O(n·m) join, without the BNLJ.
    """
    extra_keys = extra_keys or []
    lx = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(left_lo) / width), F.floor(F.col(left_hi) / width)
            )
        ),
    )
    rx = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / width),
                F.floor(F.col(right_hi) / width),
            )
        ),
    )
    owner = F.floor(F.greatest(F.col(left_lo), F.col(right_lo)) / width)
    return (
        lx.join(rx, ["__bucket", *extra_keys], "inner")
        .filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
            & (F.col("__bucket") == owner)
        )
        .drop("__bucket")
    )
