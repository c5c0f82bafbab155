"""Incremental view maintenance for grouped aggregates
(SURVEY.md §2.1 S6 / §2.8 T-family composition; classic IVM for
self-maintainable aggregates — Gupta & Mumick, "Maintenance of
Materialized Views", IEEE Data Eng. Bull. 18(2), 1995).

Given a materialized ``GROUP BY keys → count + sums`` state and a
row-level changelog in CDF vocabulary (operators/snapshots.table_diff:
insert / delete / update_preimage / update_postimage), the new state is
computed WITHOUT touching the base table: each changelog row carries a
±1 sign (post-images add, pre-images/deletes subtract), the signed
changes aggregate to one delta row per touched key, and the delta
merges into the state (operators/merge.py). Groups whose count reaches
zero are dropped — count and SUM over exact (integer/decimal) types are
self-maintainable under deletion; float sums are NOT (removal cannot
un-round), so callers quantize to integer units first (see
s24_incremental_agg: cents).

Scale notes (100 TB): cost is O(|changes| + |touched groups|), never
O(base table) — the whole point. One shuffle on the group keys for the
delta agg, then the merge's equi-joins on the same keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nipd_spark.operators.merge import merge_into


def incremental_group_agg(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n",
) -> DataFrame:
    """Apply a CDF changelog to a grouped count+sums state.

    state: columns = keys + [count_col] + sum_cols.keys().
    changes: columns = keys + sum_cols.values() + _change_type.
    sum_cols: state sum column -> changelog value column (exact types —
    integers/decimals; see module doc for why not floats).
    Returns the new state (groups with zero count removed).
    """
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = changes.groupBy(*keys).agg(
        F.sum(sign).alias(count_col),
        *[
            F.sum(sign * F.col(src)).alias(out)
            for out, src in sum_cols.items()
        ],
    )
    matched = {
        count_col: F.col(f"t.{count_col}") + F.col(f"s.{count_col}"),
        **{
            out: F.col(f"t.{out}") + F.col(f"s.{out}")
            for out in sum_cols
        },
    }
    inserted = {
        **{k: F.col(f"s.{k}") for k in keys},
        count_col: F.col(f"s.{count_col}"),
        **{out: F.col(f"s.{out}") for out in sum_cols},
    }
    new = merge_into(
        state,
        delta,
        on=keys,
        when_matched=matched,
        when_not_matched=inserted,
    )
    return new.filter(F.col(count_col) > 0)
