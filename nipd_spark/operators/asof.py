"""As-of join (SURVEY.md §2.3 J9, §4.3): each left row matches the
latest right row with right_ts <= left_ts (per key).

pandas ``merge_asof`` analogue [PK]; Spark SQL 4.1 has no ASOF JOIN, so
this is the union-and-window algorithm:

  1. tag right rows side=0, left rows side=1; union by a common layout
  2. window per key ordered by (ts, side, right-tiebreak):
     ``last(right_payload, ignorenulls)`` over unbounded-preceding..current
     — at equal ts the right row sorts first, giving <= semantics
  3. keep left rows; the carried payload is the as-of match

Scale notes (100 TB): one shuffle on the key + in-partition sort —
identical cost profile to any window op; no ordered merge ever
materializes pairs. For bounded as-of (within Δ), add a residual filter
on the gap; for huge partitions pre-bucket by (key, coarse time) as in
range_join and stitch bucket boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join. Result = all left columns + right_payload columns
    (null when no right row matches). ``tiebreak`` orders equal-ts right
    rows; pass a unique right column for determinism. ``key`` may be a
    list for composite match keys (the window partitions on all of
    them — same one-shuffle cost, the shuffle key just widens).

    NULL discipline: the window groups NULL keys together and orders
    NULL ts first/last, so NULL keys/timestamps can carry matches here
    — SQL ASOF engines (DuckDB/Snowflake) treat NULL ordering or equi
    keys as never-matching. Callers exposing SQL semantics must filter
    NULL right (key, ts) rows and null out matches for NULL left rows
    (see sqlext.asof_sql).

    ``direction``: "backward" (default) carries the LATEST right row with
    right_ts <= left_ts via last(ignorenulls) over
    unbounded-preceding..current (equal-ts right rows sort before the
    left row; last one wins). "forward" mirrors it — the EARLIEST right
    row with right_ts >= left_ts via first(ignorenulls) over
    current..unbounded-following (equal-ts right rows sort after the
    left row, __tb DESCENDING, so first one wins). Tie semantics are
    therefore direction-invariant: among equal-ts right rows the
    LARGEST tiebreak wins in both directions — switching direction
    never silently changes the tie rule. Same one-shuffle one-sort
    cost profile either way.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    back = direction == "backward"
    keys = [key] if isinstance(key, str) else list(key)
    kcols = [f"__k{i}" for i in range(len(keys))]
    payload = F.struct(*[F.col(c) for c in right_payload])
    r = right.select(
        *[F.col(k).alias(kc) for k, kc in zip(keys, kcols)],
        F.col(right_ts).alias("__ts"),
        F.lit(0 if back else 1).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
        payload.alias("__payload"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
    )
    l = left.select(
        *[F.col(k).alias(kc) for k, kc in zip(keys, kcols)],
        F.col(left_ts).alias("__ts"),
        F.lit(1 if back else 0).alias("__side"),
        F.lit(0).alias("__tb"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *left.columns,
    )
    frame = (
        (Window.unboundedPreceding, 0) if back else (0, Window.unboundedFollowing)
    )
    tb_order = F.col("__tb").asc() if back else F.col("__tb").desc()
    w = (
        Window.partitionBy(*kcols)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), tb_order)
        .rowsBetween(*frame)
    )
    carry = (
        F.last("__payload", ignorenulls=True)
        if back
        else F.first("__payload", ignorenulls=True)
    )
    carried = l.unionByName(r).withColumn("__match", carry.over(w))
    out = carried.filter(F.col("__side") == (1 if back else 0)).select(
        *left.columns,
        *[F.col(f"__match.{c}").alias(c) for c in right_payload],
    )
    return out
