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

    "nearest" (pandas ``merge_asof(direction='nearest')`` [PK]) carries
    whichever of the backward and forward candidates minimizes the
    absolute timestamp gap; an exact gap tie prefers the BACKWARD
    candidate (pandas' rule), and within each direction the usual
    largest-tiebreak rule applies at equal right ts. Implemented as
    the backward pass composed with the forward pass (each leg's
    payload internally renamed) plus a per-row argmin projection —
    two key-shuffles + two in-partition sorts, still never a pair
    blowup. Gap comparison is exact: integer µs for timestamp keys
    (unix_micros), native arithmetic for numeric keys. Requires an
    orderable-with-subtraction ts type (timestamp or numeric).
    """
    if direction == "nearest":
        return _asof_nearest(
            left, right, key, left_ts, right_ts, right_payload, tiebreak
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}"
        )
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


def _ts_num(col_name: str, df: DataFrame):
    """A subtraction-safe numeric image of a timestamp/numeric column
    (exact integer µs for timestamps; identity for numerics)."""
    from pyspark.sql.types import DateType, TimestampType

    dt = df.schema[col_name].dataType
    if isinstance(dt, TimestampType):
        return F.unix_micros(F.col(col_name))
    if isinstance(dt, DateType):
        return F.unix_date(F.col(col_name))
    return F.col(col_name)


def _ts_class(dt) -> str:
    """Comparison class of an ordering column's type: 'timestamp',
    'date', or 'numeric' — the three families _ts_num maps to distinct
    numeric scales (µs, days, identity)."""
    from pyspark.sql.types import DateType, NumericType, TimestampType

    if isinstance(dt, TimestampType):
        return "timestamp"
    if isinstance(dt, DateType):
        return "date"
    if isinstance(dt, NumericType):
        return "numeric"
    raise ValueError(
        f"asof nearest: ordering column type {dt.simpleString()} is not "
        "a timestamp, date, or numeric type"
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str | None,
) -> DataFrame:
    """nearest = argmin(|gap|) over the backward and forward as-of
    candidates; exact ties prefer backward (pandas merge_asof rule).
    The forward pass runs on the backward pass's OUTPUT (which keeps
    every left row and only appends columns), so no row-id join-back
    is ever needed — two key-shuffles, zero extra joins."""
    keys = [key] if isinstance(key, str) else list(key)
    # The gap arithmetic below maps each side's ts through ITS OWN
    # type's numeric image — a timestamp-vs-date (or numeric-vs-
    # temporal) pair would silently compare microseconds against days
    # and pick the wrong nearest candidate. Same-class or loud error
    # (r11 ADVICE).
    lcls = _ts_class(left.schema[left_ts].dataType)
    rcls = _ts_class(right.schema[right_ts].dataType)
    if lcls != rcls:
        raise ValueError(
            "asof nearest: left and right ordering columns must be the "
            f"same comparison class, got {left_ts}={lcls} vs "
            f"{right_ts}={rcls}"
        )
    # each leg's payload (plus the right ts for the gap) renamed so the
    # two carries never collide, even when right_payload includes the
    # ts/key columns themselves
    aug = list(dict.fromkeys([*right_payload, right_ts]))
    sel: dict[str, object] = {k: F.col(k) for k in keys}
    sel[right_ts] = F.col(right_ts)
    if tiebreak:
        sel[tiebreak] = F.col(tiebreak)
    b_names = {c: f"__nb_{i}" for i, c in enumerate(aug)}
    f_names = {c: f"__nf_{i}" for i, c in enumerate(aug)}
    rb = right.select(
        *sel.values(), *[F.col(c).alias(b_names[c]) for c in aug]
    )
    rf = right.select(
        *sel.values(), *[F.col(c).alias(f_names[c]) for c in aug]
    )
    bwd = asof_join(
        left, rb, keys, left_ts, right_ts,
        [b_names[c] for c in aug], tiebreak, "backward",
    )
    both = asof_join(
        bwd, rf, keys, left_ts, right_ts,
        [f_names[c] for c in aug], tiebreak, "forward",
    )
    lts = _ts_num(left_ts, left)
    # gaps over the carried right ts columns (same type as left_ts)
    def _num(name: str):
        from pyspark.sql.types import DateType, TimestampType

        dt = right.schema[right_ts].dataType
        if isinstance(dt, TimestampType):
            return F.unix_micros(F.col(name))
        if isinstance(dt, DateType):
            return F.unix_date(F.col(name))
        return F.col(name)

    gap_b = lts - _num(b_names[right_ts])
    gap_f = _num(f_names[right_ts]) - lts
    use_b = F.col(f_names[right_ts]).isNull() | (
        F.col(b_names[right_ts]).isNotNull() & (gap_b <= gap_f)
    )
    return both.select(
        *left.columns,
        *[
            F.when(use_b, F.col(b_names[c]))
            .otherwise(F.col(f_names[c]))
            .alias(c)
            for c in right_payload
        ],
    )
