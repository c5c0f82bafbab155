"""Distributed global ranks / running sums — no single-partition window
(SURVEY.md §4.3; the two-pass histogram-rank technique behind w18).

``Window.orderBy(...)`` with no partition spec funnels every row into
one task ("Moving all data to a single partition") — fine at test SF,
a straight-line bottleneck and OOM risk at 100 TB. These helpers
compute the same total-order quantities with only key-group shuffles:

  1. bucket each row by a deterministic equi-width histogram over the
     numeric major key (bucket index monotone in the requested order,
     so bucket boundaries respect the global order by construction;
     rows with equal keys always share a bucket);
  2. a bucket-PARTITIONED window gives local ranks / local prefix sums;
  3. per-bucket totals (B rows) triangle-join into global offsets and
     broadcast back.

Determinism: boundaries derive from min/max (one cheap agg), not
sampling, so the result is a pure function of the data. Skewed keys
degrade bucket balance, never correctness; recursive splitting or more
buckets is the remedy. All-equal keys degenerate to one bucket — the
same cost as the global window, no worse.

The major key must be numeric (int/long/double/date-as-long); callers
order by (key asc|desc, *tiebreaks asc) — the same contract as the
Window they replace. NULL keys are routed explicitly to a dedicated
extreme bucket matching Spark's Window NULL ordering (asc → NULLS
FIRST → bucket -1; desc → NULLS LAST → bucket n_buckets), so the
result stays bit-identical to the Window form on nullable keys —
F.least alone would silently rank NULLs last under asc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKET = "__rk_bucket"


def _with_bucket(
    df: DataFrame, key: str, ascending: bool, n_buckets: int
) -> DataFrame:
    rng = df.agg(F.min(key).alias("__lo"), F.max(key).alias("__hi"))
    asc_idx = F.when(
        F.col("__hi") <= F.col("__lo"), F.lit(0)
    ).otherwise(
        F.least(
            F.floor(
                (F.col(key) - F.col("__lo"))
                / ((F.col("__hi") - F.col("__lo")) / n_buckets)
            ).cast("int"),
            F.lit(n_buckets - 1),
        )
    )
    idx = asc_idx if ascending else (F.lit(n_buckets - 1) - asc_idx)
    # NULL keys: Window.orderBy(asc) puts NULLS FIRST, desc NULLS LAST —
    # route them to a dedicated extreme bucket so ranks match bit-for-bit
    # (min/max ignore NULLs, so __lo/__hi stay correct for the rest).
    null_bucket = F.lit(-1) if ascending else F.lit(n_buckets)
    idx = F.when(F.col(key).isNull(), null_bucket).otherwise(idx)
    return (
        df.join(F.broadcast(rng))
        .withColumn(BUCKET, idx)
        .drop("__lo", "__hi")
    )


def _order(key: str, ascending: bool, tiebreaks: list[str]) -> list[Column]:
    head = F.col(key).asc() if ascending else F.col(key).desc()
    return [head] + [F.col(t).asc() for t in tiebreaks]


def _offsets(
    per_bucket: DataFrame,
    aggs: list[tuple],
) -> DataFrame:
    """Exclusive prefix over bucket index: for each (agg_fn, col, out)
    triple, out(b) = agg_fn(col) over buckets STRICTLY < b (NULL for
    the first bucket when the agg has no identity — callers coalesce).
    One B² triangle join on B rows — trivially broadcastable — shared
    by every requested aggregate, so N offset columns cost the same
    single non-equi join the plan lint already tolerates (one shape,
    one site, instead of hand-copied variants per aggregate)."""
    a = per_bucket.alias("ta")
    b = per_bucket.alias("tb")
    return (
        a.join(b, F.col(f"tb.{BUCKET}") < F.col(f"ta.{BUCKET}"), "left")
        .groupBy(F.col(f"ta.{BUCKET}").alias(BUCKET))
        .agg(*[fn(f"tb.{col}").alias(out) for fn, col, out in aggs])
    )


def _sum0(col: str) -> Column:
    """Sum with a 0 identity for the first bucket (left join no-match)."""
    return F.coalesce(F.sum(col), F.lit(0))


def with_global_rn(
    df: DataFrame,
    key: str,
    tiebreaks: list[str],
    ascending: bool = True,
    n_buckets: int = 64,
    out: str = "rn",
) -> DataFrame:
    """Append a global row_number over (key asc|desc, *tiebreaks asc) —
    identical to row_number().over(Window.orderBy(...)) but with no
    single-partition stage. Make (key, *tiebreaks) unique for a
    deterministic numbering, exactly as with the Window form."""
    b = _with_bucket(df, key, ascending, n_buckets)
    w_local = Window.partitionBy(BUCKET).orderBy(
        *_order(key, ascending, tiebreaks)
    )
    local = b.withColumn("__lrn", F.row_number().over(w_local))
    totals = b.groupBy(BUCKET).agg(F.count("*").alias("__cnt"))
    off = _offsets(totals, [(_sum0, "__cnt", "__offset")])
    return (
        local.join(F.broadcast(off), BUCKET)
        .withColumn(out, (F.col("__lrn") + F.col("__offset")).cast("int"))
        .drop(BUCKET, "__lrn", "__offset")
    )


def with_global_running_sum(
    df: DataFrame,
    key: str,
    tiebreaks: list[str],
    val: str | list[str],
    ascending: bool = True,
    n_buckets: int = 64,
    out: str | list[str] = "running",
) -> DataFrame:
    """Append global running sums of the ``val`` column(s) over the
    total order — identical to sum(v).over(Window.orderBy(...)
    .rowsBetween(unboundedPreceding, 0)) for each v, without the
    single-partition stage.

    Accepts one column or N (with matching ``out`` names). N columns
    run in ONE bucket pass: one local window computing N prefix sums,
    one per-bucket totals agg with N sum columns, one broadcast offset
    join. Chaining N single-column calls instead rebuilds the join
    output's whole lineage inside every later call's totals agg —
    the multi-map lesson CLAUDE.md records as measured 5× on
    fact-sized inputs; this signature makes the single-pass form the
    path of least resistance."""
    vals = [val] if isinstance(val, str) else list(val)
    outs = [out] if isinstance(out, str) else list(out)
    if len(vals) != len(outs):
        raise ValueError("with_global_running_sum: len(val) != len(out)")
    b = _with_bucket(df, key, ascending, n_buckets)
    w_local = Window.partitionBy(BUCKET).orderBy(
        *_order(key, ascending, tiebreaks)
    ).rowsBetween(Window.unboundedPreceding, 0)
    local = b.select(
        "*", *[F.sum(v).over(w_local).alias(f"__lsum{i}")
               for i, v in enumerate(vals)]
    )
    totals = b.groupBy(BUCKET).agg(
        *[F.sum(v).alias(f"__tot{i}") for i, v in enumerate(vals)]
    )
    # exclusive per-bucket offsets for every column in one triangle join
    off = _offsets(
        totals,
        [(_sum0, f"__tot{i}", f"__offset{i}") for i in range(len(vals))],
    )
    res = local.join(F.broadcast(off), BUCKET)
    for i, o in enumerate(outs):
        res = res.withColumn(
            o, F.col(f"__lsum{i}") + F.col(f"__offset{i}")
        )
    drop = [BUCKET] + [f"__lsum{i}" for i in range(len(vals))] + [
        f"__offset{i}" for i in range(len(vals))
    ]
    return res.drop(*drop)


def with_grouped_running_sum(
    df: DataFrame,
    group: str | list[str],
    key: str,
    tiebreaks: list[str],
    val: str | list[str],
    ascending: bool = True,
    n_buckets: int = 64,
    out: str | list[str] = "running",
    min_out: str | None = None,
) -> DataFrame:
    """Append PER-GROUP running sums of the ``val`` column(s) over
    (key asc|desc, *tiebreaks asc) — identical to sum(v).over(
    Window.partitionBy(group).orderBy(...).rowsBetween(
    unboundedPreceding, 0)) for each v, but with no per-group
    single-task funnel. N columns share ONE bucket pass (one local
    window, one totals agg, one offsets broadcast — the single-pass
    rule from the global form); ``min_out`` requires a single val.

    The partitioned-Window form caps parallelism at |distinct group|
    tasks over RAW rows — with a 3-5-value group key (l_returnflag,
    event_type) that is ~25% of a 100 TB table per task. Here each
    group gets its own equi-width value histogram (per-group min/max,
    one cheap agg), rows get a (group, bucket) partitioned local prefix
    sum, and per-(group, bucket) totals (|groups| × n_buckets rows)
    turn into exclusive offsets via a window over that TINY aggregated
    table — so parallelism is |groups| × n_buckets over the raw data.

    Exactness: bit-identical to the Window form whenever the sums are
    exactly representable (integer/long ``val``, or integer-valued
    doubles below 2^53 — the repo's quantization discipline). True
    floating-point ``val`` accumulates in bucket-segmented order, which
    can differ in the last bits from sequential accumulation; round on
    output as usual. NULL keys route to the extreme bucket matching
    Window NULL ordering (asc → NULLS FIRST, desc → NULLS LAST).

    The per-group range table is broadcast — one row per group, fine
    for the low-cardinality groups this exists for (a high-cardinality
    group key doesn't need this operator: the plain partitioned window
    is already parallel).

    ``min_out``: when set, additionally append the running MIN of the
    running sum (min_{j<=i} running_j, current row inclusive) — the
    quantity CUSUM-style detectors need (w20). Same decomposition:
    per-bucket local prefix-min of the local prefix sum, plus a
    prefix-min over the tiny per-bucket (offset + bucket-min) table.
    """
    from pyspark.sql.types import DoubleType, FloatType

    vals = [val] if isinstance(val, str) else list(val)
    outs = [out] if isinstance(out, str) else list(out)
    if len(vals) != len(outs):
        raise ValueError("with_grouped_running_sum: len(val) != len(out)")
    if min_out is not None and len(vals) != 1:
        raise ValueError("with_grouped_running_sum: min_out needs 1 val")
    groups = [group] if isinstance(group, str) else list(group)
    # Window.partitionBy treats NULL as a real group; plain equi-join
    # keys would silently drop NULL-group rows. Substitute a non-null
    # surrogate group key for the internal joins/windows instead. The
    # surrogate is prefix-tagged ("v" + value vs bare NUL for NULL) so
    # no real value can collide with the NULL sentinel, and float/double
    # groups are normalized with +0.0 first: groupBy/partitionBy fold
    # -0.0 and 0.0 into ONE partition, while their string forms differ —
    # stringifying unnormalized would split that group in two.
    gcols = []
    df2 = df
    for i, g in enumerate(groups):
        gc = f"__rk_g{i}"
        gcol = F.col(g)
        if isinstance(df2.schema[g].dataType, (FloatType, DoubleType)):
            gcol = gcol + F.lit(0.0)
        df2 = df2.withColumn(
            gc,
            F.when(F.col(g).isNull(), F.lit("\x00")).otherwise(
                F.concat(F.lit("v"), gcol.cast("string"))
            ),
        )
        gcols.append(gc)
    groups = gcols
    df = df2
    rng = df.groupBy(*groups).agg(
        F.min(key).alias("__lo"), F.max(key).alias("__hi")
    )
    asc_idx = F.when(
        F.col("__hi") <= F.col("__lo"), F.lit(0)
    ).otherwise(
        F.least(
            F.floor(
                (F.col(key) - F.col("__lo"))
                / ((F.col("__hi") - F.col("__lo")) / n_buckets)
            ).cast("int"),
            F.lit(n_buckets - 1),
        )
    )
    idx = asc_idx if ascending else (F.lit(n_buckets - 1) - asc_idx)
    null_bucket = F.lit(-1) if ascending else F.lit(n_buckets)
    idx = F.when(F.col(key).isNull(), null_bucket).otherwise(idx)
    b = (
        df.join(F.broadcast(rng), groups)
        .withColumn(BUCKET, idx)
        .drop("__lo", "__hi")
    )
    w_local = Window.partitionBy(*groups, BUCKET).orderBy(
        *_order(key, ascending, tiebreaks)
    ).rowsBetween(Window.unboundedPreceding, 0)
    local = b.select(
        "*",
        *[
            F.sum(v).over(w_local).alias(f"__lsum{i}")
            for i, v in enumerate(vals)
        ],
    )
    # exclusive prefix over bucket index WITHIN each group — a window,
    # but over the aggregated (|groups| × n_buckets)-row totals table,
    # never over raw rows (the shape plan_lint's low-card rule allows)
    w_off = (
        Window.partitionBy(*groups)
        .orderBy(BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    if min_out is None:
        totals = b.groupBy(*groups, BUCKET).agg(
            *[F.sum(v).alias(f"__tot{i}") for i, v in enumerate(vals)]
        )
        off = totals.select(
            *groups,
            F.col(BUCKET),
            *[
                F.coalesce(F.sum(f"__tot{i}").over(w_off), F.lit(0)).alias(
                    f"__offset{i}"
                )
                for i in range(len(vals))
            ],
        )
        res = local.join(F.broadcast(off), [*groups, BUCKET])
        for i, o in enumerate(outs):
            res = res.withColumn(
                o, F.col(f"__lsum{i}") + F.col(f"__offset{i}")
            )
        return res.drop(
            BUCKET,
            *[f"__lsum{i}" for i in range(len(vals))],
            *[f"__offset{i}" for i in range(len(vals))],
            *groups,
        )
    out = outs[0]
    local = local.withColumnRenamed("__lsum0", "__lsum")
    local = local.withColumn("__lmin", F.min("__lsum").over(w_local))
    totals = local.groupBy(*groups, BUCKET).agg(
        F.sum(vals[0]).alias("__tot"), F.min("__lsum").alias("__bmin")
    )
    t1 = totals.select(
        *groups,
        F.col(BUCKET),
        "__bmin",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__offset"),
    )
    # min over STRICTLY-earlier buckets of (their offset + their local
    # min): running_j for a row in bucket c is lsum_j + offset_c, so the
    # per-bucket min of running is offset_c + __bmin_c; NULL for the
    # first bucket (no earlier rows).
    off = t1.select(
        *groups,
        F.col(BUCKET),
        "__offset",
        F.min(F.col("__offset") + F.col("__bmin"))
        .over(w_off)
        .alias("__minprev"),
    )
    res = (
        local.join(F.broadcast(off), [*groups, BUCKET])
        .withColumn(out, F.col("__lsum") + F.col("__offset"))
        .withColumn(
            min_out,
            F.when(
                F.col("__minprev").isNull(),
                F.col("__lmin") + F.col("__offset"),
            ).otherwise(
                F.least(
                    F.col("__minprev"),
                    F.col("__lmin") + F.col("__offset"),
                )
            ),
        )
    )
    return res.drop(BUCKET, "__lsum", "__lmin", "__offset", "__minprev", *groups)


def grouped_avg_rank_map(
    df: DataFrame,
    group: str | list[str],
    key: str,
    out: str,
    n_buckets: int = 64,
) -> DataFrame:
    """The per-group FRACTIONAL (average) rank of ``key`` as a
    (group…, key, out) MAP over DISTINCT keys — one row per distinct
    (group, key), joinable back onto the rows. Identical values to the
    tie-averaged rank

        rank().over(Window.partitionBy(group).orderBy(key))
        + (count(*).over(Window.partitionBy(group, key)) - 1) / 2.0

    — but with no per-group single-task funnel. The partitioned-Window
    form ranks RAW rows, so a fixed-cardinality group key sees its
    whole 100 TB share in one task. Here ranks come from counts alone:
    avg_rank(v) = #{key < v} + (#{key = v} + 1)/2, so the plan is a
    (group, key) count aggregation (ties collapse to one row) and a
    bucketed per-group exclusive prefix over DISTINCT keys
    (with_grouped_running_sum — parallelism |groups| × n_buckets even
    when keys are continuous and distinct ≈ raw).

    Returned as a map (not appended in place) so a caller ranking
    SEVERAL columns builds every map against the ORIGINAL relation and
    joins them all at the end — appending in place would make each
    later map's count aggregation recompute the earlier joins' whole
    lineage (measured: 5× slower at 100× for w22's two-column rank).

    Exactness: counts are integers and the rank is integer + exact
    half-integer — bit-identical to the Window form, no float drift.
    Contract: non-null ``key`` and group columns (the map joins back
    by equality; NULL keys would drop). Numeric ``key`` (the bucketing
    contract of this module).
    """
    groups = [group] if isinstance(group, str) else list(group)
    cnt = df.groupBy(*groups, key).agg(F.count(F.lit(1)).alias("__ct"))
    cum = with_grouped_running_sum(
        cnt,
        group=groups,
        key=key,
        tiebreaks=[],
        val="__ct",
        n_buckets=n_buckets,
        out="__cum",
    )
    return cum.select(
        *groups,
        key,
        (
            F.col("__cum")
            - F.col("__ct")
            + (F.col("__ct") + F.lit(1)) / F.lit(2.0)
        ).alias(out),
    )


def with_grouped_avg_rank(
    df: DataFrame,
    group: str | list[str],
    key: str,
    out: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Append grouped_avg_rank_map's rank in place (single-column
    convenience; for multi-column ranking build the maps separately
    and join — see grouped_avg_rank_map's lineage note)."""
    groups = [group] if isinstance(group, str) else list(group)
    return df.join(
        grouped_avg_rank_map(df, groups, key, out, n_buckets),
        [*groups, key],
    )


def ntile_from_rn(k: int, rn: Column, n: Column) -> Column:
    """Spark/ANSI ntile(k) reconstructed from a global row_number and
    the total count: the first n%k tiles take ceil(n/k) rows, the rest
    floor(n/k) — bit-for-bit the Window ntile assignment. The otherwise
    branch never evaluates when q = 0 (CaseWhen is lazy per row), so
    n < k is safe under ANSI division."""
    q = F.floor(n / k)
    r = n % k
    big = (q + 1) * r
    return (
        F.when(rn <= big, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rn - 1 - big) / q) + 1)
        .cast("int")
    )


def with_global_running_min(
    df: DataFrame,
    key: str,
    tiebreaks: list[str],
    val: str,
    ascending: bool = True,
    n_buckets: int = 64,
    out: str = "runmin",
    inclusive: bool = True,
) -> DataFrame:
    """Append the global running MIN of ``val`` over the total order —
    identical to min(val).over(Window.orderBy(...).rowsBetween(
    unboundedPreceding, 0 if inclusive else -1)) without the
    single-partition stage. ``inclusive=False`` gives the EXCLUSIVE
    prefix (strictly-earlier rows; NULL for the global first row) —
    the sweep-line quantity skyline/frontier algorithms need.

    Same two-level decomposition as the running sums: bucket-local
    prefix-min window + per-bucket min table + strictly-earlier-bucket
    offsets (B² triangle join over B rows, broadcast back). min is
    order-independent, so the result is exact for any type min
    supports — no float accumulation discipline needed."""
    b = _with_bucket(df, key, ascending, n_buckets)
    frame = (Window.unboundedPreceding, 0 if inclusive else -1)
    w_local = Window.partitionBy(BUCKET).orderBy(
        *_order(key, ascending, tiebreaks)
    ).rowsBetween(*frame)
    local = b.withColumn("__lmin", F.min(val).over(w_local))
    totals = b.groupBy(BUCKET).agg(F.min(val).alias("__bmin"))
    off = _offsets(totals, [(F.min, "__bmin", "__offset")])
    merged = (
        F.when(F.col("__lmin").isNull(), F.col("__offset"))
        .when(F.col("__offset").isNull(), F.col("__lmin"))
        .otherwise(F.least(F.col("__lmin"), F.col("__offset")))
    )
    return (
        local.join(F.broadcast(off), BUCKET)
        .withColumn(out, merged)
        .drop(BUCKET, "__lmin", "__offset")
    )
