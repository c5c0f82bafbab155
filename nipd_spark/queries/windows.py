"""Window functions (SURVEY.md §2.5, W1-W9).

Reference realization [PK]: pandas ``groupby().cumcount/cumsum/shift/
rolling/rank`` along genomic position order — the axis the RHDO/SPRT
statistics run on (Lo et al. 2010, SURVEY.md §2.12). Spark windows need
explicit deterministic ordering: every orderBy here carries a unique
tie-breaker key (orderkey / event_id / linenumber).

Scale notes (100 TB): a window is one shuffle on partitionBy keys + an
in-partition sort; partitions here (custkey / user_id / suppkey) are
bounded, so no single partition outgrows an executor. Cumulative frames
are streamed (running accumulation), not O(n²). Partition-only windows
(W8) broadcast nothing — they re-aggregate within the sorted run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nipd_spark.catalog import load
from nipd_spark.oracle import dround, ts_us
from nipd_spark.registry import query

def _orders_w():
    """Deterministic per-customer order: date then unique orderkey.
    Built lazily — Window.partitionBy needs an active SparkContext, so a
    module-level constant would break import before session creation."""
    return Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")


@query(
    "w1_rank_family",
    sql="""
    SELECT o_orderkey, o_custkey,
           row_number() OVER w_uniq AS rn,
           rank() OVER w_pri AS rnk,
           dense_rank() OVER w_pri AS drnk,
           ntile(4) OVER w_uniq AS quartile
    FROM orders
    WINDOW w_uniq AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w_pri  AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
    """,
    tags=("W1",),
)
def w1_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/ntile (SNP ordering within block)."""
    o = load(spark, sf_dir, "orders")
    w_pri = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(_orders_w()).alias("rn"),
        F.rank().over(w_pri).alias("rnk"),
        F.dense_rank().over(w_pri).alias("drnk"),
        F.ntile(4).over(_orders_w()).alias("quartile"),
    )


@query(
    "w2_lag_lead",
    sql=f"""
    SELECT event_id, user_id,
           epoch_us({ts_us()}) - lag(epoch_us({ts_us()}))
             OVER w AS gap_us,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY {ts_us()}, event_id)
    """,
    tags=("W2",),
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead — adjacent-SNP distance / inter-event gap analogue."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "w3_cumsum",
    sql=f"""
    SELECT o_custkey, o_orderkey,
           {dround("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")}
             AS running_total
    FROM orders
    """,
    tags=("W3",),
)
def w3_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum along an ordered partition — the SPRT cumulative-LLR
    frame shape (Lo 2010 core computation; SURVEY.md §2.12)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(
                _orders_w().rowsBetween(Window.unboundedPreceding, 0)
            ),
            4,
        ).alias("running_total"),
    )


@query(
    "w4_moving_avg",
    sql=f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           {dround("avg(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)", 6)}
             AS qty_ma7
    FROM lineitem
    """,
    tags=("W4",),
)
def w4_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average (rolling coverage smoothing analogue)."""
    li = load(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-6, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.avg("l_quantity").over(w), 6).alias("qty_ma7"),
    )


@query(
    "w5_range_frame",
    sql=f"""
    WITH t AS (
      SELECT event_id, user_id, value,
             CAST(epoch_us({ts_us()}) // 1000000 AS BIGINT) AS sec
      FROM events
    )
    SELECT event_id, user_id,
           count(*) OVER w AS n_1h,
           {dround("sum(value) OVER w")} AS val_1h
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    tags=("W5",),
)
def w5_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rangeBetween frame: trailing 1 h per user (±100 kb window analogue).

    RANGE frames need a numeric order key; both engines floor ts to epoch
    seconds first, so frame membership is identical.
    """
    ev = load(spark, sf_dir, "events")
    t = ev.select(
        "event_id", "user_id", "value", (F.unix_micros("ts") / 1_000_000).cast("long")
        .alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec").rangeBetween(-3600, 0)
    return t.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 4).alias("val_1h"),
    )


@query(
    "w6_first_last",
    sql="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("W6",),
)
def w6_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over the full partition (block boundary values)."""
    o = load(spark, sf_dir, "orders")
    w = _orders_w().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "w7_pct_rank_cume",
    sql="""
    SELECT o_orderkey, o_orderstatus,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
    """,
    tags=("W7",),
)
def w7_pct_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist — empirical CDF of depth analogue.

    Raw doubles are safe: both engines compute (rank-1)/(n-1) and
    count≤/n from identical small integers.

    Scale shape: reconstructed from per-(status, price) counts + the
    per-group histogram cumsum (operators/ranks) instead of a
    Window.partitionBy(o_orderstatus) over raw orders — the 3-value
    partition key would cap parallelism at 3 tasks at 100 TB. With
    cum = #rows with price' <= price and cnt = #rows at this price:
    rank = cum - cnt + 1 (ties share the min rank), percent_rank =
    (rank-1)/(n-1), cume_dist = cum/n — all from exact integers, so
    the doubles are bit-identical to the window builtins.
    """
    from nipd_spark.operators import ranks

    o = load(spark, sf_dir, "orders")
    per_price = o.groupBy("o_orderstatus", "o_totalprice").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cum = ranks.with_grouped_running_sum(
        per_price,
        group="o_orderstatus",
        key="o_totalprice",
        tiebreaks=[],
        val="cnt",
        out="cum",
    )
    n = o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    # Joins are null-safe throughout so NULL-keyed rows stay in their
    # NULL partition exactly as the Window form keeps them (a plain
    # USING join would silently drop them).
    stats = cum.alias("c").join(
        F.broadcast(n).alias("g"),
        F.col("c.o_orderstatus").eqNullSafe(F.col("g.o_orderstatus")),
    ).select(
        F.col("c.o_orderstatus").alias("o_orderstatus"),
        "o_totalprice",
        # singleton partition: percent_rank is defined as 0, not 0/0
        F.when(F.col("n") == 1, F.lit(0.0))
        .otherwise(
            (F.col("cum") - F.col("cnt")).cast("double")
            / (F.col("n") - 1).cast("double")
        )
        .alias("pct_rank"),
        (F.col("cum").cast("double") / F.col("n").cast("double")).alias(
            "cume"
        ),
    )
    return (
        o.alias("o")
        .join(
            stats.alias("st"),
            F.col("o.o_orderstatus").eqNullSafe(F.col("st.o_orderstatus"))
            & F.col("o.o_totalprice").eqNullSafe(F.col("st.o_totalprice")),
        )
        .select(
            "o.o_orderkey",
            F.col("o.o_orderstatus").alias("o_orderstatus"),
            "st.pct_rank",
            "st.cume",
        )
    )


@query(
    "w8_zscore",
    sql=f"""
    SELECT event_id, event_type,
           {dround("(value - avg(value) OVER (PARTITION BY event_type)) / stddev_samp(value) OVER (PARTITION BY event_type)", 6)}
             AS z
    FROM events
    """,
    tags=("W8",),
)
def w8_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score — the NIPT z-score screen normalization
    (Chiu BMJ 2011 analogue; SURVEY.md §2.12). Rounded: partition
    aggregates are order-dependent sums.

    Scale shape: groupBy(event_type).agg(avg, stddev) + broadcast
    join-back — identical result to the whole-partition Window form,
    but fully parallel. Window.partitionBy(event_type) over raw events
    would funnel each event type's entire 100 TB history through one
    task; the group aggregate is map-side partial + a 5-row broadcast.
    The join-back is null-safe, so NULL event_type rows keep their
    NULL-partition stats exactly as the Window form would.
    """
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("__m"), F.stddev_samp("value").alias("__s")
    )
    z = (F.col("value") - F.col("__m")) / F.col("__s")
    return (
        ev.alias("e")
        .join(
            F.broadcast(stats).alias("st"),
            F.col("e.event_type").eqNullSafe(F.col("st.event_type")),
        )
        .select(
            "e.event_id",
            F.col("e.event_type").alias("event_type"),
            F.round(z, 6).alias("z"),
        )
    )


@query(
    "w9_threshold_crossing",
    sql="""
    WITH c AS (
      SELECT o_custkey, o_orderkey,
             row_number() OVER w AS rn,
             sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey,
           min(CASE WHEN cum > 500000 THEN rn END) AS cross_at,
           count(*) AS n_orders
    FROM c
    GROUP BY o_custkey
    """,
    tags=("W9", "W3", "W1"),
)
def w9_threshold_crossing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPRT bound-crossing detection: first ordered index where the
    cumulative statistic exits the threshold (Lo 2010 supplement shape).

    The cumulative sum is compared UNROUNDED: both engines accumulate in
    identical frame order, so the comparison is bit-deterministic.
    """
    o = load(spark, sf_dir, "orders")
    cum = F.sum("o_totalprice").over(_orders_w().rowsBetween(Window.unboundedPreceding, 0))
    c = o.select(
        "o_custkey",
        F.row_number().over(_orders_w()).alias("rn"),
        cum.alias("cum"),
    )
    return c.groupBy("o_custkey").agg(
        F.min(F.when(F.col("cum") > 500000, F.col("rn"))).alias("cross_at"),
        F.count("*").alias("n_orders"),
    )


@query(
    "w10_longest_streak",
    sql=f"""
    WITH ev AS (
      SELECT user_id, event_type, event_id, {ts_us()} AS ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_type, event_id, ts,
             CASE WHEN event_type = lag(event_type)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 0 ELSE 1 END AS brk
      FROM ev
    ),
    grouped AS (
      SELECT user_id, event_type, event_id,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM flagged
    ),
    streaks AS (
      SELECT user_id, event_type, grp,
             count(*) AS streak_len,
             min(event_id) AS first_event
      FROM grouped
      GROUP BY user_id, event_type, grp
    ),
    ranked AS (
      SELECT user_id, event_type, streak_len, first_event,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY streak_len DESC, first_event ASC) AS rn
      FROM streaks
    )
    SELECT user_id, event_type AS streak_type,
           CAST(streak_len AS BIGINT) AS streak_len,
           first_event
    FROM ranked WHERE rn = 1
    """,
    tags=("W2", "W3", "A1"),
)
def w10_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of consecutive
    same-type events (lag-break → cumsum group id → per-island count →
    arg-max with first-event tie-break). The canonical sessionless
    streak analytic; the same island construction underlies t3's
    sessionization.

    Scale shape: one shuffle on user_id for the windows, then an
    equi-keyed island aggregation — identical cost profile to any
    per-key window op.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "brk",
        F.when(
            F.col("event_type") == F.lag("event_type").over(w), 0
        ).otherwise(1),
    )
    grouped = flagged.withColumn(
        "grp", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    streaks = grouped.groupBy("user_id", "event_type", "grp").agg(
        F.count("*").alias("streak_len"), F.min("event_id").alias("first_event")
    )
    ranked = streaks.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(
                F.col("streak_len").desc(), F.col("first_event").asc()
            )
        ),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "user_id",
        F.col("event_type").alias("streak_type"),
        "streak_len",
        "first_event",
    )


@query(
    "w11_gap_fill",
    sql=f"""
    WITH ev AS (
      SELECT user_id, date_trunc('hour', {ts_us()}) AS h, value FROM events
    ),
    hourly AS (
      SELECT user_id, h, {dround('sum(value)')} AS v
      FROM ev GROUP BY user_id, h
    ),
    bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM ev GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ),
    j AS (
      SELECT g.user_id, g.h, hv.v
      FROM grid g LEFT JOIN hourly hv ON g.user_id = hv.user_id AND g.h = hv.h
    )
    SELECT user_id, h,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
           v IS NOT NULL AS observed
    FROM j
    """,
    tags=("W4", "W6", "F2", "J2"),
)
def w11_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward fill: densify each user's hourly
    grid between their first and last event hour, then carry the last
    observed hourly total across gaps (``last(..., ignorenulls)``) —
    the standard sensor/metric gap-fill before any rolling statistic.

    Scale shape: the grid is generated per key with ``sequence`` (no
    driver loop, no cross join against a calendar table); grid size is
    O(keys × hours), independent of event count. One equi-join puts
    observations on the grid and one per-key window streams the fill —
    the same cost profile as any per-key window op. Hourly sums are
    rounded (order-dependent aggregate policy, nipd_spark/oracle.py).
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h"), "value"
    )
    hourly = ev.groupBy("user_id", "h").agg(F.round(F.sum("value"), 4).alias("v"))
    grid = (
        ev.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
        )
    )
    j = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "user_id",
        "h",
        F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("v").isNotNull().alias("observed"),
    )


# Trailing-EWMA weights α(1-α)^j, α=0.25, K=50: computed ONCE in Python
# and embedded as literals in BOTH engines (the composites-LLR trick) so
# neither side evaluates pow() — libm last-ulp differences would leak
# into the fold otherwise. The j=49 tail weight is ~2e-8: the truncated
# window is within float-display noise of the infinite EWMA.
_EWMA_K = 50
_EWMA_W = [round(0.25 * (0.75**j), 12) for j in range(_EWMA_K)]
_EWMA_W_SPARK = "array(" + ", ".join(f"{w!r}D" for w in _EWMA_W) + ")"
_EWMA_W_DUCK = "([" + ", ".join(repr(w) for w in _EWMA_W) + "]::DOUBLE[])"


@query(
    "w12_ewma",
    sql=f"""
    WITH arr AS (
      SELECT user_id, event_id,
             list(value) OVER (
               PARTITION BY user_id ORDER BY {ts_us()}, event_id
               ROWS BETWEEN {_EWMA_K - 1} PRECEDING AND CURRENT ROW) AS vs
      FROM events
    )
    SELECT user_id, event_id,
           {dround(f'''list_reduce(
             list_prepend(0.0, list_transform(
               list_reverse(vs), (x, i) -> x * {_EWMA_W_DUCK}[i])),
             (acc, x) -> acc + x)''')} AS ewma
    FROM arr
    """,
    tags=("W4", "W5", "F5"),
)
def w12_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user (trailing-K form):
    ewma_n = Σ_{{j<K}} α(1-α)^j · value_{{n-j}} — the streaming-metrics
    smoother that plain SQL windows can't express exactly (the infinite
    recurrence needs state); the K-term truncation makes it a pure
    sliding frame, exact to ~2e-8 here.

    Scale shape: one shuffle + sort per key like any window; the frame
    materializes at most K=50 doubles per row (bounded memory, no
    whole-partition collect). The weighted fold runs JVM-side via
    higher-order array functions — no Python UDF. Both engines fold
    newest-first over identical weight literals, so the sum is
    bit-deterministic before the policy rounding.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_K - 1), 0)
    )
    arr = ev.select(
        "user_id", "event_id", F.collect_list("value").over(w).alias("vs")
    )
    fold = F.expr(
        f"""aggregate(
              zip_with(reverse(vs), slice({_EWMA_W_SPARK}, 1, size(vs)),
                       (x, w) -> x * w),
              0.0D, (acc, x) -> acc + x)"""
    )
    return arr.select("user_id", "event_id", F.round(fold, 4).alias("ewma"))


@query(
    "w13_moving_median",
    sql=f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           {dround("median(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)", 6)}
             AS qty_med7
    FROM lineitem
    """,
    tags=("W4", "A9", "F5"),
)
def w13_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row moving MEDIAN — the robust-smoothing counterpart
    of w4's moving average (a depth-spike filter in the coverage-QC
    sense: one outlier row can't drag the estimate).

    Spark's median/percentile aggregates reject ordered window frames
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the frame median is
    built from primitives: collect_list over the ROWS frame →
    array_sort → middle element (odd) or mean of the two middles
    (even). All JVM-side expression work — no UDF — and exact, which is
    what lets DuckDB's native frame ``median(...) OVER`` hash-match.

    Scale note: per-row cost is O(frame·log frame) on a 7-element
    array — constant-bounded, unlike a true per-frame percentile sort;
    keep frames small with this pattern (a 10k-row frame would carry a
    10k array per row) — that regime belongs to a15's sketch tier.
    """
    li = load(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-6, 0)
    )
    framed = li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.array_sort(F.collect_list("l_quantity").over(w)).alias("frame"),
    )
    n = F.size("frame")
    lo = F.element_at("frame", (n / 2).cast("int"))
    hi = F.element_at("frame", (n / 2 + 1).cast("int"))
    mid = F.element_at("frame", ((n + 1) / 2).cast("int"))
    return framed.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.when(n % 2 == 1, mid).otherwise((lo + hi) / 2), 6).alias(
            "qty_med7"
        ),
    )


@query(
    "w14_reset_cumsum",
    sql=f"""
    WITH flagged AS (
      SELECT user_id, event_id, {ts_us()} AS ts, value,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_reset
      FROM events
    ),
    seg AS (
      SELECT user_id, event_id, ts, value, is_reset,
             sum(is_reset) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS segment
      FROM flagged
    )
    SELECT user_id, event_id, CAST(segment AS BIGINT) AS segment,
           {dround("sum(CASE WHEN is_reset = 0 THEN value ELSE 0 END) OVER (PARTITION BY user_id, segment ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)")}
             AS run_value
    FROM seg
    """,
    tags=("W3", "W2", "F4"),
)
def w14_reset_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resettable running total: per-user cumulative value that resets
    to zero at every 'error' event — the gaps-and-islands segment trick
    (a running count of reset flags IS the segment id; the cumsum then
    partitions by (user, segment)). No loop, no state machine, no UDF:
    two stacked window passes over the same (user, time) sort, which
    Spark executes with ONE shuffle and one in-partition sort since the
    partition keys of the second window prefix-extend the first.
    """
    ev = load(spark, sf_dir, "events")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        (F.col("event_type") == "error").cast("int").alias("is_reset"),
    )
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = flagged.withColumn("segment", F.sum("is_reset").over(w1))
    w2 = (
        Window.partitionBy("user_id", "segment")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return seg.select(
        "user_id",
        "event_id",
        "segment",
        F.round(
            F.sum(
                F.when(F.col("is_reset") == 0, F.col("value")).otherwise(0.0)
            ).over(w2),
            4,
        ).alias("run_value"),
    )


@query(
    "w15_nth_value_family",
    sql="""
    SELECT o_custkey, o_orderkey,
           nth_value(o_orderkey, 2) OVER w AS second_order,
           lead(o_orderkey, 2, -1) OVER w AS after_next,
           first_value(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END
                       IGNORE NULLS) OVER w AS first_finished
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("W6", "W2", "P5"),
)
def w15_nth_value_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The offset-window long tail: nth_value (the customer's 2nd-ever
    order as of each row), lead with an explicit DEFAULT for the
    off-the-end case (no NULL ambiguity downstream), and IGNORE NULLS
    first_value (first 'F'-status order so far — the carry-forward
    idiom c12's as-of attribution builds on). All three share one
    window sort, so the plan pays a single shuffle+sort for the family.
    """
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.lead("o_orderkey", 2, -1).over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).alias("after_next"),
        F.first(
            F.when(F.col("o_orderstatus") == "F", F.col("o_orderkey")),
            ignorenulls=True,
        ).over(w).alias("first_finished"),
    )


@query(
    "w16_cumulative_distinct",
    sql=f"""
    WITH t AS (
      SELECT event_type, event_id, user_id,
             CAST(epoch_us({ts_us()}) AS BIGINT) AS us
      FROM events
    )
    SELECT event_type, event_id,
           count(DISTINCT user_id) OVER (
             PARTITION BY event_type ORDER BY us
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS users_so_far
    FROM t
    ORDER BY event_type, event_id
    LIMIT 600
    """,
    tags=("A3", "W3", "A8"),
)
def w16_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-user curve per event type — the
    "unique-users-to-date" growth metric as of every event. Same
    primitive spelling as a22's sliding version (collect_set over the
    frame + size: Spark bans DISTINCT aggregates in windows) but with
    an unbounded RANGE frame; ties in event time share a frame on both
    engines, so the RANGE (not ROWS) frame is what makes the
    cross-engine values deterministic without a unique sort key.

    Scale shape: the naive form (collect_set over an unbounded frame,
    partitioned by a 5-value key over raw events) is doubly broken at
    100 TB — one task per event type AND O(users) window state per
    row. Instead: a user is "in the set" at time t iff their FIRST
    event (per type) is <= t, so users_so_far = running count of
    first-occurrences. First occurrences come from a groupBy (fully
    parallel); the running count over (increments UNION probes) uses
    the per-group histogram cumsum (operators/ranks), increments
    sorting before probes at equal timestamps to honor the RANGE
    frame's inclusive bound. All counts are exact integers —
    bit-identical to the window form.
    """
    from nipd_spark.operators import ranks

    ev = load(spark, sf_dir, "events")
    t = ev.select(
        "event_type", "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    firsts = t.groupBy("event_type", "user_id").agg(F.min("us").alias("us"))
    inc = (
        firsts.groupBy("event_type", "us")
        .agg(F.count(F.lit(1)).alias("delta"))
        .select(
            "event_type",
            "us",
            F.lit(0).alias("tag"),
            F.lit(None).cast("long").alias("event_id"),
            "delta",
        )
    )
    probes = t.select(
        "event_type",
        "us",
        F.lit(1).alias("tag"),
        "event_id",
        F.lit(0).cast("long").alias("delta"),
    )
    both = inc.unionByName(probes)
    cum = ranks.with_grouped_running_sum(
        both,
        group="event_type",
        key="us",
        tiebreaks=["tag", "event_id"],
        val="delta",
        out="users_so_far",
    )
    return (
        cum.filter(F.col("tag") == 1)
        .select(
            "event_type",
            "event_id",
            F.col("users_so_far").cast("int").alias("users_so_far"),
        )
        .orderBy("event_type", "event_id")
        .limit(600)
    )


@query(
    "w17_time_weighted_avg",
    sql=f"""
    WITH seq AS (
      SELECT user_id, value, {ts_us()} AS ts,
             lead({ts_us()}) OVER (PARTITION BY user_id
                                   ORDER BY {ts_us()}, event_id) AS next_ts
      FROM events
    ),
    held AS (
      SELECT user_id, value,
             epoch_us(next_ts - ts) AS w_us
      FROM seq WHERE next_ts IS NOT NULL
    )
    SELECT user_id,
           count(*) AS n_obs,
           CAST(sum(w_us) // 1000000 AS BIGINT) AS span_sec,
           {dround("sum(value * w_us) / sum(w_us)", 6)} AS twap
    FROM held
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("W2", "A1", "F2"),
)
def w17_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation weighted by how
    long it was the latest value — the correct mean for irregularly
    sampled series (a plain avg over-counts bursts of events and
    under-counts quiet stretches; TWAP is what pricing, telemetry and
    billing actually integrate). Weights are exact integer µs from
    lead(); one window shuffle on user_id then a weighted-sum agg.
    The open last interval is excluded on both engines (its holding
    time is unknown until the next event).
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "value", "ts", F.lead("ts").over(w).alias("next_ts")
    ).filter(F.col("next_ts").isNotNull())
    w_us = F.unix_micros("next_ts") - F.unix_micros("ts")
    held = seq.select("user_id", "value", w_us.alias("w_us"))
    return (
        held.groupBy("user_id")
        .agg(
            F.count("*").alias("n_obs"),
            (F.sum("w_us") / 1_000_000).cast("bigint").alias("span_sec"),
            F.round(
                F.sum(F.col("value") * F.col("w_us")) / F.sum("w_us"), 6
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


@query(
    "w18_mann_whitney_u",
    sql=f"""
    WITH s AS (
      SELECT value,
             CASE WHEN CAST(date_part('dow', {ts_us()}) AS INT) IN (0, 6)
                  THEN 'weekend' ELSE 'weekday' END AS grp,
             event_id
      FROM events WHERE event_type = 'purchase'
    ),
    ranked AS (
      SELECT grp,
             rank() OVER (ORDER BY value)
               + (count(*) OVER (PARTITION BY value) - 1) / 2.0 AS midrank
      FROM s
    )
    SELECT count(*) FILTER (WHERE grp = 'weekend') AS n1,
           count(*) FILTER (WHERE grp = 'weekday') AS n2,
           {dround("sum(CASE WHEN grp = 'weekend' THEN midrank END)", 4)} AS r1,
           {dround("sum(CASE WHEN grp = 'weekend' THEN midrank END) - count(*) FILTER (WHERE grp = 'weekend') * (count(*) FILTER (WHERE grp = 'weekend') + 1) / 2.0", 4)}
             AS u_stat
    FROM ranked
    """,
    tags=("W1", "A12", "F3"),
)
def w18_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (two-sample rank test): do weekend purchases run
    larger than weekday ones, WITHOUT assuming normality — the
    nonparametric sibling of c15's z-test, and the robust choice for
    skewed monetary values. Built from exact integer rank arithmetic:
    midrank(v) = lt(v) + (cnt(v)+1)/2 where lt(v) = #rows strictly
    below v (halves are exact binary doubles), rank-sum,
    U = R₁ − n₁(n₁+1)/2. No transcendental touches anything, so both
    engines agree to the last bit before the display rounding.

    Scale shape (round-4 rewrite): NO unpartitioned window. Rows
    collapse to one per distinct value (cnt, weekend cnt), then lt(v)
    is a two-pass histogram rank — deterministic equi-width value
    buckets, a bucket-partitioned running sum for the local prefix,
    and a broadcast join of per-bucket totals (triangle-aggregated,
    B² rows for B buckets) for the global offset. The old
    rank().over(Window.orderBy(...)) funnelled the whole input through
    one partition ("Moving all data to a single partition"); this plan
    shuffles only on bucket and the rank arithmetic stays exact.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    s = ev.select(
        "value",
        F.when(
            (F.dayofweek("ts") - 1).isin(0, 6), "weekend"
        ).otherwise("weekday").alias("grp"),
    )
    from nipd_spark.operators import ranks

    pv = s.groupBy("value").agg(
        F.count("*").alias("cnt"),
        F.count_if(F.col("grp") == "weekend").alias("wk_cnt"),
    )
    # lt(v) = inclusive running count minus own count — the exclusive
    # prefix, via the shared distributed-rank machinery
    ranked = ranks.with_global_running_sum(
        pv, key="value", tiebreaks=[], val="cnt", out="cum"
    ).select(
        "cnt",
        "wk_cnt",
        (
            F.col("cum") - F.col("cnt") + (F.col("cnt") + 1) / 2.0
        ).alias("midrank"),
    )
    n1 = F.sum("wk_cnt")
    r1 = F.sum(F.col("wk_cnt") * F.col("midrank"))
    return ranked.agg(
        n1.alias("n1"),
        F.sum(F.col("cnt") - F.col("wk_cnt")).alias("n2"),
        F.round(r1, 4).alias("r1"),
        F.round(r1 - n1 * (n1 + 1) / 2.0, 4).alias("u_stat"),
    )


@query(
    "w19_theil_sen",
    sql=f"""
    WITH ev AS (
      SELECT event_id, event_type, epoch_us({ts_us()}) AS us, value
      FROM events WHERE user_id < 15
    ),
    slopes AS (
      SELECT a.event_type,
             (b.value - a.value)
               / (CAST(b.us - a.us AS DOUBLE) / 1000000.0) AS slope
      FROM ev a JOIN ev b
        ON a.event_type = b.event_type AND a.event_id < b.event_id
      WHERE b.us <> a.us
    )
    SELECT event_type,
           count(*) AS n_pairs,
           {dround("median(slope)", 9)} AS sen_slope
    FROM slopes GROUP BY event_type
    """,
    tags=("A9", "J11", "F3"),
)
def w19_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator: per event type, the median of
    all pairwise slopes (Δvalue/Δseconds) over a bounded user cohort —
    the 29%-breakdown alternative to least-squares drift detection
    (pairs with outliers can't drag the median the way they drag a
    regression line; complements dq2's median/MAD location gate with a
    robust SLOPE).

    Scale shape: pairs are generated by an equi self-join on the group
    key, so cost is Σ|group|² — Theil-Sen is inherently quadratic per
    group; production bounds the cohort (here user_id < 15) or samples
    pairs. Δt in µs-long arithmetic divided once (identical expression
    both engines); the median is order-free, so only it needs dround.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 15)
        .select(
            "event_id", "event_type", F.unix_micros("ts").alias("us"), "value"
        )
    )
    a, b = ev.alias("a"), ev.alias("b")
    slopes = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .filter(F.col("b.us") != F.col("a.us"))
        .select(
            F.col("a.event_type").alias("event_type"),
            (
                (F.col("b.value") - F.col("a.value"))
                / ((F.col("b.us") - F.col("a.us")).cast("double") / 1000000.0)
            ).alias("slope"),
        )
    )
    return slopes.groupBy("event_type").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.median("slope"), 9).alias("sen_slope"),
    )


@query(
    "w20_cusum_drift",
    sql=f"""
    WITH stats AS (
      SELECT event_type,
             {dround("avg(value)", 6)} AS mean_r,
             {dround("stddev_pop(value)", 6)} AS sd_r
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.event_id, {ts_us("e.ts")} AS ts,
             CAST(round((e.value - s.mean_r - 0.25 * s.sd_r) * 1e6) AS BIGINT) AS d,
             CAST(round(5 * s.sd_r * 1e6) AS BIGINT) AS h
      FROM events e JOIN stats s ON e.event_type = s.event_type
    ),
    pre1 AS (
      SELECT event_type, event_id, ts, h,
             sum(d) OVER w AS p
      FROM dev
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    pre AS (
      SELECT event_type, ts, h, p,
             min(p) OVER w2 AS minp
      FROM pre1
      WINDOW w2 AS (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    cusum AS (
      SELECT event_type, ts, h,
             p - least(minp, 0) AS s
      FROM pre
    )
    SELECT event_type,
           count(*) FILTER (WHERE s > h) AS n_alarms,
           min(ts) FILTER (WHERE s > h) AS first_alarm,
           CAST(max(s) AS DOUBLE) / 1e6 AS max_cusum
    FROM cusum GROUP BY event_type
    """,
    tags=("W3", "W9", "A10"),
)
def w20_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection (Page 1954) per event type: the one-sided
    cumulative sum s_i = max(0, s_{i-1} + (x_i − μ − k)) with slack
    k = 0.25σ and decision interval h = 5σ — the classic
    process-control detector for a sustained upward mean shift.

    The recursion is NOT window-expressible directly, but the closed
    form s_i = P_i − min(0, min_{j≤i} P_j) over the prefix sums
    P = Σ(x − μ − k) is — two stacked window functions, no recursion,
    no UDF. Cross-engine determinism is by FIXED-POINT quantization:
    deviations are rounded to integer micro-units (×1e6 → BIGINT)
    before the cumulative sums, because windowed double-sums are NOT
    order-stable across engines (DuckDB's segment-tree accumulation vs
    Spark's streaming fold differ in the last ulp — observed flipping
    a 6-dp rounding boundary); int64 addition is associative, so the
    prefix sums, the min, and every alarm comparison are exact in both
    engines (headroom: |d| ≲ 1e9 µ-units × 1e5 rows ≪ 2^63). One
    shuffle on event_type + one in-partition sort.

    Residual risk (accepted): mean_r/sd_r are themselves order-
    dependent double aggregates rounded to 6 dp — a last-ulp engine
    difference exactly AT a rounding boundary would shift every
    quantized deviation by 1 µ-unit. If this ever flakes, quantize
    from a deterministically-ordered aggregation (sum of pre-rounded
    per-row values) instead of rounding avg/stddev outputs.

    Scale shape: the prefix sum AND the prefix-min-of-prefix-sum both
    come from the per-group histogram cumsum (operators/ranks
    ``min_out``) rather than Window.partitionBy(event_type) over raw
    events — the 5-value key would funnel ~20% of a 100 TB table
    through one task per value (the lowcard rule this query originally
    violated once the lint learned to see through broadcast join-backs).
    Integer µ-unit arithmetic keeps the decomposed sums bit-identical
    to the sequential window form.
    """
    from nipd_spark.operators import ranks

    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mean_r"),
        F.round(F.stddev_pop("value"), 6).alias("sd_r"),
    )
    dev = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "event_id",
        "ts",
        F.unix_micros("ts").alias("__ts_us"),
        F.round((F.col("value") - F.col("mean_r") - 0.25 * F.col("sd_r")) * 1e6, 0)
        .cast("long")
        .alias("d"),
        F.round(5 * F.col("sd_r") * 1e6, 0).cast("long").alias("h"),
    )
    pre = ranks.with_grouped_running_sum(
        dev,
        group="event_type",
        key="__ts_us",
        tiebreaks=["event_id"],
        val="d",
        out="p",
        min_out="minp",
    )
    cusum = pre.select(
        "event_type", "ts", "h", (F.col("p") - F.least("minp", F.lit(0).cast("long"))).alias("s")
    )
    return cusum.groupBy("event_type").agg(
        F.count_if(F.col("s") > F.col("h")).alias("n_alarms"),
        F.min(F.when(F.col("s") > F.col("h"), F.col("ts"))).alias("first_alarm"),
        (F.max("s").cast("double") / 1e6).alias("max_cusum"),
    )


@query(
    "w21_ewma",
    sql=f"""
    WITH s AS (
      SELECT user_id, event_id, {ts_us()} AS ts, value,
             lag(value, 1) OVER w AS v1, lag(value, 2) OVER w AS v2,
             lag(value, 3) OVER w AS v3, lag(value, 4) OVER w AS v4,
             lag(value, 5) OVER w AS v5, lag(value, 6) OVER w AS v6,
             lag(value, 7) OVER w AS v7
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {ts_us()}, event_id)
    )
    SELECT user_id, event_id,
           (value
            + coalesce(v1, 0) * 0.5 + coalesce(v2, 0) * 0.25
            + coalesce(v3, 0) * 0.125 + coalesce(v4, 0) * 0.0625
            + coalesce(v5, 0) * 0.03125 + coalesce(v6, 0) * 0.015625
            + coalesce(v7, 0) * 0.0078125)
           / (1.0
              + CASE WHEN v1 IS NULL THEN 0 ELSE 0.5 END
              + CASE WHEN v2 IS NULL THEN 0 ELSE 0.25 END
              + CASE WHEN v3 IS NULL THEN 0 ELSE 0.125 END
              + CASE WHEN v4 IS NULL THEN 0 ELSE 0.0625 END
              + CASE WHEN v5 IS NULL THEN 0 ELSE 0.03125 END
              + CASE WHEN v6 IS NULL THEN 0 ELSE 0.015625 END
              + CASE WHEN v7 IS NULL THEN 0 ELSE 0.0078125 END)
             AS ewma
    FROM s
    """,
    tags=("W2", "W4", "F3"),
)
def w21_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α = 1/2, 8-tap) per user
    over the event stream — the time-series smoother W4's uniform
    window can't express. Spelled as 7 explicit lags with dyadic
    weights (2⁻ᵏ is EXACT in binary floating point, and the 8-term sum
    is a fixed expression tree evaluated identically by both engines)
    — so the result is bit-equal cross-engine with NO rounding, unlike
    a pow()-based spelling whose libm could differ in the last ulp.
    Ramp-in renormalizes over the weights actually present.

    Scale shape: one window (shuffle on user_id + in-partition sort)
    computing 7 lags — identical cost to a single lag; everything else
    is map-side arithmetic.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = {k: F.lag("value", k).over(w) for k in range(1, 8)}
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value", *[
            lags[k].alias(f"v{k}") for k in range(1, 8)
        ]
    )
    num = F.col("value")
    den = F.lit(1.0)
    for k in range(1, 8):
        wk = 2.0 ** -k
        num = num + F.coalesce(F.col(f"v{k}"), F.lit(0.0)) * wk
        den = den + F.when(F.col(f"v{k}").isNull(), 0.0).otherwise(wk)
    return ev.select("user_id", "event_id", (num / den).alias("ewma"))


@query(
    "w22_spearman_corr",
    # Determinism: average ranks are exact (integer min-rank + exact
    # half-integer tie correction); corr over them is an order-dependent
    # float aggregate → dround 6, and the top-20 orders by the ROUNDED
    # rho with a suppkey tiebreak so both engines sort identical keys.
    sql=f"""
    WITH b AS (
      SELECT l_suppkey, l_quantity AS q, l_extendedprice AS p
      FROM lineitem
    ),
    r AS (
      SELECT l_suppkey,
             rank() OVER (PARTITION BY l_suppkey ORDER BY q)
               + (count(*) OVER (PARTITION BY l_suppkey, q) - 1) / 2.0 AS rq,
             rank() OVER (PARTITION BY l_suppkey ORDER BY p)
               + (count(*) OVER (PARTITION BY l_suppkey, p) - 1) / 2.0 AS rp
      FROM b
    ),
    g AS (
      SELECT l_suppkey, count(*) AS n_lines,
             {dround(
                 'covar_samp(rq, rp)'
                 ' / (stddev_samp(rq) * stddev_samp(rp))', 6)} AS rho
      FROM r GROUP BY l_suppkey HAVING count(*) >= 20
    )
    SELECT l_suppkey, n_lines, rho
    FROM g WHERE rho IS NOT NULL
    ORDER BY rho DESC, l_suppkey ASC
    LIMIT 20
    """,
    tags=("W1", "A10", "O3"),
)
def w22_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per supplier between line quantity
    and extended price (top-20 suppliers by ρ): the rank-based,
    outlier-robust dependence measure (monotone association) that
    Pearson corr (a10) misses — the standard screen for nonlinear
    price–volume relationships and for feature–target monotonicity in
    quality-score calibration. Ties receive average ranks (the
    fractional-rank convention: min-rank + (|ties|−1)/2), then
    ρ = Pearson corr of the two rank columns — the definition that
    stays exact under ties, unlike the 6·Σd²/(n(n²−1)) shortcut.

    Plan shape for 100 TB: the rank windows partition by l_suppkey, a
    key whose cardinality GROWS with the data while per-group size
    stays bounded by supplier activity — measured on the key-shifted
    100× replica: 100 000 distinct suppliers × ~600 rows each, so
    parallelism scales and no group funnels the table. (The r8
    SCALE.md note claiming the replica holds supplier cardinality
    fixed was wrong — gen_scale.py shifts l_suppkey per copy; the
    16.2× time for 100× data is sublinear sort/shuffle cost on fixed
    cores, not a funnel.) The r9 experiment that ported these ranks
    onto the grouped-histogram path measured 4–5× SLOWER here at
    every scale, because a high-cardinality group key makes the
    (group, value) count table fact-sized and its machinery pure
    overhead — that path wins only when the group key is genuinely
    fixed-cardinality and the count table collapses, which is w23's
    query (operators/ranks.grouped_avg_rank_map). corr is an
    algebraic aggregate (map-side partials), and the final top-20 is
    a TakeOrderedAndProject over one row per supplier.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.col("l_quantity").alias("q"),
        F.col("l_extendedprice").alias("p"),
    )
    wq = Window.partitionBy("l_suppkey").orderBy("q")
    wp = Window.partitionBy("l_suppkey").orderBy("p")
    cq = Window.partitionBy("l_suppkey", "q")
    cp = Window.partitionBy("l_suppkey", "p")
    r = li.select(
        "l_suppkey",
        (
            F.rank().over(wq)
            + (F.count(F.lit(1)).over(cq) - F.lit(1)) / F.lit(2.0)
        ).alias("rq"),
        (
            F.rank().over(wp)
            + (F.count(F.lit(1)).over(cp) - F.lit(1)) / F.lit(2.0)
        ).alias("rp"),
    )
    # corr() throws DIVIDE_BY_ZERO under ANSI mode when a rank column
    # has zero variance (an all-tied supplier); the explicit
    # covar/stddev form with try_divide yields NULL there — exactly
    # DuckDB's corr() semantics — and is filtered below.
    g = (
        r.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.try_divide(
                    F.covar_samp("rq", "rp"),
                    F.stddev_samp("rq") * F.stddev_samp("rp"),
                ),
                6,
            ).alias("rho"),
        )
        .filter((F.col("n_lines") >= 20) & F.col("rho").isNotNull())
    )
    return g.orderBy(F.col("rho").desc(), F.col("l_suppkey").asc()).limit(20)


@query(
    "w23_spearman_lowcard",
    # Determinism: identical policy to w22 — exact average ranks,
    # dround 6 on the order-dependent corr.
    sql=f"""
    WITH b AS (
      SELECT l_returnflag AS flag, l_quantity AS q, l_extendedprice AS p
      FROM lineitem
    ),
    r AS (
      SELECT flag,
             rank() OVER (PARTITION BY flag ORDER BY q)
               + (count(*) OVER (PARTITION BY flag, q) - 1) / 2.0 AS rq,
             rank() OVER (PARTITION BY flag ORDER BY p)
               + (count(*) OVER (PARTITION BY flag, p) - 1) / 2.0 AS rp
      FROM b
    )
    SELECT flag, count(*) AS n_lines,
           {dround(
               'covar_samp(rq, rp)'
               ' / (stddev_samp(rq) * stddev_samp(rp))', 6)} AS rho
    FROM r GROUP BY flag
    ORDER BY flag
    """,
    tags=("W1", "A10"),
)
def w23_spearman_lowcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per RETURN FLAG — the fixed-
    cardinality-group variant of w22. With 3 groups forever (a flag
    domain, not an entity key), w22's per-group rank windows would
    funnel ~33% of a 100 TB table through ONE task each; this query
    instead takes its average ranks from the grouped-histogram rank
    map (operators/ranks.grouped_avg_rank_map, the c35 idiom):
    avg_rank(v) = #{<v} + (#{=v}+1)/2 needs only per-(group, value)
    counts and a bucketed per-group exclusive prefix over DISTINCT
    values.

    Plan shape for 100 TB: the (flag, value) count aggregation
    collapses the fact table to |flags| × |distinct values| rows
    (value domains are fixed: ~50 quantities, ~O(100k) prices — they
    do NOT grow with row count), so the prefix machinery runs over a
    bounded table with |flags|×64-bucket parallelism and the rank
    maps join back as small broadcast-scale relations. Every stage is
    key-parallel; nothing sees a per-flag funnel. Ranks stay exact
    half-integers, bit-equal to the Window form (property-pinned);
    corr is an algebraic map-side-partial aggregate over raw rows.
    """
    from nipd_spark.operators.ranks import grouped_avg_rank_map

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("q"),
        F.col("l_extendedprice").alias("p"),
    )
    # both maps derive from the ORIGINAL relation (building the second
    # map over the first join's output would recompute that join's
    # lineage inside the count agg — measured 5x slower)
    rq_map = grouped_avg_rank_map(li, "flag", "q", out="rq")
    rp_map = grouped_avg_rank_map(li, "flag", "p", out="rp")
    r = (
        li.join(F.broadcast(rq_map), ["flag", "q"])
        .join(F.broadcast(rp_map), ["flag", "p"])
        .select("flag", "rq", "rp")
    )
    return (
        r.groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.try_divide(
                    F.covar_samp("rq", "rp"),
                    F.stddev_samp("rq") * F.stddev_samp("rp"),
                ),
                6,
            ).alias("rho"),
        )
        .orderBy("flag")
    )


@query(
    "w24_pattern_vshape",
    # Oracle: the identical gaps-and-islands compilation spelled as
    # DuckDB window SQL — labels from lag, change-point cumsum islands,
    # per-island collapse, adjacent-pair detection. Counts are exact
    # integers; bottom_val/recovery are stored doubles / one identical-
    # shape subtraction — bit-equal cross-engine, unrounded.
    sql=f"""
    WITH e AS (
      SELECT user_id, {ts_us()} AS ts, event_id, value,
             row_number() OVER w AS rn,
             lag(value) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {ts_us()}, event_id)
    ),
    lbl AS (
      SELECT *, CASE WHEN prev IS NULL THEN NULL
                     WHEN value > prev THEN 'UP'
                     WHEN value < prev THEN 'DOWN'
                     ELSE 'FLAT' END AS lab
      FROM e
    ),
    isl AS (
      SELECT *, sum(CASE WHEN lab IS NULL OR plab IS NULL
                          OR lab <> plab THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY rn) AS island
      FROM (SELECT *, lag(lab) OVER (PARTITION BY user_id ORDER BY rn)
                        AS plab
            FROM lbl)
    ),
    seg AS (
      SELECT user_id, island, min(lab) AS lab,
             CAST(count(*) AS BIGINT) AS n,
             min(ts) AS start_ts, max(ts) AS end_ts,
             arg_max(value, rn) AS last_val
      FROM isl GROUP BY user_id, island
    ),
    m AS (
      SELECT user_id, lab, lag(lab) OVER wi AS plab,
             lag(n) OVER wi AS n_down, n AS n_up,
             lag(start_ts) OVER wi AS start_ts,
             lag(end_ts) OVER wi AS bottom_ts,
             end_ts,
             lag(last_val) OVER wi AS bottom_val,
             last_val
      FROM seg
      WINDOW wi AS (PARTITION BY user_id ORDER BY island)
    )
    SELECT user_id, start_ts, bottom_ts, end_ts,
           n_down, n_up, bottom_val,
           last_val - bottom_val AS recovery
    FROM m WHERE lab = 'UP' AND plab = 'DOWN'
    """,
    tags=("W10", "W5", "A11"),
)
def w24_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching (SURVEY §2.5 W10): the MATCH_RECOGNIZE
    run-pattern subset [PK: ISO/IEC SQL:2016 row pattern recognition;
    Oracle/Snowflake MATCH_RECOGNIZE; Flink CEP], compiled to keyed
    windows by operators/patterns.match_runs — here the classic
    V-shape: per user, every maximal DOWN+ UP+ dip-and-recover in the
    event-value sequence, ONE ROW PER MATCH with SKIP PAST LAST ROW
    semantics (exact for this pattern — DOWN/UP has no border, so
    matches provably cannot overlap; self-overlapping patterns like
    the W-shape are loudly rejected by the operator). Measures: the
    dip's start/bottom/end timestamps, run lengths, bottom value and
    recovery height.

    Plan shape for 100 TB: label + island windows and the detection
    window all partition on user_id — a key whose cardinality GROWS
    with the data, so parallelism scales (the sql7 lesson); the island
    collapse shrinks the relation before detection; no bounded-domain
    partition key, no Python, no sequential scan anywhere.
    """
    from nipd_spark.operators.patterns import match_runs

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = ev.withColumn("rn", F.row_number().over(w))
    prev = F.lag("value").over(w)
    label = (
        F.when(prev.isNull(), F.lit(None).cast("string"))
        .when(F.col("value") > prev, F.lit("UP"))
        .when(F.col("value") < prev, F.lit("DOWN"))
        .otherwise(F.lit("FLAT"))
    )
    matches = match_runs(
        ev,
        key="user_id",
        order=["ts", "event_id"],
        label=label,
        pattern=["DOWN", "UP"],
        island_aggs={
            "start_ts": F.min("ts"),
            "end_ts": F.max("ts"),
            "last_val": F.max_by("value", F.col("rn")),
        },
    )
    return matches.select(
        "user_id",
        F.col("seg0_start_ts").alias("start_ts"),
        F.col("seg0_end_ts").alias("bottom_ts"),
        F.col("seg1_end_ts").alias("end_ts"),
        F.col("seg0_n").alias("n_down"),
        F.col("seg1_n").alias("n_up"),
        F.col("seg0_last_val").alias("bottom_val"),
        (F.col("seg1_last_val") - F.col("seg0_last_val")).alias(
            "recovery"
        ),
    )


@query(
    "w24b_pattern_dip_stabilize_recover",
    # Oracle: the same islands compilation with a TWO-lag detection
    # chain (k=3) in DuckDB window SQL. Labels classify the QUANTIZED
    # value band (floor(value/25)) so FLAT plateaus actually occur on
    # a continuous measure; every output is an exact integer or µs
    # timestamp.
    sql=f"""
    WITH e AS (
      SELECT user_id, {ts_us()} AS ts, event_id,
             CAST(floor(value / 25) AS BIGINT) AS band,
             row_number() OVER w AS rn,
             lag(CAST(floor(value / 25) AS BIGINT)) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {ts_us()}, event_id)
    ),
    lbl AS (
      SELECT *, CASE WHEN prev IS NULL THEN NULL
                     WHEN band > prev THEN 'UP'
                     WHEN band < prev THEN 'DOWN'
                     ELSE 'FLAT' END AS lab
      FROM e
    ),
    isl AS (
      SELECT *, sum(CASE WHEN lab IS NULL OR plab IS NULL
                          OR lab <> plab THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY rn) AS island
      FROM (SELECT *, lag(lab) OVER (PARTITION BY user_id ORDER BY rn)
                        AS plab
            FROM lbl)
    ),
    seg AS (
      SELECT user_id, island, min(lab) AS lab,
             CAST(count(*) AS BIGINT) AS n,
             min(ts) AS start_ts, max(ts) AS end_ts,
             arg_max(band, rn) AS last_band
      FROM isl GROUP BY user_id, island
    ),
    m AS (
      SELECT user_id, lab,
             lag(lab) OVER wi AS lab1, lag(lab, 2) OVER wi AS lab2,
             lag(n, 2) OVER wi AS n_down,
             lag(n) OVER wi AS n_flat, n AS n_up,
             lag(start_ts, 2) OVER wi AS start_ts,
             end_ts,
             lag(last_band) OVER wi AS plateau_band
      FROM seg
      WINDOW wi AS (PARTITION BY user_id ORDER BY island)
    )
    SELECT user_id, start_ts, end_ts, n_down, n_flat, n_up, plateau_band
    FROM m WHERE lab = 'UP' AND lab1 = 'FLAT' AND lab2 = 'DOWN'
    """,
    tags=("W10", "W5"),
)
def w24b_pattern_dip_stabilize_recover(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The k=3 run pattern DOWN+ FLAT+ UP+ — dip, stabilize, recover —
    through the same W10 compiler (operators/patterns.match_runs): the
    three-label sequence is border-free (no proper prefix equals a
    suffix), so the lag-chain detection is still exactly SKIP PAST
    LAST ROW. Exercises the multi-lag detection path the V-shape
    (k=2) doesn't. Labels classify the QUANTIZED value band
    (floor(value/25)) — on a continuous measure exact-equality FLAT
    never fires (measured: zero matches on the raw doubles), so the
    stabilize leg is defined on the banded level, the standard
    practice for plateau detection on noisy series. Measures: the
    full span, the three run lengths and the plateau band.

    Plan shape for 100 TB: identical to w24 — every window on the
    growing user_id key; detection adds one more lag over the SAME
    island window (no extra shuffle).
    """
    from nipd_spark.operators.patterns import match_runs

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") / 25).cast("long").alias("band"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = ev.withColumn("rn", F.row_number().over(w))
    prev = F.lag("band").over(w)
    label = (
        F.when(prev.isNull(), F.lit(None).cast("string"))
        .when(F.col("band") > prev, F.lit("UP"))
        .when(F.col("band") < prev, F.lit("DOWN"))
        .otherwise(F.lit("FLAT"))
    )
    matches = match_runs(
        ev,
        key="user_id",
        order=["ts", "event_id"],
        label=label,
        pattern=["DOWN", "FLAT", "UP"],
        island_aggs={
            "start_ts": F.min("ts"),
            "end_ts": F.max("ts"),
            "last_band": F.max_by("band", F.col("rn")),
        },
    )
    return matches.select(
        "user_id",
        F.col("seg0_start_ts").alias("start_ts"),
        F.col("seg2_end_ts").alias("end_ts"),
        F.col("seg0_n").alias("n_down"),
        F.col("seg1_n").alias("n_flat"),
        F.col("seg2_n").alias("n_up"),
        F.col("seg1_last_band").alias("plateau_band"),
    )


@query(
    "w24c_pattern_wshape",
    # Oracle (r12, upgraded from rows-only): the greedy leftmost
    # non-overlapping island scan as a DuckDB RECURSIVE CTE — the
    # per-key NFA walk itself, advanced +4 islands on a W match and +1
    # otherwise, so SKIP PAST LAST ROW over the self-overlapping
    # pattern is literal (the w27b technique). Counts exact integers;
    # timestamps exact µs.
    sql=f"""
    WITH RECURSIVE e AS (
      SELECT user_id, {ts_us()} AS ts, event_id,
             CAST(floor(value / 25) AS BIGINT) AS band,
             row_number() OVER w AS rn,
             lag(CAST(floor(value / 25) AS BIGINT)) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {ts_us()}, event_id)
    ),
    lbl AS (
      SELECT *, CASE WHEN prev IS NULL THEN NULL
                     WHEN band > prev THEN 'UP'
                     WHEN band < prev THEN 'DOWN'
                     ELSE 'FLAT' END AS lab
      FROM e
    ),
    isl0 AS (
      SELECT *, sum(CASE WHEN lab IS NULL OR plab IS NULL
                          OR lab <> plab THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY rn) AS island
      FROM (SELECT *, lag(lab) OVER (PARTITION BY user_id ORDER BY rn)
                        AS plab
            FROM lbl)
    ),
    isl AS MATERIALIZED (
      SELECT user_id, island, min(lab) AS lab,
             CAST(count(*) AS BIGINT) AS n,
             min(ts) AS start_ts, max(ts) AS end_ts,
             row_number() OVER (PARTITION BY user_id ORDER BY island)
               AS pos
      FROM isl0 GROUP BY user_id, island
    ),
    steps AS MATERIALIZED (
      SELECT i1.user_id, i1.pos,
             (i1.lab = 'DOWN' AND i2.lab = 'UP'
              AND i3.lab = 'DOWN' AND i4.lab = 'UP') AS w_match,
             i1.start_ts AS s_ts, i2.end_ts AS m_ts, i4.end_ts AS e_ts,
             i1.n + i2.n + i3.n + i4.n AS nr
      FROM isl i1
      LEFT JOIN isl i2 ON i2.user_id = i1.user_id AND i2.pos = i1.pos + 1
      LEFT JOIN isl i3 ON i3.user_id = i1.user_id AND i3.pos = i1.pos + 2
      LEFT JOIN isl i4 ON i4.user_id = i1.user_id AND i4.pos = i1.pos + 3
    ),
    scan AS (
      SELECT user_id, CAST(1 AS BIGINT) AS pos,
             CAST(NULL AS TIMESTAMP) AS start_ts,
             CAST(NULL AS TIMESTAMP) AS mid_ts,
             CAST(NULL AS TIMESTAMP) AS end_ts,
             CAST(NULL AS BIGINT) AS n_rows
      FROM (SELECT DISTINCT user_id FROM isl)
      UNION ALL
      SELECT t.user_id,
             s.pos + CASE WHEN coalesce(t.w_match, FALSE)
                          THEN 4 ELSE 1 END,
             CASE WHEN coalesce(t.w_match, FALSE) THEN t.s_ts END,
             CASE WHEN coalesce(t.w_match, FALSE) THEN t.m_ts END,
             CASE WHEN coalesce(t.w_match, FALSE) THEN t.e_ts END,
             CASE WHEN coalesce(t.w_match, FALSE) THEN t.nr END
      FROM scan s
      JOIN steps t ON t.user_id = s.user_id AND t.pos = s.pos
    )
    SELECT user_id, start_ts, mid_ts, end_ts, n_rows
    FROM scan WHERE start_ts IS NOT NULL
    """,
    tags=("W10", "D6"),
)
def w24c_pattern_wshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The W-shape (double dip: DOWN+ UP+ DOWN+ UP+) per user over the
    banded event values — a SELF-OVERLAPPING pattern (the label
    sequence has the border DOWN UP), so the windows-compiled matcher
    rejects it by design and the sequential escape hatch runs instead:
    operators/patterns.match_runs_sequential — the SAME distributed
    island collapse, then one Arrow-batched applyInPandas greedy scan
    per user over the ISLAND sequence (never raw rows).

    Oracled since r12: AFTER MATCH SKIP PAST LAST ROW over a
    self-overlapping pattern is inherently sequential greedy
    consumption — not SET-based SQL, but it IS iterative SQL: a
    DuckDB recursive CTE walks each user's island sequence exactly
    like the NFA (the w27b technique), value-hashing the full match
    set. The matcher is additionally fuzz-pinned to re.finditer and
    property-pinned to a from-scratch sequential reference.

    Plan shape for 100 TB: two keyed window stages + one keyed
    applyInPandas over the collapsed islands — per-user island
    sequences are bounded by the user's row share; Python sees runs,
    not rows.
    """
    from nipd_spark.operators.patterns import match_runs_sequential

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") / 25).cast("long").alias("band"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("band").over(w)
    label = (
        F.when(prev.isNull(), F.lit(None).cast("string"))
        .when(F.col("band") > prev, F.lit("UP"))
        .when(F.col("band") < prev, F.lit("DOWN"))
        .otherwise(F.lit("FLAT"))
    )
    matches = match_runs_sequential(
        ev,
        key="user_id",
        order=["ts", "event_id"],
        label=label,
        pattern=["DOWN", "UP", "DOWN", "UP"],
        island_aggs={
            "start_ts": F.min("ts"),
            "end_ts": F.max("ts"),
        },
    )
    return matches.select(
        "user_id",
        F.col("seg0_start_ts").alias("start_ts"),
        F.col("seg1_end_ts").alias("mid_ts"),
        F.col("seg3_end_ts").alias("end_ts"),
        (
            F.col("seg0_n") + F.col("seg1_n")
            + F.col("seg2_n") + F.col("seg3_n")
        ).alias("n_rows"),
    )


@query(
    "w25_pattern_quantified",
    # Oracle: the w24b islands compilation with the quantifier bounds
    # as plain per-island length predicates in the detection WHERE —
    # exact because border-free occurrences cannot overlap, so
    # detect-then-filter equals the NFA's match-under-bounds. Counts
    # are exact integers; timestamps exact µs.
    sql=f"""
    WITH e AS (
      SELECT user_id, {ts_us()} AS ts, event_id,
             CAST(floor(value / 25) AS BIGINT) AS band,
             row_number() OVER w AS rn,
             lag(CAST(floor(value / 25) AS BIGINT)) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {ts_us()}, event_id)
    ),
    lbl AS (
      SELECT *, CASE WHEN prev IS NULL THEN NULL
                     WHEN band > prev THEN 'UP'
                     WHEN band < prev THEN 'DOWN'
                     ELSE 'FLAT' END AS lab
      FROM e
    ),
    isl AS (
      SELECT *, sum(CASE WHEN lab IS NULL OR plab IS NULL
                          OR lab <> plab THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY rn) AS island
      FROM (SELECT *, lag(lab) OVER (PARTITION BY user_id ORDER BY rn)
                        AS plab
            FROM lbl)
    ),
    seg AS (
      SELECT user_id, island, min(lab) AS lab,
             CAST(count(*) AS BIGINT) AS n,
             min(ts) AS start_ts, max(ts) AS end_ts,
             arg_max(band, rn) AS last_band
      FROM isl GROUP BY user_id, island
    ),
    m AS (
      SELECT user_id, lab,
             lag(lab) OVER wi AS lab1, lag(lab, 2) OVER wi AS lab2,
             lag(n, 2) OVER wi AS n_down,
             lag(n) OVER wi AS n_flat, n AS n_up,
             lag(start_ts, 2) OVER wi AS start_ts,
             end_ts,
             lag(last_band) OVER wi AS plateau_band
      FROM seg
      WINDOW wi AS (PARTITION BY user_id ORDER BY island)
    )
    SELECT user_id, start_ts, end_ts, n_down, n_flat, n_up, plateau_band
    FROM m WHERE lab = 'UP' AND lab1 = 'FLAT' AND lab2 = 'DOWN'
      AND n_down >= 2 AND n_flat <= 2
    """,
    tags=("W10", "W5"),
)
def w25_pattern_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified run pattern (W10 v2, r12): DOWN{2,} FLAT{1,2} UP+ —
    a sustained dip (at least 2 ticks), a SHORT plateau (1-2 ticks),
    then recovery — through operators/patterns.match_runs, whose
    bounded quantifiers compile to per-island row-count filters inside
    the same lag-chain detection (no extra shuffle, no Python). The
    bounds are exact at island granularity because an interior leg
    must consume its whole maximal run and end legs are unbounded —
    the rules the operator enforces loudly (fuzz-pinned against the
    regex-NFA ground truth in tests/test_hypothesis_edges.py).

    Plan shape for 100 TB: identical to w24b — every window on the
    growing user_id key; quantifier bounds are extra predicates on
    already-lagged columns, zero additional stages.
    """
    from nipd_spark.operators.patterns import match_runs

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") / 25).cast("long").alias("band"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = ev.withColumn("rn", F.row_number().over(w))
    prev = F.lag("band").over(w)
    label = (
        F.when(prev.isNull(), F.lit(None).cast("string"))
        .when(F.col("band") > prev, F.lit("UP"))
        .when(F.col("band") < prev, F.lit("DOWN"))
        .otherwise(F.lit("FLAT"))
    )
    matches = match_runs(
        ev,
        key="user_id",
        order=["ts", "event_id"],
        label=label,
        pattern=[("DOWN", 2, None), ("FLAT", 1, 2), ("UP", 1, None)],
        island_aggs={
            "start_ts": F.min("ts"),
            "end_ts": F.max("ts"),
            "last_band": F.max_by("band", F.col("rn")),
        },
    )
    return matches.select(
        "user_id",
        F.col("seg0_start_ts").alias("start_ts"),
        F.col("seg2_end_ts").alias("end_ts"),
        F.col("seg0_n").alias("n_down"),
        F.col("seg1_n").alias("n_flat"),
        F.col("seg2_n").alias("n_up"),
        F.col("seg1_last_band").alias("plateau_band"),
    )


@query(
    "w25b_pattern_optional",
    # Oracle: end-anchored detection with BOTH expansion forms of the
    # optional leg spelled as a CASE — the long form (FLAT present,
    # within bounds) and the short form (DOWN directly under UP). The
    # two forms are mutually exclusive at one end island (lab1 is
    # either FLAT or DOWN), so the CASE is exact; measures of the
    # absent leg surface as NULL, matching the operator contract.
    sql=f"""
    WITH e AS (
      SELECT user_id, {ts_us()} AS ts, event_id,
             CAST(floor(value / 25) AS BIGINT) AS band,
             row_number() OVER w AS rn,
             lag(CAST(floor(value / 25) AS BIGINT)) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {ts_us()}, event_id)
    ),
    lbl AS (
      SELECT *, CASE WHEN prev IS NULL THEN NULL
                     WHEN band > prev THEN 'UP'
                     WHEN band < prev THEN 'DOWN'
                     ELSE 'FLAT' END AS lab
      FROM e
    ),
    isl AS (
      SELECT *, sum(CASE WHEN lab IS NULL OR plab IS NULL
                          OR lab <> plab THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY rn) AS island
      FROM (SELECT *, lag(lab) OVER (PARTITION BY user_id ORDER BY rn)
                        AS plab
            FROM lbl)
    ),
    seg AS (
      SELECT user_id, island, min(lab) AS lab,
             CAST(count(*) AS BIGINT) AS n,
             min(ts) AS start_ts, max(ts) AS end_ts
      FROM isl GROUP BY user_id, island
    ),
    m AS (
      SELECT user_id, lab,
             lag(lab) OVER wi AS lab1, lag(lab, 2) OVER wi AS lab2,
             lag(n) OVER wi AS n1, lag(n, 2) OVER wi AS n2, n AS n_up,
             lag(start_ts) OVER wi AS s1, lag(start_ts, 2) OVER wi AS s2,
             end_ts
      FROM seg
      WINDOW wi AS (PARTITION BY user_id ORDER BY island)
    ),
    det AS (
      SELECT *,
             CASE WHEN lab = 'UP' AND lab1 = 'FLAT' AND n1 <= 2
                       AND lab2 = 'DOWN' THEN 2
                  WHEN lab = 'UP' AND lab1 = 'DOWN' THEN 1 END AS form
      FROM m
    )
    SELECT user_id,
           CASE WHEN form = 2 THEN s2 ELSE s1 END AS start_ts,
           end_ts,
           CASE WHEN form = 2 THEN n2 ELSE n1 END AS n_down,
           CASE WHEN form = 2 THEN n1 END AS n_flat,
           n_up
    FROM det WHERE form IS NOT NULL
    """,
    tags=("W10", "W5"),
)
def w25b_pattern_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optional pattern leg (W10 v2, r12): DOWN+ FLAT{0,2} UP+ — dip,
    an OPTIONAL short plateau, recover. The operator expands the
    optional leg into its present/absent forms ([DOWN,FLAT,UP] and
    [DOWN,UP]), validates that no two expansion occurrences with
    different ends can overlap (they cannot here: the expansions
    diverge at position 1), and ORs their lag chains in one detection
    pass; a match through the short form carries NULL seg columns for
    the absent leg — exactly the greedy NFA's behavior, fuzz-pinned
    against re.finditer in tests/test_hypothesis_edges.py.

    Plan shape for 100 TB: same stages as w24b; the second expansion
    adds predicates over the SAME lagged columns — one window, one
    island collapse, one detection pass, regardless of expansion
    count (bounded at 32).
    """
    from nipd_spark.operators.patterns import match_runs

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") / 25).cast("long").alias("band"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("band").over(w)
    label = (
        F.when(prev.isNull(), F.lit(None).cast("string"))
        .when(F.col("band") > prev, F.lit("UP"))
        .when(F.col("band") < prev, F.lit("DOWN"))
        .otherwise(F.lit("FLAT"))
    )
    matches = match_runs(
        ev,
        key="user_id",
        order=["ts", "event_id"],
        label=label,
        pattern=[("DOWN", 1, None), ("FLAT", 0, 2), ("UP", 1, None)],
        island_aggs={
            "start_ts": F.min("ts"),
            "end_ts": F.max("ts"),
        },
    )
    return matches.select(
        "user_id",
        F.col("seg0_start_ts").alias("start_ts"),
        F.col("seg2_end_ts").alias("end_ts"),
        F.col("seg0_n").alias("n_down"),
        F.col("seg1_n").alias("n_flat"),
        F.col("seg2_n").alias("n_up"),
    )


# shared DuckDB oracle for the ALL ROWS PER MATCH V-shape (w26 and its
# SQL-surface twin sql11): islands + end-anchored detection + per-user
# match ordinals + attribution of each island row to the match whose
# span covers it (spans are [end-1, end] for the k=2 V pattern).
ALL_ROWS_VSHAPE_ORACLE = f"""
WITH e AS (
  SELECT user_id, {ts_us()} AS ts, event_id, value,
         row_number() OVER w AS rn,
         lag(value) OVER w AS prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY {ts_us()}, event_id)
),
lbl AS (
  SELECT *, CASE WHEN prev IS NULL THEN NULL
                 WHEN value > prev THEN 'UP'
                 WHEN value < prev THEN 'DOWN'
                 ELSE 'FLAT' END AS lab
  FROM e
),
isl AS (
  SELECT *, sum(CASE WHEN lab IS NULL OR plab IS NULL
                      OR lab <> plab THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY rn) AS island
  FROM (SELECT *, lag(lab) OVER (PARTITION BY user_id ORDER BY rn)
                    AS plab
        FROM lbl)
),
seg AS (
  SELECT user_id, island, min(lab) AS lab
  FROM isl GROUP BY user_id, island
),
ends AS (
  SELECT user_id, island AS end_isl,
         row_number() OVER (PARTITION BY user_id ORDER BY island)
           AS match_no
  FROM (SELECT user_id, island, lab,
               lag(lab) OVER (PARTITION BY user_id ORDER BY island)
                 AS plab
        FROM seg)
  WHERE lab = 'UP' AND plab = 'DOWN'
)
SELECT i.user_id, i.ts, i.event_id, i.value,
       CAST(m.match_no AS BIGINT) AS match_no, i.lab AS classifier
FROM isl i JOIN ends m
  ON i.user_id = m.user_id
 AND i.island IN (m.end_isl - 1, m.end_isl)
"""


@query("w26_pattern_all_rows", sql=ALL_ROWS_VSHAPE_ORACLE, tags=("W10", "W5"))
def w26_pattern_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL ROWS PER MATCH (W10 v2, r12): every event row participating
    in a V-shape match, tagged with MATCH_NUMBER() (1-based per user,
    in match order) and CLASSIFIER() (the row's matched label) — the
    ISO output mode the ONE-ROW queries (w24 family) don't exercise,
    via operators/patterns.match_runs_all_rows. Row-level tagging is
    what a downstream pipeline consumes (e.g. extracting the raw
    ticks inside every dip-and-recover episode for training windows).

    Plan shape for 100 TB: the same keyed label/island windows and
    lag-chain detection as w24, a cumulative match counter over the
    SAME island window, bounded lead-lookahead attribution (pattern
    length, not data, bounds the lookahead), then ONE co-keyed equi
    join of the attributed islands back to the raw rows on
    (user_id, island) — all stages keyed on the growing user_id.
    Oracle: the identical compilation in DuckDB window SQL with an
    IN-list attribution join.
    """
    from nipd_spark.operators.patterns import match_runs_all_rows

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    label = (
        F.when(prev.isNull(), F.lit(None).cast("string"))
        .when(F.col("value") > prev, F.lit("UP"))
        .when(F.col("value") < prev, F.lit("DOWN"))
        .otherwise(F.lit("FLAT"))
    )
    return match_runs_all_rows(
        ev,
        key="user_id",
        order=["ts", "event_id"],
        label=label,
        pattern=["DOWN", "UP"],
    ).select("user_id", "ts", "event_id", "value", "match_no", "classifier")


@query(
    "w27_pattern_alternation",
    # Oracle: end-anchored detection where the group's two branches
    # are the CASE arms at the end island — exact because the branch
    # label sequences diverge at position 1 (FLAT vs UP), so at any
    # end island at most one branch can match and no two occurrences
    # with different ends can overlap. Counts exact integers;
    # timestamps exact µs.
    sql=f"""
    WITH e AS (
      SELECT user_id, {ts_us()} AS ts, event_id,
             CAST(floor(value / 25) AS BIGINT) AS band,
             row_number() OVER w AS rn,
             lag(CAST(floor(value / 25) AS BIGINT)) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {ts_us()}, event_id)
    ),
    lbl AS (
      SELECT *, CASE WHEN prev IS NULL THEN NULL
                     WHEN band > prev THEN 'UP'
                     WHEN band < prev THEN 'DOWN'
                     ELSE 'FLAT' END AS lab
      FROM e
    ),
    isl AS (
      SELECT *, sum(CASE WHEN lab IS NULL OR plab IS NULL
                          OR lab <> plab THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY rn) AS island
      FROM (SELECT *, lag(lab) OVER (PARTITION BY user_id ORDER BY rn)
                        AS plab
            FROM lbl)
    ),
    seg AS (
      SELECT user_id, island, min(lab) AS lab,
             CAST(count(*) AS BIGINT) AS n,
             min(ts) AS start_ts, max(ts) AS end_ts
      FROM isl GROUP BY user_id, island
    ),
    m AS (
      SELECT user_id, lab, lag(lab) OVER wi AS lab1,
             lag(n) OVER wi AS n1, n,
             lag(start_ts) OVER wi AS s1, end_ts
      FROM seg
      WINDOW wi AS (PARTITION BY user_id ORDER BY island)
    )
    SELECT user_id, s1 AS start_ts, end_ts, n1 AS n_down,
           CASE WHEN lab = 'FLAT' THEN 'stabilize'
                ELSE 'rebound' END AS resolution,
           n AS n_res
    FROM m WHERE lab IN ('FLAT', 'UP') AND lab1 = 'DOWN' AND n1 >= 2
    """,
    tags=("W10", "W5"),
)
def w27_pattern_alternation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alternation group (W10 v3, r12): DOWN{2,} (FLAT+ | UP+) — a
    sustained dip resolving EITHER into stabilization or a rebound,
    one pattern [PK: ISO/IEC 9075-2:2016 §R alternation; Oracle/
    Snowflake MATCH_RECOGNIZE '|']. operators/patterns.match_runs
    compiles the group by branch expansion ([DOWN,FLAT] and
    [DOWN,UP], distinct flattened leg positions) ORed into one
    lag-chain detection pass; which branch matched is read off which
    branch's seg columns are non-NULL — no second pattern pass, no
    Python. Fuzz-pinned against the regex-NFA ground truth
    (tests/test_hypothesis_edges.py pattern #7).

    Plan shape for 100 TB: identical to w25 — label + island windows
    and the detection window all keyed on the growing user_id;
    alternation adds WHEN arms over already-lagged columns, zero
    additional stages, zero extra shuffles.
    """
    from nipd_spark.operators.patterns import match_runs

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") / 25).cast("long").alias("band"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("band").over(w)
    label = (
        F.when(prev.isNull(), F.lit(None).cast("string"))
        .when(F.col("band") > prev, F.lit("UP"))
        .when(F.col("band") < prev, F.lit("DOWN"))
        .otherwise(F.lit("FLAT"))
    )
    matches = match_runs(
        ev,
        key="user_id",
        order=["ts", "event_id"],
        label=label,
        pattern=[
            ("DOWN", 2, None),
            [[("FLAT", 1, None)], [("UP", 1, None)]],
        ],
        island_aggs={
            "start_ts": F.min("ts"),
            "end_ts": F.max("ts"),
        },
    )
    return matches.select(
        "user_id",
        F.col("seg0_start_ts").alias("start_ts"),
        F.coalesce("seg1_end_ts", "seg2_end_ts").alias("end_ts"),
        F.col("seg0_n").alias("n_down"),
        F.when(F.col("seg1_n").isNotNull(), F.lit("stabilize"))
        .otherwise(F.lit("rebound"))
        .alias("resolution"),
        F.coalesce("seg1_n", "seg2_n").alias("n_res"),
    )


@query(
    "w27b_pattern_permute",
    # Oracle: the greedy leftmost non-overlapping island scan spelled
    # as a DuckDB RECURSIVE CTE — the per-key NFA walk itself, advanced
    # +2 islands on a match and +1 otherwise, so SKIP PAST LAST ROW is
    # literal, not approximated. The first sequential-matcher query
    # with a full value-hash oracle (the w24c W-shape stayed
    # rows-only). Counts exact integers; timestamps exact µs.
    sql=f"""
    WITH RECURSIVE e AS (
      SELECT user_id, {ts_us()} AS ts, event_id,
             CAST(floor(value / 25) AS BIGINT) AS band,
             row_number() OVER w AS rn,
             lag(CAST(floor(value / 25) AS BIGINT)) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {ts_us()}, event_id)
    ),
    lbl AS (
      SELECT *, CASE WHEN prev IS NULL THEN NULL
                     WHEN band > prev THEN 'UP'
                     WHEN band < prev THEN 'DOWN'
                     ELSE 'FLAT' END AS lab
      FROM e
    ),
    isl0 AS (
      SELECT *, sum(CASE WHEN lab IS NULL OR plab IS NULL
                          OR lab <> plab THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY rn) AS island
      FROM (SELECT *, lag(lab) OVER (PARTITION BY user_id ORDER BY rn)
                        AS plab
            FROM lbl)
    ),
    isl AS MATERIALIZED (
      SELECT user_id, island, min(lab) AS lab,
             CAST(count(*) AS BIGINT) AS n,
             min(ts) AS start_ts, max(ts) AS end_ts,
             row_number() OVER (PARTITION BY user_id ORDER BY island)
               AS pos
      FROM isl0 GROUP BY user_id, island
    ),
    steps AS MATERIALIZED (
      SELECT i1.user_id, i1.pos,
             CASE WHEN i1.lab = 'DOWN' AND i2.lab = 'UP' THEN 'valley'
                  WHEN i1.lab = 'UP' AND i2.lab = 'DOWN' THEN 'peak'
             END AS shape,
             i1.start_ts AS s_ts, i2.end_ts AS e_ts,
             i1.n + i2.n AS nr
      FROM isl i1 LEFT JOIN isl i2
        ON i2.user_id = i1.user_id AND i2.pos = i1.pos + 1
    ),
    scan AS (
      SELECT user_id, CAST(1 AS BIGINT) AS pos,
             CAST(NULL AS VARCHAR) AS shape,
             CAST(NULL AS TIMESTAMP) AS start_ts,
             CAST(NULL AS TIMESTAMP) AS end_ts,
             CAST(NULL AS BIGINT) AS n_rows
      FROM (SELECT DISTINCT user_id FROM isl)
      UNION ALL
      SELECT t.user_id,
             s.pos + CASE WHEN t.shape IS NOT NULL THEN 2 ELSE 1 END,
             t.shape, t.s_ts, t.e_ts, t.nr
      FROM scan s
      JOIN steps t ON t.user_id = s.user_id AND t.pos = s.pos
    )
    SELECT user_id, shape, start_ts, end_ts, n_rows
    FROM scan WHERE shape IS NOT NULL
    """,
    tags=("W10", "W5"),
)
def w27b_pattern_permute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMUTE pattern (W10 v3, r12): PERMUTE(DOWN+, UP+) — every
    maximal band move-pair in EITHER order (a valley DOWN→UP or a
    peak UP→DOWN) as one pattern [PK: ISO/IEC 9075-2:2016 §R PERMUTE].
    PERMUTE compiles to the alternation of its orderings; the two
    branches overlap on the island string D U D (a valley's UP is the
    next peak's start), so the operator REJECTS the windows
    compilation and this query routes — deliberately — through
    match_runs_sequential, the bucketed per-key greedy island scan.
    The oracle runs the SAME greedy leftmost non-overlapping scan as
    a DuckDB recursive CTE, making this the first sequential-matcher
    query whose SKIP PAST LAST semantics are value-hash-verified
    (w24c stayed rows-only); the matcher itself is also fuzz-pinned
    to re.finditer (tests/test_hypothesis_edges.py pattern #9).

    Plan shape for 100 TB: the island collapse is the same two keyed
    window stages as every W10 query (user_id-keyed, growing key);
    the Python scan sees ISLANDS, never rows, grouped into 256
    xxhash64 buckets so Python invocations number buckets, not users
    (the w24c lesson). Matches per user are bounded by the user's
    island count — linear end to end.
    """
    from nipd_spark.operators.patterns import (
        match_runs_sequential,
        parse_pattern,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") / 25).cast("long").alias("band"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("band").over(w)
    label = (
        F.when(prev.isNull(), F.lit(None).cast("string"))
        .when(F.col("band") > prev, F.lit("UP"))
        .when(F.col("band") < prev, F.lit("DOWN"))
        .otherwise(F.lit("FLAT"))
    )
    matches = match_runs_sequential(
        ev,
        key="user_id",
        order=["ts", "event_id"],
        label=label,
        pattern=parse_pattern("PERMUTE(DOWN+, UP+)"),
        island_aggs={
            "start_ts": F.min("ts"),
            "end_ts": F.max("ts"),
        },
    )
    # seg0/seg1 = DOWN,UP of the valley ordering; seg2/seg3 = UP,DOWN
    # of the peak ordering — exactly one pair is non-NULL per match
    return matches.select(
        "user_id",
        F.when(F.col("seg0_n").isNotNull(), F.lit("valley"))
        .otherwise(F.lit("peak"))
        .alias("shape"),
        F.coalesce("seg0_start_ts", "seg2_start_ts").alias("start_ts"),
        F.coalesce("seg1_end_ts", "seg3_end_ts").alias("end_ts"),
        (
            F.coalesce("seg0_n", F.lit(0))
            + F.coalesce("seg1_n", F.lit(0))
            + F.coalesce("seg2_n", F.lit(0))
            + F.coalesce("seg3_n", F.lit(0))
        ).alias("n_rows"),
    )


@query(
    "w28_pattern_overlapping",
    # Oracle: NO recursion needed for this skip mode — detection over
    # the islands at every end (overlap allowed = emit all ends), then
    # a join back to the first DOWN island's rows: each row r is one
    # match start; the suffix row count is island_cnt - pos_in_island
    # + 1 and the suffix min(ts) is r's own ts (rows are ts-ordered).
    # Counts exact integers; timestamps exact µs.
    sql=f"""
    WITH e AS (
      SELECT user_id, {ts_us()} AS ts, event_id,
             CAST(floor(value / 25) AS BIGINT) AS band,
             row_number() OVER w AS rn,
             lag(CAST(floor(value / 25) AS BIGINT)) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {ts_us()}, event_id)
    ),
    lbl AS (
      SELECT *, CASE WHEN prev IS NULL THEN NULL
                     WHEN band > prev THEN 'UP'
                     WHEN band < prev THEN 'DOWN'
                     ELSE 'FLAT' END AS lab
      FROM e
    ),
    isl0 AS (
      SELECT *, sum(CASE WHEN lab IS NULL OR plab IS NULL
                          OR lab <> plab THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY rn) AS island
      FROM (SELECT *, lag(lab) OVER (PARTITION BY user_id ORDER BY rn)
                        AS plab
            FROM lbl)
    ),
    isl AS MATERIALIZED (
      SELECT * FROM isl0
    ),
    seg AS MATERIALIZED (
      SELECT user_id, island, min(lab) AS lab,
             CAST(count(*) AS BIGINT) AS n, max(ts) AS end_ts
      FROM isl GROUP BY user_id, island
    ),
    det AS (
      SELECT user_id, island - 3 AS start_isl,
             n_u1, n_d2, n AS n_u2, end_ts
      FROM (
        SELECT *, lag(lab) OVER wi AS lab1, lag(lab, 2) OVER wi AS lab2,
               lag(lab, 3) OVER wi AS lab3,
               lag(n, 2) OVER wi AS n_u1, lag(n) OVER wi AS n_d2
        FROM seg
        WINDOW wi AS (PARTITION BY user_id ORDER BY island)
      )
      WHERE lab = 'UP' AND lab1 = 'DOWN' AND lab2 = 'UP'
        AND lab3 = 'DOWN'
    ),
    starts AS (
      SELECT r.user_id, r.ts AS start_ts, d.end_ts,
             CAST(count(*) OVER (PARTITION BY r.user_id, r.island
                                 ORDER BY r.rn DESC) AS BIGINT)
               AS n_d1,
             d.n_u1, d.n_d2, d.n_u2, r.island, r.rn
      FROM isl r JOIN det d
        ON d.user_id = r.user_id AND d.start_isl = r.island
    )
    SELECT user_id,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY island, rn) AS BIGINT)
             AS match_no,
           start_ts, end_ts, n_d1,
           n_d1 + n_u1 + n_d2 + n_u2 AS n_rows
    FROM starts
    """,
    tags=("W10", "W5"),
)
def w28_pattern_overlapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AFTER MATCH SKIP TO NEXT ROW (W10 v3, r12): every OVERLAPPING
    W-shape (DOWN+ UP+ DOWN+ UP+) per user — one match per row from
    which the greedy NFA matches [PK: ISO/IEC 9075-2:2016 §R skip
    modes]. The overlap-allowed mode REMOVES the border restriction:
    the W-shape, sequential-only under SKIP PAST LAST (w24c), compiles
    all-JVM here via operators/patterns.match_runs_overlapping —
    end-anchored detection emits ALL matches (exactly this mode's
    semantics), and mid-island starts explode through one co-keyed
    join back to the first DOWN island's rows carrying suffix
    (start-row..island-end) measures as reverse-running windows.
    Fuzz-pinned against the lookahead-regex ground truth
    (re.finditer of '(?=(pattern))' enumerates overlapping greedy
    matches — one per qualifying start).

    Plan shape for 100 TB: the same user_id-keyed label/island
    windows as every W10 query, the lag-chain detection, then ONE
    (user_id, island) equi join + suffix windows over the same keys —
    one extra shuffle; output is the answer size itself (matches x
    first-leg starts). No Python for ANY pattern in this mode.
    """
    from nipd_spark.operators.patterns import match_runs_overlapping

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") / 25).cast("long").alias("band"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("band").over(w)
    label = (
        F.when(prev.isNull(), F.lit(None).cast("string"))
        .when(F.col("band") > prev, F.lit("UP"))
        .when(F.col("band") < prev, F.lit("DOWN"))
        .otherwise(F.lit("FLAT"))
    )
    matches = match_runs_overlapping(
        ev,
        key="user_id",
        order=["ts", "event_id"],
        label=label,
        pattern=["DOWN", "UP", "DOWN", "UP"],
        island_aggs={
            "start_ts": F.min("ts"),
            "end_ts": F.max("ts"),
        },
        with_match_no=True,
    )
    return matches.select(
        "user_id",
        "match_no",
        F.col("seg0_start_ts").alias("start_ts"),
        F.col("seg3_end_ts").alias("end_ts"),
        F.col("seg0_n").alias("n_d1"),
        (
            F.col("seg0_n") + F.col("seg1_n")
            + F.col("seg2_n") + F.col("seg3_n")
        ).alias("n_rows"),
    )


@query(
    "w26b_pattern_all_rows_wshape",
    # Oracle: the w24c recursive-CTE greedy scan EMITTING each match's
    # start position, then attribution in plain SQL — a matched row's
    # leg is its island's offset from the match start (matches under
    # SKIP PAST LAST are disjoint, so the join is 1:1), match_no is
    # the per-user rank of start positions. Counts exact; µs exact.
    sql=f"""
    WITH RECURSIVE e AS (
      SELECT user_id, {ts_us()} AS ts, event_id,
             CAST(floor(value / 25) AS BIGINT) AS band,
             row_number() OVER w AS rn,
             lag(CAST(floor(value / 25) AS BIGINT)) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {ts_us()}, event_id)
    ),
    lbl AS (
      SELECT *, CASE WHEN prev IS NULL THEN NULL
                     WHEN band > prev THEN 'UP'
                     WHEN band < prev THEN 'DOWN'
                     ELSE 'FLAT' END AS lab
      FROM e
    ),
    isl0 AS (
      SELECT *, sum(CASE WHEN lab IS NULL OR plab IS NULL
                          OR lab <> plab THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY rn) AS island
      FROM (SELECT *, lag(lab) OVER (PARTITION BY user_id ORDER BY rn)
                        AS plab
            FROM lbl)
    ),
    isl AS MATERIALIZED (
      SELECT * FROM isl0
    ),
    seg AS MATERIALIZED (
      SELECT user_id, island, min(lab) AS lab,
             row_number() OVER (PARTITION BY user_id ORDER BY island)
               AS pos
      FROM isl GROUP BY user_id, island
    ),
    steps AS MATERIALIZED (
      SELECT i1.user_id, i1.pos,
             (i1.lab = 'DOWN' AND i2.lab = 'UP'
              AND i3.lab = 'DOWN' AND i4.lab = 'UP') AS w_match,
             i1.island AS start_isl
      FROM seg i1
      LEFT JOIN seg i2 ON i2.user_id = i1.user_id AND i2.pos = i1.pos + 1
      LEFT JOIN seg i3 ON i3.user_id = i1.user_id AND i3.pos = i1.pos + 2
      LEFT JOIN seg i4 ON i4.user_id = i1.user_id AND i4.pos = i1.pos + 3
    ),
    scan AS (
      SELECT user_id, CAST(1 AS BIGINT) AS pos,
             CAST(NULL AS BIGINT) AS start_isl
      FROM (SELECT DISTINCT user_id FROM seg)
      UNION ALL
      SELECT t.user_id,
             s.pos + CASE WHEN coalesce(t.w_match, FALSE)
                          THEN 4 ELSE 1 END,
             CASE WHEN coalesce(t.w_match, FALSE) THEN t.start_isl END
      FROM scan s
      JOIN steps t ON t.user_id = s.user_id AND t.pos = s.pos
    ),
    matches AS (
      SELECT user_id, start_isl,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY start_isl) AS BIGINT)
               AS match_no
      FROM scan WHERE start_isl IS NOT NULL
    )
    SELECT r.user_id, r.ts, r.event_id, r.band, r.lab AS classifier,
           m.match_no,
           CAST(r.island - m.start_isl AS INT) AS leg
    FROM isl r JOIN matches m
      ON m.user_id = r.user_id
     AND r.island BETWEEN m.start_isl AND m.start_isl + 3
    """,
    tags=("W10", "D6"),
)
def w26b_pattern_all_rows_wshape(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ALL ROWS PER MATCH for a SELF-OVERLAPPING pattern (W10 v3,
    r12): every event row inside a W-shape (DOWN+ UP+ DOWN+ UP+),
    tagged with MATCH_NUMBER/CLASSIFIER and its pattern leg — the
    row-level output mode the sequential escape hatch lacked until
    this round (operators/patterns.match_runs_all_rows_sequential).
    The bucketed island scan emits only the ATTRIBUTION table
    (user, island, match_no, leg); one co-keyed join carries it back
    to the raw rows. The oracle extends the w24c recursive-CTE greedy
    scan to emit match START positions, attributing rows in plain SQL
    (disjoint matches make the island-range join 1:1) — value-hashing
    the complete row-level output of the sequential path.

    Plan shape for 100 TB: the match_runs_sequential stages plus the
    (user_id, island) join-back match_runs_all_rows already pays; the
    Python stage's output is bounded by islands-in-matches, never
    rows.
    """
    from nipd_spark.operators.patterns import (
        match_runs_all_rows_sequential,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") / 25).cast("long").alias("band"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("band").over(w)
    label = (
        F.when(prev.isNull(), F.lit(None).cast("string"))
        .when(F.col("band") > prev, F.lit("UP"))
        .when(F.col("band") < prev, F.lit("DOWN"))
        .otherwise(F.lit("FLAT"))
    )
    return match_runs_all_rows_sequential(
        ev,
        key="user_id",
        order=["ts", "event_id"],
        label=label,
        pattern=["DOWN", "UP", "DOWN", "UP"],
    ).select(
        "user_id",
        "ts",
        "event_id",
        "band",
        "classifier",
        "match_no",
        F.col("leg").cast("int").alias("leg"),
    )


@query(
    "w29_pattern_skip_to_first",
    # Oracle: for THIS pattern the resumption row (first UP row =
    # match start + 1 island) trails every later occurrence's start,
    # so the chained scan provably emits EVERY island-string
    # occurrence of DOWN UP DOWN — plain end-anchored detection, no
    # recursion needed; match_no = per-user rank of start islands.
    # (The operator runs the general resumption scan; the equivalence
    # is pattern-specific and row-reference-fuzzed in tests.)
    sql=f"""
    WITH e AS (
      SELECT user_id, {ts_us()} AS ts, event_id,
             CAST(floor(value / 25) AS BIGINT) AS band,
             row_number() OVER w AS rn,
             lag(CAST(floor(value / 25) AS BIGINT)) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {ts_us()}, event_id)
    ),
    lbl AS (
      SELECT *, CASE WHEN prev IS NULL THEN NULL
                     WHEN band > prev THEN 'UP'
                     WHEN band < prev THEN 'DOWN'
                     ELSE 'FLAT' END AS lab
      FROM e
    ),
    isl AS (
      SELECT *, sum(CASE WHEN lab IS NULL OR plab IS NULL
                          OR lab <> plab THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY rn) AS island
      FROM (SELECT *, lag(lab) OVER (PARTITION BY user_id ORDER BY rn)
                        AS plab
            FROM lbl)
    ),
    seg AS (
      SELECT user_id, island, min(lab) AS lab,
             CAST(count(*) AS BIGINT) AS n,
             min(ts) AS start_ts, max(ts) AS end_ts
      FROM isl GROUP BY user_id, island
    ),
    m AS (
      SELECT user_id, lab, lag(lab) OVER wi AS lab1,
             lag(lab, 2) OVER wi AS lab2,
             lag(n, 2) OVER wi AS n_d1, lag(n) OVER wi AS n_u,
             n AS n_d2,
             lag(start_ts, 2) OVER wi AS start_ts,
             lag(end_ts) OVER wi AS mid_ts, end_ts,
             island
      FROM seg
      WINDOW wi AS (PARTITION BY user_id ORDER BY island)
    ),
    det AS (
      SELECT * FROM m
      WHERE lab = 'DOWN' AND lab1 = 'UP' AND lab2 = 'DOWN'
    )
    SELECT user_id,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY island) AS BIGINT)
             AS match_no,
           start_ts, mid_ts, end_ts, n_d1, n_u, n_d2
    FROM det
    """,
    tags=("W10", "D6"),
)
def w29_pattern_skip_to_first(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """AFTER MATCH SKIP TO FIRST <label> (W10 v3, r12): chained
    dip-recover-dip shapes — DOWN+ UP+ DOWN+ where each match's
    trailing DOWN may seed the NEXT match (scanning resumes AT the
    first UP row, inside the previous match) [PK: ISO/IEC 9075-2:2016
    §R skip modes]. The resumption row is always an island START (the
    UP leg consumed its whole maximal run), so the mode is
    island-exact in match_runs_sequential; a first-leg or absent
    target is the ISO no-progress/no-resumption error, rejected
    statically. Fuzzed against a row-level reference (regex search
    from each resumption point) in tests.

    Plan shape for 100 TB: identical stages to every sequential W10
    query — two keyed windows, island collapse, the 256-bucket scan
    over runs; resumption only changes the scan's cursor arithmetic,
    zero extra stages.
    """
    from nipd_spark.operators.patterns import match_runs_sequential

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") / 25).cast("long").alias("band"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("band").over(w)
    label = (
        F.when(prev.isNull(), F.lit(None).cast("string"))
        .when(F.col("band") > prev, F.lit("UP"))
        .when(F.col("band") < prev, F.lit("DOWN"))
        .otherwise(F.lit("FLAT"))
    )
    matches = match_runs_sequential(
        ev,
        key="user_id",
        order=["ts", "event_id"],
        label=label,
        pattern=["DOWN", "UP", "DOWN"],
        island_aggs={
            "start_ts": F.min("ts"),
            "end_ts": F.max("ts"),
        },
        with_match_no=True,
        skip_to_first="UP",
    )
    return matches.select(
        "user_id",
        "match_no",
        F.col("seg0_start_ts").alias("start_ts"),
        F.col("seg1_end_ts").alias("mid_ts"),
        F.col("seg2_end_ts").alias("end_ts"),
        F.col("seg0_n").alias("n_d1"),
        F.col("seg1_n").alias("n_u"),
        F.col("seg2_n").alias("n_d2"),
    )
