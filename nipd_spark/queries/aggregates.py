"""Aggregations (SURVEY.md §2.4, A1-A14).

Reference realization [PK]: pandas ``groupby().agg()`` / ``describe`` /
``value_counts`` over variant tables (per-block depth sums, genotype
distributions, coverage percentiles). Spark gives partial+final hash
aggregation (map-side combine) automatically for every query here.

Scale notes (100 TB): all groupBys shuffle only the (small) group-key
domain after partial aggregation; countDistinct expands then aggregates
(use A4's HLL sketch when the distinct domain itself is huge); the
grouped-pandas UDAF (A14) ships Arrow batches per group — keep group
count ≫ core count and group size bounded.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nipd_spark.catalog import load
from nipd_spark.oracle import dround, ts_us
from nipd_spark.registry import query


@query(
    "a2_global_agg",
    sql=f"""
    SELECT count(*) AS n_rows,
           {dround("sum(l_quantity)")} AS total_qty,
           {dround("avg(l_extendedprice)")} AS avg_price,
           min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
    FROM lineitem
    """,
    tags=("A2",),
)
def a2_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (ungrouped) aggregate — total-reads / overall-rate analogue."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 4).alias("total_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@query(
    "a3_count_distinct",
    sql="""
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_partkey)  AS n_parts,
           count(DISTINCT l_suppkey)  AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A3",),
)
def a3_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (distinct-sites-per-sample analogue)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query("a4_approx_count_distinct", sql=None, tags=("A4",))
def a4_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (rows-only: sketch estimates aren't
    cross-engine hashable — SURVEY.md §2.4 A4).

    Scale note: at 100 TB this replaces A3 whenever the distinct domain
    doesn't fit the expand-shuffle; rsd=0.01 keeps ±1% error.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
    )


@query(
    "a5_having",
    sql=f"""
    SELECT l_suppkey, count(*) AS n_lines, {dround("sum(l_quantity)")} AS qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING count(*) >= 50 AND sum(l_quantity) > 1000
    """,
    tags=("A5",),
)
def a5_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — groups passing QC thresholds (block SNP-count analogue).

    The HAVING predicate filters on the *unrounded* aggregate in both
    engines; only the emitted column is rounded.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("l_quantity").alias("_qty_raw"),
        )
        .filter((F.col("n_lines") >= 50) & (F.col("_qty_raw") > 1000))
        .select("l_suppkey", "n_lines", F.round("_qty_raw", 4).alias("qty"))
    )


@query(
    "a6_rollup",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag, l_linestatus) AS gid,
           count(*) AS n, {dround("sum(l_extendedprice)")} AS revenue
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("A6",),
)
def a6_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP multi-granularity QC summary (per-sample/per-chrom/overall).

    DuckDB ``grouping(a,b)`` produces the same bitmask as Spark's
    ``grouping_id()`` (verified: 0/1/3 on the rollup levels).
    """
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
    )


@query(
    "a6b_cube",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag, l_linestatus) AS gid,
           {dround("sum(l_quantity)")} AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("A6",),
)
def a6b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all granularity combinations."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.round(F.sum("l_quantity"), 4).alias("qty"),
    )


@query(
    "a7_pivot",
    sql=f"""
    SELECT l_returnflag,
           {dround("sum(l_quantity) FILTER (l_linestatus = 'O')")} AS qty_O,
           {dround("sum(l_quantity) FILTER (l_linestatus = 'F')")} AS qty_F,
           count(*) FILTER (l_linestatus = 'O') AS n_O,
           count(*) FILTER (l_linestatus = 'F') AS n_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A7",),
)
def a7_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot to wide (samples×metric matrix analogue); oracle uses
    FILTER-per-column, the portable spelling of PIVOT."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return p.select(
        "l_returnflag",
        F.col("O_qty").alias("qty_O"),
        F.col("F_qty").alias("qty_F"),
        F.col("O_n").alias("n_O"),
        F.col("F_n").alias("n_F"),
    )


@query(
    "a8_collect_sorted",
    sql="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
             AS priorities,
           count(DISTINCT o_orderpriority) AS n_priorities
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("A8",),
)
def a8_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sorted → joined (SNP-list-per-block analogue).

    sort_array + concat_ws makes the nondeterministic collection order
    deterministic and string-hashable on both engines.
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderpriority"))).alias(
            "priorities"
        ),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@query(
    "a9_percentiles",
    sql=f"""
    SELECT l_returnflag,
           {dround("median(l_quantity)", 6)} AS med_qty,
           {dround("quantile_cont(l_quantity, 0.25)", 6)} AS p25_qty,
           {dround("quantile_cont(l_extendedprice, 0.95)", 6)} AS p95_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A9",),
)
def a9_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles/median (coverage p50/p95 QC analogue).

    Spark ``percentile`` and DuckDB ``quantile_cont`` both use linear
    interpolation; approx_percentile is covered rows-only by A4's family.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("med_qty"),
        F.round(F.percentile("l_quantity", 0.25), 6).alias("p25_qty"),
        F.round(F.percentile("l_extendedprice", 0.95), 6).alias("p95_price"),
    )


@query(
    "a10_stats",
    sql=f"""
    SELECT l_returnflag,
           {dround("stddev_samp(l_quantity)", 6)} AS sd_qty,
           {dround("var_samp(l_discount)", 6)} AS var_disc,
           {dround("corr(l_extendedprice, l_quantity)", 6)} AS corr_pq,
           {dround("covar_samp(l_extendedprice, l_quantity)", 4)} AS covar_pq
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A10",),
)
def a10_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion + correlation (fetal-fraction dispersion analogue)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("covar_pq"),
    )


@query(
    "a11_minmax_by",
    sql="""
    SELECT o_orderstatus,
           arg_max(o_orderkey, o_totalprice) AS biggest_order,
           arg_min(o_orderkey, o_totalprice) AS smallest_order,
           max(o_totalprice) AS max_price, min(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("A11",),
)
def a11_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by representative row per group (idxmax analogue).

    Tie-free on this corpus (verified: exactly one row per group carries
    the extreme o_totalprice at sf0.01 and sf0.1).
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@query(
    "a12_conditional_agg",
    sql=f"""
    SELECT user_id,
           count(*) AS n_events,
           CAST(count_if(event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(count_if(event_type = 'error') AS BIGINT) AS n_error,
           {dround("sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END)")}
             AS purchase_value
    FROM events
    GROUP BY user_id
    """,
    tags=("A12",),
)
def a12_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates (count-if-het / sum-if-ref analogue).

    Scale note: events.user_id is low-cardinality (15000·sf keys,
    FIXTURES.md) — the partial agg collapses each partition to at most
    that many rows before the shuffle, so hot keys never materialize;
    see a1b for the salting pattern when the per-key *state* is big.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchase"),
        F.count_if(F.col("event_type") == "error").alias("n_error"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)),
            4,
        ).alias("purchase_value"),
    )


@query(
    "a13_histogram",
    sql=f"""
    SELECT CAST(floor(value / 50) * 50 AS DOUBLE) AS bin_lo,
           count(*) AS n,
           {dround("avg(value)", 6)} AS bin_avg
    FROM events
    GROUP BY 1
    """,
    tags=("A13",),
)
def a13_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-binned histogram (depth-histogram analogue)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        (F.floor(F.col("value") / 50) * 50).cast("double").alias("bin_lo")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("bin_avg"),
    )


GEOMEAN_SCHEMA = "user_id long, n long, geomean_value double"


@query(
    "a14_udaf_geomean",
    sql=f"""
    SELECT user_id, count(*) AS n,
           {dround("exp(avg(ln(value)))", 6)} AS geomean_value
    FROM events
    WHERE value > 0
    GROUP BY user_id
    """,
    tags=("A14", "D4"),
)
def a14_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via grouped pandas (SPRT-terminal-decision shape):
    geometric mean per user, recomputable in SQL for the oracle.

    Spark has no Python Aggregator; applyInPandas is the idiomatic
    grouped-reduce (SURVEY.md §2.4 A14). Arrow-batched, one group per
    pandas frame.
    """
    import numpy as np

    ev = load(spark, sf_dir, "events").filter(F.col("value") > 0)

    def geomean(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n": [len(pdf)],
                "geomean_value": [round(float(np.exp(np.log(pdf["value"]).mean())), 6)],
            }
        )

    return ev.select("user_id", "value").groupBy("user_id").applyInPandas(
        geomean, GEOMEAN_SCHEMA
    )


@query(
    "a6c_grouping_sets",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag, l_linestatus) AS gid,
           count(*) AS n, {dround("sum(l_quantity)")} AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("A6",),
)
def a6c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — arbitrary granularity list (neither
    rollup nor cube): per-flag, per-status, and grand total."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("qty"),
        )
    )


@query(
    "a1b_salted_agg",
    sql=f"""
    SELECT user_id, count(*) AS n, {dround("sum(value)")} AS total_value
    FROM events GROUP BY user_id
    """,
    tags=("A1",),
)
def a1b_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage (salted) aggregation, result-identical to a
    plain GROUP BY (the oracle runs the plain form).

    events.user_id is the low-cardinality key fixture (15 keys at
    sf0.001, FIXTURES.md) — a direct groupBy on a handful of keys caps
    reduce parallelism at the key count, and a hot key melts one task
    at 100 TB. Stage 1 groups by (user_id, salt16) spreading each
    key over 16 reducers; stage 2 folds the 16 partials. Sums are
    reassociated, so the oracle-facing total is rounded per the float
    discipline (nipd_spark/oracle.py).
    """
    ev = load(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64("event_id"), F.lit(16)).alias("salt")
    partial = ev.groupBy("user_id", salt).agg(
        F.count("*").alias("pn"), F.sum("value").alias("pv")
    )
    return partial.groupBy("user_id").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pv"), 4).alias("total_value"),
    )


_A15_PCTS = (50, 90, 99)  # target percentiles, integer keys


def _a15_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, q_pct, p_est) sketch estimates — shared by a15
    (rows-only surface) and a15b (oracled rank-error certificate)."""
    ev = load(spark, sf_dir, "events")
    qs = [p / 100.0 for p in _A15_PCTS]
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", qs, 10000).alias("pa")
    )
    # flat (event_type, q_pct, p_est) rows: the driver's rows-only
    # canonicalizer sorts the pandas frame, and an array column is
    # unhashable there — scalar doubles sort fine (r8 driver lesson).
    return agg.select(
        "event_type", F.posexplode("pa").alias("qi", "p_est")
    ).select(
        "event_type",
        F.element_at(
            F.array(*[F.lit(p) for p in _A15_PCTS]), F.col("qi") + 1
        ).alias("q_pct"),
        "p_est",
    )


@query("a15_approx_percentile", sql=None, tags=("A9", "A4"))
def a15_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the KLL/GK-style sketch behind
    ``approx_percentile``, one flat (event_type, q_pct, p_est) row per
    group × quantile (rows-only: sketch outputs aren't cross-engine
    hashable, same status as the HLL tier a4; the oracled rank-error
    certificate is a15b). accuracy=10000 bounds rank error at n/10000 —
    tests/test_operators_properties.py asserts the empirical CDF at
    each estimate stays within that band of the target quantile.

    Scale note: this is the 100 TB replacement for a9's exact
    percentiles — the sketch is a bounded-size mergeable partial
    aggregate (no sort, no whole-column shuffle), so cost is one scan
    plus an O(sketch) merge tree, while exact percentile_cont needs a
    per-group sort of everything.
    """
    return _a15_estimates(spark, sf_dir)


@query(
    "a15b_approx_percentile_certificate",
    # Certificate oracle (a17 precedent): the sketch's GK guarantee —
    # every estimate's rank interval intersects [q·n ± n/accuracy] —
    # is checked Spark-side against EXACT per-group counts; the oracle
    # enumerates the expected (group × percentile, TRUE) matrix, so a
    # hash match proves the bound held for every cell at this SF.
    sql=f"""
    SELECT event_type, q_pct, TRUE AS within_band
    FROM (SELECT DISTINCT event_type FROM events)
    CROSS JOIN (VALUES {", ".join(f"({p})" for p in _A15_PCTS)}) t(q_pct)
    ORDER BY event_type, q_pct
    """,
    tags=("A9", "A4"),
)
def a15b_approx_percentile_certificate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rank-error certificate for a15's approx-percentile sketch: for
    each (event_type, q_pct) estimate, recompute the EXACT rank
    interval the estimate occupies — [#{value < p_est}+1, #{value <=
    p_est}] — and assert it intersects the GK-guaranteed band
    q·n ± (n/accuracy + 1) [PK: Greenwald & Khanna, SIGMOD'01,
    "Space-efficient online computation of quantile summaries"]. The
    +1 slack absorbs the discrete-rank convention gap between
    floor/ceil target-rank definitions; the guarantee itself holds for
    ANY merge order, so the certificate is deterministic even though
    task scheduling can perturb the estimate in the last ulp.

    Plan shape for 100 TB: the estimates table is |groups|×3 rows —
    broadcast it back onto the fact scan; the verification is then one
    partial-aggregated groupBy over the same single scan the sketch
    itself needs. No sort, no second shuffle of raw rows.
    """
    est = _a15_estimates(spark, sf_dir)
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    j = ev.join(F.broadcast(est), "event_type")
    band = j.groupBy("event_type", "q_pct").agg(
        F.sum((F.col("value") < F.col("p_est")).cast("long")).alias("n_lt"),
        F.sum((F.col("value") <= F.col("p_est")).cast("long")).alias("n_le"),
        F.count(F.lit(1)).alias("n"),
    )
    target = F.col("q_pct") / F.lit(100.0) * F.col("n")
    err = F.col("n") / F.lit(10000.0) + F.lit(1.0)
    return band.select(
        "event_type",
        "q_pct",
        (
            (F.col("n_lt") + F.lit(1) <= target + err)
            & (F.col("n_le") >= target - err)
        ).alias("within_band"),
    ).orderBy("event_type", "q_pct")


@query(
    "a16_unpivot",
    sql=f"""
    WITH wide AS (
      SELECT l_returnflag,
             {dround("sum(l_quantity) FILTER (l_linestatus = 'O')")} AS qty_O,
             {dround("sum(l_quantity) FILTER (l_linestatus = 'F')")} AS qty_F
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'O' AS linestatus, qty_O AS qty FROM wide
      WHERE qty_O IS NOT NULL
    UNION ALL
    SELECT l_returnflag, 'F' AS linestatus, qty_F AS qty FROM wide
      WHERE qty_F IS NOT NULL
    """,
    tags=("A7", "U1"),
)
def a16_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide samples×metric matrix back to long form
    via DataFrame.unpivot — the inverse of a7's pivot and the portable
    UNION-ALL spelling in the oracle. NULL cells are dropped (Spark's
    unpivot keeps them; the explicit filter makes both engines agree).

    Scale shape: unpivot is a map-only row expansion (no shuffle); the
    wide input here is already a tiny aggregate.
    """
    li = load(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 4))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )
    long = wide.unpivot(
        ids=["l_returnflag"],
        values=["qty_O", "qty_F"],
        variableColumnName="linestatus",
        valueColumnName="qty",
    )
    return long.filter(F.col("qty").isNotNull()).select(
        "l_returnflag",
        F.substring("linestatus", 5, 1).alias("linestatus"),
        "qty",
    )


@query(
    "a17_heavy_hitters",
    sql="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    bi AS (
      SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
               AS bigram
      FROM toks WHERE len(t) >= 2
    )
    SELECT bigram, count(*) AS n
    FROM bi
    GROUP BY bigram
    ORDER BY n DESC, bigram ASC
    LIMIT 25
    """,
    tags=("A1", "L8", "O3"),
)
def a17_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed heavy hitters (SpaceSaving candidate shape): find
    the top-25 bigrams while bounding what crosses the network to
    ≤ m rows per partition instead of the full key domain.

    Phase 1 computes a (partition_id, bigram) partial count — the
    map-side combine collapses each partition's stream to its local
    distinct keys before any exchange — then a per-partition top-m
    (m=256) window keeps only plausible hitters. Phase 2 recounts the
    candidates EXACTLY — but from the SAME partials, never from the raw
    stream: a bigram's global count is by definition the sum of its
    per-partition counts, so semi-joining the candidate union onto the
    checkpointed partials and summing ``c`` reproduces the full-shuffle
    GROUP BY bit-for-bit (which is what lets the plain GROUP BY oracle
    hash-match) while the fact-sized tokenize/explode stream is read
    ONCE (r6: was two full passes — the 100x probe measured 52 s, half
    of it the redundant second tokenize). A per-partition top-m over n
    rows keeps every key with local freq > n_p/m, so the only keys the
    candidate union can MISS are those below that bar in EVERY
    partition — i.e. with global count ≤ n/m. That is a real
    precondition, not a theorem: on a flat distribution the true 25th
    count can itself be ≤ n/m and coverage is NOT guaranteed. The
    query therefore checks the certificate at runtime
    (``_certified_topk_from_partials``): if the candidate result's
    25th exact count > n/m, every missed key is strictly below it and
    the bounded result is provably the true top-25; otherwise it falls
    back to an exact GROUP BY over the SAME checkpointed partials (one
    wider shuffle of distinct×partitions rows — never a re-scan of the
    raw stream). The test corpus's flat ~1.6k-bigram domain genuinely
    FAILS the certificate (the advisor's exact scenario — coverage held
    only because m·partitions happened to exceed the domain), so there
    the fallback runs, which is also the CHEAPER plan when distinct
    keys < m·partitions; on Zipfian production data the certificate
    passes and the shuffle stays bounded. Branch↔certificate
    correspondence is pinned in tests/test_plan_quality.py; both
    branches' exactness on adversarial corpora in
    tests/test_operators_properties.py.

    Scale: the one exchange carries per-partition distinct keys — for
    heavy-hitter-shaped (Zipfian) data that is orders of magnitude
    under the row count; the partials table (what spill_checkpoint
    materializes DISK_ONLY, outside the unified memory pool) is that
    same post-combine set, so it scales with distinct keys x
    partitions, not rows. When the distinct-per-partition set itself
    outgrows memory, swap phase 1 for a bounded-memory Misra-Gries
    mapInPandas (same superset contract) and recount its survivors with
    one additional pass — the JVM path is preferred because an Arrow
    round-trip of every row measured 17x slower at the 16x probe for
    identical output. Phase 2's probe side is a broadcast of
    ≤ m·partitions candidates.
    """
    from nipd_spark.operators import text
    from nipd_spark.operators.materialize import spill_checkpoint

    docs = load(spark, sf_dir, "documents")
    bigrams = docs.select(
        F.explode(text.shingles(F.col("text"), 2)).alias("bigram")
    )
    # lazy: the checkpoint materializes inside the query's first job
    # (honest timing) and every downstream branch (candidate top-m,
    # exact recount, certificate, fallback) reads the same DISK_ONLY
    # blocks — the raw tokenize/explode stream is read exactly once.
    local = spill_checkpoint(
        bigrams.select(F.spark_partition_id().alias("pid"), "bigram")
        .groupBy("pid", "bigram")
        .agg(F.count("*").alias("c")),
        eager=False,
    )
    return _certified_topk_from_partials(local, key="bigram", m=256, k=25)


def _certified_topk_from_partials(
    local: DataFrame, key: str, m: int, k: int
) -> DataFrame:
    """Exact top-k over (pid, key, c) per-partition partials with a
    bounded-shuffle fast path and a runtime coverage certificate.

    Fast path: per-partition top-m candidates → broadcast-semi recount
    from the partials (the only exchange carries ≤ m·partitions keys).
    Certificate: a key outside every partition's top-m has local count
    ≤ n_p/m there (at most m−1 keys sit above that bar), so its GLOBAL
    count is ≤ Σ n_p/m = n/m. If the fast path's kth exact count
    strictly exceeds n/m, every missed key ranks strictly below the
    returned k and the bounded result is provably the true top-k.
    Otherwise (flat distribution — the precondition genuinely fails)
    fall back to the exact GROUP BY over the same partials: one
    distinct×partitions-wide shuffle, never a raw-stream re-scan. The
    certificate costs two bounded driver actions (k rows + one total)
    against the checkpointed partials.
    """
    from pyspark.sql import Window

    pw = Window.partitionBy("pid").orderBy(
        F.col("c").desc(), F.col(key).asc()
    )
    cands = (
        local.withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= m)
        .select(key)
        .distinct()
    )
    fast = (
        local.join(F.broadcast(cands), key, "left_semi")
        .groupBy(key)
        .agg(F.sum("c").alias("n"))
        .orderBy(F.col("n").desc(), F.col(key).asc())
        .limit(k)
    )
    rows = fast.collect()
    n_total = local.agg(F.sum("c")).first()[0] or 0
    if len(rows) == k and int(rows[-1]["n"]) * m > int(n_total):
        return fast
    return (
        local.groupBy(key)
        .agg(F.sum("c").alias("n"))
        .orderBy(F.col("n").desc(), F.col(key).asc())
        .limit(k)
    )


@query("a18_hll_rollup", sql=None, tags=("A4", "A6", "T1"))
def a18_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: daily HLL sketches of distinct users per
    event_type, unioned upward into per-type totals WITHOUT rescanning
    the raw events (rows-only: DataSketches HLL binaries/estimates
    aren't cross-engine; tests/test_operators_properties.py bounds the
    estimates against exact distinct counts).

    This is the 100 TB warehouse pattern a3's exact countDistinct can't
    follow: materialize a tiny (day, type, sketch) table once per day,
    then answer any-date-range distinct-user questions by hll_union_agg
    over the relevant sketch rows — seconds over KBs instead of a
    re-shuffle of TBs of raw user_ids. The sketches are commutative
    partial aggregates, so the daily build is map-side combinable too.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk", True)).alias(
                "est_distinct_users"
            ),
            F.count("*").alias("n_daily_sketches"),
        )
        .orderBy("event_type")
    )


@query(
    "a19_bitmap_distinct",
    sql="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
    tags=("A3", "A4", "A6"),
)
def a19_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable roaring-style bitmaps
    (bitmap_construct_agg / bitmap_or_agg / bitmap_count): the id space
    is sliced into 32k-bit buckets, per-(day, type, bucket) bitmaps are
    built independently, OR-merged up to (type, bucket), and the bit
    counts summed — the same pre-aggregate-then-merge topology as the
    HLL rollup (a18), but lossless, so it hash-matches the plain
    count(DISTINCT) oracle.

    This is the warehouse answer when distinct counts must be exact AND
    incremental at 100 TB: daily bitmap partials are small, mergeable
    in any order and grain (day→month→all-time without rescanning), and
    never expand row-wise the way count(DISTINCT)'s internal
    expand-then-dedup does. Needs a dense-ish integer key — that's
    user_id here; hash/dictionary-encode other key types first.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    per_bucket = daily.groupBy("event_type", "bucket").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm")
    )
    return per_bucket.groupBy("event_type").agg(
        F.expr("sum(bitmap_count(bm))").alias("n_users")
    )


@query(
    "a17b_approx_top_k",
    sql="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    bi AS (
      SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
               AS bigram
      FROM toks WHERE len(t) >= 2
    )
    SELECT bigram, count(*) AS n
    FROM bi
    GROUP BY bigram
    ORDER BY n DESC, bigram ASC
    LIMIT 25
    """,
    tags=("A1", "A4", "L8"),
)
def a17b_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the engine-native sketch (approx_top_k,
    Spark 4): one aggregate call replaces a17's hand-built two-phase
    candidate pipeline. maxItemsTracked=65536 exceeds the bigram
    domain, so the sketch degenerates to exact counts and the plain
    GROUP BY oracle hash-matches — the same sized-to-exactness trick as
    the a15/a18 sketch tiers in reverse. At 100 TB with an unbounded
    domain you shrink maxItemsTracked and accept rank error; the
    explicit re-count pass (a17) is the variant that keeps counts exact
    at any domain size.
    """
    from nipd_spark.operators import text

    docs = load(spark, sf_dir, "documents")
    bigrams = docs.select(
        F.explode(text.shingles(F.col("text"), 2)).alias("bigram")
    )
    # over-fetch 100 then re-sort with the lexicographic tie-break and
    # cut to 25: the sketch's own ordering of equal counts at the k-th
    # boundary is unspecified, the oracle's is not
    sk = bigrams.agg(
        F.expr("approx_top_k(bigram, 100, 65536)").alias("top")
    )
    return (
        sk.select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").alias("bigram"),
            F.col("e.count").alias("n"),
        )
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(25)
    )


@query(
    "a21_string_agg",
    sql="""
    SELECT c_mktsegment,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
             AS priorities,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("A8", "F1"),
)
def a21_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg / string_agg): the distinct
    order priorities seen per market segment, pipe-joined in sorted
    order. Determinism rule: an unordered listagg is nondeterministic
    under parallel aggregation by construction — ALWAYS pin an ORDER BY
    (here: sort the distinct set before joining), or the same query
    returns different strings run to run. Spark spelling:
    sort_array(collect_set()) + array_join, which makes the
    determinism explicit rather than syntactic.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), "|"
            ).alias("priorities"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "a22_window_distinct",
    sql=f"""
    WITH t AS (
      SELECT event_id, user_id,
             CAST(epoch_us({ts_us()}) // 1000000 AS BIGINT) AS sec
      FROM events
    )
    SELECT event_id,
           count(DISTINCT user_id) OVER (
             ORDER BY sec
             RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) AS dau_24h
    FROM t
    ORDER BY event_id
    LIMIT 500
    """,
    tags=("A3", "W5", "A8"),
)
def a22_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a sliding event-time frame (trailing-24 h
    active users as of every event, RANGE semantics — equal-sec peers
    included). Spark bans count(DISTINCT) in windows, and the naive
    spelling (collect_set over an unpartitioned RANGE frame) funnels
    the whole table into one partition — so this runs as a BUCKETED
    RANGE JOIN instead (the j8 design): the 500 target events are taken
    first (TakeOrderedAndProject on the unique event_id), each probes
    its own and its previous 86400-s day bucket by equi-key, the exact
    [sec-86400, sec] bound filters residually, and count(DISTINCT
    user_id) groups per target. No unpartitioned window anywhere; cost
    is |targets| x 2-day slices. For ALL-events DAU at scale the answer
    is the a18/a19 sketch territory (per-bucket HLL/bitmap partials
    unioned over buckets). DuckDB runs the native frame-DISTINCT as the
    twin.
    """
    ev = load(spark, sf_dir, "events")
    t = ev.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") / 1_000_000).cast("bigint").alias("sec"),
    )
    day = F.floor(F.col("sec") / 86400)
    targets = t.orderBy("event_id").limit(500)
    probes = targets.select(
        "event_id",
        F.col("sec").alias("tsec"),
        F.explode(F.array(day, day - 1)).alias("b"),
    )
    rows = t.select("user_id", "sec", day.alias("b"))
    cand = probes.join(rows, "b").filter(
        (F.col("sec") >= F.col("tsec") - 86400)
        & (F.col("sec") <= F.col("tsec"))
    )
    return (
        cand.groupBy("event_id")
        .agg(F.countDistinct("user_id").alias("dau_24h"))
        .orderBy("event_id")
    )


@query(
    "a24_weighted_median",
    sql=f"""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS v, l_quantity AS wt
      FROM lineitem
    ),
    ranked AS (
      SELECT l_returnflag, v, wt,
             sum(wt) OVER (PARTITION BY l_returnflag ORDER BY v, wt
                           ROWS UNBOUNDED PRECEDING) AS cum_wt,
             sum(wt) OVER (PARTITION BY l_returnflag) AS tot_wt
      FROM w
    )
    SELECT l_returnflag,
           {dround("min(CASE WHEN cum_wt >= tot_wt / 2 THEN v END)", 6)}
             AS weighted_median,
           {dround("any_value(tot_wt)")} AS total_weight
    FROM ranked
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("A9", "W3", "A11"),
)
def a24_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median (price weighted by quantity): the smallest
    value whose running weight reaches half the group's total — the
    cumulative-weight crossing formulation, which needs only a sorted
    prefix sum and a conditional min (no dense rank, no second pass).
    Plain median treats a 1-unit and a 50-unit line equally; the
    weighted form answers "the price of the median UNIT shipped",
    which is the statistic pricing teams actually mean. Ordering ties
    on (v, wt) keeps the prefix sums bit-identical across engines.

    Scale shape: the running weight comes from the per-group two-level
    histogram cumsum (operators/ranks.with_grouped_running_sum) — a
    Window.partitionBy(l_returnflag) over raw lineitem would funnel
    ~25% of a 100 TB table through one task per flag value; the
    histogram form keeps |groups| × n_buckets-way parallelism.
    Weights are integer-valued quantities, so every partial sum is
    exact and the crossing comparison stays bit-deterministic.
    """
    from nipd_spark.operators import ranks

    li = load(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").alias("wt"),
    )
    cum = ranks.with_grouped_running_sum(
        w, group="l_returnflag", key="v", tiebreaks=["wt"], val="wt",
        out="cum_wt",
    )
    tot = w.groupBy("l_returnflag").agg(F.sum("wt").alias("tot_wt"))
    ranked = cum.join(F.broadcast(tot), "l_returnflag").select(
        "l_returnflag", "v", "cum_wt", "tot_wt"
    )
    return (
        ranked.groupBy("l_returnflag")
        .agg(
            F.round(
                F.min(F.when(F.col("cum_wt") >= F.col("tot_wt") / 2, F.col("v"))),
                6,
            ).alias("weighted_median"),
            F.round(F.first("tot_wt"), 4).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@query("a25_hll_set_algebra", sql=None, tags=("A4", "U3", "A2"))
def a25_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra on HLL sketches: distinct users who clicked, who
    purchased, their union (one hll_union of the two sketches — no
    rescan), and the INTERSECTION estimated by inclusion-exclusion
    |A∩B| ≈ |A|+|B|−|A∪B|. Sketch unions are lossless-mergeable;
    intersections are NOT a sketch primitive, and the subtraction
    amplifies relative error when the union dwarfs the overlap — the
    property test bounds the error against exact counts, and THAT
    caveat (fine for dashboards, not for billing) is the operational
    lesson of this rows-only tier.
    """
    ev = load(spark, sf_dir, "events")
    sk = ev.filter(F.col("event_type").isin("click", "purchase")).groupBy(
        "event_type"
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    wide = sk.agg(
        F.max(F.when(F.col("event_type") == "click", F.col("sk"))).alias("a"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("sk"))).alias("b"),
    )
    est_a = F.hll_sketch_estimate("a")
    est_b = F.hll_sketch_estimate("b")
    est_u = F.hll_sketch_estimate(F.expr("hll_union(a, b)"))
    return wide.select(
        est_a.alias("n_click"),
        est_b.alias("n_purchase"),
        est_u.alias("n_union"),
        (est_a + est_b - est_u).alias("n_intersection_est"),
    )


@query(
    "a26_deterministic_mode",
    sql="""
    WITH counts AS (
      SELECT l_returnflag, l_linenumber AS v, count(*) AS c
      FROM lineitem GROUP BY l_returnflag, l_linenumber
    )
    SELECT l_returnflag,
           first(v ORDER BY c DESC, v ASC) AS mode_v,
           max(c) AS mode_count
    FROM counts
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("A11", "A1"),
)
def a26_deterministic_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode with a PINNED tie-break: the builtin mode() returns an
    arbitrary element when counts tie — nondeterministic across runs,
    partitionings, and engines, i.e. unusable under a value-hash
    contract. The portable spelling is count-then-argmax with an
    explicit (count DESC, value ASC) order: two hash aggs, fully
    deterministic. min_by/max_by over a composite struct is the same
    trick every canonical-representative choice in this repo uses
    (l16b, a11).
    """
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", F.col("l_linenumber").alias("v")).agg(
        F.count("*").alias("c")
    )
    return (
        counts.groupBy("l_returnflag")
        .agg(
            F.max_by("v", F.struct(F.col("c"), -F.col("v"))).alias("mode_v"),
            F.max("c").alias("mode_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "a27_share_of_parent",
    sql=f"""
    WITH leaf AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             {dround("sum(c.c_acctbal)")} AS bal
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation, bal,
           {dround("bal / sum(bal) OVER (PARTITION BY region)", 6)}
             AS share_of_region,
           {dround("sum(bal) OVER (PARTITION BY region) / sum(bal) OVER ()", 6)}
             AS region_share_of_total
    FROM leaf
    ORDER BY region, nation
    """,
    tags=("A6", "W3", "J6"),
)
def a27_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent ratios in one pass: each nation's slice of its
    region and each region's slice of the grand total, computed as
    windows OVER THE AGGREGATE (25 leaf rows) rather than re-scanning
    facts per level — the ratio-to-report OLAP idiom. The
    whole-partition windows carry no ORDER BY, so no sort happens;
    Spark evaluates them as a tiny re-aggregation per frame. Float
    discipline: leaf sums rounded before ratios, ratios rounded after
    — the same two-level rounding every share calculation here uses.
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    leaf = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("c_acctbal"), 4).alias("bal"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return leaf.select(
        "region",
        "nation",
        "bal",
        F.round(F.col("bal") / F.sum("bal").over(w_region), 6).alias(
            "share_of_region"
        ),
        F.round(
            F.sum("bal").over(w_region) / F.sum("bal").over(w_all), 6
        ).alias("region_share_of_total"),
    ).orderBy("region", "nation")


@query(
    "a28_grouping_function",
    sql=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           grouping(l_returnflag) AS g_rf,
           grouping(l_linestatus) AS g_ls,
           count(*) AS n,
           {dround("sum(l_quantity)")} AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, rf, ls
    """,
    tags=("A6", "F4"),
)
def a28_grouping_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() markers on a rollup: distinguishes a real NULL group
    key from a rollup-generated subtotal row — the only robust way to
    label subtotal levels (coalesce-to-'ALL' alone is ambiguous the
    day a real 'ALL' value ships). The (g_rf, g_ls) bit pair IS the
    aggregation level; BI layers key their indentation off it. Same
    single-pass multi-level hash agg as a6, plus two virtual columns.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_rf"),
            F.grouping("l_linestatus").alias("g_ls"),
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            F.col("g_rf").cast("int").alias("g_rf"),
            F.col("g_ls").cast("int").alias("g_ls"),
            "n",
            "qty",
        )
        .orderBy("g_rf", "g_ls", "rf", "ls")
    )


@query(
    "a29_harmonic_mean",
    sql=f"""
    WITH r AS (
      SELECT l_returnflag,
             l_extendedprice / l_quantity AS unit_price
      FROM lineitem WHERE l_quantity > 0
    )
    SELECT l_returnflag,
           count(*) AS n,
           {dround("avg(unit_price)", 6)} AS arith_mean,
           {dround("count(*) / sum(1.0 / unit_price)", 6)} AS harmonic_mean
    FROM r
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("A2", "F3"),
)
def a29_harmonic_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic vs arithmetic mean of unit prices: when averaging
    RATES (price per unit, km/h, tokens/sec), the arithmetic mean
    over-weights expensive units — the harmonic mean n/Σ(1/x) is the
    quantity-consistent answer (it equals total spend over total units
    when weights are equal). Reporting both side by side makes the
    gap visible; a14's geometric mean completes the Pythagorean trio.
    Same single-pass shape as any sum: the reciprocal is a per-row
    expression, the rest is one partial+final agg.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    r = li.select(
        "l_returnflag",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    return (
        r.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("unit_price"), 6).alias("arith_mean"),
            F.round(
                F.count("*") / F.sum(F.lit(1.0) / F.col("unit_price")), 6
            ).alias("harmonic_mean"),
        )
        .orderBy("l_returnflag")
    )


@query("a30_tdigest_quantiles", sql=None, tags=("A9", "A4", "D6"))
def a30_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed t-digest percentiles of l_extendedprice
    (operators/tdigest.py): per-partition partial digests (mapInPandas,
    ≤ δ=100 centroids each) → one associative merge → interpolated
    p50/p90/p99/p999. Rows-only by design (the estimate depends on
    partition layout within rank-error bounds); the property test pins
    |est_rank − true_rank| against the exact sort, and a15 is the
    built-in-sketch twin.

    This is the mergeable-sketch execution shape every 100 TB
    percentile uses: the data is never sorted globally — only
    ~(δ × n_partitions) centroid rows shuffle to one reducer.
    """
    from nipd_spark.operators import tdigest

    li = load(spark, sf_dir, "lineitem")
    return tdigest.tdigest_quantiles(
        li, "l_extendedprice", [0.5, 0.9, 0.99, 0.999]
    ).select("q", "est", "n_centroids")


@query(
    "a31_weighted_median",
    sql="""
    WITH w AS (
      SELECT l_returnflag, l_quantity,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS wt,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               OVER (PARTITION BY l_returnflag
                     ORDER BY l_quantity, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               OVER (PARTITION BY l_returnflag) AS total
      FROM lineitem
    )
    SELECT l_returnflag,
           min(CASE WHEN 2 * cw >= total THEN l_quantity END)
             AS weighted_median_qty,
           CAST(max(total) AS BIGINT) AS total_weight_cents
    FROM w GROUP BY l_returnflag
    """,
    tags=("A9", "W3"),
)
def a31_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median (lower weighted median: smallest value whose
    cumulative weight reaches half the total) of quantity weighted by
    revenue — the survey-statistics aggregate neither engine ships
    natively, built from a deterministic window cumsum. Weights are
    integer cents, so the cumsum, the total and the 2·cw >= total
    threshold are EXACT integer arithmetic in both engines — no float
    ordering hazard anywhere (the repo's quantization discipline).
    The cumsum order carries a unique tiebreak (qty, orderkey,
    linenumber) so both engines walk the identical prefix.

    Scale shape: the running weight is the per-group two-level
    histogram cumsum (operators/ranks.with_grouped_running_sum), not a
    Window.partitionBy(l_returnflag) over raw rows — the 3-4-value
    partition key would cap parallelism at 3-4 tasks over the whole
    fact table at 100 TB. Integer-cent weights keep every partial sum
    and the 2·cw >= total threshold exact in both engines.
    """
    from nipd_spark.operators import ranks

    li = load(spark, sf_dir, "lineitem")
    wt = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    base = li.select(
        "l_returnflag",
        "l_quantity",
        "l_orderkey",
        "l_linenumber",
        wt.alias("wt"),
    )
    cum = ranks.with_grouped_running_sum(
        base,
        group="l_returnflag",
        key="l_quantity",
        tiebreaks=["l_orderkey", "l_linenumber"],
        val="wt",
        out="cw",
    )
    tot = base.groupBy("l_returnflag").agg(F.sum("wt").alias("total"))
    w = cum.join(F.broadcast(tot), "l_returnflag").select(
        "l_returnflag", "l_quantity", "cw", "total"
    )
    return w.groupBy("l_returnflag").agg(
        F.min(
            F.when(2 * F.col("cw") >= F.col("total"), F.col("l_quantity"))
        ).alias("weighted_median_qty"),
        F.max("total").alias("total_weight_cents"),
    )


@query(
    "a32_equidepth_histogram",
    # Integer-exact end to end: the global row number comes from a
    # deterministic unique ordering (price, orderkey, linenumber), the
    # bucket index is BIGINT arithmetic, and only the per-bucket sum —
    # an order-dependent float aggregate — is rounded (2 dp, money).
    sql=f"""
    WITH b AS (
      SELECT l_extendedprice AS v, l_orderkey, l_linenumber FROM lineitem
    ),
    r AS (
      SELECT v, row_number() OVER (
               ORDER BY v ASC, l_orderkey ASC, l_linenumber ASC) AS rn
      FROM b
    ),
    n AS (SELECT count(*) AS c FROM b)
    SELECT CAST(((rn - 1) * 8) // c AS BIGINT) AS bucket,
           count(*) AS n_rows,
           min(v) AS lo,
           max(v) AS hi,
           {dround('sum(v)', 2)} AS bucket_sum
    FROM r, n
    GROUP BY 1
    """,
    tags=("A9", "A13", "W1"),
)
def a32_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of l_extendedprice in 8
    buckets: per bucket the row count (±1 across buckets by
    construction), value bounds (the exact quantile boundaries), and
    mass. Equi-depth histograms are the cardinality-estimation
    workhorse inside optimizers and the right summary for skewed
    distributions where equi-WIDTH buckets (a13) collapse into one hot
    bin. Bucket assignment is floor((rn−1)·8/n) over a deterministic
    unique global ordering — exact quantiles, no interpolation
    ambiguity cross-engine.

    Plan shape for 100 TB: the global row number is the bucketed
    two-pass rank (operators/ranks.with_global_rn) — a raw-row
    Window.orderBy would funnel the whole table through ONE task; the
    histogram form keeps 64-bucket parallelism with one tiny offsets
    broadcast. Everything after is a map-side bucket key + an 8-group
    partial aggregation.
    """
    from nipd_spark.operators import ranks

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"), "l_orderkey", "l_linenumber"
    )
    r = ranks.with_global_rn(
        li, key="v", tiebreaks=["l_orderkey", "l_linenumber"]
    )
    n = li.agg(F.count(F.lit(1)).alias("c"))
    return (
        r.crossJoin(F.broadcast(n))
        .select(
            # integer DIV, matching the oracle's '//' exactly: the
            # double-division spelling is safe at fixture scale but
            # silently diverges once (rn-1)*8 exceeds 2^53 — at the
            # 100 TB posture this docstring claims, that's real rows
            F.expr("((CAST(rn AS BIGINT) - 1) * 8) DIV c").alias(
                "bucket"
            ),
            "v",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.round(F.sum("v"), 2).alias("bucket_sum"),
        )
    )


@query(
    "a4b_hll_error_certificate",
    # Certificate oracle (a15b precedent): HLL++ accuracy is checked
    # Spark-side against EXACT per-group distinct counts; the oracle
    # enumerates the expected (group, TRUE, TRUE) matrix, so a hash
    # match proves the rsd envelope held for every cell at this SF.
    sql="""
    SELECT l_returnflag, TRUE AS orders_within
    FROM (SELECT DISTINCT l_returnflag FROM lineitem)
    ORDER BY l_returnflag
    """,
    tags=("A4", "A3"),
)
def a4b_hll_error_certificate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Error certificate for a4's HLL++ distinct estimates: per return
    flag, |approx − exact| must stay within 3·rsd of the exact
    distinct order count (rsd=0.01 ⇒ ±3%, the 3σ envelope of the HLL
    standard error [PK: Flajolet et al. 2007; Heule et al. HLL++
    2013]; the sketch is deterministic for a given dataset, so the
    certificate is stable, not flaky). a4 itself stays rows-only —
    raw sketch estimates aren't cross-engine hashable — this sibling
    turns its accuracy contract into driver-hash-green evidence, the
    same move a15b made for the GK percentile sketch.

    Plan shape for 100 TB: the certificate deliberately pays the
    exact countDistinct (the expand-shuffle a4 exists to avoid) to
    have a truth value to compare against — it is an AUDIT run on a
    sample/SF, not the production path. ONE distinct column on
    purpose: a single distinct aggregate plans as a two-level agg
    with no Expand, so the audit shares the scan's shuffle; the
    two-column spelling Expand-multiplied the shuffle and OOMed the
    16× probe on this host's single shared heap (measured r9).

    r13 (guide §5; VERDICT r12 item 4): the MIXED approx+exact
    spelling made planAggregateWithOneDistinct key the first-level
    aggregate by (l_returnflag, l_orderkey) while ALSO carrying a
    partial_approx_count_distinct buffer — 1,639 sketch words
    (rsd 0.01 ⇒ 2^14 registers) PER DISTINCT PAIR through the first
    exchange (plans/r13/a4b_..._before.txt node (3): Results [1641]).
    At the 100× tier that is ~45M × 13 KB of agg state — the GC death
    spiral behind the 311-373 s row. HLL register updates are maxes of
    hashed values, so inserting a value twice is idempotent:
    approx_count_distinct over the DEDUPED (flag, orderkey) pairs is
    bit-identical to over the raw rows, and countDistinct over them is
    plain count. The explicit dropDuplicates pays the same pair
    exchange the distinct rewrite already paid — but with 2 narrow
    columns and no sketch — and the agg that follows holds 3 sketches
    per task, not one per pair.
    """
    li = load(spark, sf_dir, "lineitem")
    d = li.select("l_returnflag", "l_orderkey").dropDuplicates()
    g = d.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("ao"),
        F.count("l_orderkey").alias("eo"),
    )
    bound = F.lit(3 * 0.01)
    return g.select(
        "l_returnflag",
        (
            F.abs(F.col("ao") - F.col("eo"))
            <= bound * F.col("eo")
        ).alias("orders_within"),
    ).orderBy("l_returnflag")


@query(
    "a30b_tdigest_certificate",
    # Certificate oracle (a15b precedent): the t-digest estimates'
    # exact rank intervals are recomputed Spark-side; the oracle
    # enumerates the expected (q_mille, TRUE, TRUE) matrix.
    sql="""
    SELECT q_mille, TRUE AS within_band, TRUE AS centroids_bounded
    FROM (VALUES (500), (900), (990), (999)) t(q_mille)
    ORDER BY q_mille
    """,
    tags=("A9", "A4", "D6"),
)
def a30b_tdigest_certificate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rank-error certificate for a30's distributed t-digest: each
    estimate's exact rank interval [#{v < est}+1, #{v <= est}] must
    intersect [q·n ± (0.01·n + 1)] — the 1% rank-error budget the
    property test pins, conservative for δ=100 which tightens toward
    the tails [PK: Dunning & Ertl, "Computing extremely accurate
    quantiles using t-digests"] — and the merged digest must hold ≤ δ
    centroids. Turns a30's rows-only accuracy contract into
    driver-hash-green evidence (the a15b move, applied to the
    custom-operator sketch rather than the built-in one).

    Plan shape for 100 TB: the digest is the production path (only
    δ×partitions centroid rows ever shuffle); the certificate adds
    one broadcast of the 4 estimates back onto the scan and a
    partial-aggregated count — an audit-tier cost, no global sort.
    """
    from nipd_spark.operators import tdigest

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v")
    )
    qs = [0.5, 0.9, 0.99, 0.999]
    est = tdigest.tdigest_quantiles(
        load(spark, sf_dir, "lineitem"), "l_extendedprice", qs
    ).select(
        (F.round(F.col("q") * 1000).cast("int")).alias("q_mille"),
        "est",
        "n_centroids",
    )
    j = li.crossJoin(F.broadcast(est))
    band = j.groupBy("q_mille").agg(
        F.sum((F.col("v") < F.col("est")).cast("long")).alias("n_lt"),
        F.sum((F.col("v") <= F.col("est")).cast("long")).alias("n_le"),
        F.count(F.lit(1)).alias("n"),
        F.max("n_centroids").alias("nc"),
    )
    target = F.col("q_mille") / F.lit(1000.0) * F.col("n")
    err = F.lit(0.01) * F.col("n") + F.lit(1.0)
    return band.select(
        "q_mille",
        (
            (F.col("n_lt") + F.lit(1) <= target + err)
            & (F.col("n_le") >= target - err)
        ).alias("within_band"),
        (F.col("nc") <= F.lit(100)).alias("centroids_bounded"),
    ).orderBy("q_mille")
