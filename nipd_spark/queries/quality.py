"""Data-quality expectation suites (SURVEY.md §2.9 guardrails; the
Deequ/Great-Expectations role every production pipeline runs before a
table is published or a training corpus is frozen).

Each suite is a set of declarative rules (range, positivity, null,
uniqueness, referential integrity) evaluated in as few table scans as
possible and summarized as one row per rule: rows checked, violations,
pass/fail. The result is tiny regardless of input size, so the whole
suite is a map-side conditional aggregation — the 100 TB cost is one
pass over each fact table plus one equi-keyed anti-join for the FK rule.

Scale notes: all single-table rules for a given table are fused into ONE
conditional aggregate (one scan, partial aggregation, 1-row result); the
uniqueness rule rides the same pass via count - countDistinct; only the
orphan rule needs a shuffle (left-anti on the join key). Never one job
per rule — at 1000 executors that multiplies scan cost by the rule count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nipd_spark.catalog import load
from nipd_spark.oracle import dround, ts_us
from nipd_spark.registry import query


@query(
    "dq1_expectations",
    sql="""
    WITH li AS (
      SELECT count(*) AS n,
             count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS v_disc,
             count(*) FILTER (WHERE l_quantity <= 0) AS v_qty,
             count(*) FILTER (WHERE l_shipdate IS NULL) AS v_ship
      FROM lineitem
    ),
    o AS (
      SELECT count(*) AS n,
             count(*) FILTER (WHERE o_totalprice <= 0) AS v_price,
             count(*) - count(DISTINCT o_orderkey) AS v_dup
      FROM orders
    ),
    orph AS (
      SELECT count(*) AS v
      FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    )
    SELECT * FROM (
      SELECT 'lineitem.l_discount_in_0_1' AS rule, li.n AS n_checked,
             li.v_disc AS violations, li.v_disc = 0 AS pass FROM li
      UNION ALL
      SELECT 'lineitem.l_quantity_positive', li.n, li.v_qty, li.v_qty = 0 FROM li
      UNION ALL
      SELECT 'lineitem.l_shipdate_not_null', li.n, li.v_ship, li.v_ship = 0 FROM li
      UNION ALL
      SELECT 'lineitem.l_orderkey_fk_orders', li.n, orph.v, orph.v = 0
      FROM li, orph
      UNION ALL
      SELECT 'orders.o_totalprice_positive', o.n, o.v_price, o.v_price = 0 FROM o
      UNION ALL
      SELECT 'orders.o_orderkey_unique', o.n, o.v_dup, o.v_dup = 0 FROM o
    )
    """,
    tags=("A12", "A2", "J5", "P5"),
)
def dq1_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite: 6 rules over lineitem/orders
    evaluated in two fused scans + one anti-join, emitted as a
    rule/violations scoreboard.

    The fixture corpus is clean by construction (FIXTURES.md integrity
    properties), so every rule passes — the point is the evaluation
    shape: conditional counts fused per table, never a job per rule.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")

    li_agg = li.agg(
        F.count("*").alias("n"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("v_disc"),
        F.count(F.when(F.col("l_quantity") <= 0, 1)).alias("v_qty"),
        F.count(F.when(F.col("l_shipdate").isNull(), 1)).alias("v_ship"),
    )
    o_agg = o.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("v_price"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("v_dup"),
    )
    orphans = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("v"))
    )

    def row(src: DataFrame, rule: str, n: str, v) -> DataFrame:
        vcol = F.col(v) if isinstance(v, str) else v
        return src.select(
            F.lit(rule).alias("rule"),
            F.col(n).alias("n_checked"),
            vcol.alias("violations"),
            (vcol == 0).alias("pass"),
        )

    li_orph = li_agg.crossJoin(orphans)  # two 1-row aggregates
    return (
        row(li_agg, "lineitem.l_discount_in_0_1", "n", "v_disc")
        .unionAll(row(li_agg, "lineitem.l_quantity_positive", "n", "v_qty"))
        .unionAll(row(li_agg, "lineitem.l_shipdate_not_null", "n", "v_ship"))
        .unionAll(row(li_orph, "lineitem.l_orderkey_fk_orders", "n", "v"))
        .unionAll(row(o_agg, "orders.o_totalprice_positive", "n", "v_price"))
        .unionAll(row(o_agg, "orders.o_orderkey_unique", "n", "v_dup"))
    )


@query(
    "dq2_robust_outliers",
    sql=f"""
    WITH med AS (
      SELECT event_type, median(value) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, med.med,
             median(abs(e.value - med.med)) AS mad
      FROM events e JOIN med ON e.event_type = med.event_type
      GROUP BY e.event_type, med.med
    )
    SELECT e.event_type,
           count(*) AS n,
           count(*) FILTER (WHERE abs(e.value - mad.med)
                                  > 3 * 1.4826 * mad.mad) AS n_outliers,
           {dround("mad.med", 6)} AS med,
           {dround("mad.mad", 6)} AS mad
    FROM events e JOIN mad ON e.event_type = mad.event_type
    GROUP BY e.event_type, mad.med, mad.mad
    """,
    tags=("A9", "A12", "J6"),
)
def dq2_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier audit (median/MAD, the Hampel X84 rule): flag
    values beyond 3 scaled-MADs from their group median. Unlike a
    mean/stddev z-score (w8), the breakdown point is 50% — the
    outliers themselves can't drag the fence, which is what a
    data-quality gate needs when the contamination is the thing being
    measured.

    Shape: two grouped exact medians (per-type, then per-type absolute
    deviations) with the tiny (type, med, mad) tables broadcast back
    onto the fact scan between passes — three scans total, no row-level
    UDF. At 100 TB swap the exact medians for a15's percentile sketch
    and it becomes one scan + merge; the exact form here is what the
    cross-engine hash can verify.
    """
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count("*").alias("n"),
            F.count_if(
                F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad")
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            "n_outliers",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
        )
    )


@query(
    "dq3_freshness_completeness",
    sql=f"""
    WITH bounds AS (
      SELECT CAST(date_trunc('hour', min({ts_us()})) AS TIMESTAMP) AS lo,
             CAST(date_trunc('hour', max({ts_us()})) AS TIMESTAMP) AS hi,
             max({ts_us()}) AS max_ts
      FROM events
    ),
    expected AS (
      SELECT CAST(hr AS TIMESTAMP) AS hr, max_ts FROM (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr, max_ts
        FROM bounds
      )
    ),
    observed AS (
      SELECT CAST(date_trunc('hour', {ts_us()}) AS TIMESTAMP) AS hr,
             count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT count(*) AS expected_hours,
           count(o.hr) AS observed_hours,
           count(*) - count(o.hr) AS missing_hours,
           CAST(min(coalesce(o.n, 0)) AS BIGINT) AS min_events_per_hour,
           CAST(max(epoch_us(e.max_ts - e.hr)) / 3600000000.0 >= 1.0 AS INT)
             AS spans_over_1h
    FROM expected e LEFT JOIN observed o ON e.hr = o.hr
    """,
    tags=("F2", "A2", "J2"),
)
def dq3_freshness_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness + freshness audit: generate the EXPECTED hour spine
    between the table's first and last event hours, left-join the
    observed per-hour counts, and report coverage (hours with zero
    events are ingestion gaps a groupBy alone can never show — absent
    groups produce no row to alarm on). The pattern behind every
    data-SLA dashboard: expected-domain spine ⟕ observed, audit the
    null side. The spine is sequence()-generated (tiny at any scale);
    the observed side is one map-side-combined agg of the fact table.
    """
    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
        F.max("ts").alias("max_ts"),
    )
    expected = b.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
        "max_ts",
    )
    observed = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count("*").alias("n")
    )
    joined = expected.join(observed, "hr", "left")
    return joined.agg(
        F.count("*").alias("expected_hours"),
        F.count("n").alias("observed_hours"),
        (F.count("*") - F.count("n")).alias("missing_hours"),
        F.min(F.coalesce("n", F.lit(0))).alias("min_events_per_hour"),
        (
            F.max(F.unix_micros("max_ts") - F.unix_micros("hr")) / 3.6e9 >= 1.0
        ).cast("int").alias("spans_over_1h"),
    )


@query(
    "dq4_distribution_drift",
    sql=f"""
    WITH tagged AS (
      SELECT source, CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS half
      FROM documents
    ),
    cells AS (
      SELECT source,
             count(*) FILTER (half = 'a') AS n_a,
             count(*) FILTER (half = 'b') AS n_b
      FROM tagged GROUP BY source
    ),
    tot AS (SELECT sum(n_a) AS t_a, sum(n_b) AS t_b FROM cells)
    SELECT count(*) AS n_categories,
           {dround("sum(power(n_a * t_b - n_b * t_a, 2) / (CAST((n_a + n_b) AS DOUBLE) * t_a * t_b))", 6)}
             AS chi2,
           CAST(max(CAST((CAST(n_a AS DOUBLE) * t_b
                          / (t_a * greatest(n_b, 1))) >= 2.0 AS INT))
                AS BIGINT) AS any_cell_2x
    FROM cells, tot
    GROUP BY t_a, t_b
    """,
    tags=("A12", "A1", "F3"),
)
def dq4_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit between two corpus slices (here the
    doc_id parity halves standing in for yesterday/today): the
    chi-square homogeneity statistic over the source mix, plus a
    flag for any category whose rate shifted ≥2x. Drift gates like
    this run between every corpus snapshot pair before a retrain —
    a KL/PSI variant needs ln() (cross-engine transcendental risk,
    SURVEY §4.2); chi-square is products, squares, and one division —
    exact IEEE all the way, which is why the twin hash-matches at
    full precision. One scan, one tiny pivot per category, one 1-row
    reduce.
    """
    docs = load(spark, sf_dir, "documents")
    cells = docs.groupBy("source").agg(
        F.count_if(F.col("doc_id") % 2 == 0).alias("n_a"),
        F.count_if(F.col("doc_id") % 2 != 0).alias("n_b"),
    )
    tot = cells.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    j = cells.crossJoin(F.broadcast(tot))
    chi_term = F.pow(
        F.col("n_a") * F.col("t_b") - F.col("n_b") * F.col("t_a"), 2
    ) / (
        (F.col("n_a") + F.col("n_b")).cast("double")
        * F.col("t_a")
        * F.col("t_b")
    )
    ratio = (
        F.col("n_a").cast("double")
        * F.col("t_b")
        / (F.col("t_a") * F.greatest("n_b", F.lit(1)))
    )
    return j.groupBy("t_a", "t_b").agg(
        F.count("*").alias("n_categories"),
        F.round(F.sum(chi_term), 6).alias("chi2"),
        F.max((ratio >= 2.0).cast("int")).cast("bigint").alias("any_cell_2x"),
    ).select("n_categories", "chi2", "any_cell_2x")


@query(
    "dq5_benford_audit",
    sql=f"""
    WITH digits AS (
      SELECT CAST(regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]', 0)
                  AS INT) AS d
      FROM orders WHERE o_totalprice > 0
    ),
    cells AS (SELECT d, count(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT sum(n) AS t FROM cells)
    SELECT d, n,
           {dround("CAST(n AS DOUBLE) / t", 6)} AS observed_share
    FROM cells, tot
    GROUP BY d, n, t
    ORDER BY d
    """,
    tags=("F1", "A1", "F3"),
)
def dq5_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of order amounts: the
    leading-digit histogram fraud/fabrication screens compare against
    Benford's log-curve (fabricated figures over-use 5s and round
    numbers). The digit is pulled from the value's decimal STRING form
    (both engines print sub-1e7 doubles in plain shortest-repr
    notation) rather than via log10 arithmetic — floor(log10(x)) is a
    transcendental whose last-ulp wobble at power-of-ten boundaries
    can flip the digit cross-engine (SURVEY §4.2 discipline: never
    hash through a transcendental). Expected Benford shares are for
    the reader: 30.1%, 17.6%, 12.5%, 9.7%, 7.9%, 6.7%, 5.8%, 5.1%,
    4.6% — synthetic uniform prices will NOT match them, which is
    itself the demo.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.regexp_extract(
            F.col("o_totalprice").cast("string"), "[1-9]", 0
        ).cast("int").alias("d")
    )
    cells = digits.groupBy("d").agg(F.count("*").alias("n"))
    tot = cells.agg(F.sum("n").alias("t"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "n",
            F.round(F.col("n").cast("double") / F.col("t"), 6).alias(
                "observed_share"
            ),
        )
        .orderBy("d")
    )


@query(
    "dq6_orphan_trend",
    sql="""
    WITH li AS (
      SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS mon,
             l_orderkey
      FROM lineitem
    ),
    flags AS (
      SELECT li.mon,
             CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END AS is_orphan
      FROM li LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        ON li.l_orderkey = o.o_orderkey
    )
    SELECT mon, count(*) AS n_lines,
           CAST(sum(is_orphan) AS BIGINT) AS n_orphans
    FROM flags
    GROUP BY mon
    ORDER BY mon
    """,
    tags=("J2", "J5", "F2"),
)
def dq6_orphan_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity TREND: orphaned fact rows (lineitem with
    no parent order) counted per ship month — dq1 asserts the orphan
    count is zero today; this query is the monitoring view that shows
    WHEN integrity broke if it ever does (a bad backfill shows up as a
    one-month spike, a broken producer as a step change). Left join
    against the distinct parent keys + null-flag aggregation; the
    orphan column is all-zero on this corpus, which the oracle
    confirms month by month.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey").distinct()
    flags = (
        li.select(
            F.date_trunc("month", "l_shipdate").alias("mon"), "l_orderkey"
        )
        .join(o, li.l_orderkey == o.o_orderkey, "left")
        .select("mon", F.when(F.col("o_orderkey").isNull(), 1).otherwise(0).alias("is_orphan"))
    )
    return (
        flags.groupBy("mon")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("is_orphan").cast("bigint").alias("n_orphans"),
        )
        .orderBy("mon")
    )


@query(
    "dq7_observe_metrics",
    sql=f"""
    SELECT count(*) AS n_rows,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_big_discount,
           count(*) FILTER (WHERE l_quantity IS NULL) AS n_null_qty,
           {dround("sum(l_extendedprice)")} AS total_price,
           max(l_extendedprice) AS max_price
    FROM lineitem
    """,
    tags=("A2", "S1"),
)
def dq7_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-pass QC via the Observation API (`df.observe`): the metrics
    (row count, big-discount count, null count, revenue total, flag
    cardinality) are computed AS A SIDE EFFECT of a normal action over
    the scan — zero extra passes over the data, which at 100 TB is the
    whole point: the alternative is a second full read just to fill
    the QC dashboard. The query materializes the observed metrics as
    its one-row result; the oracle recomputes them relationally.
    """
    from pyspark.sql import Observation

    li = load(spark, sf_dir, "lineitem")
    obs = Observation("qc")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("l_discount") > 0.05).alias("n_big_discount"),
        F.count_if(F.col("l_quantity").isNull()).alias("n_null_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("total_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    # the "real" job this pipeline stage would run anyway
    observed.groupBy("l_returnflag").agg(F.count("*")).collect()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_big_discount"],
                m["n_null_qty"],
                float(m["total_price"]),
                float(m["max_price"]),
            )
        ],
        "n_rows long, n_big_discount long, n_null_qty long, "
        "total_price double, max_price double",
    )


@query(
    "dq8_key_skew",
    sql=f"""
    WITH p1 AS (SELECT l_orderkey AS k, count(*) AS cnt
                FROM lineitem GROUP BY 1),
    p2 AS (SELECT o_custkey AS k, count(*) AS cnt FROM orders GROUP BY 1),
    p3 AS (SELECT user_id AS k, count(*) AS cnt FROM events GROUP BY 1)
    SELECT 'events.user_id' AS key_name,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           max(cnt) AS max_per_key,
           {dround("max(cnt) / (sum(cnt) / count(*))", 6)} AS skew_factor,
           {dround("quantile_cont(cnt, 0.5)", 4)} AS median_per_key
    FROM p3
    UNION ALL
    SELECT 'lineitem.l_orderkey', CAST(count(*) AS BIGINT),
           CAST(sum(cnt) AS BIGINT), max(cnt),
           {dround("max(cnt) / (sum(cnt) / count(*))", 6)},
           {dround("quantile_cont(cnt, 0.5)", 4)}
    FROM p1
    UNION ALL
    SELECT 'orders.o_custkey', CAST(count(*) AS BIGINT),
           CAST(sum(cnt) AS BIGINT), max(cnt),
           {dround("max(cnt) / (sum(cnt) / count(*))", 6)},
           {dround("quantile_cont(cnt, 0.5)", 4)}
    FROM p2
    ORDER BY key_name
    """,
    tags=("A1", "A9", "U1"),
)
def dq8_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler: per candidate join key, the key count,
    row count, hottest-key size, skew factor (max/avg — the number AQE's
    skewedPartitionFactor thresholds against), and median rows per key.
    This is the diagnostic run BEFORE a big join at scale: skew_factor
    near 1 → plain shuffle join; tens → AQE skew split handles it;
    hundreds+ → salt the key (a1b/j13 show the remedies this profiler
    motivates). One groupBy per key — all map-side-combinable, no
    window, no collect.
    """
    def prof(df: DataFrame, key: str, label: str) -> DataFrame:
        per = df.groupBy(key).agg(F.count("*").alias("cnt"))
        return per.agg(
            F.lit(label).alias("key_name"),
            F.count("*").alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_per_key"),
            F.round(
                F.max("cnt") / (F.sum("cnt") / F.count("*")), 6
            ).alias("skew_factor"),
            F.round(F.expr("percentile(cnt, 0.5)"), 4).alias(
                "median_per_key"
            ),
        )

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    ev = load(spark, sf_dir, "events")
    return (
        prof(ev, "user_id", "events.user_id")
        .unionByName(prof(li, "l_orderkey", "lineitem.l_orderkey"))
        .unionByName(prof(o, "o_custkey", "orders.o_custkey"))
        .orderBy("key_name")
    )


@query(
    "dq9_control_chart",
    sql=f"""
    WITH series AS (
      SELECT event_type,
             epoch_us({ts_us()}) // 3600000000 AS bucket,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, bucket, c,
             CAST(sum(c) OVER win AS BIGINT) AS s,
             CAST(sum(c * c) OVER win AS BIGINT) AS q,
             CAST(count(*) OVER win AS BIGINT) AS n
      FROM series
      WINDOW win AS (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT event_type, c, s, q, n,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var
      FROM w WHERE n >= 12
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(count(*) FILTER (WHERE var > 0 AND
             abs(CAST(c AS DOUBLE) - mean) > 3 * sqrt(var)) AS BIGINT)
             AS n_anomalies
    FROM scored GROUP BY event_type
    """,
    tags=("W4", "A10", "T1"),
)
def dq9_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart-style 3σ control chart over the hourly revenue series
    per event type — the data-quality anomaly screen a pipeline runs on
    its own output metrics. The rolling baseline (prior 24 buckets,
    ≥ 12 required) is computed from INTEGER cents sums (Σc, Σc²), so
    mean and variance come from the closed form on exact integers —
    every double in the chain has identical IEEE expression shape in
    both engines, and the 3σ comparison is bit-deterministic with NO
    rounding anywhere (stronger than dround: nothing to round).

    Scale shape: one hash agg onto (type, hour) — cardinality
    types x hours regardless of event volume — then a window over that
    tiny series and a final agg. The expensive part is the first agg,
    which is the same partial+final shape as T1.
    """
    hour_us = 3_600_000_000
    us = F.unix_micros("ts")
    series = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            # floor, not cast-truncation: matches the oracle's // (floor
            # division) for pre-1970 (negative-epoch) timestamps too.
            F.floor(us / hour_us).cast("long").alias("bucket"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.sum("cents").alias("c"))
    )
    from pyspark.sql import Window

    win = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-24, -1)
    )
    w = series.select(
        "event_type",
        "c",
        F.sum("c").over(win).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(win).alias("q"),
        F.count("c").over(win).alias("n"),
    ).filter(F.col("n") >= 12)
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
        / F.col("n").cast("double")
    ) / (F.col("n") - 1).cast("double")
    scored = w.select(
        "event_type",
        "c",
        mean.alias("mean"),
        var.alias("var"),
    )
    anom = (F.col("var") > 0) & (
        F.abs(F.col("c").cast("double") - F.col("mean"))
        > 3 * F.sqrt(F.col("var"))
    )
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n_eval"),
        F.count(F.when(anom, 1)).alias("n_anomalies"),
    )


@query(
    "dq10_ks_two_sample",
    # Determinism: the ECDFs are exact-integer running counts divided
    # once by exact totals — identical expression shapes per pooled
    # value, so the per-row |F1-F2| is bit-equal cross-engine; the max
    # over identical sets is order-independent. d_stat is dround-6ed
    # anyway (belt and braces), the reject flag compares the SAME
    # doubles both sides compute.
    sql=f"""
    WITH s AS (
      SELECT value,
             count(*) FILTER (event_type = 'click') AS c1,
             count(*) FILTER (event_type = 'purchase') AS c2
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY value
    ),
    n AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
      FROM s
    ),
    e AS (
      SELECT sum(c1) OVER (ORDER BY value) AS r1,
             sum(c2) OVER (ORDER BY value) AS r2
      FROM s
    )
    SELECT n1, n2,
           {dround("max(abs(CAST(r1 AS DOUBLE)/n1 - CAST(r2 AS DOUBLE)/n2))", 6)}
             AS d_stat,
           max(abs(CAST(r1 AS DOUBLE)/n1 - CAST(r2 AS DOUBLE)/n2))
             > 1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / (n1 * n2))
             AS reject_05
    FROM e CROSS JOIN n
    GROUP BY n1, n2
    """,
    tags=("A10", "W3", "O1"),
)
def dq10_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test between the value
    distributions of click and purchase events: D = sup |F₁(x)−F₂(x)|
    over the pooled support, plus the α=0.05 large-sample rejection
    c(α)·√((n₁+n₂)/(n₁n₂)), c(0.05)=1.358 [PK: Smirnov 1948; the
    classic distribution-free drift test]. Completes the drift family:
    dq4's chi² needs BINNED categories and is blind to within-bin
    shape; KS compares the full continuous ECDFs — the standard gate
    for "did this feature's distribution move between corpus
    versions/slices" before a training freeze.

    Plan shape for 100 TB: the fact table collapses FIRST to one row
    per distinct pooled value (a keyed partial-agg shuffle), then the
    two ECDFs come from bucketed global running sums over that
    collapsed table (operators/ranks.with_global_running_sum — 64-way
    parallel two-pass prefix, NO single-partition window; the a32
    idiom), and the sup is a plain max aggregate. Nothing raw-row ever
    funnels. The running counts are exact integers; each ECDF value is
    one double division, so cross-engine equality is per-row exact.
    """
    from nipd_spark.operators.materialize import spill_checkpoint
    from nipd_spark.operators.ranks import with_global_running_sum

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "value")
    )
    # the collapsed table feeds the bucket-range agg, the bucketed
    # rows, the per-bucket totals AND the n-totals — four consumers
    # that would each re-scan the fact table; checkpoint once
    # (multi-consumer discipline; measured 15% at the 100× probe)
    s = spill_checkpoint(
        ev.groupBy("value").agg(
            F.sum((F.col("event_type") == "click").cast("long")).alias(
                "c1"
            ),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias(
                "c2"
            ),
        )
    )
    # BOTH ECDFs in ONE bucket pass (r9 VERDICT finding 1): chaining
    # two single-column calls rebuilt the first join's lineage inside
    # the second call's totals agg — the measured-5× chained-map trap.
    s = with_global_running_sum(
        s, key="value", tiebreaks=[], val=["c1", "c2"], out=["r1", "r2"]
    )
    n = s.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    e = s.crossJoin(F.broadcast(n))
    gap = F.abs(
        F.col("r1").cast("double") / F.col("n1")
        - F.col("r2").cast("double") / F.col("n2")
    )
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n1") + F.col("n2")).cast("double")
        / (F.col("n1") * F.col("n2"))
    )
    return e.groupBy("n1", "n2").agg(
        F.round(F.max(gap), 6).alias("d_stat"),
        (F.max(gap) > F.max(crit)).alias("reject_05"),
    )


@query(
    "dq10b_ks_binned_certificate",
    # Certificate oracle (a15b/a4b/a30b idiom): both engines compute
    # the binned statistic, the exact statistic, AND the analytical
    # sandwich bound from the same integer running counts, so a hash
    # match proves the binned estimator honored its error contract at
    # this SF. All three doubles are maxima over per-row exact-shaped
    # divisions (order-independent), dround-6ed belt-and-braces; the
    # flags compare the SAME unrounded doubles both engines hold.
    sql=f"""
    WITH s AS (
      SELECT value,
             count(*) FILTER (event_type = 'click') AS c1,
             count(*) FILTER (event_type = 'purchase') AS c2
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY value
    ),
    n AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
      FROM s
    ),
    e AS (
      SELECT c1, c2,
             sum(c1) OVER (ORDER BY value) AS r1,
             sum(c2) OVER (ORDER BY value) AS r2
      FROM s
    ),
    eb AS (
      SELECT e.*, n1, n2,
             ((r1 + r2 - 1) * 32) // (n1 + n2) AS bin
      FROM e CROSS JOIN n
    ),
    bins AS (
      SELECT bin,
             max(r1) AS br1, max(r2) AS br2,
             sum(c1) AS m1, sum(c2) AS m2,
             max(abs(CAST(r1 AS DOUBLE)/n1 - CAST(r2 AS DOUBLE)/n2))
               AS bd,
             max(n1) AS n1, max(n2) AS n2
      FROM eb GROUP BY bin
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_bins,
             max(abs(CAST(br1 AS DOUBLE)/n1 - CAST(br2 AS DOUBLE)/n2))
               AS d_binned,
             max(bd) AS d_exact,
             max(greatest(CAST(m1 AS DOUBLE)/n1, CAST(m2 AS DOUBLE)/n2))
               AS gap
      FROM bins
    )
    SELECT n_bins,
           {dround('d_binned', 6)} AS d_binned,
           {dround('d_exact', 6)} AS d_exact,
           {dround('gap', 6)} AS gap,
           d_binned <= d_exact AS lower_ok,
           d_exact <= d_binned + gap AS sandwich_ok
    FROM agg
    """,
    tags=("A9", "A10", "W3"),
)
def dq10b_ks_binned_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-binned two-sample KS with an oracled error certificate
    — the continuous-domain scale path for dq10 (r9 VERDICT item 2).
    dq10's exact form collapses the fact table to one row per DISTINCT
    value; for a genuinely continuous feature at 100 TB that collapsed
    table is fact-sized. The binned estimator evaluates the ECDF gap
    only at B=32 equi-depth bin edges of the POOLED distribution
    (a32's integer-exact ``(rank-1)·B DIV N`` bucket key), giving
    D̂ = max over edges |F₁−F₂|. Because both ECDFs are nondecreasing
    and each bin is a contiguous value range, every edge gap is one of
    the exact per-value gaps (D̂ ≤ D), and inside a bin neither ECDF
    can move more than that bin's own sample mass, so
    D ≤ D̂ + max_b max(ΔF₁(b), ΔF₂(b)) [PK: the standard ECDF
    oscillation-within-cell bound; same certificate idiom as the
    Glivenko–Cantelli binning argument]. The certificate row carries
    (D̂, D, gap) and both inequality flags — hash-checked cross-engine,
    so the accuracy contract is proved, not asserted. With equi-depth
    bins the gap is ≈1/B plus the largest single atom's share, so the
    estimator error is tunable by B independent of data volume.

    Plan shape for 100 TB: at fixture scale the bin key derives from
    the exact pooled running counts (bucketed single-pass
    with_global_running_sum over the collapsed table — needed anyway
    to produce the exact D the certificate compares against). In the
    production binned-only path the B+1 edges come from an
    approx-quantile sketch (a15/a30 machinery) broadcast to a map-side
    bin assignment, so the whole statistic is two map passes + a
    B-row aggregate — no distinct-value collapse anywhere; this query
    is the fixture-scale proof that the B-row summary preserves D to
    within the certified gap.
    """
    from nipd_spark.operators.materialize import spill_checkpoint
    from nipd_spark.operators.ranks import with_global_running_sum

    B = 32
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "value")
    )
    # multi-consumer collapse — checkpointed once, as in dq10
    s = spill_checkpoint(
        ev.groupBy("value").agg(
            F.sum((F.col("event_type") == "click").cast("long")).alias(
                "c1"
            ),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias(
                "c2"
            ),
        )
    )
    s = with_global_running_sum(
        s, key="value", tiebreaks=[], val=["c1", "c2"], out=["r1", "r2"]
    )
    n = s.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    eb = s.crossJoin(F.broadcast(n)).withColumn(
        "bin",
        F.expr(
            f"((CAST(r1 AS BIGINT) + CAST(r2 AS BIGINT) - 1) * {B}) "
            "DIV (n1 + n2)"
        ),
    )
    f1 = F.col("r1").cast("double") / F.col("n1")
    f2 = F.col("r2").cast("double") / F.col("n2")
    bins = eb.groupBy("bin").agg(
        F.max("r1").alias("br1"),
        F.max("r2").alias("br2"),
        F.sum("c1").alias("m1"),
        F.sum("c2").alias("m2"),
        F.max(F.abs(f1 - f2)).alias("bd"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )
    agg = bins.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.max(
            F.abs(
                F.col("br1").cast("double") / F.col("n1")
                - F.col("br2").cast("double") / F.col("n2")
            )
        ).alias("d_binned_raw"),
        F.max("bd").alias("d_exact_raw"),
        F.max(
            F.greatest(
                F.col("m1").cast("double") / F.col("n1"),
                F.col("m2").cast("double") / F.col("n2"),
            )
        ).alias("gap_raw"),
    )
    return agg.select(
        "n_bins",
        F.round("d_binned_raw", 6).alias("d_binned"),
        F.round("d_exact_raw", 6).alias("d_exact"),
        F.round("gap_raw", 6).alias("gap"),
        (F.col("d_binned_raw") <= F.col("d_exact_raw")).alias("lower_ok"),
        (
            F.col("d_exact_raw")
            <= F.col("d_binned_raw") + F.col("gap_raw")
        ).alias("sandwich_ok"),
    )


# --- dq10c/dq10d: the binned-ONLY production path (sketch edges) ----------

_DQ10C_B = 32        # bins; 31 interior edges
_DQ10C_ACC = 10000   # approx_percentile accuracy (rank err <= N/ACC)


def _dq10_sketch_edge_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-edge exact counts against the sketch-derived pooled quantile
    edges — the shared core of dq10c (binned-D statistic) and dq10d
    (GK-band certificate). NO distinct-value collapse and NO ranks pass
    anywhere: one sketch aggregate (mergeable partial agg over the raw
    scan), a broadcast of the 31-edge table back onto the scan, and one
    partial-aggregated groupBy — two map passes end to end."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "value")
    )
    qs = [i / _DQ10C_B for i in range(1, _DQ10C_B)]
    est = (
        ev.agg(
            F.percentile_approx("value", qs, _DQ10C_ACC).alias("edges")
        )
        .select(F.posexplode("edges").alias("ei", "edge"))
    )
    j = ev.crossJoin(F.broadcast(est))
    c1 = (F.col("event_type") == "click").cast("long")
    c2 = (F.col("event_type") == "purchase").cast("long")
    le = (F.col("value") <= F.col("edge")).cast("long")
    lt = (F.col("value") < F.col("edge")).cast("long")
    return j.groupBy("ei", "edge").agg(
        F.sum(c1 * le).alias("n1_le"),
        F.sum(c2 * le).alias("n2_le"),
        F.sum(le).alias("pool_le"),
        F.sum(lt).alias("pool_lt"),
        F.sum(c1).alias("n1"),
        F.sum(c2).alias("n2"),
        F.count(F.lit(1)).alias("n_pool"),
    )


@query("dq10c_ks_sketch_binned", sql=None, tags=("A9", "A10"))
def dq10c_ks_sketch_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The binned-ONLY two-sample KS production path dq10b's docstring
    promises (r10 VERDICT item 8): D̂ = max over the B−1 sketch-derived
    pooled quantile edges of |F₁(e) − F₂(e)|, where the edges come from
    ``approx_percentile`` (mergeable GK-style partial aggregate [PK:
    Greenwald & Khanna SIGMOD'01]) broadcast back onto the raw scan for
    exact per-edge ≤-counts — NO distinct-value collapse and NO ranks
    pass anywhere (plan-pinned), so the whole statistic is two map
    passes + a 31-row aggregate regardless of the value domain's
    cardinality. Error contract: D̂ ≤ D always (each edge gap is a real
    ECDF gap), and D ≤ D̂ + max-bin-mass by the ECDF oscillation bound
    dq10b certifies at fixture scale; with equi-depth edges the bin
    mass is ≈1/B + 2/accuracy + the largest atom's share.

    rows-only (a15/a4/a30 status): the emitted D̂ depends on the
    sketch's merge-order-sensitive edge VALUES, which no other engine
    reproduces bit-for-bit. The oracled twin is dq10d's certificate
    (exact GK rank bands on every edge), and the sandwich against
    dq10's exact D is property-tested against dq10b at fixture scale.

    Plan shape for 100 TB: sketch agg (partial, bounded state) →
    31-row broadcast → one partial-aggregated groupBy over the scan;
    reject threshold is the same 1.358·√((n₁+n₂)/(n₁n₂)) large-sample
    criterion as dq10, evaluated on the binned D̂ (conservative: the
    binned statistic under-rejects, never over-rejects).
    """
    stats = _dq10_sketch_edge_stats(spark, sf_dir)
    f1 = F.col("n1_le").cast("double") / F.col("n1")
    f2 = F.col("n2_le").cast("double") / F.col("n2")
    agg = stats.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.max(F.abs(f1 - f2)).alias("d_binned_raw"),
    )
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n1") + F.col("n2")).cast("double")
        / (F.col("n1") * F.col("n2"))
    )
    return agg.select(
        "n1",
        "n2",
        "n_edges",
        F.round("d_binned_raw", 6).alias("d_binned"),
        (F.col("d_binned_raw") > crit).alias("reject_05"),
    )


@query(
    "dq10d_ks_sketch_certificate",
    # Certificate oracle (a15b idiom): the oracle enumerates the exact
    # totals and the expected all-TRUE flag row; a hash match proves
    # every sketch edge's exact pooled rank interval intersected its
    # GK-guaranteed band and the edge array was sorted — i.e. the
    # equi-depth contract the binned-D estimator relies on held at
    # this SF.
    sql=f"""
    SELECT count(*) FILTER (event_type = 'click') AS n1,
           count(*) FILTER (event_type = 'purchase') AS n2,
           CAST({_DQ10C_B - 1} AS BIGINT) AS n_edges,
           TRUE AS edges_sorted,
           TRUE AS all_edges_in_band
    FROM events WHERE event_type IN ('click', 'purchase')
    """,
    tags=("A9", "A10"),
)
def dq10d_ks_sketch_certificate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GK rank-band certificate for dq10c's sketch-derived bin edges:
    for every edge e_i (target pooled quantile i/B), the EXACT pooled
    rank interval [#{value < e_i}+1, #{value ≤ e_i}] — computed from
    the same broadcast-edge pass, no ranks machinery — must intersect
    i·N/B ± (N/accuracy + 1) [PK: Greenwald & Khanna SIGMOD'01; the +1
    absorbs the discrete-rank convention gap, as in a15b], and the
    edge array must be sorted. Flags are aggregated with bool_and so
    ONE failing edge fails the row; the oracle pins the expected
    all-TRUE row with exact totals.

    Plan shape for 100 TB: identical to dq10c (two map passes + a
    31-row aggregate) — the certificate rides the statistic's own
    plan, the a15b discipline.
    """
    from pyspark.sql import Window

    stats = _dq10_sketch_edge_stats(spark, sf_dir)
    target = (
        (F.col("ei") + 1).cast("double")
        * F.col("n_pool")
        / F.lit(_DQ10C_B)
    )
    err = F.col("n_pool").cast("double") / F.lit(_DQ10C_ACC) + F.lit(1.0)
    band_ok = (
        (F.col("pool_lt") + F.lit(1) <= target + err)
        & (F.col("pool_le") >= target - err)
    )
    w = Window.orderBy("ei")
    # sortedness over the 31-row edge table: lag over a bounded
    # aggregate (31 rows at any data size)
    sorted_ok = F.col("edge") >= F.coalesce(
        F.lag("edge").over(w), F.lit(float("-inf"))
    )
    flags = stats.select(
        "n1", "n2", band_ok.alias("bok"), sorted_ok.alias("sok")
    )
    return flags.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.bool_and("sok").alias("edges_sorted"),
        F.bool_and("bok").alias("all_edges_in_band"),
    )
