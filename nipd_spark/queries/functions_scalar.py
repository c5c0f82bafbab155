"""Scalar function families (SURVEY.md §2.8: F1 string, F2 date/time,
F3 math, F4 conditional, F8 casts).

Reference realization [PK]: pandas ``str.*`` accessors (genotype '0/1'
parsing, locus keys), ``pd.to_datetime``/``.dt``, numpy log/abs/sqrt
(log-likelihoods), ``np.select`` CASE ladders, ``astype``.

Cross-engine notes: transcendental functions (ln/log10/exp/pow) may
differ in the last ulp between JVM StrictMath and libm → rounded to
6 dp; sqrt is IEEE-correctly-rounded → raw. Spark's double→int CAST
truncates while DuckDB's rounds → the oracle spells Spark's semantics
as CAST(trunc(x) AS INT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nipd_spark.catalog import load
from nipd_spark.oracle import dround
from nipd_spark.registry import query


@query(
    "f1_string_funcs",
    sql="""
    SELECT c_custkey,
           c_mktsegment || ':' || lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS locus_key,
           lower(c_name) AS name_lc,
           right(c_name, 3) AS tail3,
           length(c_name) AS name_len,
           replace(c_name, 'Customer#', 'C') AS short_name,
           split_part(c_mktsegment, 'I', 1) AS seg_head,
           strpos(c_name, '#') AS hash_pos,
           trim(upper(c_mktsegment)) AS seg_up
    FROM customer
    """,
    tags=("F1",),
)
def f1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: locus-key building, case, pad, substring, replace
    (genotype-string parsing analogue)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws(
            ":", "c_mktsegment", F.lpad(F.col("c_custkey").cast("string"), 10, "0")
        ).alias("locus_key"),
        F.lower("c_name").alias("name_lc"),
        F.right(F.col("c_name"), F.lit(3)).alias("tail3"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C")).alias("short_name"),
        F.split_part(F.col("c_mktsegment"), F.lit("I"), F.lit(1)).alias("seg_head"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.trim(F.upper(F.col("c_mktsegment"))).alias("seg_up"),
    )


@query(
    "f2_datetime_funcs",
    sql="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofmonth(o_orderdate) AS INT) AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_ts,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch0,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
    tags=("F2", "F8"),
)
def f2_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (run-date arithmetic / month bucketing analogue)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.date_add(F.col("o_orderdate").cast("date"), 30))
        .cast("timestamp")
        .alias("due_ts"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch0"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "f3_math_funcs",
    sql=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(CAST((ln(l_extendedprice)) AS VARCHAR) AS DECIMAL(38,15)), 6) AS DOUBLE) AS ln_price,
           CAST(round(CAST(CAST((log10(l_extendedprice)) AS VARCHAR) AS DECIMAL(38,15)), 6) AS DOUBLE) AS log10_price,
           sqrt(l_quantity) AS sqrt_qty,
           l_quantity * l_quantity AS qty_sq,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           greatest(l_quantity, 25.0) AS qty_hi,
           least(l_tax, l_discount) AS min_rate
    FROM lineitem
    """,
    tags=("F3",),
)
def f3_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (log-likelihood arithmetic analogue). sqrt is exact
    (IEEE); ln/log10 rounded (libm-vs-JVM last-ulp)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.sqrt("l_quantity").alias("sqrt_qty"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_hi"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@query(
    "f4_case_ladder",
    sql="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'DEBT'
                WHEN c_acctbal < 1000 THEN 'LOW'
                WHEN c_acctbal < 5000 THEN 'MID'
                ELSE 'HIGH' END AS bal_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_nationkey % 2 = 0 THEN 'EVEN' ELSE 'ODD' END AS nation_parity
    FROM customer
    """,
    tags=("F4",),
)
def f4_case_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE ladder — the RHDO genotype-category classification shape
    (type A/B informative SNPs, Lo 2010; SURVEY.md §2.12)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "DEBT")
        .when(F.col("c_acctbal") < 1000, "LOW")
        .when(F.col("c_acctbal") < 5000, "MID")
        .otherwise("HIGH")
        .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.when(F.col("c_nationkey") % 2 == 0, "EVEN").otherwise("ODD").alias(
            "nation_parity"
        ),
    )


@query(
    "f8_casts",
    sql="""
    SELECT l_orderkey,
           CAST(trunc(l_quantity) AS INT) AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(l_shipdate AS DATE) AS ship_date,
           CAST(l_linenumber AS DOUBLE) AS ln_dbl,
           try_cast('not a number' AS BIGINT) AS bad_cast
    FROM lineitem
    """,
    tags=("F8",),
)
def f8_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family. Spark double→int truncates toward zero; DuckDB CAST
    rounds — oracle uses CAST(trunc(x) AS INT) to express Spark's
    semantics. try_cast yields NULL on both engines (ANSI escape hatch).
    """
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_linenumber").cast("double").alias("ln_dbl"),
        F.try_to_number(F.lit("not a number"), F.lit("999")).cast("bigint").alias("bad_cast"),
    )


@query(
    "f9_calendar_funcs",
    sql="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus3mo,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
           weekofyear(CAST(o_orderdate AS DATE)) AS iso_week,
           dayofyear(CAST(o_orderdate AS DATE)) AS doy,
           CAST(o_orderdate AS DATE) - INTERVAL 90 DAY AS minus90d
    FROM orders
    """,
    tags=("F2", "F8"),
)
def f9_calendar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic family beyond f2: month-relative shifts
    (add_months handles end-of-month clamping), last_day, day-of-week
    (Spark is 1=Sunday; the oracle's 0=Sunday is shifted to match),
    ISO week number, day-of-year, and day arithmetic.

    All JVM-side date expressions inside codegen — the pattern for
    retention cohorts, fiscal bucketing, and SLA windows.
    """
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).cast("timestamp").alias("plus3mo"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.dayofweek(d).alias("dow"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofyear(d).alias("doy"),
        F.date_sub(d, 90).cast("timestamp").alias("minus90d"),
    )


@query(
    "f12_regression_funcs",
    sql=f"""
    SELECT l_returnflag,
           regr_count(l_extendedprice, l_quantity) AS n,
           {dround('regr_slope(l_extendedprice, l_quantity)', 6)} AS slope,
           {dround('regr_intercept(l_extendedprice, l_quantity)', 6)} AS intercept,
           {dround('regr_r2(l_extendedprice, l_quantity)', 6)} AS r2,
           {dround('regr_avgx(l_extendedprice, l_quantity)', 6)} AS avg_x,
           {dround('regr_avgy(l_extendedprice, l_quantity)', 6)} AS avg_y
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A10", "F3"),
)
def f12_regression_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares via the SQL regr_* aggregate
    family: slope/intercept/R² of price-on-quantity per return flag —
    the one-pass distributed regression (sufficient statistics are
    mergeable partials; no iterative solver for the univariate case).

    Order-dependent float aggregates → rounded per the float policy.
    """
    li = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 6).alias("avg_y"),
    )


@query(
    "f13_bitwise_family",
    sql="""
    SELECT l_returnflag,
           bit_and(l_linenumber) AS all_and,
           bit_or(l_linenumber)  AS all_or,
           bit_xor(l_linenumber) AS all_xor,
           CAST(sum(l_linenumber & 3) AS BIGINT) AS sum_low2,
           CAST(sum(l_linenumber << 2) AS BIGINT) AS sum_shl,
           CAST(sum(l_linenumber >> 1) AS BIGINT) AS sum_shr,
           CAST(sum(xor(l_linenumber, 5)) AS BIGINT) AS sum_xor5
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("F3", "A2"),
)
def f13_bitwise_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate family: AND/OR/XOR aggregates and
    shift/mask row expressions — flag-packing and bitmap bookkeeping
    primitives (the row-level cousins of a19's bitmap distinct).
    Integer-exact on both engines; no rounding discipline needed.
    """
    li = load(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber")
    return li.groupBy("l_returnflag").agg(
        F.bit_and(ln).alias("all_and"),
        F.bit_or(ln).alias("all_or"),
        F.bit_xor(ln).alias("all_xor"),
        F.sum(ln.bitwiseAND(3)).alias("sum_low2"),
        F.sum(F.shiftleft(ln, 2)).alias("sum_shl"),
        F.sum(F.shiftright(ln, 1)).alias("sum_shr"),
        F.sum(ln.bitwiseXOR(5)).alias("sum_xor5"),
    )


@query(
    "a20_boolean_aggregates",
    sql="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderpriority = '2-HIGH') AS any_high,
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
           bool_and(o_orderdate >= TIMESTAMP '1995-01-01') AS all_after_95
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("A2", "F4"),
)
def a20_boolean_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family (every/any/bool_and/bool_or): predicate
    summaries per group — the SQL-standard way to assert invariants
    inline (dq1's rule engine uses the count-filter spelling; these are
    the boolean-lattice duals). Short-circuit-friendly partial
    aggregation: AND/OR are commutative monoids, so map-side combine
    applies like any sum.
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderpriority") == "2-HIGH").alias("any_high"),
        F.count_if(F.col("o_orderpriority") == "2-HIGH").alias("n_high"),
        F.bool_and(
            F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
        ).alias("all_after_95"),
    )


@query(
    "f14_try_family",
    sql="""
    SELECT event_id % 7 AS grp,
           count(*) AS n,
           CAST(sum(CAST((CASE WHEN event_id % 5 = 0 THEN NULL
                    ELSE value / (event_id % 5) END) IS NULL AS INT)) AS BIGINT) AS n_div_null,
           count(TRY_CAST(props AS DOUBLE)) AS n_cast_ok,
           count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS n_json_int
    FROM events
    GROUP BY grp
    ORDER BY grp
    """,
    tags=("F8", "F4", "P5"),
)
def f14_try_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family under ANSI mode: try_divide turns
    the divide-by-zero that ANSI raises (c15 hit it live) into NULL,
    try_cast absorbs malformed strings (the raw JSON props never parses
    as a number → 0 survivors), and the extracted JSON field try_casts
    cleanly (every k is an int). The ELT-pipeline posture at 100 TB:
    strict-by-default arithmetic, explicit opt-in nullability at the
    known-dirty columns, counted so the dirt rate is observable (dq1's
    job) rather than silently swallowed.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.pmod("event_id", F.lit(7)).alias("grp"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.try_divide(F.col("value"), F.pmod("event_id", F.lit(5)))
                .isNull()
                .cast("int")
            ).alias("n_div_null"),
            F.count(F.try_to_number(F.col("props"), F.lit("999.99"))).alias(
                "n_cast_ok"
            ),
            F.count(
                F.get_json_object("props", "$.k").try_cast("bigint")
            ).alias("n_json_int"),
        )
        .orderBy("grp")
    )


@query(
    "f18_null_scalar_family",
    sql="""
    WITH t AS (
      SELECT o_orderkey,
             nullif(o_orderpriority, '4-NOT SPECIFIED') AS pri,
             CASE WHEN o_totalprice > 200000 THEN NULL
                  ELSE o_totalprice END AS capped
      FROM orders
    )
    SELECT count(*) AS n,
           count(coalesce(pri, 'x')) AS n_nvl,
           count(*) FILTER (WHERE pri IS NULL) AS n_unspecified,
           count(*) FILTER (WHERE
             (CASE WHEN pri IS NOT NULL THEN 'known' ELSE 'unknown' END)
             = 'known') AS n_nvl2_known,
           count(capped) AS n_under_cap,
           count(*) FILTER (WHERE coalesce(capped, 0.0) = 0.0) AS n_capped_out
    FROM t
    """,
    tags=("F4", "P5"),
)
def f18_null_scalar_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling scalar family as one audit row: nullif (sentinel →
    NULL), coalesce/nvl (NULL → default), the nvl2 both-ways branch,
    and NULL-aware counting (count(col) skips NULLs, count(*) does
    not) — the six idioms that make NULL propagation intentional
    instead of accidental. Spark spells them with the same functions
    the oracle uses, so the twin is nearly verbatim.
    """
    o = load(spark, sf_dir, "orders")
    t = o.select(
        F.nullif("o_orderpriority", F.lit("4-NOT SPECIFIED")).alias("pri"),
        F.when(F.col("o_totalprice") > 200000, None)
        .otherwise(F.col("o_totalprice"))
        .alias("capped"),
    )
    return t.agg(
        F.count("*").alias("n"),
        F.count(F.coalesce("pri", F.lit("x"))).alias("n_nvl"),
        F.count_if(F.col("pri").isNull()).alias("n_unspecified"),
        F.count_if(
            F.nvl2("pri", F.lit("known"), F.lit("unknown")) == "known"
        ).alias("n_nvl2_known"),
        F.count("capped").alias("n_under_cap"),
        F.count_if(F.coalesce("capped", F.lit(0.0)) == 0.0).alias(
            "n_capped_out"
        ),
    )
