"""TPC-H query family, adapted to the corpus schema (SURVEY.md §2.3/§2.4/§2.6).

The corpus (TESTDATA.md) is TPC-H-shaped but omits partsupp and several
text/date columns (l_commitdate, l_receiptdate, l_shipmode, o_comment,
c_phone, p_container); each query below keeps the original's plan shape
(the joins, the subquery pattern, the aggregation) and substitutes
corpus-available predicates where the original's column is absent. The
substitution is noted per query. Q1/Q2/Q3/Q5/Q10/Q14/Q16/Q18 live in
relational.py; this module completes the family.

Reference realization [PK]: pandas merge/mask/groupby chains
(SURVEY.md §1.1, §3.2); here each is one lazy DataFrame plan so Catalyst
chooses broadcast vs shuffle joins, pushes filters into the parquet
scan, and prunes columns.

Scale notes (100 TB): nation/region/part/supplier are broadcast dims;
orders⋈lineitem is the one real shuffle, equi-keyed on l_orderkey —
bucketing both facts on orderkey (s6b pattern) makes it co-located at
scale. Scalar subqueries (Q15's max, Q17's per-part avg, Q22's global
avg) compute tiny aggregates first; Spark runs them as separate jobs
and broadcasts the result into the main plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nipd_spark.catalog import load
from nipd_spark.oracle import dround
from nipd_spark.registry import query


# --------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS → left semi join)
# --------------------------------------------------------------------------
@query(
    "q4_order_priority",
    # Original EXISTS predicate is l_commitdate < l_receiptdate (absent);
    # substituted with "some line shipped > 90 days after order date".
    sql="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("J4", "A1", "P2"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS realized as a left-semi join on orderkey with the date
    residual in the join condition — shuffles once on the equi key, the
    correlated predicate stays in the hash-join filter."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate.cast("date"), 90).cast("timestamp")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan-side predicate reduction)
# --------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    sql=f"""
    SELECT {dround("sum(l_extendedprice * l_discount)")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("P2", "P3", "A2"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every predicate is scan-pushable (shipdate range prunes row
    groups; discount/quantity are page-level min/max filters) — the
    whole query is one codegen'd scan + partial/final agg, no shuffle
    beyond the 1-row exchange."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# --------------------------------------------------------------------------
@query(
    "q7_volume_shipping",
    sql=f"""
    SELECT supp_nation, cust_nation, l_year, {dround("sum(volume)")} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("J1", "J6", "A1", "F2"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way join where nation (twice) and supplier/customer broadcast;
    the disjunctive nation-pair predicate is applied after the dim joins
    so only the orders⋈lineitem shuffle moves fact data."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q8 — national market share
# --------------------------------------------------------------------------
@query(
    "q8_market_share",
    sql=f"""
    SELECT o_year,
           {dround("sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) / sum(volume)", 6)} AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("J1", "J6", "A12", "F4"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-way star join (all dims broadcast) feeding a conditional-agg
    ratio — the share numerator is a CASE inside the same hash agg, so
    one pass over the joined fact computes both."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q9 — product type profit
# --------------------------------------------------------------------------
@query(
    "q9_product_profit",
    # Original profit uses ps_supplycost (partsupp absent); substituted
    # cost model: 60% of p_retailprice per unit.
    sql=f"""
    SELECT nation, o_year, {dround("sum(amount)")} AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("J1", "J6", "P6", "A1"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE-filtered part dim (broadcast) drives the fact scan; profit
    expression folds into the join's codegen stage."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 4).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q12 — shipping-delay classification (original: shipmode; adapted)
# --------------------------------------------------------------------------
@query(
    "q12_late_lines",
    # Original groups by l_shipmode and counts priority classes among
    # receipt-late lines; adapted: group by lateness bucket (shipped
    # >60d after order date), count high/low priority orders.
    sql="""
    SELECT late,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o.o_orderpriority,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 'late' ELSE 'ontime' END AS late
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
    ) t
    GROUP BY late
    """,
    tags=("J1", "A12", "F4"),
)
def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem equi join (the one shuffle) with the CASE
    classification and conditional counts in the post-join agg."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.when(
            F.col("l_shipdate")
            > F.date_add(F.col("o_orderdate").cast("date"), 60).cast("timestamp"),
            "late",
        )
        .otherwise("ontime")
        .alias("late"),
    )
    return joined.groupBy("late").agg(
        F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer + double agg)
# --------------------------------------------------------------------------
@query(
    "q13_customer_distribution",
    sql="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("J2", "A1", "A13"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer preserves order-less customers (count = 0); the outer
    histogram agg is tiny. At scale the first groupBy reuses the join's
    hash partitioning on c_custkey — no second fact shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q15 — top supplier (CTE revenue view + max scalar subquery)
# --------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    sql=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {dround("sum(l_extendedprice * (1 - l_discount))")} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("J1", "A1", "A11", "W6"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue view computes once; its global max is a 1-row
    aggregate broadcast back into the equality filter (an unpartitioned
    window would funnel every supplier's row through one partition —
    wrong at 100 TB supplier cardinality).

    Rounding note: per-supplier revenue is rounded before the max
    comparison on both sides so the equality predicate selects the same
    supplier(s) in both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    best = (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .drop("mx")
    )
    s = load(spark, sf_dir, "supplier")
    return best.join(F.broadcast(s), best.supplier_no == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg subquery)
# --------------------------------------------------------------------------
@query(
    "q17_small_quantity",
    # Original filters one brand + container; container is absent, so
    # the brand filter alone scopes the part set.
    sql=f"""
    SELECT {dround("sum(l.l_extendedprice) / 7.0")} AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
    tags=("J1", "J6", "A2", "W8"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated per-part average decorrelates into a window
    average partitioned by partkey — one shuffle on l_partkey instead of
    a re-scanning subquery per row."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    return (
        joined.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-attribute predicates)
# --------------------------------------------------------------------------
@query(
    "q19_discounted_revenue",
    # Original's container/shipmode legs are absent; each OR branch
    # keeps the (brand, quantity range, size range) shape.
    sql=f"""
    SELECT {dround("sum(l.l_extendedprice * (1 - l.l_discount))")} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_size BETWEEN 1 AND 15)
    """,
    tags=("J1", "J6", "P3", "P2"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive join+filter: Catalyst extracts the common p_partkey
    equi key so this stays a broadcast hash join with the OR-of-ANDs as
    a residual filter (never a nested-loop join)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = lambda brand, qlo, qhi, slo, shi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("l_quantity").between(qlo, qhi)
        & F.col("p_size").between(slo, shi)
    )
    return joined.filter(
        branch("Brand#1", 1, 11, 1, 5)
        | branch("Brand#2", 10, 20, 1, 10)
        | branch("Brand#3", 20, 30, 1, 15)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )


# --------------------------------------------------------------------------
# Q11 — important stock identification (agg + fraction-of-total subquery)
# --------------------------------------------------------------------------
@query(
    "q11_important_stock",
    # Original values partsupp stock (ps_supplycost * ps_availqty);
    # partsupp is absent, so part value = shipped extendedprice from the
    # scoped nations' suppliers. Shape kept: scoped agg per part, HAVING
    # value > multiple of the scoped mean (scalar subquery). Mean-relative
    # (not fraction-of-total) so selectivity is stable as part cardinality
    # grows with SF — TPC-H scales its own fraction by 1/SF for the same
    # reason.
    sql=f"""
    WITH scoped AS (
      SELECT l.l_partkey, l.l_extendedprice
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_3', 'NATION_8', 'NATION_12')
    ), v AS (
      SELECT l_partkey, {dround("sum(l_extendedprice)")} AS part_value
      FROM scoped GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM v
    WHERE part_value > (SELECT {dround("avg(part_value) * 1.5")} FROM v)
    """,
    tags=("A1", "A5", "J6", "A2"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier/nation dims broadcast into the fact scan; per-part value
    aggregates once, and the fraction-of-total threshold is a 1-row agg
    over that SAME aggregated (tiny) result broadcast back — the fact is
    scanned once, not twice.

    Rounding: per-part value rounds to 4 before both the output and the
    threshold comparison so the > predicate sees identical doubles in
    both engines (q15 discipline)."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8", "NATION_12")
    )
    sup = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    v = (
        li.join(F.broadcast(sup), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("part_value"))
    )
    thresh = v.agg(F.round(F.avg("part_value") * 1.5, 4).alias("thresh"))
    return (
        v.crossJoin(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("thresh"))
        .drop("thresh")
    )


# --------------------------------------------------------------------------
# Q20 — potential part promotion (nested IN subqueries → semi joins)
# --------------------------------------------------------------------------
@query(
    "q20_potential_promotion",
    # Original compares partsupp availqty against half the shipped
    # quantity; without partsupp the qualifying set is "suppliers who
    # shipped > 45 units of some widget part in 1996" — the same
    # doubly-nested IN shape (part IN ... → lineitem agg → supplier IN).
    sql="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_8', 'NATION_12')
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
          )
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(l.l_quantity) > 45
      )
    """,
    tags=("J4", "A5", "P6", "A1"),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both IN subqueries become left-semi joins: the widget part list
    broadcasts into the lineitem scan, the qualifying supplier set (tiny
    after HAVING) broadcasts into the supplier dim. No quantity-sum
    rounding needed — quantities are integral doubles, sums are exact."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    qual = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 45)
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8", "NATION_12")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(qual), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS self joins)
# --------------------------------------------------------------------------
@query(
    "q21_suppliers_waiting",
    # Original lateness is l_receiptdate > l_commitdate (both absent);
    # substituted "shipped > 90 days after order date". The signature
    # EXISTS (another supplier in the order) + NOT EXISTS (another LATE
    # supplier in the order) correlated pair is kept verbatim.
    sql="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_8', 'NATION_12')
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s.s_name
    """,
    tags=("J4", "J5", "J11", "A1"),
)
def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi, NOT EXISTS → left-anti, both equi-keyed on
    l_orderkey with the supplier inequality as a residual in the hash
    join — no nested loop anywhere. The late-lines set is computed once
    per side from the same one orders⋈lineitem shuffle shape."""

    def late_lines() -> DataFrame:
        o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
        li = load(spark, sf_dir, "lineitem")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .filter(
                F.col("l_shipdate")
                > F.date_add(F.col("o_orderdate").cast("date"), 90).cast("timestamp")
            )
            .select("l_orderkey", "l_suppkey")
        )

    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8", "NATION_12")
    )
    sup = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    base = late_lines().join(
        F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
    )
    l2 = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    base = base.join(
        l2,
        (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
        "left_semi",
    )
    l3 = late_lines().select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    base = base.join(
        l3,
        (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
        "left_anti",
    )
    return base.groupBy("s_name").agg(F.count("*").alias("numwait"))


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (anti join + global-avg scalar subquery)
# --------------------------------------------------------------------------
@query(
    "q22_sales_opportunity",
    # Original segments by phone country code (absent); adapted to
    # nation key. The corpus's FKs are dense (every customer has some
    # order), so "no orders at all" is degenerate; the anti-join keeps
    # the original shape over "no RECENT orders" instead.
    sql=f"""
    SELECT c_nationkey, count(*) AS numcust, {dround("sum(c_acctbal)")} AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0.0
      )
      AND c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey
    """,
    tags=("J5", "A1", "A2", "P4"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global average computes on the pre-filtered customer dim and
    broadcasts as a literal-free cross join (1 row); NOT EXISTS is a
    left-anti join on custkey."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    )
    allc = load(spark, sf_dir, "customer")
    avg_bal = allc.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .drop("avg_bal")
    )
    no_orders = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return no_orders.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
    )
