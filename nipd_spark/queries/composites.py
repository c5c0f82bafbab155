"""Genomics-semantic composites (SURVEY.md §2.12) — the reference's
actual analyses [PK: Lo 2010; Lun 2008; Chiu 2011; Parks 2016],
expressed as compositions of verified inventory operators on the
supplied corpus (FIXTURES.md maps the analogy: suppkey→haplotype block,
shipdate-ordered lines→position-ordered SNPs, returnflag R→alt-allele
observation).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nipd_spark.catalog import load
from nipd_spark.oracle import dround, ts_us
from nipd_spark.registry import query

# SPRT parameters (Lo 2010 shape): H0 p=0.35 vs H1 p=0.5 over the
# binary 'alt observation' returnflag=='R'. Per-observation LLR terms
# are computed ONCE in Python and embedded as literals in BOTH engines,
# so cumulative sums are bit-deterministic.
_P0, _P1 = 0.35, 0.5
LLR_ALT = round(math.log(_P1 / _P0), 9)
LLR_REF = round(math.log((1 - _P1) / (1 - _P0)), 9)
UPPER, LOWER = 3.0, -3.0

_SPRT_SQL = f"""
WITH obs AS (
  SELECT l_suppkey AS block_id,
         row_number() OVER w AS snp_idx,
         CASE WHEN l_returnflag = 'R' THEN {LLR_ALT!r} ELSE {LLR_REF!r} END AS llr
  FROM lineitem
  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
),
cum AS (
  SELECT block_id, snp_idx, llr,
         sum(llr) OVER (PARTITION BY block_id ORDER BY snp_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_llr
  FROM obs
)
SELECT block_id,
       count(*) AS n_snps,
       {dround("max(cum_llr)", 6)} AS max_llr,
       min(CASE WHEN cum_llr >= {UPPER} THEN snp_idx END) AS upper_cross,
       min(CASE WHEN cum_llr <= {LOWER} THEN snp_idx END) AS lower_cross,
       CASE
         WHEN coalesce(min(CASE WHEN cum_llr >= {UPPER} THEN snp_idx END), 2147483647)
            < coalesce(min(CASE WHEN cum_llr <= {LOWER} THEN snp_idx END), 2147483647)
           THEN 'H1'
         WHEN min(CASE WHEN cum_llr <= {LOWER} THEN snp_idx END) IS NOT NULL
           THEN 'H0'
         ELSE 'UNDECIDED'
       END AS decision
FROM cum
GROUP BY block_id
"""


@query("c1_sprt_rhdo", sql=_SPRT_SQL, tags=("W3", "W9", "A11", "F4"))
def c1_sprt_rhdo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RHDO/SPRT classification (Lo 2010 supplement; SURVEY.md §2.12):
    per block, accumulate per-SNP log-likelihood ratios in position
    order and decide at the first boundary crossing — the reference's
    signature computation, as W1+F4+W3+W9+A11.

    LLR terms are Python-computed literals (identical doubles in both
    engines) → the cumulative comparison is bit-deterministic.
    """
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    obs = li.select(
        F.col("l_suppkey").alias("block_id"),
        F.row_number().over(w).alias("snp_idx"),
        F.when(F.col("l_returnflag") == "R", F.lit(LLR_ALT))
        .otherwise(F.lit(LLR_REF))
        .alias("llr"),
    )
    wc = Window.partitionBy("block_id").orderBy("snp_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = obs.withColumn("cum_llr", F.sum("llr").over(wc))
    up = F.min(F.when(F.col("cum_llr") >= UPPER, F.col("snp_idx")))
    lo = F.min(F.when(F.col("cum_llr") <= LOWER, F.col("snp_idx")))
    big = F.lit(2147483647)
    return cum.groupBy("block_id").agg(
        F.count("*").alias("n_snps"),
        F.round(F.max("cum_llr"), 6).alias("max_llr"),
        up.alias("upper_cross"),
        lo.alias("lower_cross"),
        F.when(F.coalesce(up, big) < F.coalesce(lo, big), "H1")
        .when(lo.isNotNull(), "H0")
        .otherwise("UNDECIDED")
        .alias("decision"),
    )


@query(
    "c2_zscore_screen",
    sql=f"""
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) AS day,
             count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n,
           {dround("(n - avg(n) OVER (PARTITION BY event_type)) / stddev_samp(n) OVER (PARTITION BY event_type)", 6)}
             AS z
    FROM daily
    """,
    tags=("W8", "A1", "T1"),
)
def c2_zscore_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score aneuploidy screen (Chiu BMJ 2011; SURVEY.md §2.12):
    per-chrom read-count z-score against the cohort — here per-type
    daily counts z-scored across days (A1 + W8)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.window("ts", "1 day")["start"].alias("day")
    ).agg(F.count("*").alias("n"))
    wp = Window.partitionBy("event_type")
    z = (F.col("n") - F.avg("n").over(wp)) / F.stddev_samp("n").over(wp)
    return daily.select("event_type", "day", "n", F.round(z, 6).alias("z"))


@query(
    "c3_fetal_fraction",
    sql=f"""
    SELECT l_suppkey AS block_id,
           count(*) FILTER (l_returnflag = 'R') AS n_alt_sites,
           {dround("2 * avg(l_discount) FILTER (l_returnflag = 'R')", 6)} AS ff_est
    FROM lineitem
    GROUP BY l_suppkey
    HAVING count(*) FILTER (l_returnflag = 'R') >= 10
    """,
    tags=("A12", "A5", "P2"),
)
def c3_fetal_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetal-fraction estimation (Lun 2008 / Hudecova 2014; §2.12):
    FF = 2 × mean minor-allele fraction at paternal-only sites —
    conditional mean over the 'alt' subset with a QC floor (A12+A5)."""
    li = load(spark, sf_dir, "lineitem")
    alt = F.when(F.col("l_returnflag") == "R", F.col("l_discount"))
    n_alt = F.count(alt)
    return (
        li.groupBy(F.col("l_suppkey").alias("block_id"))
        .agg(
            n_alt.alias("n_alt_sites"),
            F.round(2 * F.avg(alt), 6).alias("ff_est"),
        )
        .filter(F.col("n_alt_sites") >= 10)
    )


@query(
    "c5_version_diff",
    sql="""
    WITH a AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                 AND l_shipdate <  TIMESTAMP '1998-01-01'),
         b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
               WHERE l_returnflag = 'R')
    SELECT CASE WHEN a.l_orderkey IS NULL THEN 'only_v2'
                WHEN b.l_orderkey IS NULL THEN 'only_v1'
                ELSE 'both' END AS call_status,
           count(*) AS n_sites
    FROM a FULL OUTER JOIN b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey = b.l_partkey
    GROUP BY 1
    """,
    tags=("J3", "U3", "U4", "P5"),
)
def c5_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-version regression diff (§2.12): full-outer alignment of
    two call sets with per-site classification (J3+P5), the lab
    validation comparison."""
    li = load(spark, sf_dir, "lineitem")
    a = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_partkey")
        .distinct()
        .alias("a")
    )
    b = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .alias("b")
    )
    joined = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") == F.col("b.l_partkey")),
        "full",
    )
    status = (
        F.when(F.col("a.l_orderkey").isNull(), "only_v2")
        .when(F.col("b.l_orderkey").isNull(), "only_v1")
        .otherwise("both")
    )
    return joined.groupBy(status.alias("call_status")).agg(
        F.count("*").alias("n_sites")
    )


@query(
    "c4_coverage_qc",
    sql=f"""
    WITH monthly AS (
      SELECT l_suppkey, CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
             count(*) AS depth
      FROM lineitem GROUP BY 1, 2
    )
    SELECT l_suppkey, month, depth,
           {dround("avg(depth) OVER (PARTITION BY l_suppkey ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)", 6)}
             AS depth_ma3,
           {dround("median(depth) OVER (PARTITION BY l_suppkey)", 6)} AS depth_med
    FROM monthly
    """,
    tags=("A13", "A9", "W4"),
)
def c4_coverage_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage QC binning (§2.12): month-binned depth with a rolling
    3-bin smooth and per-block median (A13+W4+A9)."""
    li = load(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_suppkey", F.date_trunc("month", "l_shipdate").alias("month")
    ).agg(F.count("*").alias("depth"))
    w3 = Window.partitionBy("l_suppkey").orderBy("month").rowsBetween(-2, 0)
    wp = Window.partitionBy("l_suppkey")
    return monthly.select(
        "l_suppkey",
        "month",
        "depth",
        F.round(F.avg("depth").over(w3), 6).alias("depth_ma3"),
        F.round(F.median("depth").over(wp), 6).alias("depth_med"),
    )


@query(
    "c6_rmd",
    sql=f"""
    WITH counts AS (
      SELECT l_suppkey AS block_id,
             count(*) FILTER (l_returnflag = 'A') AS n_mut,
             count(*) FILTER (l_returnflag = 'R') AS n_wt
      FROM lineitem
      GROUP BY l_suppkey
      HAVING (count(*) FILTER (l_returnflag = 'A')
              + count(*) FILTER (l_returnflag = 'R')) >= 20
    )
    SELECT block_id, n_mut, n_wt,
           {dround("n_mut * ln(0.55 / 0.5) + n_wt * ln(0.45 / 0.5)", 6)} AS llr,
           CASE WHEN n_mut * ln(0.55 / 0.5) + n_wt * ln(0.45 / 0.5) > ln(8.0)
                  THEN 'overrepresented'
                WHEN n_mut * ln(0.55 / 0.5) + n_wt * ln(0.45 / 0.5) < -ln(8.0)
                  THEN 'underrepresented'
                ELSE 'unclassified' END AS call
    FROM counts
    """,
    tags=("A12", "F3", "F4", "A5"),
)
def c6_rmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RMD — relative mutation dosage (Lun et al. PNAS 2008; SURVEY.md
    §2.12): per-block mutant/wild-type allele counts → binomial SPRT
    log-likelihood ratio (H1: p=0.55 overrepresentation vs H0: p=0.5)
    → three-way call at likelihood bound 8. Conditional counts (A12),
    ln math (F3), CASE ladder (F4), QC depth floor (A5).
    """
    li = load(spark, sf_dir, "lineitem")
    n_mut = F.count(F.when(F.col("l_returnflag") == "A", 1))
    n_wt = F.count(F.when(F.col("l_returnflag") == "R", 1))
    import math

    counts = (
        li.groupBy(F.col("l_suppkey").alias("block_id"))
        .agg(n_mut.alias("n_mut"), n_wt.alias("n_wt"))
        .filter((F.col("n_mut") + F.col("n_wt")) >= 20)
    )
    llr = F.col("n_mut") * math.log(0.55 / 0.5) + F.col("n_wt") * math.log(
        0.45 / 0.5
    )
    return counts.select(
        "block_id",
        "n_mut",
        "n_wt",
        F.round(llr, 6).alias("llr"),
        F.when(llr > math.log(8.0), "overrepresented")
        .when(llr < -math.log(8.0), "underrepresented")
        .otherwise("unclassified")
        .alias("call"),
    )


@query(
    "c7_funnel",
    sql="""
    WITH ev AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    v AS (SELECT user_id, min(ts) AS v_ts FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT ev.user_id, min(ev.ts) AS c_ts
          FROM ev JOIN v ON ev.user_id = v.user_id
          WHERE ev.event_type = 'click' AND ev.ts > v.v_ts
          GROUP BY ev.user_id),
    p AS (SELECT ev.user_id, min(ev.ts) AS p_ts
          FROM ev JOIN c ON ev.user_id = c.user_id
          WHERE ev.event_type = 'purchase' AND ev.ts > c.c_ts
          GROUP BY ev.user_id)
    SELECT v.user_id, v.v_ts, c.c_ts, p.p_ts,
           (c.c_ts IS NOT NULL AND p.p_ts IS NOT NULL) AS completed
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
    tags=("A11", "J2", "W2"),
)
def c7_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → later click → later purchase) per user —
    the event-sequence analysis a product/behavior pipeline runs; also
    the batch twin of the T8 stateful tracker's state machine.

    Each stage anchors on the previous stage's first timestamp, so it
    is three conditional min-aggregations chained by joins (15000·sf
    users → all three aggs are tiny; at scale each is one shuffle on user_id,
    and AQE broadcasts the shrinking stage outputs).
    """
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("v_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_ts"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "v_ts",
            "c_ts",
            "p_ts",
            (F.col("c_ts").isNotNull() & F.col("p_ts").isNotNull()).alias(
                "completed"
            ),
        )
    )


@query(
    "c8_lexical_semantic",
    # Shingle CTE matches dedup._DUCK_SHINGLES; cosine matches the
    # similarity module's sequential-double expression (both
    # bit-identical across engines — no rounding needed on either score).
    sql="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks WHERE len(t) >= 3
    ),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    cand AS (
      SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
    ),
    pairs AS (
      -- candidate-driven: J >= 0.5 needs a shared shingle (dedup.py _DUCK_CAND)
      SELECT c.u AS a_id, c.v AS b_id,
             CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
               / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jaccard
      FROM cand c JOIN sh sa ON sa.doc_id = c.u JOIN sh sb ON sb.doc_id = c.v
      WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
              / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.5
    ),
    e AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    )
    SELECT p.a_id, p.b_id, p.jaccard,
           list_sum(list_transform(range(1, 65),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (a.nrm * b.nrm) AS cosine
    FROM pairs p
    JOIN e a ON a.vec_id = p.a_id
    JOIN e b ON b.vec_id = p.b_id
    """,
    tags=("L3", "L4", "J1"),
)
def c8_lexical_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation cross-check: every lexical near-dup pair (exact 3-shingle
    Jaccard ≥ 0.5) scored by its embedding cosine — lexical dupes with
    LOW semantic agreement are the interesting rows (template pages,
    boilerplate wrappers around different content), and high-cosine
    non-identical pairs feed soft dedup.

    Scale shape: the pair set is the (small) near-dup output, so the two
    embedding attachments are equi-joins keyed by id — the corpus-sized
    tables are never crossed."""
    from nipd_spark.operators import minhash, vector

    docs = load(spark, sf_dir, "documents")
    pairs = (
        minhash.exact_jaccard(minhash.doc_shingles(docs, 3))
        .filter(F.col("jaccard") >= 0.5)
        .select("a_id", "b_id", "jaccard")
    )
    e = load(spark, sf_dir, "embeddings")
    ea = e.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"))
    return (
        pairs.join(ea, "a_id")
        .join(eb, "b_id")
        .select(
            "a_id",
            "b_id",
            "jaccard",
            vector.cosine(
                F.col("ea"),
                F.col("eb"),
                vector.l2_norm(F.col("ea")),
                vector.l2_norm(F.col("eb")),
            ).alias("cosine"),
        )
    )


@query(
    "c9_curation_pipeline",
    sql="""
    WITH cleaned AS (
      SELECT doc_id, lang, n_chars,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                  ' +', ' ', 'g')) AS t
      FROM documents
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY sha256(t) ORDER BY doc_id) AS rn
      FROM cleaned
    ),
    surv AS (SELECT doc_id, lang, n_chars, t FROM ranked WHERE rn = 1),
    toks AS (SELECT *, string_split(t, ' ') AS tk FROM surv),
    g2 AS (
      SELECT doc_id, lang, n_chars, tk,
             list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) AS grams
      FROM toks WHERE len(tk) >= 2
    ),
    scored AS (
      SELECT doc_id, lang, n_chars, len(tk) AS n_tokens,
             CAST(len(list_filter(grams,
                    g -> len(list_filter(grams, h -> h = g)) > 1)) AS DOUBLE)
               / len(grams) AS rep_frac
      FROM g2
    ),
    kept AS (SELECT * FROM scored WHERE rep_frac <= 0.6 AND n_tokens >= 10)
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(round(CAST(CAST((CAST(sum(n_chars) AS DOUBLE) / sum(n_tokens)) AS VARCHAR) AS DECIMAL(38,15)), 6) AS DOUBLE) AS chars_per_token
    FROM kept
    GROUP BY lang
    """,
    tags=("L1", "L9", "F1", "A1", "W1"),
)
def c9_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline in ONE query — the composition a
    corpus team actually ships: normalize text (l20) → exact-dedup
    keep-first on the cleaned digest (l2) → score duplicated-bigram
    repetition in-row (l23's technique) → threshold filter → per-
    language corpus card (l27). Demonstrates that the verified stages
    compose without materialization barriers: Catalyst fuses clean +
    score into one projection, and the only shuffles are the dedup hash
    and the final card agg.

    Scale shape: two equi-keyed shuffles total (digest window, card
    agg); everything else is map-side. The same DAG at 100 TB just has
    bigger shuffles on the same keys.
    """
    docs = load(spark, sf_dir, "documents")

    def clean(c):
        lowered = F.lower(c)
        stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
        return F.trim(F.regexp_replace(stripped, " +", " "))

    cleaned = docs.select(
        "doc_id", "lang", "n_chars", clean(F.col("text")).alias("t")
    )
    surv = (
        cleaned.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.sha2(F.col("t"), 256)).orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    tk = F.split(F.col("t"), " ")
    # Repetition scoring via explode + hash agg (l23's shape) — the
    # codegen'd path; an in-row higher-order-function variant was ~30×
    # slower (interpreted lambdas; see l23's docstring).
    staged = surv.filter(F.size(tk) >= 2).select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(tk).alias("n_tokens"),
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.concat_ws(" ", F.slice(tk, i, 2)),
        ).alias("grams"),
    )
    counts = (
        staged.select("doc_id", F.explode("grams").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    rep = counts.groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast("double")
            / F.sum("c").cast("double")
        ).alias("rep_frac")
    )
    scored = staged.drop("grams").join(rep, "doc_id")
    kept = scored.filter((F.col("rep_frac") <= 0.6) & (F.col("n_tokens") >= 10))
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_tokens"), 6
        ).alias("chars_per_token"),
    )


@query(
    "c10_retention_cohorts",
    sql=f"""
    WITH ev AS (
      SELECT user_id, CAST({ts_us()} AS DATE) AS d FROM events
    ),
    firsts AS (SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, e.d) AS day_offset
      FROM ev e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day,
           CAST(day_offset AS BIGINT) AS day_offset,
           count(*) AS n_active
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
    tags=("A1", "F2", "J1", "W2"),
)
def c10_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity day,
    counted active at each day offset (0-7) — the standard product-
    analytics composite (first-touch attribution + day-offset join +
    distinct-user counts).

    Scale shape: the cohort table is user-cardinality (small side of the
    join — broadcastable at any event volume); activity dedup and the
    triangle agg are equi-keyed on (user, day) / (cohort, offset).
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("d"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
        .select(
            "cohort_day",
            F.col("day_offset").cast("long").alias("day_offset"),
            "n_active",
        )
    )


@query(
    "c11_scd2_merge",
    sql=f"""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             DATE '2000-01-01' AS valid_from,
             CAST(NULL AS DATE) AS valid_to, true AS is_current
      FROM customer
    ),
    upd AS (
      SELECT c_custkey, c_mktsegment,
             {dround('c_acctbal * 1.1', 2)} AS c_acctbal
      FROM customer WHERE c_custkey % 7 = 0
    ),
    chg AS (
      SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal
      FROM upd u JOIN dim d ON u.c_custkey = d.c_custkey
      WHERE u.c_acctbal <> d.c_acctbal
    )
    SELECT d.* FROM dim d
    WHERE d.c_custkey NOT IN (SELECT c_custkey FROM chg)
    UNION ALL
    SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal, d.valid_from,
           DATE '2024-01-15', false
    FROM dim d JOIN chg c ON d.c_custkey = c.c_custkey
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal, DATE '2024-01-15',
           CAST(NULL AS DATE), true
    FROM chg
    """,
    tags=("J2", "J5", "U1", "F4"),
)
def c11_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 merge (the warehouse MERGE INTO
    pattern, expressed as pure DataFrame algebra): an update batch lands
    on a versioned dimension — unchanged rows pass through, genuinely
    changed rows are closed (valid_to set) and re-inserted as the new
    current version. Change detection compares attributes, not just key
    presence, so no-op updates don't churn history.

    Scale shape: the dimension and batch join equi-keyed on the surrogate
    key (dim is the big side; the batch is typically broadcastable); the
    three branches are one semi/anti split plus a union — no window, no
    skew. This is exactly how Delta/Iceberg MERGE compiles when the
    engine lacks a native row-level-update channel.
    """
    import datetime

    cust = load(spark, sf_dir, "customer")
    eff = F.lit(datetime.date(2024, 1, 15))
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit(datetime.date(2000, 1, 1)).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    upd = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 1.1, 2).alias("c_acctbal"),
    )
    chg = (
        upd.alias("u")
        .join(dim.alias("d"), "c_custkey")
        .filter(F.col("u.c_acctbal") != F.col("d.c_acctbal"))
        .select("c_custkey", "u.c_mktsegment", "u.c_acctbal")
    )
    untouched = dim.join(chg, "c_custkey", "left_anti")
    closed = (
        dim.alias("d")
        .join(chg.select("c_custkey"), "c_custkey", "left_semi")
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            "valid_from",
            eff.alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    inserted = chg.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return untouched.unionAll(closed).unionAll(inserted)


@query(
    "c12_touch_attribution",
    sql=f"""
    WITH s AS (
      SELECT user_id, {ts_us()} AS ts, event_id, event_type, value,
             CASE WHEN event_type IN ('click', 'view') THEN event_type END
               AS touch_type
      FROM events
      WHERE event_type IN ('click', 'view', 'purchase')
    ),
    carried AS (
      SELECT user_id, ts, event_id, event_type, value,
             last_value(touch_type IGNORE NULLS) OVER w AS t_type,
             last_value(CASE WHEN touch_type IS NOT NULL THEN ts END
                        IGNORE NULLS) OVER w AS t_ts
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT coalesce(CASE WHEN t_ts >= ts - INTERVAL 7 DAY THEN t_type END,
                    'direct') AS channel,
           count(*) AS n_purchases,
           {dround('sum(value)')} AS attributed_value
    FROM carried
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    tags=("J9", "W6", "A12", "F2"),
)
def c12_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the
    user's most recent click/view within a 7-day lookback, else
    'direct'. As-of-join semantics expressed as the union +
    carry-forward window (tag both streams, one ordered pass per user,
    last-non-null touch at each purchase) — the formulation that scales
    better than a per-purchase range join when both streams share keys.

    Scale shape: ONE shuffle on user_id covers the whole as-of; no
    range-bucketed join, no per-row subquery. The two carried columns
    read from the same last touch row, so type and timestamp stay
    consistent.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(
            F.col("event_type").isin("click", "view"), F.col("event_type")
        ).alias("touch_type"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = s.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.last("touch_type", ignorenulls=True).over(w).alias("t_type"),
        F.last(
            F.when(F.col("touch_type").isNotNull(), F.col("ts")), ignorenulls=True
        ).over(w).alias("t_ts"),
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(
                F.when(
                    F.col("t_ts") >= F.col("ts") - F.expr("interval 7 days"),
                    F.col("t_type"),
                ),
                F.lit("direct"),
            ).alias("channel"),
            "value",
        )
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("attributed_value"),
        )
    )


@query(
    "c13_time_in_state",
    sql=f"""
    WITH seq AS (
      SELECT user_id, event_type, {ts_us()} AS ts,
             lead({ts_us()}) OVER (PARTITION BY user_id
                                   ORDER BY {ts_us()}, event_id) AS next_ts
      FROM events
    )
    SELECT event_type,
           count(next_ts) AS n_intervals,
           {dround("sum(epoch_us(next_ts - ts)) / 1000000.0")} AS total_sec,
           {dround("avg(epoch_us(next_ts - ts)) / 1000000.0", 6)} AS avg_sec
    FROM seq
    WHERE next_ts IS NOT NULL
    GROUP BY event_type
    """,
    tags=("W2", "A1", "F2"),
)
def c13_time_in_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-state: each event opens a state (its event_type) that
    lasts until the user's NEXT event; aggregate total/mean dwell
    seconds per state. The standard session-analytics measure of where
    users actually spend time — a funnel (c7) tells you *that* they
    moved, this tells you *how long* each stage held them. Each user's
    last event has no successor and is excluded (count(next_ts) counts
    only closed intervals on both engines).

    Plan: one window shuffle on user_id (lead over the per-user
    timeline with event_id tie-break), then a partial+final hash agg on
    the 5-value state key. Durations are computed in µs longs and
    divided once at the end — identical integer arithmetic on both
    engines until the final double division.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
    )
    dur_us = F.unix_micros("next_ts") - F.unix_micros("ts")
    return (
        seq.filter(F.col("next_ts").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("next_ts").alias("n_intervals"),
            F.round(F.sum(dur_us) / 1e6, 4).alias("total_sec"),
            F.round(F.avg(dur_us) / 1e6, 6).alias("avg_sec"),
        )
    )


@query(
    "c14_time_decay_attribution",
    sql=f"""
    WITH p AS (
      SELECT user_id, event_id AS p_id, {ts_us()} AS p_ts, value
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, event_type AS channel, event_id AS t_id,
             {ts_us()} AS t_ts
      FROM events WHERE event_type IN ('click', 'view')
    ),
    pairs AS (
      SELECT p.p_id, p.value, t.channel,
             1.0 / CAST(1 << CAST(epoch_us(p.p_ts - t.t_ts)
                                  // 3600000000 AS INT) AS DOUBLE) AS w
      FROM p JOIN t ON p.user_id = t.user_id
       AND t.t_ts <= p.p_ts AND t.t_ts > p.p_ts - INTERVAL 24 HOUR
    ),
    shares AS (
      SELECT channel, value * w / sum(w) OVER (PARTITION BY p_id) AS share
      FROM pairs
    )
    SELECT channel,
           count(*) AS n_touches,
           {dround("sum(share)")} AS attributed_value
    FROM shares
    GROUP BY channel
    """,
    tags=("J8", "W3", "A1", "F3"),
)
def c14_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch TIME-DECAY attribution (the fractional counterpart of
    c12's last-touch): every click/view in the 24 h before a purchase
    earns a share of its value, halving per hour of age —
    w = 2^-floor(hours), normalized per purchase. Decay weights are
    EXACT binary powers (integer shift, one division), not pow()/exp()
    calls, so every share is bit-identical cross-engine before the
    final rounded sums — transcendental functions are the classic
    silent cross-engine drift source in attribution pipelines.

    Scale shape: the purchase↔touch pairing is an equi-join on user_id
    with a time-band predicate — per-user event counts are bounded
    (~67 here), so pair fan-out is bounded; the per-purchase
    normalization is one window sum over those small groups, then a
    5-value hash agg. One shuffle on user_id, one on p_id.
    """
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    t = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("t_ts"),
    )
    pairs = (
        p.join(
            t,
            (p.user_id == t.t_user)
            & (t.t_ts <= p.p_ts)
            & (t.t_ts > p.p_ts - F.expr("INTERVAL 24 HOURS")),
        )
        .withColumn(
            "age_h",
            (
                (F.unix_micros("p_ts") - F.unix_micros("t_ts"))
                / F.lit(3_600_000_000)
            ).cast("int"),
        )
        .select(
            "p_id",
            "value",
            "channel",
            F.expr("1.0 / CAST(shiftleft(1, age_h) AS DOUBLE)").alias("w"),
        )
    )
    shares = pairs.select(
        "channel",
        (
            F.col("value")
            * F.col("w")
            / F.sum("w").over(Window.partitionBy("p_id"))
        ).alias("share"),
    )
    return shares.groupBy("channel").agg(
        F.count("*").alias("n_touches"),
        F.round(F.sum("share"), 4).alias("attributed_value"),
    )


@query(
    "c15_ab_test_ztest",
    sql=f"""
    WITH conv AS (
      SELECT user_id,
             CASE WHEN (user_id * 2654435761) % 2 = 0 THEN 'A' ELSE 'B' END
               AS variant,
             max(CASE WHEN event_type = 'purchase' AND value > 150
                 THEN 1 ELSE 0 END) AS converted
      FROM events
      GROUP BY user_id
    ),
    arms AS (
      SELECT variant, count(*) AS n_users,
             CAST(sum(converted) AS BIGINT) AS n_conv,
             CAST(sum(converted) AS DOUBLE) / count(*) AS rate
      FROM conv GROUP BY variant
    ),
    wide AS (
      SELECT max(CASE WHEN variant = 'A' THEN n_users END) AS n_a,
             max(CASE WHEN variant = 'A' THEN n_conv END) AS c_a,
             max(CASE WHEN variant = 'A' THEN rate END) AS r_a,
             max(CASE WHEN variant = 'B' THEN n_users END) AS n_b,
             max(CASE WHEN variant = 'B' THEN n_conv END) AS c_b,
             max(CASE WHEN variant = 'B' THEN rate END) AS r_b
      FROM arms
    )
    SELECT n_a, c_a, {dround("r_a", 6)} AS rate_a,
           n_b, c_b, {dround("r_b", 6)} AS rate_b,
           {dround("(r_a - r_b) / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) * (1.0 / n_a + 1.0 / n_b))", 6)}
             AS z_stat
    FROM wide
    """,
    tags=("A12", "A2", "F3", "A7"),
)
def c15_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for a deterministic A/B split: users are
    hashed into arms (multiplicative hash parity — reproducible, no
    rand()), conversion = made ≥1 high-value (>150) purchase, and the pooled z-statistic
    decides whether the arms differ. The experimentation-platform
    primitive, computed end-to-end in one pass + a pivot.

    Every float step — rate divisions, pooled variance, sqrt — is an
    IEEE correctly-rounded operation (sqrt included; no transcendental
    calls), so the statistic is bit-identical cross-engine before the
    final display rounding. A null split like this hash parity should
    land |z| < 2 almost always — the property test asserts the sane
    range, the oracle asserts the bits.
    """
    ev = load(spark, sf_dir, "events")
    conv = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .select(
            F.when(
                F.pmod(F.col("user_id") * 2654435761, F.lit(2)) == 0, "A"
            )
            .otherwise("B")
            .alias("variant"),
            "converted",
        )
    )
    arms = conv.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").alias("n_conv"),
        (F.sum("converted").cast("double") / F.count("*")).alias("rate"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("variant") == "A", F.col("n_conv"))).alias("c_a"),
        F.max(F.when(F.col("variant") == "A", F.col("rate"))).alias("r_a"),
        F.max(F.when(F.col("variant") == "B", F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("variant") == "B", F.col("n_conv"))).alias("c_b"),
        F.max(F.when(F.col("variant") == "B", F.col("rate"))).alias("r_b"),
    )
    pooled = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (F.col("r_a") - F.col("r_b")) / F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "c_a",
        F.round("r_a", 6).alias("rate_a"),
        "n_b",
        "c_b",
        F.round("r_b", 6).alias("rate_b"),
        F.round(z, 6).alias("z_stat"),
    )


@query(
    "c16_pretraining_pipeline",
    sql=f"""
    WITH cleaned AS (
      SELECT doc_id, source,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                  ' +', ' ', 'g')) AS t
      FROM documents
    ),
    deduped AS (
      SELECT doc_id, source, t
      FROM (SELECT *, row_number() OVER (PARTITION BY sha256(t)
                                         ORDER BY doc_id) AS rn
            FROM cleaned)
      WHERE rn = 1
    ),
    eval_grams AS (
      SELECT DISTINCT unnest(list_transform(
               range(1, len(string_split(t, ' ')) - 3),
               i -> array_to_string(list_slice(string_split(t, ' '), i, i + 4),
                                    ' '))) AS g
      FROM deduped WHERE doc_id % 97 = 0
    ),
    train AS (SELECT * FROM deduped WHERE doc_id % 97 <> 0),
    train_grams AS (
      SELECT doc_id, unnest(list_transform(
               range(1, len(string_split(t, ' ')) - 3),
               i -> array_to_string(list_slice(string_split(t, ' '), i, i + 4),
                                    ' '))) AS g
      FROM train
    ),
    contaminated AS (
      SELECT DISTINCT tg.doc_id
      FROM train_grams tg JOIN eval_grams eg ON tg.g = eg.g
    ),
    clean_train AS (
      SELECT t.doc_id, t.source, len(string_split(t.t, ' ')) AS n_tokens
      FROM train t LEFT JOIN contaminated c ON t.doc_id = c.doc_id
      WHERE c.doc_id IS NULL AND len(string_split(t.t, ' ')) >= 10
    ),
    split AS (
      SELECT doc_id, n_tokens,
             CASE WHEN (CAST(substring(source, 4) AS BIGINT) * 2654435761)
                       % 100 < 10
                  THEN 'val' ELSE 'train' END AS split
      FROM clean_train
    ),
    packed AS (
      SELECT split, doc_id, n_tokens,
             CAST(floor((sum(n_tokens) OVER (PARTITION BY split
                                             ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING)
                         - 1) / 256) AS BIGINT) AS seq_id
      FROM split
    )
    SELECT split,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           count(DISTINCT seq_id) AS n_sequences,
           {dround("CAST(sum(n_tokens) AS DOUBLE) / (count(DISTINCT seq_id) * 256)", 6)}
             AS utilization
    FROM packed
    GROUP BY split
    ORDER BY split
    """,
    tags=("L1", "L9", "L8", "L3", "W3", "A1", "F1"),
)
def c16_pretraining_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining-corpus pipeline as ONE lazy plan — the
    production composition this engine exists for: normalize (l20) →
    exact-dedup keep-first on content digest (l2) → decontaminate
    against a held-out eval slice by 5-gram overlap (l19) → minimum-
    length quality gate (l9b) → leakage-free source-hash split (l34) →
    concat-and-chop 256-token sequence packing (l25) → per-split
    corpus card (n_docs, tokens, sequences, packing utilization).

    Every stage was verified standalone; composing them in one DAG
    shows nothing needs a materialization barrier: Catalyst pipelines
    clean+tokenize+length into single projections and the only
    shuffles are the four keyed ones (digest window, gram join, split
    window, final card agg). At 100 TB each stage's scale note carries
    over unchanged — the gram join is the one to watch (both sides
    grow with corpus; the LSH tier substitutes at full scale).

    Packing is the industry-standard concat-and-chop: token counts
    cumsum per split in deterministic doc_id order, chopped at 256 —
    seq_id = floor((cumsum-1)/256) — so utilization is exact integer
    arithmetic until the single final division.
    """
    docs = load(spark, sf_dir, "documents")
    t = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    cleaned = docs.select("doc_id", "source", t.alias("t"))
    w_dig = Window.partitionBy(F.sha2("t", 256)).orderBy("doc_id")
    deduped = (
        cleaned.withColumn("rn", F.row_number().over(w_dig))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    from nipd_spark.operators import text as tx

    grams = lambda c: F.explode(tx.shingles(c, 5))  # noqa: E731
    eval_grams = (
        deduped.filter(F.col("doc_id") % 97 == 0)
        .select(grams(F.col("t")).alias("g"))
        .distinct()
    )
    train = deduped.filter(F.col("doc_id") % 97 != 0)
    contaminated = (
        train.select("doc_id", grams(F.col("t")).alias("g"))
        .join(eval_grams, "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean_train = (
        train.join(contaminated, "doc_id", "left_anti")
        .select(
            "doc_id",
            "source",
            F.size(tx.tokens(F.col("t"))).alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= 10)
    )
    sid = F.substring("source", 4, 10).cast("bigint")
    split = clean_train.select(
        "doc_id",
        "n_tokens",
        F.when(F.pmod(sid * F.lit(2654435761), F.lit(100)) < 10, "val")
        .otherwise("train")
        .alias("split"),
    )
    w_pack = (
        Window.partitionBy("split")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = split.withColumn(
        "seq_id",
        F.floor((F.sum("n_tokens").over(w_pack) - 1) / 256).cast("bigint"),
    )
    return (
        packed.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.countDistinct("seq_id").alias("n_sequences"),
            F.round(
                F.sum("n_tokens").cast("double")
                / (F.countDistinct("seq_id") * 256),
                6,
            ).alias("utilization"),
        )
        .orderBy("split")
    )


@query(
    "c17_bootstrap_ci",
    sql=f"""
    WITH resampled AS (
      SELECT e.event_type, r.r, e.value
      FROM events e
      CROSS JOIN (SELECT unnest(range(0, 10)) AS r) r
      WHERE (e.event_id * 2654435761 + r.r * 40503) % 2 = 0
    ),
    med AS (
      SELECT event_type, r, median(value) AS med
      FROM resampled
      GROUP BY event_type, r
    )
    SELECT event_type,
           count(*) AS n_resamples,
           {dround("min(med)", 6)} AS ci_lo,
           {dround("max(med)", 6)} AS ci_hi,
           {dround("avg(med)", 6)} AS med_mean
    FROM med
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("A9", "A1", "F3"),
)
def c17_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap-style confidence band for the per-type median value —
    with DETERMINISTIC resamples: replicate r keeps the rows whose
    (event_id, r) hash is even, giving 10 independent-ish half-samples
    with zero rand() (reproducible across engines, runs, and partition
    layouts; the same trick as every sampler in this repo, l17/l29/
    l32). The spread of the 10 resample medians is the uncertainty
    band an analyst actually wants next to dq2's point estimates.

    Shape: the replicate axis is a 10-row broadcast cross join (row
    expansion 10x BEFORE the hash filter halves it — net 5x), then one
    grouped exact median per (type, replicate) and a 5-row final agg.
    At 100 TB swap the exact median for a15's sketch and the expansion
    for per-replicate partial sketches in one pass.
    """
    ev = load(spark, sf_dir, "events")
    reps = spark.range(10).select(F.col("id").cast("int").alias("r"))
    resampled = (
        ev.crossJoin(F.broadcast(reps))
        .filter(
            F.pmod(
                F.col("event_id") * F.lit(2654435761) + F.col("r") * 40503,
                F.lit(2),
            )
            == 0
        )
        .select("event_type", "r", "value")
    )
    med = resampled.groupBy("event_type", "r").agg(
        F.median("value").alias("med")
    )
    return (
        med.groupBy("event_type")
        .agg(
            F.count("*").alias("n_resamples"),
            F.round(F.min("med"), 6).alias("ci_lo"),
            F.round(F.max("med"), 6).alias("ci_hi"),
            F.round(F.avg("med"), 6).alias("med_mean"),
        )
        .orderBy("event_type")
    )


@query(
    "c18_transition_matrix",
    sql=f"""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY {ts_us()}, event_id) AS to_type
      FROM events
    ),
    pairs AS (SELECT from_type, to_type FROM seq WHERE to_type IS NOT NULL),
    tot AS (SELECT from_type, count(*) AS n_from FROM pairs GROUP BY from_type)
    SELECT p.from_type, p.to_type,
           count(*) AS n,
           {dround("CAST(count(*) AS DOUBLE) / any_value(t.n_from)", 6)} AS p_transition
    FROM pairs p JOIN tot t ON p.from_type = t.from_type
    GROUP BY p.from_type, p.to_type
    ORDER BY p.from_type, p.to_type
    """,
    tags=("W2", "A1", "J6"),
)
def c18_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    (state, next-state) pair of event types, the transition count and
    conditional probability P(next | current) along every user's
    timeline. The 25-cell matrix is what session simulators, anomaly
    scorers ("this hop is rare"), and c7-style funnel analyses read
    off. Rows per user are bounded, so the lead() window is one
    user_id shuffle; the matrix agg is a 25-key hash agg; the
    row-total join broadcasts a 5-row table.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    tot = pairs.groupBy("from_type").agg(F.count("*").alias("n_from"))
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_from"), 6).alias(
                "p_transition"
            ),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "c19_seasonality_profile",
    sql=f"""
    WITH base AS (
      SELECT event_type,
             CAST(date_part('dow', {ts_us()}) AS INT) AS dow,
             value
      FROM events
    ),
    cells AS (
      SELECT event_type, dow, count(*) AS n, {dround("sum(value)")} AS total
      FROM base GROUP BY event_type, dow
    ),
    typ AS (SELECT event_type, sum(n) AS n_type FROM cells GROUP BY event_type)
    SELECT c.event_type, c.dow, c.n,
           {dround("CAST(c.n AS DOUBLE) / any_value(t.n_type)", 6)} AS dow_share,
           c.total
    FROM cells c JOIN typ t ON c.event_type = t.event_type
    GROUP BY c.event_type, c.dow, c.n, c.total
    ORDER BY c.event_type, c.dow
    """,
    tags=("F2", "A1", "A12"),
)
def c19_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: the share of a
    type's traffic landing on each weekday plus the value mass — the
    seasonal fingerprint detrending/anomaly baselines are built from
    (dq2's outlier fences should really be conditioned on THIS). Spark
    dayofweek() is 1=Sunday..7; DuckDB date_part('dow') is 0=Sunday..6
    — the cross-engine off-by-one is normalized to the DuckDB
    convention in the Spark expression, the classic calendar-semantics
    trap (SURVEY §4.2) made explicit.
    """
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        (F.dayofweek("ts") - 1).alias("dow"),  # → 0=Sunday..6 (DuckDB dow)
        "value",
    )
    cells = base.groupBy("event_type", "dow").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")
    )
    typ = cells.groupBy("event_type").agg(F.sum("n").alias("n_type"))
    return (
        cells.join(F.broadcast(typ), "event_type")
        .select(
            "event_type",
            "dow",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_type"), 6).alias(
                "dow_share"
            ),
            "total",
        )
        .orderBy("event_type", "dow")
    )


@query(
    "c20_rfm_segmentation",
    sql="""
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             sum(o_totalprice) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             ntile(4) OVER (ORDER BY last_order, o_custkey) AS r_score,
             ntile(4) OVER (ORDER BY frequency, o_custkey)  AS f_score,
             ntile(4) OVER (ORDER BY monetary, o_custkey)   AS m_score
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           CAST(max(CASE WHEN r_score = 4 AND f_score = 4 AND m_score = 4
                    THEN 1 ELSE 0 END) AS INT) AS is_champion_cell
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    tags=("W1", "A1", "A11"),
)
def c20_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer Recency / Frequency /
    Monetary, each quartiled with ntile semantics (deterministic
    o_custkey tie-break), customers counted per (r, f, m) cell — the
    4x4x4 segment grid CRM targeting runs on, with the champions cell
    (4,4,4) flagged. Each quartile assignment runs as the distributed
    histogram rank + ntile arithmetic (operators/ranks.py) — three
    bucket-partitioned passes over the customer-grain aggregate, no
    unpartitioned window anywhere, bit-identical to Window ntile
    (property-tested).

    r12 optimization: the three rank passes are built as independent
    (o_custkey, rn) MAPS over the once-checkpointed customer-grain
    aggregate and joined at the end — the multi-column rank-map idiom
    (operators/ranks.grouped_avg_rank_map's lineage note; CLAUDE.md).
    The previous form CHAINED with_global_rn calls, so pass #2's
    range/totals aggregations re-executed pass #1's whole join+window
    lineage and pass #3 re-executed both — measured 31 s at sf0.001 /
    39 output rows; the map-join form is 2.9 s (10.7x) with
    bit-identical output (row_number over (key, o_custkey) is
    deterministic per pass regardless of composition order).
    """
    from nipd_spark.operators import ranks
    from nipd_spark.operators.materialize import spill_checkpoint

    o = load(spark, sf_dir, "orders")
    rfm = spill_checkpoint(
        o.groupBy("o_custkey").agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum("o_totalprice").alias("monetary"),
        ).withColumn(
            # numeric rank key; NTZ -> TZ cast is UTC-pinned and monotone
            "last_us", F.unix_micros(F.col("last_order").cast("timestamp"))
        ),
        eager=False,
    )
    cnt = rfm.agg(F.count("*").alias("__n"))

    def rank_map(key: str, out: str) -> DataFrame:
        return ranks.with_global_rn(
            rfm.select("o_custkey", key), key, ["o_custkey"], out=out
        ).select("o_custkey", out)

    ranked = (
        rank_map("last_us", "__r_rn")
        .join(rank_map("frequency", "__f_rn"), "o_custkey")
        .join(rank_map("monetary", "__m_rn"), "o_custkey")
    )
    n = F.col("__n")
    scored = ranked.crossJoin(F.broadcast(cnt)).select(
        "o_custkey",
        ranks.ntile_from_rn(4, F.col("__r_rn"), n).alias("r_score"),
        ranks.ntile_from_rn(4, F.col("__f_rn"), n).alias("f_score"),
        ranks.ntile_from_rn(4, F.col("__m_rn"), n).alias("m_score"),
    )
    champion = (
        (F.col("r_score") == 4) & (F.col("f_score") == 4) & (F.col("m_score") == 4)
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.max(champion.cast("int")).alias("is_champion_cell"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@query(
    "c21_leadtime_distribution",
    sql=f"""
    WITH lag AS (
      SELECT o.o_orderpriority AS priority,
             CAST(epoch_us(l.l_shipdate - o.o_orderdate) // 86400000000
                  AS BIGINT) AS days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    )
    SELECT priority,
           count(*) AS n_lines,
           min(days) AS p0,
           {dround("quantile_cont(days, 0.50)", 6)} AS p50,
           {dround("quantile_cont(days, 0.90)", 6)} AS p90,
           max(days) AS p100
    FROM lag
    GROUP BY priority
    ORDER BY priority
    """,
    tags=("J1", "A9", "F2"),
)
def c21_leadtime_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead-time distribution by priority: whole-day lag
    between order placement and each line's ship date, summarized as
    exact continuous percentiles — the SLA panel (does 2-HIGH actually
    ship faster?). Day arithmetic in integer µs (floor-div, no
    calendar functions), percentile_cont matching DuckDB's
    quantile_cont interpolation exactly on integer inputs.

    Shape: one fact-fact equi join on orderkey (orders side is smaller
    — broadcast at this SF, shuffle-hash at 100 TB), then a per-group
    exact percentile (sort within 5 groups); a15's sketch replaces it
    beyond memory.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    lag = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            (
                (
                    F.unix_micros(F.col("l_shipdate").cast("timestamp"))
                    - F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                )
                / F.lit(86_400_000_000)
            ).cast("bigint").alias("days"),
        )
    )
    return (
        lag.groupBy("priority")
        .agg(
            F.count("*").alias("n_lines"),
            F.min("days").alias("p0"),
            F.round(F.expr("percentile(days, 0.50)"), 6).alias("p50"),
            F.round(F.expr("percentile(days, 0.90)"), 6).alias("p90"),
            F.max("days").alias("p100"),
        )
        .orderBy("priority")
    )


@query(
    "c22_association_rules",
    sql=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM op),
    item AS (SELECT l_partkey, count(*) AS n_item FROM op GROUP BY l_partkey),
    pair AS (
      SELECT a.l_partkey AS x, b.l_partkey AS y, count(*) AS n_pair
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING count(*) >= 3
    )
    SELECT p.x, p.y, p.n_pair,
           {dround("CAST(p.n_pair AS DOUBLE) / ix.n_item", 6)} AS confidence,
           {dround("CAST(p.n_pair AS DOUBLE) * n.n / (CAST(ix.n_item AS DOUBLE) * iy.n_item)", 6)}
             AS lift
    FROM pair p
    JOIN item ix ON p.x = ix.l_partkey
    JOIN item iy ON p.y = iy.l_partkey
    CROSS JOIN n_orders n
    ORDER BY lift DESC, p.x ASC, p.y ASC
    LIMIT 50
    """,
    tags=("J11", "A1", "A5"),
)
def c22_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-purchased parts:
    support (co-occurrence count, min 3), confidence P(y|x), and lift
    P(x,y)/(P(x)P(y)) — top-50 by lift. The counting layer of
    Apriori/FP-growth expressed as the basket self-join g1 already
    uses, plus two broadcast joins against the item-frequency table.
    Lift > 1 surfaces genuinely associated pairs rather than merely
    popular ones — the difference between a recommender signal and a
    bestseller list. The HAVING floor prunes the rule space before the
    stats joins, which is the Apriori support-pruning insight.
    """
    li = load(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = op.select("l_orderkey").distinct().count()
    item = op.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    a, b = op.alias("a"), op.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= 3)
    )
    ix = item.select(F.col("l_partkey").alias("x"), F.col("n_item").alias("nx"))
    iy = item.select(F.col("l_partkey").alias("y"), F.col("n_item").alias("ny"))
    return (
        pair.join(F.broadcast(ix), "x")
        .join(F.broadcast(iy), "y")
        .select(
            "x",
            "y",
            "n_pair",
            F.round(F.col("n_pair").cast("double") / F.col("nx"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_pair").cast("double")
                * n_orders
                / (F.col("nx").cast("double") * F.col("ny")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("x").asc(), F.col("y").asc())
        .limit(50)
    )


@query(
    "c23_ordered_funnel",
    sql=f"""
    WITH ev AS (
      SELECT user_id, event_type, {ts_us()} AS ts FROM events
    ),
    v AS (SELECT user_id, min(ts) AS v_ts FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS c_ts
          FROM ev e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.v_ts
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS p_ts
          FROM ev e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
          GROUP BY e.user_id)
    SELECT count(v.user_id) AS n_viewed,
           count(c.user_id) AS n_clicked_after,
           count(p.user_id) AS n_purchased_after,
           count(CASE WHEN p.p_ts <= v.v_ts + INTERVAL 24 HOUR
                 THEN 1 END) AS n_completed_24h
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON c.user_id = p.user_id
    """,
    tags=("J2", "A11", "F2"),
)
def c23_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICTLY ORDERED funnel (view → click → purchase, each stage
    after the previous one's first occurrence, full path within 24 h) —
    the sequence-matching semantics SQL MATCH_RECOGNIZE provides and
    Spark lacks, rebuilt from stage-anchored min aggregates: each
    stage's anchor is the earliest qualifying event AFTER the prior
    anchor, so 'purchase then click then view' users do NOT count
    (c7's unordered funnel would count them). Three grouped mins with
    equi joins on user_id — one shuffle key throughout, no window over
    full history, no state machine.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    funnel = v.join(c, "user_id", "left").join(p, "user_id", "left")
    return funnel.agg(
        F.count("v_ts").alias("n_viewed"),
        F.count("c_ts").alias("n_clicked_after"),
        F.count("p_ts").alias("n_purchased_after"),
        F.count(
            F.when(
                F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 24 HOURS"), 1
            )
        ).alias("n_completed_24h"),
    )


@query(
    "c24_discount_response",
    sql=f"""
    WITH banded AS (
      SELECT CAST(floor(l_discount * 20) AS INT) AS disc_band,
             l_quantity, l_extendedprice * (1 - l_discount) AS net
      FROM lineitem
    ),
    base AS (
      SELECT {dround("avg(l_quantity)", 6)} AS base_qty
      FROM banded WHERE disc_band = 0
    )
    SELECT disc_band,
           count(*) AS n_lines,
           {dround("avg(l_quantity)", 6)} AS avg_qty,
           {dround("avg(l_quantity) / any_value(base_qty)", 6)} AS qty_lift,
           {dround("sum(net)")} AS net_revenue
    FROM banded, base
    GROUP BY disc_band
    ORDER BY disc_band
    """,
    tags=("A13", "A12", "F3"),
)
def c24_discount_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-response curve: line items banded by discount depth
    (5%-wide bands), each band's average quantity expressed as a LIFT
    over the undiscounted band — the "does discounting move volume"
    table pricing reads before touching elasticity models (which need
    logs; the lift ratio is exact arithmetic). The zero-band baseline
    is a 1-row broadcast join back onto the band aggregate; integer
    banding via floor(×20) avoids float bucket-edge ambiguity.
    """
    li = load(spark, sf_dir, "lineitem")
    banded = li.select(
        F.floor(F.col("l_discount") * 20).cast("int").alias("disc_band"),
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )
    base = (
        banded.filter(F.col("disc_band") == 0)
        .agg(F.round(F.avg("l_quantity"), 6).alias("base_qty"))
    )
    return (
        banded.crossJoin(F.broadcast(base))
        .groupBy("disc_band")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_quantity") / F.first("base_qty"), 6).alias(
                "qty_lift"
            ),
            F.round(F.sum("net"), 4).alias("net_revenue"),
        )
        .orderBy("disc_band")
    )


@query(
    "c25_mom_growth",
    sql=f"""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
             {dround("sum(o_totalprice)")} AS revenue
      FROM orders GROUP BY 1
    )
    SELECT mon, revenue,
           {dround("lag(revenue) OVER (ORDER BY mon)")} AS prev_revenue,
           {dround("revenue / lag(revenue) OVER (ORDER BY mon) - 1", 6)}
             AS mom_growth
    FROM monthly
    ORDER BY mon
    """,
    tags=("W2", "A1", "F2"),
)
def c25_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth: the period-over-period lag ratio every
    revenue dashboard opens with. Monthly totals are rounded BEFORE
    the lag/ratio (the repo's two-level float discipline), so the
    growth figures divide identical bits on both engines; the first
    month's growth is NULL by construction (no prior period), not 0 —
    silently zero-filling it is the classic dashboard lie. The window
    is over the months-sized aggregate: ~84 rows regardless of fact
    volume.
    """
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("mon")
    ).agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    w = Window.orderBy("mon")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "mon",
        "revenue",
        F.round(prev, 4).alias("prev_revenue"),
        F.round(F.col("revenue") / prev - 1, 6).alias("mom_growth"),
    ).orderBy("mon")


@query(
    "c26_capped_balance",
    sql=f"""
    WITH RECURSIVE d AS (
      SELECT user_id, event_id,
             CASE WHEN event_type = 'purchase' THEN value
                  WHEN event_type = 'click' THEN -value
                  ELSE 0.0 END AS delta,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY {ts_us()}, event_id) AS rn
      FROM events
    ),
    walk(user_id, rn, bal, n_floored) AS (
      SELECT user_id, rn, greatest(0.0, delta),
             CAST(delta < 0 AND greatest(0.0, delta) = 0.0 AS INT)
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.user_id, d.rn, greatest(0.0, walk.bal + d.delta),
             walk.n_floored
               + CAST(walk.bal + d.delta < 0 AS INT)
      FROM walk JOIN d ON d.user_id = walk.user_id AND d.rn = walk.rn + 1
    ),
    final AS (
      SELECT user_id, bal, n_floored,
             row_number() OVER (PARTITION BY user_id ORDER BY rn DESC) AS r
      FROM walk
    )
    SELECT user_id, {dround("bal", 6)} AS final_balance,
           CAST(n_floored AS BIGINT) AS n_floored
    FROM final WHERE r = 1
    ORDER BY user_id
    """,
    tags=("D4", "W3", "F4"),
)
def c26_capped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floored running balance — the IRREDUCIBLY SEQUENTIAL recurrence:
    bal_i = max(0, bal_{i-1} + delta_i) (credits from purchases, debits
    from clicks, floor at zero like a prepaid wallet). The floor makes
    it non-associative: no window/prefix-sum spelling exists, so this
    is the honest case for applyInPandas — one Arrow-batched Python
    pass PER USER, sequential within the group, parallel across the
    ~67-row groups (SURVEY §2.11 D4's raison d'être; everything
    window-expressible in this repo deliberately avoids this path).
    The oracle walks the identical recurrence with a recursive CTE —
    two different sequential engines agreeing on every (balance,
    floor-count) pair, at full float precision until the display
    rounding.
    """
    import pandas as pd

    ev = load(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .when(F.col("event_type") == "click", -F.col("value"))
        .otherwise(0.0)
        .alias("delta"),
    )

    def run_balance(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        bal, floored = 0.0, 0
        for delta in pdf["delta"]:
            nxt = bal + delta
            if nxt < 0:
                floored += 1
                bal = 0.0
            else:
                bal = nxt
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "raw_balance": [bal],
                "n_floored": [floored],
            }
        )

    return (
        d.groupBy("user_id")
        .applyInPandas(
            run_balance, "user_id bigint, raw_balance double, n_floored bigint"
        )
        # round JVM-side: Python's round() is half-to-even, F.round is
        # HALF_UP — only the latter matches the oracle's dround
        .select(
            "user_id",
            F.round("raw_balance", 6).alias("final_balance"),
            "n_floored",
        )
        .orderBy("user_id")
    )


@query(
    "c27_pareto_abc",
    sql=f"""
    WITH per_part AS (
      SELECT l_partkey, {dround("sum(l_extendedprice * (1 - l_discount))")} AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    up AS (
      SELECT l_partkey, rev,
             CAST(round(rev * 10000) AS BIGINT) AS units
      FROM per_part
    ),
    ranked AS (
      SELECT rev,
             sum(units) OVER (ORDER BY rev DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum_units,
             sum(units) OVER () AS total_units
      FROM up
    ),
    classed AS (
      SELECT CASE WHEN 5 * cum_units <= 4 * total_units THEN 'A'
                  WHEN 20 * cum_units <= 19 * total_units THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev
      FROM ranked
    )
    SELECT abc_class,
           count(*) AS n_parts,
           {dround("sum(rev)")} AS class_revenue
    FROM classed
    GROUP BY abc_class
    ORDER BY abc_class
    """,
    tags=("W3", "A1", "O1"),
)
def c27_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification: parts ranked by revenue, classed A
    while the running share stays under 80%, B to 95%, C after — the
    inventory-prioritization classic ("the vital few"). Per-part
    revenues are rounded (4 dp) then quantized to integer 1e-4 units so
    the running sum is EXACT in any addition order — which is what lets
    the prefix run as the distributed histogram running-sum
    (operators/ranks.py: bucket-partitioned local cumsum + per-bucket
    offsets, no single-partition window) while still matching DuckDB's
    sequential window bit-for-bit; boundary tests are pure-integer
    (5·cum ≤ 4·total, 20·cum ≤ 19·total), so no float compare can flip
    a class at the edge. (rev DESC, partkey) makes the prefix order
    total.
    """
    from nipd_spark.operators import ranks

    li = load(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("rev")
    )
    up = per_part.withColumn(
        "units", F.round(F.col("rev") * 10000, 0).cast("long")
    )
    tot = up.agg(F.sum("units").alias("total_units"))
    ranked = ranks.with_global_running_sum(
        up,
        key="rev",
        tiebreaks=["l_partkey"],
        val="units",
        ascending=False,
        out="cum_units",
    ).crossJoin(F.broadcast(tot))
    abc = (
        F.when(5 * F.col("cum_units") <= 4 * F.col("total_units"), "A")
        .when(20 * F.col("cum_units") <= 19 * F.col("total_units"), "B")
        .otherwise("C")
    )
    return (
        ranked.select(abc.alias("abc_class"), "rev")
        .groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.sum("rev"), 4).alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


@query(
    "c28_session_paths",
    sql=f"""
    WITH seq AS (
      SELECT user_id, event_type, {ts_us()} AS ts, event_id,
             CASE WHEN epoch_us({ts_us()} - lag({ts_us()})
                    OVER (PARTITION BY user_id ORDER BY {ts_us()}, event_id))
                    > 1800000000
                  OR lag({ts_us()}) OVER (PARTITION BY user_id
                                          ORDER BY {ts_us()}, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    sess AS (
      SELECT user_id, event_type, ts, event_id,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM seq
    ),
    paths AS (
      SELECT user_id, sess_id,
             string_agg(substring(event_type, 1, 1), '>'
                        ORDER BY ts, event_id) AS path
      FROM sess
      GROUP BY user_id, sess_id
    )
    SELECT path, count(*) AS n_sessions
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 25
    """,
    tags=("T3", "W3", "A8", "F1"),
)
def c28_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path analysis: sessionize (30-min gap, the t3
    batch-twin logic), render each session as its ordered
    first-letter event path ('v>c>p'), and count the most common
    journeys — the UX/product view of what sessions actually look
    like, and the input to c18's transition matrix read whole-path.
    Path strings are built with an ORDER-pinned string aggregation
    (tie-break event_id), the same determinism rule as a21. Shuffles:
    one on user_id (session window), one on (user, session) — both
    bounded keys — then the tiny path-histogram agg.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            gap_us > 1_800_000_000, 1
        ).when(F.lag("ts").over(w).isNull(), 1).otherwise(0).alias("new_sess"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = seq.withColumn("sess_id", F.sum("new_sess").over(w_run))
    paths = (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "ts", "event_id",
                                F.substring("event_type", 1, 1).alias("c"),
                            )
                        )
                    ),
                    lambda s: s["c"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(25)
    )


@query(
    "c29_revenue_waterfall",
    sql=f"""
    SELECT l_returnflag,
           {dround("sum(l_extendedprice)")} AS gross,
           {dround("sum(l_extendedprice * l_discount)")} AS discount_given,
           {dround("sum(l_extendedprice * (1 - l_discount))")} AS net,
           {dround("sum(l_extendedprice * (1 - l_discount) * l_tax)")} AS tax_collected,
           {dround("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))")} AS billed,
           {dround("sum(l_extendedprice) - sum(l_extendedprice * l_discount) - sum(l_extendedprice * (1 - l_discount))", 4)}
             AS reconciliation_gap
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("A1", "A12", "F3"),
)
def c29_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall: gross → discounts given → net → tax → billed,
    per return flag, WITH the reconciliation column computed from the
    same sums (gross − discounts − net ≡ 0 up to float association) —
    finance's first question about any revenue table is whether the
    steps foot, so the footing is part of the result, not a separate
    check. Every measure reads the one scan; Catalyst computes all six
    aggregates in a single partial+final pass.
    """
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    disc = F.col("l_discount")
    tax = F.col("l_tax")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum(price), 4).alias("gross"),
            F.round(F.sum(price * disc), 4).alias("discount_given"),
            F.round(F.sum(price * (1 - disc)), 4).alias("net"),
            F.round(F.sum(price * (1 - disc) * tax), 4).alias("tax_collected"),
            F.round(F.sum(price * (1 - disc) * (1 + tax)), 4).alias("billed"),
            F.round(
                F.sum(price) - F.sum(price * disc) - F.sum(price * (1 - disc)),
                4,
            ).alias("reconciliation_gap"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "c30_scd2_dimension",
    sql="""
    WITH eff AS (
      SELECT l.l_extendedprice, l.l_discount, s.s_nationkey,
             CASE
               WHEN l.l_shipdate >= TIMESTAMP '1999-01-01'
                    + INTERVAL (s.s_suppkey % 365) DAY THEN 3
               WHEN l.l_shipdate >= TIMESTAMP '1996-01-01'
                    + INTERVAL (s.s_suppkey % 365) DAY THEN 2
               ELSE 1
             END AS dim_version,
             s.s_acctbal AS bal0
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    )
    SELECT dim_version, s_nationkey,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(sum(CAST(round((bal0 + 100 * (dim_version - 1)) * 100)
                    AS BIGINT)) AS BIGINT) AS bal_eff_cents
    FROM eff GROUP BY dim_version, s_nationkey
    """,
    tags=("J9", "A1", "F2"),
)
def c30_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 point-in-time dimension join — the warehouse pattern
    the as-of operator exists for: each supplier's dimension row has
    three effective-dated versions with PER-KEY validity dates
    (valid_from staggered by s_suppkey % 365, so no global cutoff
    shortcut exists), and every lineitem joins to the version in force
    at l_shipdate via operators/asof.asof_join (backward). Revenue and
    the effective attribute roll up per (version, nation). The oracle
    resolves the same per-key effectivity with CASE arithmetic.

    Scale shape: the dimension history is |supplier| x 3 rows — the
    as-of union+window shuffles once on suppkey; at 100 TB the fact
    side dominates and the operator's one-sort profile holds (no
    range-condition BNLJ anywhere, same as j9).
    """
    from nipd_spark.operators.asof import asof_join

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"),
        "l_shipdate",
        "l_extendedprice",
        "l_discount",
    )
    sup = load(spark, sf_dir, "supplier")
    ver = F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("dim_version")
    hist = sup.select("s_suppkey", "s_nationkey", "s_acctbal", ver).select(
        F.col("s_suppkey").alias("suppkey"),
        "s_nationkey",
        "dim_version",
        (F.col("s_acctbal") + 100 * (F.col("dim_version") - 1)).alias(
            "bal_eff"
        ),
        # Version 1 is the "since forever" row: a true -infinity sentinel
        # (0001-01-01), matching the oracle's unconditional ELSE 1 branch
        # for ANY earlier shipdate — not just the current fixtures' range.
        F.when(F.col("dim_version") == 1, F.lit("0001-01-01").cast("timestamp"))
        .otherwise(
            F.date_add(
                F.when(F.col("dim_version") == 2, F.lit("1996-01-01"))
                .otherwise(F.lit("1999-01-01"))
                .cast("date"),
                (F.col("s_suppkey") % 365).cast("int"),
            ).cast("timestamp")
        )
        .alias("valid_from"),
    )
    joined = asof_join(
        li,
        hist,
        key="suppkey",
        left_ts="l_shipdate",
        right_ts="valid_from",
        right_payload=["dim_version", "s_nationkey", "bal_eff"],
        tiebreak="dim_version",
        direction="backward",
    )
    return joined.groupBy("dim_version", "s_nationkey").agg(
        F.count("*").alias("n_items"),
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
            ).cast("long")
        ).alias("revenue_cents"),
        F.sum(F.round(F.col("bal_eff") * 100, 0).cast("long")).alias(
            "bal_eff_cents"
        ),
    )


@query(
    "c31_hardy_weinberg",
    sql="""
    WITH geno AS (
      SELECT l_partkey AS site, CAST(l_suppkey AS BIGINT) % 3 AS g
      FROM lineitem
    ),
    cnt AS (
      SELECT site,
             CAST(count(*) FILTER (WHERE g = 0) AS BIGINT) AS n0,
             CAST(count(*) FILTER (WHERE g = 1) AS BIGINT) AS n1,
             CAST(count(*) FILTER (WHERE g = 2) AS BIGINT) AS n2,
             CAST(count(*) AS BIGINT) AS n
      FROM geno GROUP BY site HAVING count(*) >= 8
    ),
    freq AS (
      SELECT *, CAST(2 * n0 + n1 AS DOUBLE) / CAST(2 * n AS DOUBLE) AS p
      FROM cnt
    )
    SELECT site, n0, n1, n2,
           CASE WHEN p > 0 AND p < 1 THEN
             (CAST(n0 AS DOUBLE) - CAST(n AS DOUBLE) * p * p)
               * (CAST(n0 AS DOUBLE) - CAST(n AS DOUBLE) * p * p)
               / (CAST(n AS DOUBLE) * p * p)
             + (CAST(n1 AS DOUBLE) - CAST(n AS DOUBLE) * 2 * p * (1 - p))
               * (CAST(n1 AS DOUBLE) - CAST(n AS DOUBLE) * 2 * p * (1 - p))
               / (CAST(n AS DOUBLE) * 2 * p * (1 - p))
             + (CAST(n2 AS DOUBLE) - CAST(n AS DOUBLE) * (1 - p) * (1 - p))
               * (CAST(n2 AS DOUBLE) - CAST(n AS DOUBLE) * (1 - p) * (1 - p))
               / (CAST(n AS DOUBLE) * (1 - p) * (1 - p))
           END AS chi2,
           CASE WHEN p > 0 AND p < 1 THEN
             CASE WHEN (CAST(n0 AS DOUBLE) - CAST(n AS DOUBLE) * p * p)
               * (CAST(n0 AS DOUBLE) - CAST(n AS DOUBLE) * p * p)
               / (CAST(n AS DOUBLE) * p * p)
             + (CAST(n1 AS DOUBLE) - CAST(n AS DOUBLE) * 2 * p * (1 - p))
               * (CAST(n1 AS DOUBLE) - CAST(n AS DOUBLE) * 2 * p * (1 - p))
               / (CAST(n AS DOUBLE) * 2 * p * (1 - p))
             + (CAST(n2 AS DOUBLE) - CAST(n AS DOUBLE) * (1 - p) * (1 - p))
               * (CAST(n2 AS DOUBLE) - CAST(n AS DOUBLE) * (1 - p) * (1 - p))
               / (CAST(n AS DOUBLE) * (1 - p) * (1 - p)) > 3.841 THEN TRUE
             ELSE FALSE END
           END AS out_of_hwe
    FROM freq
    """,
    tags=("A1", "A12", "F3"),
)
def c31_hardy_weinberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hardy-Weinberg equilibrium chi-square per variant site [PK:
    standard population-genetics QC; the reference pipeline's VCF-QC
    analog] on the corpus analogy: l_partkey = site, l_suppkey%3 =
    genotype class (hom-ref / het / hom-alt). Per site: genotype
    counts, the 1-df chi-square against p²/2pq/q² expectations, and
    the QC flag at the 0.05 critical value (3.841) — the filter that
    removes genotyping artifacts before any downstream association.

    Determinism: counts are integers; p and chi2 are single-row
    arithmetic AFTER aggregation with identical IEEE expression shape
    in both engines — bit-equal, no rounding needed (README
    "Correctness model"). Monomorphic sites (p∈{0,1}) yield NULL chi2
    by guard, never a division by zero.

    Scale shape: one partial+final hash aggregation on site, then
    map-side arithmetic — the cheapest possible plan family; at 100 TB
    sites shard evenly (partkey is high-cardinality).
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("site"),
        (F.col("l_suppkey").cast("long") % 3).alias("g"),
    )
    cnt = (
        li.groupBy("site")
        .agg(
            F.count(F.when(F.col("g") == 0, 1)).alias("n0"),
            F.count(F.when(F.col("g") == 1, 1)).alias("n1"),
            F.count(F.when(F.col("g") == 2, 1)).alias("n2"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") >= 8)
    )
    nd = F.col("n").cast("double")
    p = (2 * F.col("n0") + F.col("n1")).cast("double") / (2 * F.col("n")).cast(
        "double"
    )
    freq = cnt.withColumn("p", p)
    pc, qc = F.col("p"), 1 - F.col("p")
    e0, e1, e2 = nd * pc * pc, nd * 2 * pc * qc, nd * qc * qc
    chi2 = (
        (F.col("n0").cast("double") - e0) * (F.col("n0").cast("double") - e0) / e0
        + (F.col("n1").cast("double") - e1)
        * (F.col("n1").cast("double") - e1)
        / e1
        + (F.col("n2").cast("double") - e2)
        * (F.col("n2").cast("double") - e2)
        / e2
    )
    valid = (pc > 0) & (pc < 1)
    return freq.select(
        "site",
        "n0",
        "n1",
        "n2",
        F.when(valid, chi2).alias("chi2"),
        F.when(valid, chi2 > 3.841).alias("out_of_hwe"),
    )


@query(
    "c32_ld_r2",
    sql="""
    WITH gt AS (
      SELECT l_partkey AS site, l_suppkey AS sample,
             max(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS a
      FROM lineitem GROUP BY 1, 2
    ),
    pair AS (
      SELECT x.site AS site_a, y.site AS site_b,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x.a) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pa,
             CAST(sum(y.a) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pb,
             CAST(sum(x.a * y.a) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pab
      FROM gt x JOIN gt y ON x.site + 1 = y.site AND x.sample = y.sample
      GROUP BY 1, 2 HAVING count(*) >= 5
    )
    SELECT site_a, site_b, n,
           CASE WHEN pa > 0 AND pa < 1 AND pb > 0 AND pb < 1 THEN
             (pab - pa * pb) * (pab - pa * pb)
               / (pa * (1 - pa) * pb * (1 - pb))
           END AS r2
    FROM pair
    """,
    tags=("A1", "J1", "F3"),
)
def c32_ld_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise linkage disequilibrium r² between ADJACENT variant
    sites [PK: PLINK's --r2; standard haplotype-block QC] on the
    corpus analogy: site = l_partkey, sample = l_suppkey, allele =
    1(qty > 25) collapsed per (site, sample). For each (site, site+1)
    pair sharing ≥ 5 samples: r² = D²/(pA qA pB qB), D = pAB - pA·pB;
    monomorphic pairs yield NULL by guard.

    Determinism: allele frequencies are CAST(sum)/CAST(count) double
    divisions of integers; r² is single-row arithmetic after the agg
    with identical IEEE shape in both engines — bit-equal, unrounded
    (same discipline as c31).

    Scale shape: genotype collapse = one (site, sample) hash agg; the
    adjacent-site pairing is an EQUI-join on (site+1, sample) — LD
    against k neighbors is k such joins, never an all-pairs product;
    everything shards on high-cardinality keys.
    """
    li = load(spark, sf_dir, "lineitem")
    gt = (
        li.select(
            F.col("l_partkey").alias("site"),
            F.col("l_suppkey").alias("sample"),
            F.when(F.col("l_quantity") > 25, 1).otherwise(0).alias("a"),
        )
        .groupBy("site", "sample")
        .agg(F.max("a").alias("a"))
    )
    x = gt.select(
        F.col("site").alias("site_a"),
        (F.col("site") + 1).alias("site_next"),
        F.col("sample").alias("samp_x"),
        F.col("a").alias("ax"),
    )
    y = gt.select(
        F.col("site").alias("site_b"),
        F.col("sample").alias("samp_y"),
        F.col("a").alias("ay"),
    )
    nd = F.count("*").cast("double")
    pair = (
        x.join(
            y,
            (F.col("site_next") == F.col("site_b"))
            & (F.col("samp_x") == F.col("samp_y")),
        )
        .groupBy("site_a", "site_b")
        .agg(
            F.count("*").alias("n"),
            (F.sum("ax").cast("double") / nd).alias("pa"),
            (F.sum("ay").cast("double") / nd).alias("pb"),
            (F.sum(F.col("ax") * F.col("ay")).cast("double") / nd).alias("pab"),
        )
        .filter(F.col("n") >= 5)
    )
    pa, pb, pab = F.col("pa"), F.col("pb"), F.col("pab")
    poly = (pa > 0) & (pa < 1) & (pb > 0) & (pb < 1)
    d = pab - pa * pb
    return pair.select(
        "site_a",
        "site_b",
        "n",
        F.when(poly, d * d / (pa * (1 - pa) * pb * (1 - pb))).alias("r2"),
    )


@query(
    "c33_assoc_chi2",
    sql="""
    WITH obs AS (
      SELECT l_partkey AS site,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_case,
             CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS alt
      FROM lineitem
    ),
    tab AS (
      SELECT site,
             CAST(count(*) FILTER (WHERE is_case = 1 AND alt = 1) AS BIGINT) AS a,
             CAST(count(*) FILTER (WHERE is_case = 1 AND alt = 0) AS BIGINT) AS b,
             CAST(count(*) FILTER (WHERE is_case = 0 AND alt = 1) AS BIGINT) AS c,
             CAST(count(*) FILTER (WHERE is_case = 0 AND alt = 0) AS BIGINT) AS d
      FROM obs GROUP BY site HAVING count(*) >= 10
    )
    SELECT site, a, b, c, d,
           CASE WHEN (a + b) > 0 AND (c + d) > 0
                 AND (a + c) > 0 AND (b + d) > 0 THEN
             CAST(a + b + c + d AS DOUBLE)
               * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                  - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
               * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                  - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
               / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                  * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))
           END AS chi2
    FROM tab
    """,
    tags=("A1", "A12", "F3"),
)
def c33_assoc_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case/control allelic association chi-square per site — the GWAS
    screen [PK: standard 2x2 contingency test; the reference pipeline's
    association-analysis analog] on the corpus analogy: site =
    l_partkey, case status = (l_returnflag = 'R'), allele =
    1(qty > 25). chi² = N(ad-bc)² / ((a+b)(c+d)(a+c)(b+d)); degenerate
    margins yield NULL by guard.

    Determinism: the 2x2 cells are integer conditional counts (one hash
    agg); chi² is single-row double arithmetic with identical IEEE
    shape in both engines — bit-equal, unrounded (the c31/c32
    discipline).

    Scale shape: one partial+final agg on a high-cardinality key, then
    map-side math — nothing else; a million-site panel shards evenly.
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("site"),
        (F.col("l_returnflag") == "R").cast("int").alias("is_case"),
        (F.col("l_quantity") > 25).cast("int").alias("alt"),
    )
    tab = (
        li.groupBy("site")
        .agg(
            F.count(F.when((F.col("is_case") == 1) & (F.col("alt") == 1), 1)).alias("a"),
            F.count(F.when((F.col("is_case") == 1) & (F.col("alt") == 0), 1)).alias("b"),
            F.count(F.when((F.col("is_case") == 0) & (F.col("alt") == 1), 1)).alias("c"),
            F.count(F.when((F.col("is_case") == 0) & (F.col("alt") == 0), 1)).alias("d"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") >= 10)
    )
    ad_bc = F.col("a").cast("double") * F.col("d").cast("double") - F.col(
        "b"
    ).cast("double") * F.col("c").cast("double")
    denom = (
        (F.col("a") + F.col("b")).cast("double")
        * (F.col("c") + F.col("d")).cast("double")
        * (F.col("a") + F.col("c")).cast("double")
        * (F.col("b") + F.col("d")).cast("double")
    )
    ok = (
        (F.col("a") + F.col("b") > 0)
        & (F.col("c") + F.col("d") > 0)
        & (F.col("a") + F.col("c") > 0)
        & (F.col("b") + F.col("d") > 0)
    )
    chi2 = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast(
        "double"
    ) * ad_bc * ad_bc / denom
    return tab.select(
        "site", "a", "b", "c", "d", F.when(ok, chi2).alias("chi2")
    )


@query(
    "c34_kaplan_meier",
    sql=f"""
    WITH base AS (
      SELECT o.o_orderpriority AS grp,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS t,
             CASE WHEN l.l_returnflag <> 'R' THEN 1 ELSE 0 END AS ev
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    ),
    at_t AS (
      SELECT grp, t, CAST(sum(ev) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS m
      FROM base GROUP BY 1, 2
    ),
    risk AS (
      SELECT grp, t, d,
             CAST(sum(m) OVER (PARTITION BY grp)
               - coalesce(sum(m) OVER (PARTITION BY grp ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_risk
      FROM at_t
    ),
    km AS (
      SELECT grp, t, d, n_risk,
             max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER cum AS dead,
             exp(sum(ln(CASE WHEN d < n_risk THEN
                   1 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
                 ELSE 1 END)) OVER cum) AS s
      FROM risk
      WINDOW cum AS (PARTITION BY grp ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT grp, t, n_risk, d,
           {dround("CASE WHEN dead = 1 THEN 0.0 ELSE s END", 6)} AS survival
    FROM km WHERE d > 0
    """,
    tags=("A1", "W3", "J1", "F3"),
)
def c34_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curves per stratum [PK: the standard
    censored time-to-event estimator; the reference domain's outcome
    analysis] on the corpus analogy: duration = order-to-ship days,
    event = shipped-and-kept (returnflag != 'R' — returns are
    censored), stratum = o_orderpriority. Per event time: the risk set
    n(t) (total minus prior exits, a window cumsum), d(t), and
    S(t) = Π (1 - d/n) as a cumulative log-sum-exp product. If a time
    exhausts the risk set (d = n), survival pins to 0 from there on
    (cummax flag) — never a ln(0).

    Determinism: counts and risk sets are exact integers; the one
    order-dependent float chain (cum sum of ln) runs over the same
    t-ordered prefix in both engines, and the output is rounded 6dp
    per the repo's dround discipline for transcendental chains.

    Scale shape: one equi-join (fact-fact on orderkey), one hash agg
    on (stratum, t), two windows partitioned by stratum — nothing
    global; strata shard independently.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderpriority").alias("grp"),
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("t"),
            (F.col("l_returnflag") != "R").cast("int").alias("ev"),
        )
    )
    at_t = base.groupBy("grp", "t").agg(
        F.sum("ev").alias("d"), F.count("*").alias("m")
    )
    wall = Window.partitionBy("grp")
    wprev = Window.partitionBy("grp").orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = Window.partitionBy("grp").orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = at_t.select(
        "grp",
        "t",
        "d",
        (
            F.sum("m").over(wall)
            - F.coalesce(F.sum("m").over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    factor = F.when(
        F.col("d") < F.col("n_risk"),
        1 - F.col("d").cast("double") / F.col("n_risk").cast("double"),
    ).otherwise(F.lit(1.0))
    km = risk.select(
        "grp",
        "t",
        "d",
        "n_risk",
        F.max((F.col("d") >= F.col("n_risk")).cast("int")).over(cum).alias("dead"),
        F.exp(F.sum(F.log(factor)).over(cum)).alias("s"),
    )
    return km.filter(F.col("d") > 0).select(
        "grp",
        "t",
        "n_risk",
        "d",
        F.round(
            F.when(F.col("dead") == 1, 0.0).otherwise(F.col("s")), 6
        ).alias("survival"),
    )


@query(
    "c35_gini_by_nation",
    # Float discipline: per-customer revenue is rounded to 2 dp BEFORE
    # ranking (the l62 round-before-rank rule), so both engines order
    # identical values with the c_custkey tiebreak; the running-sum and
    # ΣS aggregates are order-dependent float sums → dround on output.
    sql=f"""
    WITH r AS (
      SELECT o_custkey, {dround('sum(o_totalprice)', 2)} AS rev
      FROM orders GROUP BY o_custkey
    ),
    j AS (
      SELECT n_name, c_custkey, rev
      FROM r
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
    ),
    w AS (
      SELECT n_name, rev,
             sum(rev) OVER (
               PARTITION BY n_name ORDER BY rev ASC, c_custkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM j
    )
    SELECT n_name,
           count(*) AS n_custs,
           {dround('sum(rev)', 2)} AS total_rev,
           {dround(
               '(count(*) + 1.0) / count(*)'
               ' - 2.0 * sum(run) / (count(*) * sum(rev))', 6)} AS gini
    FROM w GROUP BY n_name
    """,
    tags=("A1", "W3", "J6"),
)
def c35_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration census: the Gini coefficient of
    per-customer order revenue within each nation — the standard
    inequality measure behind "whale" concentration risk in sales
    analytics and per-source contribution skew in corpus curation.
    Uses the running-sum identity G = (n+1)/n − 2·Σᵢ Sᵢ / (n·Σx) with
    x sorted ascending and Sᵢ the inclusive prefix sum — algebraically
    equal to the textbook rank form G = 2·Σ i·xᵢ/(n·Σx) − (n+1)/n via
    Σᵢ Sᵢ = (n+1)·Σx − Σ i·xᵢ, but computable from a prefix sum alone
    (no explicit rank column).

    Plan shape for 100 TB: revenue collapses to one row per customer
    (map-side partial agg); the per-nation prefix sum is the grouped
    histogram cumsum (operators/ranks.with_grouped_running_sum) — a
    raw-row Window PARTITION BY n_name would funnel each nation's
    entire customer base through one task (25 tasks total at any
    scale), while the bucketed form keeps |nations| × 64 buckets of
    parallelism. Nation is a broadcast dim; the final agg is 25 rows.
    """
    from nipd_spark.operators import ranks

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    r = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    j = (
        r.join(cust, r["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select("n_name", "c_custkey", "rev")
    )
    cum = ranks.with_grouped_running_sum(
        j, group="n_name", key="rev", tiebreaks=["c_custkey"], val="rev",
        out="run",
    )
    n = F.count(F.lit(1))
    return cum.groupBy("n_name").agg(
        n.alias("n_custs"),
        F.round(F.sum("rev"), 2).alias("total_rev"),
        F.round(
            (n + F.lit(1.0)) / n
            - F.lit(2.0) * F.sum("run") / (n * F.sum("rev")),
            6,
        ).alias("gini"),
    )


# Abramowitz–Stegun 7.1.26 complement: 1 − erf(x) ≈ poly(t)·e^(−x²),
# t = 1/(1+0.3275911·x), |err| ≤ 1.5e-7 — spelled as the SAME Horner
# chain in Spark and DuckDB so the only cross-engine divergence is the
# last ulp of exp(), absorbed by the 6-dp round both sides apply.
_AS_P = (1.061405429, -1.453152027, 1.421413741, -0.284496736, 0.254829592)


def _p_two_sided_sql(z: str) -> str:
    x = f"(abs({z}) / sqrt(2.0))"
    t = f"(1.0 / (1.0 + 0.3275911 * {x}))"
    a1, a2, a3, a4, a5 = _AS_P
    poly = (
        f"((((({a1} * {t} + {a2}) * {t} + {a3}) * {t} "
        f"+ {a4}) * {t} + {a5}) * {t})"
    )
    return f"({poly} * exp(-({x} * {x})))"


def _p_two_sided_col(z):
    x = F.abs(z) / F.sqrt(F.lit(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    a1, a2, a3, a4, a5 = _AS_P
    poly = (
        (
            (
                (F.lit(a1) * t + F.lit(a2)) * t + F.lit(a3)
            ) * t + F.lit(a4)
        ) * t + F.lit(a5)
    ) * t
    return poly * F.exp(-(x * x))


@query(
    "c37_bh_fdr_screen",
    # Determinism: z is dround-6ed FIRST (identical values both
    # engines), the two-sided p comes from the same explicit A-S
    # polynomial on that rounded z and is dround-6ed again (absorbing
    # exp()'s last-ulp libm divergence), and the BH rank orders the
    # ROUNDED p with (event_type, day) tiebreaks — every comparison
    # downstream operates on cross-engine-identical doubles.
    sql=f"""
    WITH daily AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) AS day,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    z AS (
      SELECT event_type, day, n,
             {dround("(n - avg(n) OVER (PARTITION BY event_type))"
                     " / stddev_samp(n) OVER (PARTITION BY event_type)", 6)}
               AS z
      FROM daily
    ),
    p AS (
      SELECT event_type, day, n, z,
             {dround(_p_two_sided_sql("z"), 6)} AS p
      FROM z WHERE z IS NOT NULL
    ),
    r AS (
      SELECT *,
             row_number() OVER (ORDER BY p, event_type, day) AS rn,
             count(*) OVER () AS m
      FROM p
    ),
    thr AS (
      SELECT max(p) AS p_star FROM r WHERE p <= rn * 0.05 / m
    )
    SELECT event_type, day, n, z, p,
           p <= COALESCE(p_star, -1.0) AS discovery
    FROM r CROSS JOIN thr
    """,
    tags=("A10", "W8", "O1"),
)
def c37_bh_fdr_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR correction over the c2 z-score screen —
    the multiple-testing finisher every genomics screen runs before
    calling positives [PK: Benjamini & Hochberg 1995, JRSS-B]: m
    two-sided p-values (normal tail via the Abramowitz–Stegun 7.1.26
    erf polynomial — neither engine ships erf, so both evaluate the
    SAME explicit Horner chain), ranked ascending; the step-up rule
    keeps every p ≤ p⁽ᵏ*⁾ where k* is the largest k with
    p⁽ᵏ⁾ ≤ k·α/m (α = 0.05). Without this, screening ~180
    (type, day) cells at α=0.05 expects ~9 false positives; BH bounds
    the expected FALSE-DISCOVERY RATE at 5% instead.

    Plan shape for 100 TB: the fact table collapses to the bounded
    (type, day) test matrix first (one keyed partial agg); the BH rank
    runs over that AGGREGATED table via the bucketed two-pass rank
    (operators/ranks.with_global_rn — no single-partition sort even
    if the test matrix grows to millions of hypotheses, the genomics
    regime); the threshold is one broadcast scalar back onto the
    matrix. Nothing raw-row ever passes through a global window.
    """
    from nipd_spark.operators import ranks

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.window("ts", "1 day")["start"].alias("day")
    ).agg(F.count("*").alias("n"))
    wp = Window.partitionBy("event_type")
    z6 = F.round(
        (F.col("n") - F.avg("n").over(wp)) / F.stddev_samp("n").over(wp),
        6,
    )
    p = daily.select(
        "event_type", "day", "n", z6.alias("z")
    ).filter(F.col("z").isNotNull())
    p = p.withColumn(
        "p", F.round(_p_two_sided_col(F.col("z")), 6)
    )
    # the test matrix is BOUNDED (|types| × |days|) and consumed four
    # times below (rank, m, threshold, final select) — checkpoint it
    # once so the fact scan + z-window run exactly once and every
    # consumer reads the tiny materialized table
    p = p.localCheckpoint(eager=True)
    r = ranks.with_global_rn(
        p, key="p", tiebreaks=["event_type", "day"], out="rn"
    )
    m = p.agg(F.count(F.lit(1)).alias("m"))
    r = r.crossJoin(F.broadcast(m))
    thr = (
        r.filter(F.col("p") <= F.col("rn") * F.lit(0.05) / F.col("m"))
        .agg(F.max("p").alias("p_star"))
    )
    return (
        r.crossJoin(F.broadcast(thr))
        .select(
            "event_type",
            "day",
            "n",
            "z",
            "p",
            (
                F.col("p") <= F.coalesce(F.col("p_star"), F.lit(-1.0))
            ).alias("discovery"),
        )
    )


@query(
    "c38_theil_by_nation",
    # Float discipline: per-customer revenue rounded to 2 dp (the c35
    # input contract); μ and the ln-term sum are order-dependent →
    # dround 6 on output; x > 0 always (order totals are positive).
    sql=f"""
    WITH r AS (
      SELECT o_custkey, {dround('sum(o_totalprice)', 2)} AS rev
      FROM orders GROUP BY o_custkey
    ),
    j AS (
      SELECT n_name, rev
      FROM r
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
    ),
    mu AS (
      SELECT n_name, avg(rev) AS mu, count(*) AS n_custs FROM j GROUP BY 1
    )
    SELECT j.n_name,
           max(mu.n_custs) AS n_custs,
           {dround("avg((j.rev / mu.mu) * ln(j.rev / mu.mu))", 6)}
             AS theil_t
    FROM j JOIN mu ON j.n_name = mu.n_name
    GROUP BY j.n_name
    """,
    tags=("A1", "A2", "J6"),
)
def c38_theil_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of per-customer revenue within each
    nation — T = (1/n)·Σ (x/μ)·ln(x/μ) [PK: Theil 1967] — the
    entropy-based complement to c35's Gini: unlike Gini it is
    EXACTLY DECOMPOSABLE into within-group + between-group terms, the
    property corpus-curation uses to attribute concentration to
    sources vs documents-within-source. T = 0 ⇔ perfect equality;
    ln(n) is the winner-takes-all ceiling.

    Plan shape for 100 TB: revenue collapses to one row per customer
    (map-side partial agg); the per-nation mean is a 25-row aggregate
    broadcast back; the ln-term is one more partial-aggregated pass.
    Two key-parallel aggregations + one broadcast join — no windows,
    no funnels, nothing quadratic.
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    r = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    j = (
        r.join(cust, r.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "rev")
    )
    mu = j.groupBy("n_name").agg(
        F.avg("rev").alias("mu"), F.count(F.lit(1)).alias("n_custs")
    )
    t = (F.col("rev") / F.col("mu")) * F.log(F.col("rev") / F.col("mu"))
    return (
        j.join(F.broadcast(mu), "n_name")
        .groupBy("n_name")
        .agg(
            F.max("n_custs").alias("n_custs"),
            F.round(F.avg(t), 6).alias("theil_t"),
        )
    )


@query(
    "c39_cbs_split",
    # Determinism: every input to t(i) is an exact integer (per-bin
    # counts, prefix sums, positions) and both engines evaluate the
    # identical expression shape per candidate row, so the |t| values
    # are bit-equal and the argmax/equality-join selection agrees;
    # ties on |t| resolve to the smallest i in both engines. Reported
    # doubles are dround-6ed belt-and-braces.
    sql=f"""
    WITH series AS (
      SELECT event_type AS g,
             CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
               AS h,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    pre AS (
      SELECT g, h, c,
             CAST(row_number() OVER (PARTITION BY g ORDER BY h)
                  AS BIGINT) AS i,
             CAST(sum(c) OVER (PARTITION BY g ORDER BY h) AS BIGINT) AS s
      FROM series
    ),
    tot AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS q,
             CAST(sum(c * c) AS BIGINT) AS ss
      FROM series GROUP BY g
    ),
    cand AS (
      SELECT pre.g, i, h, s, n, q,
             (CAST(s AS DOUBLE) / i - CAST(q - s AS DOUBLE) / (n - i))
             / sqrt(((CAST(ss AS DOUBLE) - (CAST(q AS DOUBLE) * q) / n)
                     / (n - 1))
                    * (1.0 / i + 1.0 / (n - i))) AS t
      FROM pre JOIN tot ON pre.g = tot.g
      WHERE i < n AND n >= 3
        AND (CAST(ss AS DOUBLE) - (CAST(q AS DOUBLE) * q) / n) > 0
    ),
    m AS (SELECT g, max(abs(t)) AS tmax FROM cand GROUP BY g),
    best AS (
      SELECT cand.g, min(i) AS split_i
      FROM cand JOIN m ON cand.g = m.g AND abs(cand.t) = m.tmax
      GROUP BY cand.g
    )
    SELECT cand.g AS event_type,
           cand.n AS n_bins,
           best.split_i,
           cand.h AS split_hour,
           {dround('abs(cand.t)', 6)} AS t_max,
           {dround('CAST(cand.s AS DOUBLE) / cand.i', 6)} AS mean_left,
           {dround('CAST(cand.q - cand.s AS DOUBLE) / (cand.n - cand.i)', 6)}
             AS mean_right
    FROM best JOIN cand ON best.g = cand.g AND best.split_i = cand.i
    """,
    tags=("W3", "A10", "A2"),
)
def c39_cbs_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation split call — the core iteration of circular
    binary segmentation, CNV calling's standard segmenter [PK: Olshen,
    Venkatraman, Lucito & Wigler, Biostatistics 2004]: over each
    position-ordered coverage series (per event_type, hourly event
    counts standing in for per-bin read depth), find the breakpoint i
    maximizing |t(i)| where t compares the mean of bins 1..i against
    bins i+1..n under the globally-pooled variance:

        t(i) = (S_i/i − (Q−S_i)/(n−i)) / √(σ̂² · (1/i + 1/(n−i)))

    The emitted row per series is the best split position, its
    boundary timestamp, |t| and the two segment means — the full CBS
    recursion applies this same call to each sub-segment until |t|
    drops below the permutation threshold.

    Plan shape for 100 TB: the fact table collapses FIRST to per-(
    series, bin) counts (keyed partial-agg shuffle); that tiny bins
    table is spill-checkpointed once (multi-consumer discipline —
    prefix pass, totals, argmax all reuse it without re-scanning
    events); prefix sums AND positions come from ONE bucketed grouped
    running-sum pass (operators/ranks, multi-val — no per-series
    funnel over raw rows); candidate scoring is map-side arithmetic;
    and the argmax is a per-series max + equality join back, never a
    global sort. Genome-scale bin counts (~3M bins × samples) keep
    |series| × n_buckets parallelism throughout.
    """
    from nipd_spark.operators import ranks
    from nipd_spark.operators.materialize import spill_checkpoint

    ev = load(spark, sf_dir, "events")
    series = spill_checkpoint(
        ev.groupBy(
            F.col("event_type").alias("g"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("hk", F.unix_micros("h"))
        .withColumn("one", F.lit(1).cast("long"))
    )
    pre = ranks.with_grouped_running_sum(
        series,
        group="g",
        key="hk",
        tiebreaks=[],
        val=["c", "one"],
        out=["s", "i"],
    )
    tot = series.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("q"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    sse = F.col("ss").cast("double") - (
        F.col("q").cast("double") * F.col("q")
    ) / F.col("n")
    var = sse / (F.col("n") - 1)
    ok = (F.col("i") < F.col("n")) & (F.col("n") >= 3) & (sse > 0)
    # t is guarded by the SAME predicate the filter applies: under ANSI
    # mode Spark may evaluate a collapsed projection before the filter
    # in a self-referencing plan (observed: the m/best branches), so
    # the division must be total — CaseWhen is lazy per row
    t = F.when(
        ok,
        (
            F.col("s").cast("double") / F.col("i")
            - (F.col("q") - F.col("s")).cast("double")
            / (F.col("n") - F.col("i"))
        )
        / F.sqrt(
            var
            * (
                F.lit(1.0) / F.col("i")
                + F.lit(1.0) / (F.col("n") - F.col("i"))
            )
        ),
    )
    cand = (
        pre.join(F.broadcast(tot), "g")
        .filter(ok)
        .select("g", "i", "h", "s", "n", "q", t.alias("t"))
    )
    m = cand.groupBy("g").agg(F.max(F.abs(F.col("t"))).alias("tmax"))
    best = (
        cand.join(F.broadcast(m), "g")
        .filter(F.abs(F.col("t")) == F.col("tmax"))
        .groupBy("g")
        .agg(F.min("i").alias("split_i"))
    )
    ca = cand.alias("ca")
    be = best.alias("be")
    return (
        ca.join(
            F.broadcast(be),
            (F.col("ca.g") == F.col("be.g"))
            & (F.col("ca.i") == F.col("be.split_i")),
        )
        .select(
            F.col("ca.g").alias("event_type"),
            F.col("n").alias("n_bins"),
            "split_i",
            F.col("h").alias("split_hour"),
            F.round(F.abs(F.col("t")), 6).alias("t_max"),
            F.round(F.col("s").cast("double") / F.col("i"), 6).alias(
                "mean_left"
            ),
            F.round(
                (F.col("q") - F.col("s")).cast("double")
                / (F.col("n") - F.col("i")),
                6,
            ).alias("mean_right"),
        )
    )


@query(
    "c39b_cbs_recursion",
    # Determinism: identical to c39 — every t input is an exact
    # integer (per-bin counts, prefix sums of c/1/c², segment
    # subtractions stay integer), identical expression shapes per
    # candidate row, argmax ties resolve to the smallest local
    # position. Reported doubles dround-6ed.
    sql=f"""
    WITH series AS (
      SELECT event_type AS g,
             CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
               AS h,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    pre AS (
      SELECT g, h, c,
             CAST(row_number() OVER (PARTITION BY g ORDER BY h)
                  AS BIGINT) AS i,
             CAST(sum(c) OVER (PARTITION BY g ORDER BY h) AS BIGINT) AS s,
             CAST(sum(c * c) OVER (PARTITION BY g ORDER BY h)
                  AS BIGINT) AS sq
      FROM series
    ),
    tot AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS q,
             CAST(sum(c * c) AS BIGINT) AS ss
      FROM series GROUP BY g
    ),
    cand AS (
      SELECT pre.g, i, s, sq,
             (CAST(s AS DOUBLE) / i - CAST(q - s AS DOUBLE) / (n - i))
             / sqrt(((CAST(ss AS DOUBLE) - (CAST(q AS DOUBLE) * q) / n)
                     / (n - 1))
                    * (1.0 / i + 1.0 / (n - i))) AS t
      FROM pre JOIN tot ON pre.g = tot.g
      WHERE i < n AND n >= 3
        AND (CAST(ss AS DOUBLE) - (CAST(q AS DOUBLE) * q) / n) > 0
    ),
    m AS (SELECT g, max(abs(t)) AS tmax FROM cand GROUP BY g),
    best AS (
      SELECT cand.g, min(i) AS split_i
      FROM cand JOIN m ON cand.g = m.g AND abs(cand.t) = m.tmax
      GROUP BY cand.g
    ),
    anchor AS (
      SELECT best.g, best.split_i, cand.s AS split_s, cand.sq AS split_sq
      FROM best JOIN cand
        ON best.g = cand.g AND best.split_i = cand.i
    ),
    seg AS (
      SELECT pre.g, pre.h,
             CASE WHEN pre.i <= a.split_i THEN 'L' ELSE 'R' END AS seg,
             CASE WHEN pre.i <= a.split_i THEN a.split_i
                  ELSE t2.n - a.split_i END AS nseg,
             CASE WHEN pre.i <= a.split_i THEN pre.i
                  ELSE pre.i - a.split_i END AS p,
             CASE WHEN pre.i <= a.split_i THEN pre.s
                  ELSE pre.s - a.split_s END AS sp,
             CASE WHEN pre.i <= a.split_i THEN a.split_s
                  ELSE t2.q - a.split_s END AS qseg,
             CASE WHEN pre.i <= a.split_i THEN a.split_sq
                  ELSE t2.ss - a.split_sq END AS ssseg
      FROM pre
      JOIN anchor a ON pre.g = a.g
      JOIN tot t2 ON pre.g = t2.g
    ),
    cand2 AS (
      SELECT g, seg, h, p, nseg,
             (CAST(sp AS DOUBLE) / p
              - CAST(qseg - sp AS DOUBLE) / (nseg - p))
             / sqrt(((CAST(ssseg AS DOUBLE)
                      - (CAST(qseg AS DOUBLE) * qseg) / nseg) / (nseg - 1))
                    * (1.0 / p + 1.0 / (nseg - p))) AS t
      FROM seg
      WHERE p < nseg AND nseg >= 3
        AND (CAST(ssseg AS DOUBLE)
             - (CAST(qseg AS DOUBLE) * qseg) / nseg) > 0
    ),
    m2 AS (SELECT g, seg, max(abs(t)) AS tmax FROM cand2 GROUP BY g, seg),
    best2 AS (
      SELECT cand2.g, cand2.seg, min(p) AS split_p
      FROM cand2 JOIN m2
        ON cand2.g = m2.g AND cand2.seg = m2.seg
       AND abs(cand2.t) = m2.tmax
      GROUP BY cand2.g, cand2.seg
    )
    SELECT cand2.g AS event_type, cand2.seg AS segment,
           cand2.nseg AS n_bins_seg, best2.split_p,
           cand2.h AS split_hour,
           {dround('abs(cand2.t)', 6)} AS t_max
    FROM best2 JOIN cand2
      ON best2.g = cand2.g AND best2.seg = cand2.seg
     AND best2.split_p = cand2.p
    """,
    tags=("W3", "A10", "A2"),
)
def c39b_cbs_recursion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBS recursion, depth 2 (r10; completes c39's single split into
    the algorithm's actual loop [PK: Olshen et al. 2004]): after the
    level-1 breakpoint per series, re-run the same max-|t| split
    WITHIN each resulting segment, under each segment's own pooled
    variance. The structural point — and why this composes at 100 TB —
    is that level 2 needs NO second pass over the data: the single
    prefix table already computed for level 1 carries running
    [Σc, count, Σc²], and every segment-local quantity is a
    SUBTRACTION against the split row's prefix values (left segment:
    the prefixes verbatim; right segment: prefix minus the anchor).
    The recursion deepens by joining tiny (series, segment) anchor
    tables back onto the same bins relation — depth d costs d tiny
    joins, not d scans.

    Plan shape for 100 TB: identical to c39 with one more running-sum
    column in the SAME bucketed single pass (multi-val
    with_grouped_running_sum — three prefix columns, one Window), the
    spill-checkpointed bins table reused by every level, and per-level
    argmaxes as per-(series, segment) max + equality joins. No
    raw-row window, no recomputation across levels.
    """
    from nipd_spark.operators import ranks
    from nipd_spark.operators.materialize import spill_checkpoint

    ev = load(spark, sf_dir, "events")
    series = spill_checkpoint(
        ev.groupBy(
            F.col("event_type").alias("g"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("hk", F.unix_micros("h"))
        .withColumn("one", F.lit(1).cast("long"))
        .withColumn("c2", F.col("c") * F.col("c"))
    )
    pre = ranks.with_grouped_running_sum(
        series,
        group="g",
        key="hk",
        tiebreaks=[],
        val=["c", "one", "c2"],
        out=["s", "i", "sq"],
    )
    pre = spill_checkpoint(pre.select("g", "h", "i", "s", "sq"))
    tot = series.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("q"),
        F.sum("c2").cast("long").alias("ss"),
    )

    def t_expr(sp, p, qseg, nseg, ssseg):
        sse = ssseg.cast("double") - (qseg.cast("double") * qseg) / nseg
        var = sse / (nseg - 1)
        ok = (p < nseg) & (nseg >= 3) & (sse > 0)
        return ok, F.when(
            ok,
            (
                sp.cast("double") / p
                - (qseg - sp).cast("double") / (nseg - p)
            )
            / F.sqrt(var * (F.lit(1.0) / p + F.lit(1.0) / (nseg - p))),
        )

    j = pre.join(F.broadcast(tot), "g")
    ok1, t1 = t_expr(
        F.col("s"), F.col("i"), F.col("q"), F.col("n"), F.col("ss")
    )
    cand = j.filter(ok1).select("g", "i", "s", "sq", t1.alias("t"))
    m = cand.groupBy("g").agg(F.max(F.abs(F.col("t"))).alias("tmax"))
    best = (
        cand.join(F.broadcast(m), "g")
        .filter(F.abs(F.col("t")) == F.col("tmax"))
        .groupBy("g")
        .agg(F.min("i").alias("split_i"))
    )
    ca = cand.alias("ca")
    be = best.alias("be")
    anchor = ca.join(
        F.broadcast(be),
        (F.col("ca.g") == F.col("be.g"))
        & (F.col("ca.i") == F.col("be.split_i")),
    ).select(
        F.col("ca.g").alias("g"),
        "split_i",
        F.col("ca.s").alias("split_s"),
        F.col("ca.sq").alias("split_sq"),
    )

    left = F.col("i") <= F.col("split_i")
    seg = (
        pre.join(F.broadcast(anchor), "g")
        .join(F.broadcast(tot), "g")
        .select(
            "g",
            "h",
            F.when(left, F.lit("L")).otherwise(F.lit("R")).alias("seg"),
            F.when(left, F.col("split_i"))
            .otherwise(F.col("n") - F.col("split_i"))
            .alias("nseg"),
            F.when(left, F.col("i"))
            .otherwise(F.col("i") - F.col("split_i"))
            .alias("p"),
            F.when(left, F.col("s"))
            .otherwise(F.col("s") - F.col("split_s"))
            .alias("sp"),
            F.when(left, F.col("split_s"))
            .otherwise(F.col("q") - F.col("split_s"))
            .alias("qseg"),
            F.when(left, F.col("split_sq"))
            .otherwise(F.col("ss") - F.col("split_sq"))
            .alias("ssseg"),
        )
    )
    ok2, t2 = t_expr(
        F.col("sp"), F.col("p"), F.col("qseg"), F.col("nseg"),
        F.col("ssseg"),
    )
    cand2 = seg.filter(ok2).select(
        "g", "seg", "h", "p", "nseg", t2.alias("t")
    )
    m2 = cand2.groupBy("g", "seg").agg(
        F.max(F.abs(F.col("t"))).alias("tmax")
    )
    best2 = (
        cand2.join(F.broadcast(m2), ["g", "seg"])
        .filter(F.abs(F.col("t")) == F.col("tmax"))
        .groupBy("g", "seg")
        .agg(F.min("p").alias("split_p"))
    )
    c2a = cand2.alias("c2a")
    b2 = best2.alias("b2")
    return c2a.join(
        F.broadcast(b2),
        (F.col("c2a.g") == F.col("b2.g"))
        & (F.col("c2a.seg") == F.col("b2.seg"))
        & (F.col("c2a.p") == F.col("b2.split_p")),
    ).select(
        F.col("c2a.g").alias("event_type"),
        F.col("c2a.seg").alias("segment"),
        F.col("c2a.nseg").alias("n_bins_seg"),
        F.col("b2.split_p").alias("split_p"),
        F.col("c2a.h").alias("split_hour"),
        F.round(F.abs(F.col("c2a.t")), 6).alias("t_max"),
    )


# --- c39c: CBS recursion to convergence -----------------------------------

_CBS_THRESH = 2.0  # |t| stop threshold (permutation-threshold stand-in)
_CBS_MAX_DEPTH = 6  # superstep cap; fixtures converge at depth <= 4


def _cbs_seg_t_sql(sg: str, p: str) -> str:
    """The segment-local t statistic over prefix differences — the
    EXACT expression shape the Spark side mirrors (bit-equal on the
    all-integer inputs)."""
    sse = (
        f"(CAST({sg}.sq_hi - {sg}.sq_lo AS DOUBLE)"
        f" - (CAST({sg}.s_hi - {sg}.s_lo AS DOUBLE)"
        f" * ({sg}.s_hi - {sg}.s_lo)) / ({sg}.hi - {sg}.lo))"
    )
    return (
        f"(CAST({p}.s - {sg}.s_lo AS DOUBLE) / ({p}.i - {sg}.lo)"
        f" - CAST({sg}.s_hi - {p}.s AS DOUBLE) / ({sg}.hi - {p}.i))"
        f" / sqrt(({sse} / ({sg}.hi - {sg}.lo - 1))"
        f" * (1.0 / ({p}.i - {sg}.lo) + 1.0 / ({sg}.hi - {p}.i)))"
    ), sse


def _cbs_convergence_sql(levels: int, thresh: float) -> str:
    """Mechanically unrolled DuckDB twin of the CBS superstep loop:
    level k splits every segment whose max |t| clears the threshold;
    segments that do not split carry forward unchanged, so unrolling
    to the loop's depth cap computes recursion-to-convergence whenever
    convergence happens within the cap (the Spark side uses the same
    cap, so the two sides agree even at the cap boundary)."""
    parts = [
        """
    WITH series AS MATERIALIZED (
      SELECT event_type AS g,
             CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
               AS h,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    pre AS MATERIALIZED (
      SELECT g,
             CAST(row_number() OVER (PARTITION BY g ORDER BY h)
                  AS BIGINT) AS i,
             CAST(sum(c) OVER (PARTITION BY g ORDER BY h) AS BIGINT) AS s,
             CAST(sum(c * c) OVER (PARTITION BY g ORDER BY h)
                  AS BIGINT) AS sq
      FROM series
    ),
    seg0 AS MATERIALIZED (
      SELECT g, CAST(0 AS BIGINT) AS lo, CAST(count(*) AS BIGINT) AS hi,
             CAST(0 AS BIGINT) AS s_lo, CAST(0 AS BIGINT) AS sq_lo,
             CAST(sum(c) AS BIGINT) AS s_hi,
             CAST(sum(c * c) AS BIGINT) AS sq_hi
      FROM series GROUP BY g
    )"""
    ]
    for k in range(levels):
        t_expr, sse = _cbs_seg_t_sql("sg", "p")
        parts.append(
            f""",
    cand{k} AS MATERIALIZED (
      SELECT sg.g, sg.lo, sg.hi, p.i, {t_expr} AS t
      FROM seg{k} sg JOIN pre p
        ON p.g = sg.g AND p.i > sg.lo AND p.i < sg.hi
      WHERE sg.hi - sg.lo >= 3 AND {sse} > 0
    ),
    m{k} AS MATERIALIZED (
      SELECT g, lo, hi, max(abs(t)) AS tmax
      FROM cand{k} GROUP BY 1, 2, 3
    ),
    sp{k} AS MATERIALIZED (
      SELECT c.g, c.lo, c.hi, min(c.i) AS j
      FROM cand{k} c JOIN m{k} m
        ON c.g = m.g AND c.lo = m.lo AND c.hi = m.hi
       AND abs(c.t) = m.tmax
      WHERE m.tmax >= {thresh}
      GROUP BY 1, 2, 3
    ),
    seg{k + 1} AS MATERIALIZED (
      SELECT sg.* FROM seg{k} sg
      WHERE NOT EXISTS (
        SELECT 1 FROM sp{k} s
        WHERE s.g = sg.g AND s.lo = sg.lo AND s.hi = sg.hi
      )
      UNION ALL
      SELECT x.g, x.lo, x.j AS hi, x.s_lo, x.sq_lo,
             p.s AS s_hi, p.sq AS sq_hi
      FROM (SELECT sp.g, sp.lo, sp.hi, sp.j, sg.s_lo, sg.sq_lo
            FROM sp{k} sp JOIN seg{k} sg
              ON sp.g = sg.g AND sp.lo = sg.lo AND sp.hi = sg.hi) x
      JOIN pre p ON p.g = x.g AND p.i = x.j
      UNION ALL
      SELECT x.g, x.j AS lo, x.hi, p.s AS s_lo, p.sq AS sq_lo,
             x.s_hi, x.sq_hi
      FROM (SELECT sp.g, sp.lo, sp.hi, sp.j, sg.s_hi, sg.sq_hi
            FROM sp{k} sp JOIN seg{k} sg
              ON sp.g = sg.g AND sp.lo = sg.lo AND sp.hi = sg.hi) x
      JOIN pre p ON p.g = x.g AND p.i = x.j
    )"""
        )
    parts.append(
        f"""
    SELECT g AS event_type, lo + 1 AS start_i, hi AS end_i,
           hi - lo AS n_bins_seg,
           {dround('CAST(s_hi - s_lo AS DOUBLE) / (hi - lo)', 6)}
             AS mean_seg
    FROM seg{levels}"""
    )
    return "".join(parts)


@query(
    "c39c_cbs_convergence",
    # Determinism: every split decision compares a |t| computed from
    # exact integers (prefix differences) with the identical expression
    # shape on both engines — bit-equal doubles, so threshold and
    # argmax comparisons agree; ties on |t| take the smallest position.
    # The oracle unrolls the superstep loop to the same depth cap.
    sql=_cbs_convergence_sql(_CBS_MAX_DEPTH, _CBS_THRESH),
    tags=("W3", "A10", "A2"),
)
def c39c_cbs_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBS recursion TO CONVERGENCE (r10 VERDICT item 7; [PK: Olshen,
    Venkatraman, Lucito & Wigler, Biostatistics 2004]) — the operator a
    real CNV caller runs end-to-end: per coverage series, recursively
    split at the max-|t| breakpoint until every segment's best |t|
    falls below the stop threshold (2.0 here, standing in for Olshen's
    permutation threshold), then emit the FINAL SEGMENTATION — one row
    per segment with its bin span and mean level.

    The r10 depth-2 insight (c39b) generalized to arbitrary depth:
    every segment-local quantity is a SUBTRACTION between two rows of
    the ONE global prefix table [running Σc, position, Σc²], computed
    once and spill-checkpointed. Each superstep joins the broadcast
    segment table (one row per open segment — anchor positions, never
    data) onto that prefix table, argmaxes |t| per segment, and
    collects only the ≤|open segments| split decisions to drive the
    next level. Depth costs supersteps over the collapsed bins table,
    never rescans of the fact data.

    Plan shape for 100 TB: fact scan → per-(series, hour) collapse →
    one multi-val bucketed prefix pass (all checkpointed once);
    per level ONE aggregate-sized job (bins ⋈ broadcast segments →
    per-segment max + argmin) plus a driver collect bounded by the
    segment count (segments = breakpoints + series, CBS's output
    size — the same bounded-driver-action discipline as the iterative
    graph family). Genome-scale: ~3M bins × samples with |series| ×
    n_buckets parallelism in the prefix pass; the superstep jobs touch
    only the collapsed bins.
    """
    from nipd_spark.operators import ranks
    from nipd_spark.operators.materialize import spill_checkpoint

    ev = load(spark, sf_dir, "events")
    series = spill_checkpoint(
        ev.groupBy(
            F.col("event_type").alias("g"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("hk", F.unix_micros("h"))
        .withColumn("one", F.lit(1).cast("long"))
        .withColumn("c2", F.col("c") * F.col("c"))
    )
    pre = ranks.with_grouped_running_sum(
        series,
        group="g",
        key="hk",
        tiebreaks=[],
        val=["c", "one", "c2"],
        out=["s", "i", "sq"],
    )
    pre = spill_checkpoint(pre.select("g", "i", "s", "sq"))
    seg_schema = (
        "g string, lo long, hi long, s_lo long, sq_lo long, "
        "s_hi long, sq_hi long"
    )
    segs = [
        (r.g, 0, r.n, 0, 0, r.q, r.ss)
        for r in series.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("c").cast("long").alias("q"),
            F.sum("c2").cast("long").alias("ss"),
        )
        .collect()
    ]
    for _ in range(_CBS_MAX_DEPTH):
        open_segs = [s for s in segs if s[2] - s[1] >= 3]
        if not open_segs:
            break
        seg_df = spark.createDataFrame(open_segs, seg_schema)
        j = pre.alias("p").join(
            F.broadcast(seg_df.alias("sg")),
            (F.col("p.g") == F.col("sg.g"))
            & (F.col("p.i") > F.col("sg.lo"))
            & (F.col("p.i") < F.col("sg.hi")),
        )
        # segment-local t from prefix differences — identical shape to
        # the SQL twin (CAST(sq_hi - sq_lo AS DOUBLE) - ...); total
        # under ANSI via the same-guard CaseWhen
        sse = (F.col("sq_hi") - F.col("sq_lo")).cast("double") - (
            F.col("s_hi") - F.col("s_lo")
        ).cast("double") * (F.col("s_hi") - F.col("s_lo")) / (
            F.col("hi") - F.col("lo")
        )
        # the positional bounds (i inside the open interval) are join
        # conditions, but under ANSI the collapsed projection can be
        # evaluated before them when cand later joins aggregates of
        # itself (the c39 lesson) — fold them into the guard so every
        # division in the CaseWhen branch is total
        ok = (
            ((F.col("hi") - F.col("lo")) >= 3)
            & (F.col("i") > F.col("lo"))
            & (F.col("i") < F.col("hi"))
            & (sse > 0)
        )
        t = F.when(
            ok,
            (
                (F.col("s") - F.col("s_lo")).cast("double")
                / (F.col("i") - F.col("lo"))
                - (F.col("s_hi") - F.col("s")).cast("double")
                / (F.col("hi") - F.col("i"))
            )
            / F.sqrt(
                (sse / (F.col("hi") - F.col("lo") - 1))
                * (
                    F.lit(1.0) / (F.col("i") - F.col("lo"))
                    + F.lit(1.0) / (F.col("hi") - F.col("i"))
                )
            ),
        )
        cand = j.filter(ok).select(
            F.col("p.g").alias("g"), "lo", "hi", "i", "s", "sq",
            t.alias("t"),
        )
        m = cand.groupBy("g", "lo", "hi").agg(
            F.max(F.abs(F.col("t"))).alias("tmax")
        )
        best = (
            cand.join(F.broadcast(m), ["g", "lo", "hi"])
            .filter(
                (F.abs(F.col("t")) == F.col("tmax"))
                & (F.col("tmax") >= _CBS_THRESH)
            )
            .groupBy("g", "lo", "hi")
            .agg(F.min("i").alias("j"))
        )
        anchors = (
            cand.join(
                F.broadcast(best.withColumnRenamed("j", "i")),
                ["g", "lo", "hi", "i"],
            )
            .select("g", "lo", "hi", "i", "s", "sq")
            .collect()
        )
        if not anchors:
            break
        split_at = {(a.g, a.lo, a.hi): a for a in anchors}
        nxt = []
        for s in segs:
            a = split_at.get((s[0], s[1], s[2]))
            if a is None:
                nxt.append(s)
            else:
                nxt.append((s[0], s[1], a.i, s[3], s[4], a.s, a.sq))
                nxt.append((s[0], a.i, s[2], a.s, a.sq, s[5], s[6]))
        segs = nxt
    out = spark.createDataFrame(segs, seg_schema)
    return out.select(
        F.col("g").alias("event_type"),
        (F.col("lo") + 1).alias("start_i"),
        F.col("hi").alias("end_i"),
        (F.col("hi") - F.col("lo")).alias("n_bins_seg"),
        F.round(
            (F.col("s_hi") - F.col("s_lo")).cast("double")
            / (F.col("hi") - F.col("lo")),
            6,
        ).alias("mean_seg"),
    )
