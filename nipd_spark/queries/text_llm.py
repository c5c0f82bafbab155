"""Text-analysis / LLM-pipeline operators over `documents`
(SURVEY.md §2.9: L1, L2, L6-L9; driver mandate BASELINE.json:6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nipd_spark.catalog import load
from nipd_spark.operators import text, vector
from nipd_spark.operators.materialize import plan_checkpoint
from nipd_spark.oracle import dround
from nipd_spark.registry import query


@query(
    "l6_token_tf",
    sql="""
    SELECT token, count(*) AS tf
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY tf DESC, token ASC
    LIMIT 20
    """,
    tags=("L6",),
)
def l6_token_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency, top-20 (split → explode → count)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(text.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(20)
    )


@query(
    "l7_tfidf",
    sql=f"""
    WITH tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY doc_id, token
    ),
    df AS (SELECT token, count(*) AS df FROM (SELECT DISTINCT doc_id, token FROM tf) GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, tf.token AS token, tf,
           {dround("tf * ln(CAST(n_docs AS DOUBLE) / df)", 6)} AS tfidf
    FROM tf, df, n
    WHERE tf.token = df.token
    ORDER BY tfidf DESC, doc_id ASC, tf.token ASC
    LIMIT 100
    """,
    tags=("L7",),
)
def l7_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-DataFrame TF-IDF (no MLlib): TF ⋈ DF with ln(N/df) weighting.

    Scale note: DF is a token-domain aggregate (small) — broadcast it;
    TF stays partitioned by doc. ln rounded (libm-vs-JVM ulp).
    """
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar; one job, reused in the plan as a literal
    tf = (
        text.doc_tokens(docs)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    # tf is keyed by (doc_id, token) — already distinct, so document
    # frequency is a plain recount; no distinct shuffle, and the tf
    # aggregate subtree is identical in both join branches (exchange
    # reuse under AQE).
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    return (
        tf.join(F.broadcast(df), "token")
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
        .orderBy(F.col("tfidf").desc(), F.col("doc_id").asc(), F.col("token").asc())
        .limit(100)
    )


@query(
    "l8_ngrams",
    sql="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bi AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
               AS bigram
      FROM toks WHERE len(t) >= 2
    )
    SELECT bigram, count(*) AS n
    FROM bi
    GROUP BY bigram
    ORDER BY n DESC, bigram ASC
    LIMIT 30
    """,
    tags=("L8",),
)
def l8_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word bigram counts via higher-order fns (no MLlib NGram)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(text.shingles(F.col("text"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(30)
    )


@query(
    "l9_doc_stats",
    sql=f"""
    SELECT lang,
           count(*) AS n_docs,
           count(DISTINCT source) AS n_sources,
           {dround("avg(n_chars)", 6)} AS avg_chars,
           {dround("median(n_chars)", 6)} AS med_chars,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("L9",),
)
def l9_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (language/source filtering + length
    percentiles — quality-scoring input features)."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.median("n_chars"), 6).alias("med_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "l9b_quality_score",
    sql=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(len(string_split(text, ' ')) AS DOUBLE)
             / len(list_distinct(string_split(text, ' '))) AS repetition,
           {dround("length(text) / CAST(len(string_split(text, ' ')) AS DOUBLE)", 6)}
             AS avg_token_len,
           length(text) = n_chars AS chars_consistent
    FROM documents
    """,
    tags=("L9", "L6"),
)
def l9b_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features: token count, repetition ratio (tokens /
    distinct tokens), mean token length, metadata consistency — the
    length/stopword-style heuristics of LLM-corpus quality scoring."""
    docs = load(spark, sf_dir, "documents")
    toks = text.tokens(F.col("text"))
    n_tok = F.size(toks)
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        (n_tok.cast("double") / F.size(F.array_distinct(toks))).alias("repetition"),
        F.round(F.length("text") / n_tok.cast("double"), 6).alias("avg_token_len"),
        (F.length("text") == F.col("n_chars")).alias("chars_consistent"),
    )


@query(
    "l1_exact_dedup",
    sql="""
    WITH keyed AS (
      SELECT doc_id, lang, source,
             list_aggregate(string_split(text, ' ')[1:5], 'string_agg', ' ')
               AS head_key,
             row_number() OVER (PARTITION BY
                 list_aggregate(string_split(text, ' ')[1:5], 'string_agg', ' ')
                 ORDER BY doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, source, head_key
    FROM keyed WHERE rn = 1
    """,
    tags=("L1",),
)
def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a derived key (first-5-token shingle), deterministic
    keep-lowest-doc_id via row_number — the reproducible spelling of
    dropDuplicates (which keeps an arbitrary row).

    The corpus has no full-text duplicates at small SF (FIXTURES.md), so
    the key is a prefix shingle to actually exercise collision handling.
    """
    docs = load(spark, sf_dir, "documents")
    head_key = F.concat_ws(" ", F.slice(text.tokens(F.col("text")), 1, 5))
    w = Window.partitionBy("head_key").orderBy("doc_id")
    return (
        docs.select("doc_id", "lang", "source", head_key.alias("head_key"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "l2_hash_dedup",
    sql="""
    WITH h AS (SELECT doc_id, sha256(lower(trim(text))) AS text_sha FROM documents)
    SELECT count(*) AS n_docs,
           count(DISTINCT text_sha) AS n_unique,
           count(*) - count(DISTINCT text_sha) AS n_dups
    FROM h
    """,
    tags=("L2",),
)
def l2_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup accounting: sha256 of normalized text.

    Scale note: at 100 TB the 32-byte hash replaces the full text in the
    dedup shuffle — this is the standard first pass before MinHash.
    """
    docs = load(spark, sf_dir, "documents")
    h = docs.select(F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("text_sha"))
    return h.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text_sha").alias("n_unique"),
        (F.count("*") - F.countDistinct("text_sha")).alias("n_dups"),
    )


@query(
    "l12_language_id",
    sql="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    profile AS (  -- P(token | lang) with add-one smoothing, from the corpus itself
      SELECT lang AS p_lang, token AS p_token,
             count(*) AS c
      FROM tok GROUP BY 1, 2
    ),
    lang_tot AS (SELECT p_lang, sum(c) AS tot FROM profile GROUP BY 1),
    vocab AS (SELECT count(DISTINCT token) AS v FROM tok),
    scored AS (
      SELECT t.doc_id, t.lang AS true_lang, l.p_lang AS cand_lang,
             sum(ln((coalesce(p.c, 0) + 1.0) / (l2.tot + v.v))) AS loglik
      FROM tok t
      CROSS JOIN (SELECT DISTINCT p_lang FROM profile) l
      JOIN lang_tot l2 ON l2.p_lang = l.p_lang
      CROSS JOIN vocab v
      LEFT JOIN profile p ON p.p_lang = l.p_lang AND p.p_token = t.token
      GROUP BY 1, 2, 3
    ),
    best AS (
      SELECT doc_id, true_lang,
             arg_max(cand_lang, loglik) AS pred_lang
      FROM scored GROUP BY 1, 2
    )
    SELECT true_lang, pred_lang, count(*) AS n_docs
    FROM best GROUP BY 1, 2
    """,
    tags=("L9", "L6"),
)
def l12_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification via unigram Naive Bayes (n-gram-heuristic
    langid): per-language token profiles with add-one smoothing, argmax
    log-likelihood per doc, confusion matrix out.

    On this corpus text is language-independent by construction, so the
    matrix shows near-chance accuracy — the operator pipeline (profile
    build → score join → argmax → confusion) is the deliverable, and is
    exactly what runs against real multilingual text at 100 TB (profiles
    broadcast; one shuffle per agg).

    arg_max ties: log-likelihoods are sums of distinct ln-ratios —
    bit-identical in both engines (same join shape), ties practically
    impossible; DuckDB arg_max and Spark max_by both take the max pair.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(text.tokens(F.col("text"))).alias("token")
    )
    profile = tok.groupBy(
        F.col("lang").alias("p_lang"), F.col("token").alias("p_token")
    ).agg(F.count("*").alias("c"))
    lang_tot = profile.groupBy("p_lang").agg(F.sum("c").alias("tot"))
    v = tok.select("token").distinct().count()

    t = tok.alias("t")
    pl = profile.select("p_lang").distinct().alias("pl")
    lt = lang_tot.withColumnRenamed("p_lang", "lt_lang").alias("lt")
    pr = profile.withColumnRenamed("p_lang", "pr_lang").alias("pr")
    scored = (
        t.crossJoin(F.broadcast(pl))
        .join(F.broadcast(lt), F.col("pl.p_lang") == F.col("lt.lt_lang"))
        .join(
            F.broadcast(pr),
            (F.col("pr.pr_lang") == F.col("pl.p_lang"))
            & (F.col("pr.p_token") == F.col("t.token")),
            "left",
        )
        .groupBy(
            F.col("t.doc_id").alias("doc_id"),
            F.col("t.lang").alias("true_lang"),
            F.col("pl.p_lang").alias("cand_lang"),
        )
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("pr.c"), F.lit(0)) + 1.0)
                    / (F.col("lt.tot") + F.lit(v))
                )
            ).alias("loglik")
        )
    )
    best = scored.groupBy("doc_id", "true_lang").agg(
        F.max_by("cand_lang", "loglik").alias("pred_lang")
    )
    return best.groupBy("true_lang", "pred_lang").agg(F.count("*").alias("n_docs"))


# GPT-2-flavored pretokenizer, simplified to the corpus alphabet: word
# pieces capped at 4 chars, digit runs capped at 3, single other chars —
# greedy in both engines (Java regex / RE2), so counts agree exactly.
_BPE_PAT = "[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9 ]"


@query(
    "l15_token_count",
    sql=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{_BPE_PAT}')) AS n_bpe_tokens,
           {dround("CAST(n_chars AS DOUBLE) / len(regexp_extract_all(text, '" + _BPE_PAT + "'))", 6)}
             AS chars_per_token
    FROM documents
    """,
    tags=("L6", "L9"),
)
def l15_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for pipeline cost accounting: whitespace tokens vs
    a BPE-ish regex pretokenization (subword-capped pieces), plus
    chars-per-token — the budget metric an LLM data pipeline tracks.

    Pure JVM-side regex (no UDF); at 100 TB this is a map-only pass.
    """
    docs = load(spark, sf_dir, "documents")
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), F.lit(0)))
    return docs.select(
        "doc_id",
        F.size(text.tokens(F.col("text"))).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(F.col("n_chars").cast("double") / n_bpe, 6).alias(
            "chars_per_token"
        ),
    )


@query(
    "l17_hash_sample",
    sql="""
    SELECT lang, count(*) AS n_sampled,
           count(DISTINCT source) AS n_sources
    FROM documents
    WHERE (doc_id * 1103) % 100 < 20
    GROUP BY lang
    """,
    tags=("L9", "P2"),
)
def l17_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% corpus sample via multiplicative hashing on the
    key — the reproducible alternative to df.sample() for pipeline
    eval splits (same rows every run, no RNG state, cheap predicate
    that pushes to the scan). Per-language sample counts out.

    At 100 TB: sampling-by-key-hash is the only sane way to carve
    train/eval splits — membership is a pure function of the key, so
    it survives repartitioning, backfills, and incremental loads.
    """
    docs = load(spark, sf_dir, "documents")
    return (
        docs.filter(F.pmod(F.col("doc_id") * 1103, F.lit(100)) < 20)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@query(
    "l19_decontaminate",
    sql="""
    WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(t) - 3),
                    i -> list_aggregate(t[i:i+4], 'string_agg', ' '))) AS g
      FROM toks WHERE len(t) >= 5
    ),
    ev AS (SELECT DISTINCT g FROM grams WHERE source = 'src0')
    SELECT doc_id, count(DISTINCT g) AS n_shared
    FROM grams
    WHERE source <> 'src0' AND g IN (SELECT g FROM ev)
    GROUP BY doc_id
    """,
    tags=("L3", "L8", "J4"),
)
def l19_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any word 5-gram
    with the eval set (source = src0), with the count of distinct shared
    5-grams — the standard train/test-contamination sweep run before
    LLM training.

    Scale shape: the eval side is small at any corpus scale (benchmarks
    are MBs) — its distinct 5-gram set broadcasts; the training side
    explodes to 5-grams map-side and the membership test is a broadcast
    left-semi hash join, so the 100 TB side never shuffles on text.
    n_shared is a pure function of CONTENT, so the expensive explode +
    probe runs once per DISTINCT training text and the result fans
    back to every copy by digest (the l26 representative trick) —
    on the 16x duplicated probe corpus that is a 16x cut in gram rows
    for identical output."""
    docs = load(spark, sf_dir, "documents")
    ev = (
        docs.filter(F.col("source") == "src0")
        .select(F.explode(text.shingles(F.col("text"), 5)).alias("g"))
        .distinct()
    )
    train = docs.filter(F.col("source") != "src0").select(
        "doc_id", F.sha2("text", 256).alias("h"), "text"
    )
    rep = train.groupBy("h").agg(F.min_by("text", "doc_id").alias("text"))
    rep_shared = (
        rep.select("h", F.explode(text.shingles(F.col("text"), 5)).alias("g"))
        .join(F.broadcast(ev), "g", "left_semi")
        .groupBy("h")
        .agg(F.countDistinct("g").alias("n_shared"))
    )
    return train.select("doc_id", "h").join(rep_shared, "h").select(
        "doc_id", "n_shared"
    )


@query(
    "l20_text_clean",
    sql="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                ' +', ' ', 'g')) AS cleaned,
           length(text)
             - length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                      ' +', ' ', 'g'))) AS n_removed
    FROM documents
    """,
    tags=("L9", "F1"),
)
def l20_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus text normalization: lowercase → strip non-alphanumerics →
    collapse runs of spaces → trim, plus the per-doc byte-reduction
    count. Pure map-side regexp chain in whole-stage codegen —
    scale-invariant (the canonical pre-dedup cleaning pass; L2's
    normalized-hash key is exactly a digest of this output)."""
    docs = load(spark, sf_dir, "documents")

    def clean(c):
        lowered = F.lower(c)
        stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
        return F.trim(F.regexp_replace(stripped, " +", " "))

    cleaned = clean(F.col("text"))
    return docs.select(
        "doc_id",
        cleaned.alias("cleaned"),
        (F.length("text") - F.length(cleaned)).alias("n_removed"),
    )


@query(
    "l21_stratified_sample",
    sql="""
    SELECT lang, count(*) AS n_sampled
    FROM documents
    WHERE (doc_id * 2971) % 100 <
          CASE WHEN lang = 'en' THEN 10 ELSE 50 END
    GROUP BY lang
    """,
    tags=("L9", "P2", "J6"),
)
def l21_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language sampling rates
    (down-weight the dominant language, keep half of the rest — corpus
    rebalancing) applied via key-hash membership, never rand().

    The rate table is data, not code: a broadcast dim joined on the
    stratum key, so rebalancing 100 TB means editing a 5-row table. Same
    reproducibility contract as l17 (membership is a pure function of
    doc_id)."""
    docs = load(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        [("en", 10), ("de", 50), ("es", 50), ("fr", 50), ("zh", 50)],
        "lang string, rate int",
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(F.pmod(F.col("doc_id") * 2971, F.lit(100)) < F.col("rate"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )


@query(
    "l22_unigram_logprob",
    sql=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    lm AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    tot AS (SELECT sum(c) AS t FROM lm)
    SELECT doc_id, count(*) AS n_tokens,
           {dround("avg(ln(CAST(c AS DOUBLE) / t))", 6)} AS avg_logprob
    FROM tok JOIN lm USING (token), tot
    GROUP BY doc_id
    """,
    tags=("L9", "L6", "J6"),
)
def l22_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring: train a corpus unigram LM (token →
    relative frequency), then score each doc by its mean token
    log-probability — the cheap stand-in for the perplexity filters
    used in corpus curation (low avg_logprob = out-of-distribution doc).

    Scale shape: the LM is vocab-sized (≪ corpus) so it broadcasts into
    the scoring pass; training is one explode + equi-keyed agg. At
    100 TB train on l21's sample instead of the full corpus — same
    plan, cheaper LM pass."""
    docs = load(spark, sf_dir, "documents")
    toks = text.doc_tokens(docs)
    lm = toks.groupBy("token").agg(F.count("*").alias("c"))
    tot = lm.agg(F.sum("c").alias("t"))
    return (
        toks.join(F.broadcast(lm), "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("c").cast("double") / F.col("t"))), 6
            ).alias("avg_logprob"),
        )
    )


@query(
    "l23_repetition_filter",
    sql="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g2 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
      FROM toks
    ),
    c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
    m2 AS (
      SELECT doc_id,
             CAST(round(CAST(CAST((CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,15)), 6) AS DOUBLE) AS top_bigram_frac
      FROM c2 GROUP BY doc_id
    ),
    g5 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 3),
                    i -> list_aggregate(t[i:i+4], 'string_agg', ' '))) AS g
      FROM toks WHERE len(t) >= 5
    ),
    c5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g),
    m5 AS (
      SELECT doc_id,
             CAST(round(CAST(CAST((CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / CAST(sum(c) AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,15)), 6) AS DOUBLE) AS dup_5gram_frac
      FROM c5 GROUP BY doc_id
    )
    SELECT m2.doc_id AS doc_id, top_bigram_frac, dup_5gram_frac,
           CAST(top_bigram_frac > 0.2 OR dup_5gram_frac > 0.3 AS INT) AS flagged
    FROM m2 JOIN m5 ON m2.doc_id = m5.doc_id
    """,
    tags=("L9", "L8", "A1"),
)
def l23_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters: per doc, the fraction of
    2-grams taken by the single most frequent 2-gram (top_bigram_frac)
    and the fraction of 5-gram occurrences that are within-doc repeats
    (dup_5gram_frac); flagged = exceeds either curation threshold.
    These are the standard repetitious-text gates run before LLM
    training (boilerplate, keyword-stuffed, and template pages).

    Scale shape: two explode → (doc_id, gram) equi-keyed aggs — the
    shuffle key is doc_id, so this partitions cleanly at any corpus
    size; no cross-doc state. An in-row higher-order-function variant
    was tried and REVERTED: interpreted per-element lambdas cost
    ~10 ms/doc (60 s at sf0.1) vs ~0.5 µs/gram for the codegen'd
    explode+hash-agg path (~2 s) — whole-stage codegen beats avoiding
    the shuffle by two orders of magnitude here. Both metrics are pure
    functions of CONTENT, so they are computed once per distinct text
    and fanned back to copies by digest (the l26/l19 representative
    trick — duplicated corpora pay for distinct content only). flagged
    emitted as INT for a representation-stable cross-engine hash.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.sha2("text", 256).alias("h"), "text"
    )
    rep = docs.groupBy("h").agg(F.min_by("text", "doc_id").alias("text"))

    def gram_metric(n, agg):
        grams = rep.select(
            "h", F.explode(text.shingles(F.col("text"), n)).alias("g")
        )
        counts = grams.groupBy("h", "g").agg(F.count("*").alias("c"))
        return counts.groupBy("h").agg(agg)

    m2 = gram_metric(
        2,
        F.round(
            F.max("c").cast("double") / F.sum("c").cast("double"), 6
        ).alias("top_bigram_frac"),
    )
    m5 = gram_metric(
        5,
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast("double")
            / F.sum("c").cast("double"),
            6,
        ).alias("dup_5gram_frac"),
    )
    per_text = m2.join(m5, "h")
    return docs.select("doc_id", "h").join(per_text, "h").select(
        "doc_id",
        "top_bigram_frac",
        "dup_5gram_frac",
        ((F.col("top_bigram_frac") > 0.2) | (F.col("dup_5gram_frac") > 0.3))
        .cast("int")
        .alias("flagged"),
    )


@query(
    "l24_pii_redact",
    sql="""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                    THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                  WHEN doc_id % 3 = 1
                    THEN text || ' call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                  ELSE text END AS t
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(t, '[a-z0-9]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                          '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted,
           len(regexp_extract_all(t, '[a-z0-9]+@[a-z0-9.]+')) AS n_emails,
           len(regexp_extract_all(t, '[0-9]{3}-[0-9]{4}')) AS n_phones
    FROM aug
    """,
    tags=("L9", "F1", "P6"),
)
def l24_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: detect and redact email- and phone-shaped spans,
    reporting per-doc match counts — the pre-release privacy pass every
    training corpus gets. The corpus is synthetic-clean, so the query
    first plants deterministic PII (doc_id-derived emails/phones on 2/3
    of docs) and then proves the redaction removes exactly those spans.

    Pure map-side regexp chain (whole-stage codegen, no UDF, no
    shuffle) — scale-invariant. Patterns use the [0-9]/[a-z] common
    subset of Java regex and RE2 so both engines match identically.
    """
    docs = load(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.col("text"),
                F.lit(" call 555-"),
                (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("t"),
    )
    email, phone = "[a-z0-9]+@[a-z0-9.]+", "[0-9]{3}-[0-9]{4}"
    return aug.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("t"), email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("redacted"),
        F.size(F.regexp_extract_all("t", F.lit(email), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(phone), F.lit(0))).alias("n_phones"),
    )


@query(
    "l25_pack_sequences",
    sql="""
    WITH sized AS (
      SELECT doc_id,
             doc_id % 8 AS bucket,
             (doc_id * 1103) % 997 AS h,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    packed AS (
      SELECT bucket,
             CAST((sum(n) OVER (PARTITION BY bucket ORDER BY h, doc_id) - n) // 512
                  AS BIGINT) AS seq_id,
             n
      FROM sized
    )
    SELECT bucket, seq_id,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(round(CAST(CAST((CAST(sum(n) AS DOUBLE) / 512) AS VARCHAR) AS DECIMAL(38,15)), 6) AS DOUBLE) AS fill
    FROM packed
    GROUP BY bucket, seq_id
    """,
    tags=("L9", "W3", "A1"),
)
def l25_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training batches: docs are sharded into
    buckets, deterministically shuffled within each (multiplicative key
    hash — reproducible, no RNG), then greedily packed into 512-token
    sequences by cumulative token count; a doc belongs to the sequence
    where its span begins. Out: per (bucket, seq) doc count, token
    count, and fill ratio (>1 when a doc straddles the boundary).

    Scale shape: the running sum is windowed PER BUCKET, so packing
    parallelizes across buckets — no global sort, no single-partition
    window. At 100 TB, bucket count scales with the cluster and each
    bucket's window is a local sort within its shuffle partition.
    """
    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("bucket"),
        ((F.col("doc_id") * 1103) % 997).alias("h"),
        F.size(text.tokens(F.col("text"))).alias("n"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = sized.select(
        "bucket", (F.sum("n").over(w) - F.col("n")).alias("start"), "n"
    ).select("bucket", F.expr("start div 512").alias("seq_id"), "n")
    return packed.groupBy("bucket", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("n_tokens"),
        F.round(F.sum("n").cast("double") / 512, 6).alias("fill"),
    )


@query(
    "l27_corpus_card",
    sql="""
    WITH ranked AS (
      SELECT doc_id, lang, n_chars, text,
             row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
      FROM documents
    ),
    surv AS (SELECT * FROM ranked WHERE rn = 1),
    card AS (
      SELECT lang,
             CAST(least(n_chars // 150, 2) AS BIGINT) AS size_bucket,
             count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM surv
      GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total FROM card)
    SELECT lang, size_bucket, n_docs, n_tokens,
           CAST(round(CAST(CAST((CAST(n_docs AS DOUBLE) / total) AS VARCHAR) AS DECIMAL(38,15)), 6) AS DOUBLE) AS doc_share
    FROM card, tot
    """,
    tags=("L9", "L1", "A1", "W1"),
)
def l27_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data card: the summary table published alongside a training
    corpus — after exact dedup (keep-first per content digest), doc and
    token counts by language × document-size bucket, plus each cell's
    share of the corpus. The final reporting step of the curation
    pipeline (l1/l2 dedup → l9/l23 quality → card).

    Scale shape: dedup survivorship is one window keyed by the content
    hash; the card aggregation is equi-keyed on (lang, bucket); the
    1-row total broadcasts back for the share column. Card cardinality
    is O(langs × buckets) regardless of corpus size.
    """
    docs = load(spark, sf_dir, "documents")
    surv = (
        docs.withColumn("h", F.sha2(F.col("text"), 256))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
    )
    card = surv.groupBy(
        "lang", F.least(F.expr("n_chars div 150"), F.lit(2)).alias("size_bucket")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(text.tokens(F.col("text")))).alias("n_tokens"),
    )
    tot = card.agg(F.sum("n_docs").cast("double").alias("total"))
    return card.crossJoin(F.broadcast(tot)).select(
        "lang",
        "size_bucket",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs").cast("double") / F.col("total"), 6).alias(
            "doc_share"
        ),
    )


@query(
    "l29_domain_rebalance",
    sql="""
    WITH cnt AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT ceil(0.5 * sum(n_docs) / count(*)) AS budget FROM cnt),
    rates AS (
      SELECT source, n_docs,
             CAST(floor(10000 * least(1.0, budget / n_docs)) AS BIGINT) AS rate_bp
      FROM cnt, tot
    ),
    kept AS (
      SELECT d.source, count(*) AS n_kept
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE (d.doc_id * 1103) % 10000 < r.rate_bp
      GROUP BY d.source
    )
    SELECT r.source, r.n_docs, r.rate_bp, coalesce(k.n_kept, 0) AS n_kept
    FROM rates r LEFT JOIN kept k ON r.source = k.source
    """,
    tags=("L9", "A1", "J6", "P2"),
)
def l29_domain_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus domain rebalancing: flatten the source mix to a uniform
    per-source budget (half the corpus split evenly over sources), with
    membership decided by the same deterministic multiplicative hash as
    l17 — the reproducible "re-weight the domain mixture" step that
    precedes every LLM training run.

    Keep-rates are computed in basis points from integer counts through
    a single correctly-rounded double division, so floor() agrees
    bit-for-bit with the oracle.

    Scale shape: per-source counts are one map-side-combined aggregation
    whose result is O(sources) — tiny — so the rate table broadcasts
    back onto the corpus (no shuffle of the fact side); the kept-count
    re-aggregation is equi-keyed on source. Membership is a pure hash of
    the key: stable under repartitioning and incremental loads.
    """
    docs = load(spark, sf_dir, "documents")
    cnt = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = cnt.agg(
        F.ceil(0.5 * F.sum("n_docs") / F.count("*")).cast("double").alias("budget")
    )
    rates = cnt.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.floor(
            10000 * F.least(F.lit(1.0), F.col("budget") / F.col("n_docs"))
        ).alias("rate_bp"),
    )
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(F.pmod(F.col("doc_id") * 1103, F.lit(10000)) < F.col("rate_bp"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "rate_bp",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
    )


@query(
    "l31_bpe_pair_step",
    sql="""
    WITH words AS (
      SELECT token AS word, count(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> ''
      GROUP BY token
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(word)), i ->
               substring(word, CAST(i AS INT), 2))) AS pair,
             freq
      FROM words WHERE length(word) >= 2
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair ASC
    LIMIT 30
    """,
    tags=("L6", "L8", "A1"),
)
def l31_bpe_pair_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE tokenizer-training iteration (Sennrich 2016 shape): count
    adjacent symbol pairs weighted by word frequency; the argmax pair is
    the next merge rule. Iterating this query (with merged symbols fed
    back into the word table) IS the BPE trainer — each round is one
    Spark job over the compact (word, freq) table, not the raw corpus.

    Scale shape: the corpus collapses to a (word, freq) table first
    (one map-side-combined agg — the domain is vocabulary-sized, tiny
    vs. the corpus), so per-iteration cost is independent of corpus
    size. Pair explosion is a JVM higher-order transform over char
    positions (no UDF); the final count shuffles only the symbol-pair
    domain.
    """
    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(text.tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .filter(F.length("word") >= 2)
    )
    pair_idx = F.sequence(F.lit(1), F.length("word") - 1)
    pairs = words.select(
        F.explode(
            F.transform(pair_idx, lambda i: F.col("word").substr(i, F.lit(2)))
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(30)
    )


@query(
    "l32_weighted_sample",
    sql="""
    WITH pri AS (
      SELECT doc_id, source, n_chars,
             CAST(n_chars AS DOUBLE)
               / (((doc_id * 2654435761) % 1000003) + 1) AS priority
      FROM documents
    )
    SELECT doc_id, source, n_chars, priority
    FROM pri
    ORDER BY priority DESC, doc_id ASC
    LIMIT 25
    """,
    tags=("L9", "O3", "P2"),
)
def l32_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling for corpus mixing (priority
    sampling, Duffield-Lund-Thorup 2007): each doc gets priority
    w/u — weight n_chars over a deterministic pseudo-uniform u from a
    multiplicative hash of doc_id — and the global top-k by priority is
    the sample. Longer docs are proportionally likelier, yet the draw
    is exactly reproducible across runs, engines, and repartitionings
    (no rand(), no seed-per-partition drift).

    Every arithmetic step (integer hash, +1, one double division) is
    correctly rounded under IEEE-754, so Spark and DuckDB rank
    identical bits — the reproducibility claim is hash-verified, not
    approximate. Top-k is TakeOrderedAndProject: per-partition heaps,
    no global sort.
    """
    docs = load(spark, sf_dir, "documents")
    u = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1000003)) + 1
    pri = docs.select(
        "doc_id",
        "source",
        "n_chars",
        (F.col("n_chars").cast("double") / u).alias("priority"),
    )
    return pri.orderBy(F.col("priority").desc(), F.col("doc_id").asc()).limit(25)


@query(
    "l33_corpus_shuffle",
    sql="""
    WITH ranked AS (
      SELECT doc_id,
             (doc_id * 2654435761 + 40503) % 1000000007 AS shuffle_key
      FROM documents
    )
    SELECT row_number() OVER (ORDER BY shuffle_key, doc_id) AS pos,
           doc_id, shuffle_key
    FROM ranked
    ORDER BY pos
    LIMIT 40
    """,
    tags=("L9", "O1", "S6"),
)
def l33_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle — the final pretraining step
    that decorrelates document order before sequence packing. Ordering
    by a multiplicative hash of doc_id gives a reproducible permutation
    that is stable across engines, runs, and input partitionings
    (unlike rand() or repartition-by-random, whose draw depends on
    partition layout).

    At 100 TB you never materialize the permutation with one global
    sort: write with repartitionByRange(shuffle_key) — range partitions
    are globally ordered, each file sorts locally, and readers stream
    files in range order to consume the permutation. The query returns
    the first 40 positions (row_number over the hash order) as the
    verifiable fingerprint of that permutation.

    The top-40 is taken FIRST (TakeOrderedAndProject — per-partition
    heaps, no global sort) and row_number runs over just those 40 rows;
    numbering the full table through a global window would funnel every
    row into one partition.
    """
    docs = load(spark, sf_dir, "documents")
    ranked = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id") * F.lit(2654435761) + 40503, F.lit(1000000007)).alias(
            "shuffle_key"
        ),
    )
    head = ranked.orderBy("shuffle_key", "doc_id").limit(40)
    w = Window.orderBy("shuffle_key", "doc_id")
    return head.select(
        F.row_number().over(w).alias("pos"), "doc_id", "shuffle_key"
    )


@query(
    "l34_grouped_split",
    sql="""
    WITH tagged AS (
      SELECT doc_id, lang, n_chars,
             CASE WHEN (CAST(substring(source, 4) AS BIGINT) * 2654435761)
                       % 100 < 10
                  THEN 'val' ELSE 'train' END AS split
      FROM documents
    )
    SELECT split,
           count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM tagged
    GROUP BY split
    ORDER BY split
    """,
    tags=("L9", "L1", "A1"),
)
def l34_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/validation split: the split key is a
    deterministic hash of the SOURCE (group), not the document, so
    every document from one source lands in the same split — near-dups
    and templated pages concentrate within a source, and a per-doc
    split would leak them across the boundary (the l19 contamination
    problem, created by your own splitter). ~10% of sources go to val.

    Group-hash splitting is also stable under corpus growth: adding
    documents never moves an existing source between splits, so val
    stays val across dataset versions. One narrow scan + a 2-group
    aggregate; the hash is arithmetic on the numeric source id
    (cross-engine exact), no rand().
    """
    docs = load(spark, sf_dir, "documents")
    sid = F.substring("source", 4, 10).cast("bigint")
    tagged = docs.select(
        "lang",
        "n_chars",
        F.when(F.pmod(sid * F.lit(2654435761), F.lit(100)) < 10, "val")
        .otherwise("train")
        .alias("split"),
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


@query(
    "l36_chunk_documents",
    sql="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST(i AS INT) // 16 AS chunk_id,
             list_slice(t, CAST(i AS INT) + 1, CAST(i AS INT) + 32) AS chunk
      FROM toks,
           LATERAL (SELECT unnest(range(0, greatest(len(t) - 16, 1), 16)) AS i)
    )
    SELECT doc_id, chunk_id,
           len(chunk) AS n_tokens,
           chunk[1] AS first_token,
           chunk[len(chunk)] AS last_token
    FROM chunks
    ORDER BY doc_id, chunk_id
    LIMIT 200
    """,
    tags=("L6", "F5", "L9"),
)
def l36_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG / context-window chunking: split each document into
    overlapping token windows (size 32, stride 16 — 50% overlap so no
    retrieval-relevant span straddles a boundary unseen). The chunk
    table (doc_id, chunk_id, tokens) is what gets embedded and indexed
    by the similarity stack (l4/l5/l35); this query returns its shape
    audit (first/last token, length) for the first 200 chunks.

    All JVM-side: tokenize once, generate window start offsets with
    sequence(), slice per offset with a higher-order transform, explode.
    Row expansion is ~2× the token count (stride = size/2) regardless
    of corpus size — linear, shuffle-free, embarrassingly parallel.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", text.tokens(F.col("text")).alias("t"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("t") - 17, F.lit(0)), F.lit(16)
    )
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    (i / 16).cast("int").alias("chunk_id"),
                    F.slice("t", i + 1, 32).alias("chunk"),
                ),
            )
        ).alias("c"),
    ).select("doc_id", F.col("c.chunk_id").alias("chunk_id"), F.col("c.chunk").alias("chunk"))
    return (
        chunks.select(
            "doc_id",
            "chunk_id",
            F.size("chunk").alias("n_tokens"),
            F.element_at("chunk", 1).alias("first_token"),
            F.element_at("chunk", F.size("chunk")).alias("last_token"),
        )
        .orderBy("doc_id", "chunk_id")
        .limit(200)
    )


@query(
    "l39_content_defined_chunks",
    sql="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    vals AS (
      SELECT doc_id,
             list_transform(t, s -> length(s) * 31 + ascii(s)) AS v
      FROM toks
    ),
    bounds AS (
      SELECT doc_id,
             len(v) AS n_tokens,
             len(list_filter(range(2, len(v) + 1),
                 i -> (v[i - 1] * 31 + v[i]) % 8 = 0)) AS n_cuts
      FROM vals
    )
    SELECT doc_id, n_tokens, n_cuts + 1 AS n_chunks,
           CAST(floor(CAST(n_tokens AS DOUBLE)
                      / (n_cuts + 1) * 1000) AS BIGINT) AS avg_chunk_millitokens
    FROM bounds
    ORDER BY doc_id
    """,
    tags=("L2", "L8", "F5"),
)
def l39_content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (Rabin/rolling-hash family, the rsync/
    LBFS boundary trick): a chunk boundary falls wherever the rolling
    hash of the local token window hits 0 mod 8, so boundaries are a
    function of LOCAL content — an insertion early in a document shifts
    fixed-stride chunk frames (l36) for the whole tail, but CDC
    boundaries downstream of the edit stay put, which is what makes
    chunk-level dedup robust to near-identical long documents. Expected
    chunk size = the modulus (8 tokens).

    The rolling value is exact integer arithmetic over (length,
    first-byte) token features — cross-engine deterministic, no string
    hashing disagreement — computed entirely in JVM higher-order
    functions (per-doc, map-only, no shuffle).
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", text.tokens(F.col("text")).alias("t"))
    vals = toks.select(
        "doc_id",
        F.transform(
            "t", lambda s: F.length(s) * 31 + F.ascii(s)
        ).alias("v"),
    )
    n_tokens = F.size("v")
    cuts = F.size(
        F.filter(
            F.sequence(F.lit(2), n_tokens),
            lambda i: (F.element_at("v", (i - 1).cast("int")) * 31
                       + F.element_at("v", i.cast("int"))) % 8 == 0,
        )
    )
    return (
        vals.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            (cuts + 1).alias("n_chunks"),
            F.floor(
                n_tokens.cast("double") / (cuts + 1) * 1000
            ).cast("bigint").alias("avg_chunk_millitokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "l41_lexical_diversity",
    sql=f"""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    )
    SELECT source,
           count(*) AS n_tokens,
           count(DISTINCT token) AS n_types,
           {dround("CAST(count(DISTINCT token) AS DOUBLE) / count(*)", 6)}
             AS type_token_ratio
    FROM toks
    GROUP BY source
    ORDER BY source
    """,
    tags=("L9", "L6", "A3"),
)
def l41_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source: tokens, distinct types, and the
    type-token ratio — the vocabulary-richness quality signal (spam
    and template farms sit at the low-TTR extreme; OCR noise at the
    high). Alongside l9b's surface stats and l23's repetition gates,
    this completes the standard text-quality triad. One explode + one
    grouped count-distinct on the token domain (bounded by vocabulary,
    not corpus — the expand-dedup shuffle stays small at any scale;
    a4's HLL stands in when vocabulary itself explodes).
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(text.tokens(F.col("text"))).alias("token")
    )
    return (
        toks.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("token").alias("n_types"),
            F.round(
                F.countDistinct("token").cast("double") / F.count("*"), 6
            ).alias("type_token_ratio"),
        )
        .orderBy("source")
    )


@query(
    "l42_stopword_discovery",
    sql=f"""
    WITH df AS (
      SELECT token, count(DISTINCT doc_id) AS doc_freq
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents)
      GROUP BY token
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT token, doc_freq,
           {dround("CAST(doc_freq AS DOUBLE) / n_docs", 6)} AS df_ratio,
           CAST(CAST(doc_freq AS DOUBLE) / n_docs >= 0.5 AS INT) AS is_stopword
    FROM df, n
    ORDER BY doc_freq DESC, token ASC
    LIMIT 40
    """,
    tags=("L7", "L9", "A3"),
)
def l42_stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-driven stopword discovery: tokens present in ≥50% of
    documents carry no discriminative signal (their IDF ≈ 0 — this is
    l7's document-frequency table put to its other use) and get
    flagged for exclusion from similarity/keyword features. Deriving
    the list from the corpus instead of a fixed English list is what
    makes the pipeline language- and domain-agnostic — the fixture's
    query-themed vocabulary has its own 'the's. Distinct-per-doc
    explode + one grouped distinct count, vocabulary-bounded shuffle.
    """
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    df_tbl = (
        docs.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.countDistinct("doc_id").alias("doc_freq"))
    )
    ratio = F.col("doc_freq").cast("double") / n_docs
    return (
        df_tbl.select(
            "token",
            "doc_freq",
            F.round(ratio, 6).alias("df_ratio"),
            (ratio >= 0.5).cast("int").alias("is_stopword"),
        )
        .orderBy(F.col("doc_freq").desc(), F.col("token").asc())
        .limit(40)
    )


@query(
    "l43_perplexity_pruning",
    sql=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    lm AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    tot AS (SELECT sum(c) AS t FROM lm),
    scored AS (
      SELECT doc_id, count(*) AS n_tokens,
             {dround("avg(ln(CAST(c AS DOUBLE) / t))", 6)} AS lp
      FROM tok JOIN lm USING (token), tot
      GROUP BY doc_id
    ),
    banded AS (
      SELECT *, ntile(10) OVER (ORDER BY lp, doc_id) AS band FROM scored
    )
    SELECT band,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           {dround("min(lp)", 6)} AS lp_min,
           {dround("max(lp)", 6)} AS lp_max,
           CAST(band BETWEEN 3 AND 8 AS INT) AS kept
    FROM banded
    GROUP BY band
    ORDER BY band
    """,
    tags=("L9", "L6", "W1"),
)
def l43_perplexity_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-band corpus pruning: score every doc with the l22
    unigram log-prob, decile it, and keep the MIDDLE bands (3-8) —
    the data-pruning heuristic where the lowest-perplexity docs are
    boilerplate the model already knows and the highest are noise/OOD
    garbage; the informative middle is what's worth training on.
    Returns the per-band audit (docs, tokens, lp range, kept flag) —
    the table a curation review actually signs off on.

    The decile banding runs over the doc-grain AGGREGATE (corpus-count
    rows, not token rows) with (lp, doc_id) tie-break; banding on the
    pre-rounded lp keeps the band assignment identical cross-engine.
    The ntile itself is the distributed histogram-rank form
    (operators/ranks.py — no single-partition window), bit-identical
    to Window ntile by construction and by property test.
    """
    from nipd_spark.operators import ranks

    docs = load(spark, sf_dir, "documents")
    toks = text.doc_tokens(docs)
    lm = toks.groupBy("token").agg(F.count("*").alias("c"))
    tot = lm.agg(F.sum("c").alias("t"))
    scored = (
        toks.join(F.broadcast(lm), "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("c").cast("double") / F.col("t"))), 6
            ).alias("lp"),
        )
    )
    cnt = scored.agg(F.count("*").alias("__n"))
    banded = (
        ranks.with_global_rn(scored, "lp", ["doc_id"], out="__rn")
        .crossJoin(F.broadcast(cnt))
        .withColumn(
            "band", ranks.ntile_from_rn(10, F.col("__rn"), F.col("__n"))
        )
        .drop("__rn", "__n")
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.min("lp"), 6).alias("lp_min"),
            F.round(F.max("lp"), 6).alias("lp_max"),
        )
        .select(
            "band",
            "n_docs",
            "n_tokens",
            "lp_min",
            "lp_max",
            F.col("band").between(3, 8).cast("int").alias("kept"),
        )
        .orderBy("band")
    )


@query(
    "l45_blocklist_filter",
    sql=f"""
    WITH hits AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text,
                 '\\b(drop|delete|truncate)\\b')) AS n_hits,
             length(text) AS n_chars
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           count(*) FILTER (WHERE n_hits > 0) AS n_flagged,
           CAST(sum(n_hits) AS BIGINT) AS total_hits,
           {dround("avg(CAST(n_hits AS DOUBLE) / n_chars * 1000)", 6)}
             AS hits_per_kchar
    FROM hits
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("L9", "P6", "F1"),
)
def l45_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist screening: word-boundary regex hits against a
    curated term list (here destructive SQL verbs standing in for a
    safety blocklist), reported as per-language flag rates and hit
    density — the screening report a corpus safety review reads
    before the l24-style redaction or drop decision. Word boundaries
    (not substrings) are the difference between flagging 'delete' and
    flagging 'deleted'-inside-'undeletable'; both engines compile the
    same \\b semantics. Map-only regex in codegen + one small agg.
    """
    docs = load(spark, sf_dir, "documents")
    n_hits = F.size(
        F.regexp_extract_all(
            "text", F.lit(r"\b(drop|delete|truncate)\b"), F.lit(0)
        )
    )
    hits = docs.select(
        "lang",
        n_hits.alias("n_hits"),
        F.length("text").alias("n_chars"),
    )
    return (
        hits.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_if(F.col("n_hits") > 0).alias("n_flagged"),
            F.sum("n_hits").cast("bigint").alias("total_hits"),
            F.round(
                F.avg(F.col("n_hits").cast("double") / F.col("n_chars") * 1000),
                6,
            ).alias("hits_per_kchar"),
        )
        .orderBy("lang")
    )


@query(
    "l47_balanced_shards",
    sql="""
    WITH sized AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
    ),
    ranked AS (
      SELECT doc_id, n,
             row_number() OVER (ORDER BY n DESC, doc_id) - 1 AS r
      FROM sized
    ),
    assigned AS (
      SELECT doc_id, n,
             CAST(CASE WHEN (r // 16) % 2 = 0 THEN r % 16
                       ELSE 15 - (r % 16) END AS BIGINT) AS shard
      FROM ranked
    )
    SELECT shard,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           max(n) AS max_doc_tokens
    FROM assigned GROUP BY shard
    """,
    tags=("L9", "O1", "A1"),
)
def l47_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced training-shard assignment: docs sorted by token
    count (desc, doc_id tie-break) are dealt onto 16 shards in
    serpentine order (shard 0..15 then 15..0, alternating) — the
    classic LPT/boustrophedon approximation that keeps per-shard token
    totals within one max-doc of each other without an iterative bin
    packer. Out: per-shard doc count, token total, largest doc.

    Scale shape: the global numbering runs over the (doc_id, n)
    METADATA projection only — two longs per doc — and via the
    distributed histogram rank (operators/ranks.py), so no stage ever
    funnels the corpus into one partition; the heavy text column never
    shuffles, and the final write would join the tiny assignment back
    and `partitionBy(shard)`. The serpentine formula is rank
    arithmetic, so both engines agree exactly.
    """
    from nipd_spark.operators import ranks

    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.size(text.tokens(F.col("text"))).alias("n")
    )
    numbered = ranks.with_global_rn(
        sized, key="n", tiebreaks=["doc_id"], ascending=False, out="__rn"
    )
    r = F.col("__rn") - 1
    assigned = numbered.select(
        "doc_id",
        "n",
        F.when(F.floor(r / 16) % 2 == 0, r % 16)
        .otherwise(15 - (r % 16))
        .cast("long")
        .alias("shard"),
    )
    return assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.max("n").alias("max_doc_tokens"),
    )


@query(
    "l48_dsir_importance",
    sql="""
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
    big AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i+1])) AS g
      FROM toks WHERE len(t) >= 2
    ),
    occ AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(g), 1, 4)) AS BIGINT) % 256 AS b
      FROM big
    ),
    src AS (SELECT b, count(*) AS n_s FROM occ GROUP BY b),
    tgt AS (SELECT b, count(*) AS n_t FROM occ WHERE lang = 'en' GROUP BY b),
    tot AS (SELECT (SELECT count(*) FROM occ) AS s_tot,
                   (SELECT count(*) FROM occ WHERE lang = 'en') AS t_tot),
    w AS (
      SELECT s.b,
             ln(((coalesce(t.n_t, 0) + 1.0) / (tot.t_tot + 256))
                / ((s.n_s + 1.0) / (tot.s_tot + 256))) AS lw
      FROM src s LEFT JOIN tgt t ON s.b = t.b CROSS JOIN tot
    ),
    scored AS (
      SELECT o.doc_id, count(*) AS n_bigrams,
             {score} AS score
      FROM occ o JOIN w ON o.b = w.b
      GROUP BY o.doc_id
    )
    SELECT s.doc_id, d.lang, s.n_bigrams, s.score
    FROM scored s JOIN documents d USING (doc_id)
    ORDER BY s.score DESC, s.doc_id ASC
    LIMIT 25
    """.format(score=dround("sum(w.lw) / count(*)", 6)),
    tags=("L9", "L8", "A1", "J6"),
)
def l48_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., arXiv:2302.03169): score every
    raw document by its hashed-n-gram importance weight against a
    target domain — here the en-language slice stands in for the
    curated target corpus. Bigram occurrences hash into 256 buckets
    (md5-prefix, portable across engines); bucket log-likelihood
    ratios ln(p_target/p_raw) use Laplace(+1) smoothing; a doc's score
    is its mean bucket LLR, and the top 25 would be kept for training.

    Scale shape: bucket vocab is FIXED (256 rows), so the weight table
    broadcasts and scoring is a map-side join; all per-text hashing
    runs ONCE PER DISTINCT (lang, text) (round-4 representative
    collapse — bucket counts are group-size-weighted sums over the
    per-representative profiles, which is exact since identical texts
    have identical bigram multisets; scores fan back out by digest).
    One shuffle on the digest for the per-doc mean, nothing quadratic,
    raw text never leaves the scan. Mean LLR is order-dependent so
    both engines round (oracle.dround discipline).
    """
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "lang",
        "text",
        F.sha2(
            F.concat_ws(
                "|", F.coalesce(F.col("lang"), F.lit("")), F.col("text")
            ),
            256,
        ).alias("ghash"),
    )
    groups = keyed.groupBy("ghash").agg(
        F.min("doc_id").alias("rep_id"), F.count("*").alias("gsize")
    )
    reps = keyed.join(
        groups.select(F.col("rep_id").alias("doc_id"), "gsize"), "doc_id"
    )
    big = reps.select(
        "ghash",
        "gsize",
        "lang",
        F.explode(text.shingles(F.col("text"), 2)).alias("g"),
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5("g"), 1, 4), 16, 10).cast("long"), F.lit(256)
    )
    # per-representative bucket profile; corpus counts re-weight by
    # group size, so stats are identical to the per-copy scan
    prof = big.select("ghash", "gsize", "lang", bucket.alias("b")).groupBy(
        "ghash", "gsize", "lang", "b"
    ).agg(F.count("*").alias("c"))
    stats = prof.groupBy("b").agg(
        F.sum(F.col("c") * F.col("gsize")).alias("n_s"),
        F.sum(
            F.when(F.col("lang") == "en", F.col("c") * F.col("gsize"))
            .otherwise(F.lit(0))
        ).alias("n_t"),
    )
    tot = stats.agg(
        F.sum("n_s").alias("s_tot"), F.sum("n_t").alias("t_tot")
    )
    w = stats.crossJoin(F.broadcast(tot)).select(
        "b",
        F.log(
            ((F.col("n_t") + F.lit(1.0)) / (F.col("t_tot") + 256))
            / ((F.col("n_s") + F.lit(1.0)) / (F.col("s_tot") + 256))
        ).alias("lw"),
    )
    rep_scored = (
        prof.join(F.broadcast(w), "b")
        .groupBy("ghash")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.round(
                F.sum(F.col("lw") * F.col("c")) / F.sum("c"), 6
            ).alias("score"),
        )
    )
    return (
        keyed.select("doc_id", "lang", "ghash")
        .join(rep_scored, "ghash")
        .select("doc_id", "lang", "n_bigrams", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(25)
    )


@query(
    "l50_gopher_rules",
    sql="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    stats AS (
      SELECT doc_id, len(t) AS n_words,
             list_aggregate(list_transform(t, w -> len(w)), 'avg') AS mwl
      FROM toks
    ),
    freq AS (
      SELECT token, count(*) AS c
      FROM (SELECT unnest(t) AS token FROM toks)
      GROUP BY token ORDER BY c DESC, token ASC LIMIT 8
    ),
    fw AS (
      SELECT doc_id, count(DISTINCT token) AS n_fw
      FROM (SELECT doc_id, unnest(t) AS token FROM toks)
      WHERE token IN (SELECT token FROM freq)
      GROUP BY doc_id
    ),
    toptok AS (
      SELECT doc_id, max(c) AS top_c FROM (
        SELECT doc_id, token, count(*) AS c
        FROM (SELECT doc_id, unnest(t) AS token FROM toks)
        GROUP BY doc_id, token
      ) GROUP BY doc_id
    ),
    rules AS (
      SELECT s.doc_id,
             s.n_words BETWEEN 30 AND 90 AS r_words,
             s.mwl BETWEEN 4.0 AND 5.0 AS r_mwl,
             coalesce(f.n_fw, 0) >= 2 AS r_function_words,
             CAST(t.top_c AS DOUBLE) / s.n_words <= 0.2 AS r_repetition
      FROM stats s
      LEFT JOIN fw f USING (doc_id)
      JOIN toptok t USING (doc_id)
    )
    SELECT count(*) AS n_docs,
           count(*) FILTER (WHERE r_words) AS pass_words,
           count(*) FILTER (WHERE r_mwl) AS pass_mwl,
           count(*) FILTER (WHERE r_function_words) AS pass_function_words,
           count(*) FILTER (WHERE r_repetition) AS pass_repetition,
           count(*) FILTER (WHERE r_words AND r_mwl AND r_function_words
                            AND r_repetition) AS pass_all
    FROM rules
    """,
    tags=("L9", "F5", "A12"),
)
def l50_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (Rae et al., arXiv:2112.11446 App. A),
    calibrated to this corpus: word count in [30, 90], mean word
    length in [4, 5], ≥2 distinct function words (the corpus's 8 most
    frequent tokens stand in for the English stop set), and top-token
    frequency ≤ 20% (the repetition rule). One-row scoreboard of
    per-rule and all-rules pass counts.

    Scale shape: rules 1-2 are in-row higher-order array math (zero
    shuffles); the function-word set is an 8-row broadcast; rules 3-4
    share ONE (doc, token) count aggregate (r13 — dedup rides the
    aggregate, so the former countDistinct pass and its distinct
    exchange are gone) folded per doc. A 100 TB gate runs the scans +
    one pair-keyed shuffle + one doc-keyed fold, then a 1-row reduce.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", text.tokens(F.col("text")).alias("t"))
    stats = toks.select(
        "doc_id",
        F.size("t").alias("n_words"),
        (
            F.aggregate(
                F.transform("t", lambda w: F.length(w).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size("t")
        ).alias("mwl"),
    )
    exploded = toks.select("doc_id", F.explode("t").alias("token"))
    freq = (
        exploded.groupBy("token")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("token").asc())
        .limit(8)
        .select("token")
    )
    # r13 (guide §2.3/§2.4): rules 3 and 4 both reduce over the DISTINCT
    # (doc, token) pairs — one shared count pass serves both. The r12
    # spelling ran the exploded stream twice more (a broadcast-semi +
    # countDistinct pass for the function-word rule — 6.0 s isolated at
    # the 100x replica, the most expensive leg of the query — and a
    # separate (doc, token) agg for repetition). Now ONE (doc, token)
    # count agg (dedup rides the aggregate, so countDistinct and its
    # two-level distinct exchange disappear) is flagged against the
    # 8-row broadcast and folded per doc: top_c = max(c), n_fw = count
    # of flagged rows (rows are distinct pairs, so the count IS the
    # distinct count). Integer-exact, same rows: docs without tokens
    # had no fw/toptok row before and have no per_doc row now.
    dt = exploded.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    per_doc = (
        dt.join(
            F.broadcast(freq.withColumn("is_fw", F.lit(1))), "token", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("top_c"),
            F.count(F.when(F.col("is_fw") == 1, 1)).alias("n_fw"),
        )
    )
    rules = (
        stats.join(per_doc, "doc_id")
        .select(
            "doc_id",
            F.col("n_words").between(30, 90).alias("r_words"),
            F.col("mwl").between(4.0, 5.0).alias("r_mwl"),
            (F.col("n_fw") >= 2).alias("r_function_words"),
            (F.col("top_c").cast("double") / F.col("n_words") <= 0.2).alias(
                "r_repetition"
            ),
        )
    )
    return rules.agg(
        F.count("*").alias("n_docs"),
        F.count_if("r_words").alias("pass_words"),
        F.count_if("r_mwl").alias("pass_mwl"),
        F.count_if("r_function_words").alias("pass_function_words"),
        F.count_if("r_repetition").alias("pass_repetition"),
        F.count_if(
            F.col("r_words")
            & F.col("r_mwl")
            & F.col("r_function_words")
            & F.col("r_repetition")
        ).alias("pass_all"),
    )


@query(
    "l53_source_similarity",
    sql="""
    WITH vocab AS (
      SELECT DISTINCT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    sizes AS (SELECT source, count(*) AS n FROM vocab GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
      FROM vocab a JOIN vocab b
        ON a.token = b.token AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.src_a, i.src_b, i.n_inter,
           CAST(i.n_inter AS DOUBLE)
             / (sa.n + sb.n - i.n_inter) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.src_a = sa.source
    JOIN sizes sb ON i.src_b = sb.source
    ORDER BY jaccard DESC, src_a ASC, src_b ASC
    LIMIT 40
    """,
    tags=("L9", "L3", "J11", "A3"),
)
def l53_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixture similarity matrix: vocabulary Jaccard between
    every pair of sources (top 40 most-similar pairs) — the input to
    data-mixture design (near-identical sources are redundant in the
    mix; distant ones add diversity; cf. the domain-weighting setup in
    DoReMi, arXiv:2305.10429).

    Scale shape: the unit of comparison is the per-source DISTINCT
    vocabulary, aggregated BEFORE any pairing — bounded by the token
    vocabulary, not the corpus; the pair intersection is an equi-join
    on token (never a doc-level cross product), and with S sources the
    output is S² tiny rows. At 100 TB: same plan, vocab tables a few
    MB each.
    """
    docs = load(spark, sf_dir, "documents")
    vocab = docs.select(
        "source", F.explode(text.tokens(F.col("text"))).alias("token")
    ).distinct()
    sizes = vocab.groupBy("source").agg(F.count("*").alias("n"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_inter",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), F.col("src_a").asc(), F.col("src_b").asc())
        .limit(40)
    )


@query(
    "l55_span_dedup",
    sql="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 6),
               i -> {'start': i, 'gram': array_to_string(t[i:i+7], ' ')})) AS g
      FROM toks WHERE len(t) >= 8
    ),
    dup AS (
      SELECT gram FROM (
        SELECT g.gram AS gram, count(DISTINCT doc_id) AS nd FROM sh GROUP BY 1
      ) WHERE nd > 1
    ),
    cov AS (
      SELECT DISTINCT sh.doc_id, sh.g.start + r.range AS pos
      FROM sh JOIN dup ON sh.g.gram = dup.gram, range(0, 8) r
    ),
    pos AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) + 1),
               i -> {'pos': i, 'tok': t[i]})) AS p
      FROM toks
    ),
    kept AS (
      SELECT pos.doc_id, pos.p.pos AS tpos, pos.p.tok AS tok
      FROM pos LEFT JOIN cov
        ON pos.doc_id = cov.doc_id AND pos.p.pos = cov.pos
      WHERE cov.pos IS NULL
    )
    SELECT t.doc_id,
           len(t.t) AS n_tokens,
           c.n_removed,
           coalesce(k.text2, '') AS dedup_text
    FROM toks t
    JOIN (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY 1) c
      ON t.doc_id = c.doc_id
    LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS text2
               FROM kept GROUP BY 1) k
      ON t.doc_id = k.doc_id
    """,
    tags=("L3", "L8", "L2"),
)
def l55_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span REMOVAL (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499):
    every 8-token span that appears in MORE THAN ONE document is cut
    from every document containing it, and the surviving tokens are
    reassembled in order. l49 is the census (which spans repeat); this
    is the surgery. Returns one row per modified doc: token count,
    tokens removed, deduplicated text ('' when nothing survives, e.g.
    exact duplicates).

    Scale shape — all equi-joins, no window, and the whole mutation is
    computed ONCE PER DISTINCT TEXT (the repo's representative-collapse
    cascade, as in l23/l26): byte-identical documents collapse to one
    sha2 representative, a gram's true distinct-document count is the
    group-size-weighted sum over the representatives containing it
    (identical docs have identical shingle sets, so weighting is
    exact), and the per-representative result fans back out to every
    copy by digest. Within a representative: shingle-with-position
    explode (folded zip_with, operators/text.py), coverage = dup-span
    starts exploded to their 8 positions (sequence explode keeps it
    equi — no range join), anti-join tokens against covered positions,
    ordered reassembly via array_sort(collect_list(struct)). Cost is
    bounded by 8·|dup-span instances over distinct texts| + |distinct
    tokens| + |output| — on a duplicate-heavy corpus the expensive
    stages shrink by the duplication factor (16×-replica probe: 57.7 s
    naive → representative path, see SCALE.md), and the unavoidable
    per-copy cost is emitting the result rows themselves.
    """
    from nipd_spark.operators import text

    docs = load(spark, sf_dir, "documents")
    members = docs.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("ghash")
    )
    groups = members.groupBy("ghash").agg(
        F.min("doc_id").alias("rep_id"), F.count("*").alias("gsize")
    )
    reps = docs.join(
        groups.select(
            F.col("rep_id").alias("doc_id"), "ghash", "gsize"
        ),
        "doc_id",
    ).select("doc_id", "ghash", "gsize", "text")

    toks = reps.select("ghash", F.split("text", " ").alias("t"))
    sh = reps.select(
        "ghash",
        "gsize",
        F.posexplode(text.shingles(F.col("text"), 8)).alias("pos0", "gram"),
    ).select("ghash", "gsize", (F.col("pos0") + 1).alias("start"), "gram")
    # true distinct-doc count of a gram = sum of group sizes over the
    # distinct representatives containing it
    dup = (
        sh.select("ghash", "gsize", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.sum("gsize").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gram")
    )
    cov = (
        sh.join(dup, "gram")
        .select(
            "ghash",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + 7)
            ).alias("pos"),
        )
        .distinct()
    )
    pos = toks.select(
        "ghash", F.posexplode("t").alias("pos0", "tok")
    ).select("ghash", (F.col("pos0") + 1).alias("pos"), "tok")
    kept = pos.join(cov, ["ghash", "pos"], "left_anti")
    n_removed = cov.groupBy("ghash").agg(F.count("*").alias("n_removed"))
    text2 = kept.groupBy("ghash").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x.tok,
            ),
            " ",
        ).alias("text2")
    )
    per_rep = (
        toks.select("ghash", F.size("t").alias("n_tokens"))
        .join(n_removed, "ghash")
        .join(text2, "ghash", "left")
        .select(
            "ghash",
            "n_tokens",
            "n_removed",
            F.coalesce(F.col("text2"), F.lit("")).alias("dedup_text"),
        )
    )
    return members.join(per_rep, "ghash").select(
        "doc_id", "n_tokens", "n_removed", "dedup_text"
    )


@query(
    "l57_semantic_decontaminate",
    sql="""
    WITH e AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    ev AS (SELECT * FROM e WHERE vec_id % 23 = 0),
    tr AS (SELECT * FROM e WHERE vec_id % 23 <> 0),
    hits AS (
      SELECT tr.vec_id AS train_id, ev.vec_id AS eval_id,
             list_sum(list_transform(range(1, 65),
               i -> CAST(tr.embedding[i] AS DOUBLE)
                    * CAST(ev.embedding[i] AS DOUBLE)))
               / (tr.nrm * ev.nrm) AS cos
      FROM tr, ev
    )
    SELECT train_id, max(cos) AS max_cos,
           CAST(count(*) AS BIGINT) AS n_hits
    FROM hits WHERE cos >= 0.4
    GROUP BY train_id
    """,
    tags=("L3", "L4", "J4"),
)
def l57_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination — the embedding-space sibling of l19's
    n-gram screen: flag every train vector whose cosine to ANY held-out
    eval vector reaches 0.4, reporting the worst overlap (max_cos) and
    how many eval items it collides with (n_hits). Eval membership is
    the hash-split discipline of l17 (vec_id % 23 == 0 — a pure key
    function that survives repartitioning and backfills).

    Plan shape (the knn.py pattern): eval is streamed as bounded
    broadcast blocks and a per-partition GEMM SCREENS pairs at
    tau - 1e-6 (output-bounded — no train x eval materialization);
    survivors are re-scored with the sequential zip_with expression and
    re-filtered at tau EXACTLY, so emitted cosines, the max, and the
    boundary count are all bit-identical to the DuckDB twin. At 100 TB
    the eval side is the small one by construction (benchmarks are
    KB-MB scale), so the broadcast never inverts.
    """
    from nipd_spark.operators import knn

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ev = e.filter(F.col("vec_id") % 23 == 0)
    tr = e.filter(F.col("vec_id") % 23 != 0)
    screened = knn.threshold_pairs_gemm(tr, ev, tau=0.4)
    exact = knn.rescore_pairs(e, screened.select("a_id", "b_id")).filter(
        F.col("cosine") >= 0.4
    )
    return exact.groupBy(F.col("a_id").alias("train_id")).agg(
        F.max("cosine").alias("max_cos"),
        F.count("*").alias("n_hits"),
    )


@query(
    "l58_per_source_cap",
    sql="""
    WITH ranked AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok,
             row_number() OVER (PARTITION BY source
               ORDER BY (doc_id * 1103) % 10007, doc_id) AS rn
      FROM documents
    )
    SELECT source,
           CAST(count(*) FILTER (WHERE rn <= 15) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (WHERE rn > 15) AS BIGINT) AS n_dropped,
           CAST(sum(doc_id) FILTER (WHERE rn <= 15) AS BIGINT) AS kept_id_sum,
           CAST(sum(n_tok) FILTER (WHERE rn <= 15) AS BIGINT) AS kept_tokens
    FROM ranked GROUP BY source
    """,
    tags=("L9", "W1", "O4"),
)
def l58_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (the Dolma/CC-style "no domain may
    dominate" curation rule): every source keeps at most 15 docs,
    selected DETERMINISTICALLY by multiplicative-hash order (the l17
    split discipline — membership is a pure key function, stable under
    repartitioning and backfills, no RNG state). Output proves the
    exact selection per source (kept-id checksum), not just counts.

    Scale shape: salted two-level top-k. A raw-row window partitioned
    only by ``source`` caps parallelism at the source-domain size at
    100 TB, so level 1 ranks within (source, salt-of-doc_id) — high
    parallelism, keeps ≤ k per salt — and level 2 takes the exact
    global top-k per source from the ≤ k × n_salts survivors with a
    BOUNDED collect_list + array_sort + slice (≤ 960 structs per
    source, not fact-sized). Totals come from a plain groupBy, so no
    window ever sees raw rows partitioned by source alone.
    """
    docs = load(spark, sf_dir, "documents")
    k, n_salts = 15, 64
    base = docs.select(
        "source",
        "doc_id",
        F.pmod(F.col("doc_id") * 1103, F.lit(10007)).alias("hk"),
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )
    w1 = Window.partitionBy("source", "__salt").orderBy("hk", "doc_id")
    local = (
        base.withColumn("__salt", F.pmod(F.col("doc_id"), F.lit(n_salts)))
        .withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= k)
    )
    kept = (
        local.groupBy("source")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct("hk", "doc_id", "n_tok"))
                ),
                1,
                k,
            ).alias("top")
        )
        .select("source", F.explode("top").alias("t"))
        .select("source", F.col("t.doc_id").alias("doc_id"),
                F.col("t.n_tok").alias("n_tok"))
    )
    kept_agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("kept_id_sum"),
        F.sum("n_tok").alias("kept_tokens"),
    )
    totals = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    return totals.join(kept_agg, "source").select(
        "source",
        "n_kept",
        (F.col("n_total") - F.col("n_kept")).alias("n_dropped"),
        "kept_id_sum",
        "kept_tokens",
    )


@query(
    "l59_token_budget_mix",
    sql="""
    WITH ranked AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok,
             sum(len(string_split(text, ' '))) OVER (PARTITION BY source
               ORDER BY (doc_id * 1103) % 10007, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tok_before
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs_kept,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens_kept,
           CAST(greatest(sum(n_tok) - 600, 0) AS BIGINT) AS overshoot
    FROM ranked
    WHERE coalesce(tok_before, 0) < 600
    GROUP BY source
    """,
    tags=("L9", "W3"),
)
def l59_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted mixture sampling: each source contributes docs in
    deterministic hash order until its token budget (600) is reached —
    a doc is kept iff the tokens BEFORE it are under budget, so the
    budget is met with bounded overshoot (≤ one doc) and the selection
    is an exact prefix of a stable order. This is how mixture weights
    become concrete document sets in an LLM data recipe (tokens, not
    doc counts, are the currency).

    Scale shape: the per-source prefix sum is the two-level histogram
    cumsum (operators/ranks.with_grouped_running_sum) — a raw-row
    Window.partitionBy(source) would funnel each source domain through
    one task at 100 TB; the histogram form keeps |sources| × n_buckets
    parallelism. Token counts are exact integers, so the inclusive
    cumsum minus the row's own tokens IS the exclusive frame,
    bit-identical to the window form.
    """
    from nipd_spark.operators import ranks

    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "doc_id",
        F.pmod(F.col("doc_id") * 1103, F.lit(10007)).alias("hk"),
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )
    cum = ranks.with_grouped_running_sum(
        base, group="source", key="hk", tiebreaks=["doc_id"], val="n_tok",
        out="cum_tok",
    )
    ranked = cum.withColumn(
        "tok_before", F.col("cum_tok") - F.col("n_tok")
    )
    return (
        ranked.filter(F.col("tok_before") < 600)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs_kept"),
            F.sum("n_tok").alias("n_tokens_kept"),
            F.greatest(
                F.sum("n_tok") - F.lit(600), F.lit(0).cast("long")
            ).alias("overshoot"),
        )
    )


@query(
    "l60_unimax_allocation",
    sql="""
    WITH sizes AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
      FROM documents GROUP BY source
    ),
    caps AS (
      SELECT source, n_tok,
             CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                  THEN 0.5 ELSE 0.25 END * CAST(n_tok AS DOUBLE) AS cap
      FROM sizes
    ),
    tot AS (
      SELECT CAST(sum(n_tok) AS DOUBLE) * 3 / 10 AS budget,
             CAST(count(*) AS BIGINT) AS n_lang
      FROM caps
    ),
    ranked AS (
      SELECT source, n_tok, cap,
             row_number() OVER (ORDER BY cap, source) AS rn,
             coalesce(sum(cap) OVER (ORDER BY cap, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS p_prev,
             lag(cap) OVER (ORDER BY cap, source) AS c_prev
      FROM caps
    ),
    cand AS (
      SELECT (tot.budget - r.p_prev) / (tot.n_lang - r.rn + 1) AS th
      FROM ranked r, tot
      WHERE (r.rn = 1 OR r.c_prev <=
               (tot.budget - r.p_prev) / (tot.n_lang - r.rn + 1))
        AND (tot.budget - r.p_prev) / (tot.n_lang - r.rn + 1) < r.cap
    ),
    theta AS (SELECT coalesce(min(th), 1e308) AS th FROM cand)
    SELECT c.source, c.n_tok, c.cap,
           least(c.cap, t.th) AS alloc,
           c.cap <= t.th AS capped
    FROM caps c, theta t
    """,
    tags=("L9", "W3", "A2"),
)
def l60_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax-style budget allocation [PK: Chung et al., "UniMax:
    Fairer and More Effective Language Sampling", ICLR 2023]: given a
    token budget (30% of the corpus) and per-source epoch caps
    (0.25x/0.5x the source's tokens — the low/high-resource split), the
    waterfilling threshold θ solves Σ min(cap_i, θ) = B, giving every
    small source its full cap and splitting the rest evenly. θ has the
    closed sorted-prefix form: for the unique rank k where the k
    smallest caps lie below water, θ = (B - Σ_{i≤k} cap_i)/(L - k) —
    found here with ONE window cumsum + lag and a 1-row broadcast back,
    no iteration, no driver loop.

    Determinism: token counts are integers; caps are dyadic multiples
    (0.25/0.5 — exact in binary); the prefix cumsum runs in a total
    order (cap, source) identical in both engines, so θ and every
    allocation are bit-equal with no rounding.

    Scale shape: sizing is one hash agg on source; everything after
    operates on the L-row language table (broadcast-trivial at any
    corpus size — L is languages/domains, not documents).
    """
    docs = load(spark, sf_dir, "documents")
    sizes = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tok")
    )
    mult = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, 0.5
    ).otherwise(0.25)
    caps = sizes.select(
        "source", "n_tok", (mult * F.col("n_tok").cast("double")).alias("cap")
    )
    tot = caps.agg(
        (F.sum("n_tok").cast("double") * 3 / 10).alias("budget"),
        F.count("*").alias("n_lang"),
    )
    w = Window.orderBy("cap", "source")
    ranked = (
        caps.select(
            "source",
            "cap",
            F.row_number().over(w).alias("rn"),
            F.coalesce(
                F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0.0),
            ).alias("p_prev"),
            F.lag("cap").over(w).alias("c_prev"),
        )
        .crossJoin(F.broadcast(tot))
    )
    th = (F.col("budget") - F.col("p_prev")) / (
        F.col("n_lang") - F.col("rn") + 1
    )
    cand = ranked.filter(
        ((F.col("rn") == 1) | (F.col("c_prev") <= th)) & (th < F.col("cap"))
    ).select(th.alias("th"))
    theta = cand.agg(F.coalesce(F.min("th"), F.lit(1e308)).alias("th"))
    return caps.crossJoin(F.broadcast(theta)).select(
        "source",
        "n_tok",
        "cap",
        F.least(F.col("cap"), F.col("th")).alias("alloc"),
        (F.col("cap") <= F.col("th")).alias("capped"),
    )


_BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "window"), (1, "sort"), (1, "order"),
    (2, "hash"), (2, "join"), (2, "merge"),
    (3, "stream"), (3, "batch"), (3, "filter"),
    (4, "scan"), (4, "column"), (4, "table"),
)
_BM25_VALUES = ", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)

# BM25 scored CTE chain shared by the l62 oracle and l65's sparse leg.
# Ends at scored(query_id, doc_id, score) with the 6 dp rounded score.
# Float discipline: avgdl is sum(dl)/n (integer sum then one
# division — bit-identical, never avg()'s order-dependent float
# sum); per-(doc,term) contributions are identical expression
# shapes over identical integers, so only ln()'s last ulp and the
# ≤3-term SUM order differ cross-engine — both far inside the 6 dp
# rounding. Ranking uses the ROUNDED score (ties → doc_id), so
# rank is deterministic on both engines.
_BM25_SCORED_CTES = f"""q(query_id, term) AS (VALUES {_BM25_VALUES}),
    d AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    dd AS (SELECT doc_id, len(toks) AS dl, toks FROM d),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dd),
    tok AS (SELECT doc_id, dl, unnest(toks) AS term FROM dd),
    tf AS (
      SELECT q.query_id, t.term, t.doc_id, t.dl, count(*) AS tf
      FROM tok t JOIN q ON t.term = q.term
      GROUP BY 1, 2, 3, 4
    ),
    dfreq AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ),
    scored AS (
      SELECT f.query_id, f.doc_id,
             {dround('''sum(
               ln(1 + (s.n_docs - x.df + 0.5) / (x.df + 0.5))
               * (f.tf * 2.2)
               / (f.tf + 1.2 * (0.25 + 0.75 * f.dl
                    / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
             )''', 6)} AS score
      FROM tf f JOIN dfreq x USING (term), stats s
      GROUP BY f.query_id, f.doc_id
    )"""


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, score): BM25 (k1=1.2, b=0.75) over the fixed
    4-query term set, 6 dp rounded — the sparse-retrieval core shared
    by l62 (direct top-k) and l65 (hybrid fusion sparse leg).

    The query-term table is a ≤12-row broadcast, so the fact-sized
    tokenize/explode stream is filtered to matching terms BEFORE the
    (query, term, doc) tf aggregation — the shuffle carries only docs
    containing ≥1 query term. Document frequencies and corpus stats
    are tiny aggregates broadcast back.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    dd = docs.withColumn("dl", F.size("toks"))
    stats = dd.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tok = dd.select("doc_id", "dl", F.explode("toks").alias("term"))
    qterms = docs.sparkSession.createDataFrame(
        list(_BM25_QUERIES), "query_id int, term string"
    )
    tf = (
        tok.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = (
        tf.select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    contrib = (
        F.log(
            F.lit(1)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * (F.col("tf") * 2.2)
        / (F.col("tf") + 1.2 * (F.lit(0.25) + 0.75 * F.col("dl") / avgdl))
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )


def _salted_topk(scored: DataFrame, k: int, n_salts: int = 16) -> DataFrame:
    """Exact per-query top-k over (query_id, doc_id, score) without a
    per-query window funnel — the l58 salted two-level pattern: level 1
    ranks within (query, salt-of-doc) so no window ever funnels all
    matching docs of one query through one task; level 2 takes the
    exact global top-k from the ≤ k·n_salts survivors with a bounded
    collect + array_sort + slice. posexplode rebuilds rn 1..k.
    Ties break by doc_id, matching the oracles' ORDER BY.
    """
    w1 = Window.partitionBy("query_id", "__salt").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    local = (
        scored.withColumn("__salt", F.pmod(F.col("doc_id"), F.lit(n_salts)))
        .withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= k)
    )
    return (
        local.groupBy("query_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("score")).alias("ns"), "doc_id", "score"
                        )
                    )
                ),
                1,
                k,
            ).alias("top")
        )
        .select("query_id", F.posexplode("top").alias("pos", "t"))
        .select(
            "query_id",
            (F.col("pos") + 1).cast("long").alias("rn"),
            F.col("t.doc_id").alias("doc_id"),
            F.col("t.score").alias("score"),
        )
    )


@query(
    "l62_bm25_topk",
    # Float discipline: see _BM25_SCORED_CTES.
    sql=f"""
    WITH {_BM25_SCORED_CTES},
    ranked AS (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id ASC) AS rn
      FROM scored
    )
    SELECT query_id, CAST(rn AS BIGINT) AS rn, doc_id, score
    FROM ranked WHERE rn <= 10
    """,
    tags=("L7", "L6", "O4"),
)
def l62_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 sparse retrieval (k1=1.2, b=0.75): top-10 documents per
    query for a fixed 4-query set — the lexical-retrieval primitive
    behind eval-set decontamination probes, RAG candidate generation,
    and quality-by-query curation that TF-IDF (l7) doesn't cover
    (BM25's tf saturation and length normalization change ranking).

    Plan shape for 100 TB: the query-term table is a ≤12-row broadcast,
    so the fact-sized tokenize/explode stream is filtered to matching
    terms BEFORE the (query, term, doc) tf aggregation — the shuffle
    carries only docs containing ≥1 query term. Document frequencies
    and corpus stats are tiny aggregates broadcast back. The final
    per-query top-k uses the l58 salted two-level pattern
    (_salted_topk): no window ever funnels all matching docs of one
    query through one task.
    """
    return _salted_topk(_bm25_scored(spark, sf_dir), k=10)


@query(
    "l63_hrw_shard_rebalance",
    # Fully integer/hex-deterministic: both engines build the SAME
    # candidate strings "<doc_id>|<shard>", md5 to lowercase hex, and
    # pick the lexicographic-max hash (unique — no ties), so shard
    # assignments are bit-identical cross-engine with no float in
    # sight. The n_moved_in = 0 rows for shards 0-7 ARE the minimal-
    # movement theorem, visible in the result.
    sql="""
    WITH ids AS (SELECT doc_id FROM documents),
    c8 AS (
      SELECT doc_id, s, md5(doc_id || '|' || s) AS h
      FROM ids, range(8) t(s)
    ),
    a8 AS (SELECT doc_id, arg_max(s, h) AS shard_old FROM c8 GROUP BY doc_id),
    c9 AS (
      SELECT doc_id, s, md5(doc_id || '|' || s) AS h
      FROM ids, range(9) t(s)
    ),
    a9 AS (SELECT doc_id, arg_max(s, h) AS shard_new FROM c9 GROUP BY doc_id)
    SELECT CAST(a9.shard_new AS BIGINT) AS shard_id,
           count(*) AS n_docs,
           count(*) FILTER (WHERE a8.shard_old <> a9.shard_new)
             AS n_moved_in
    FROM a8 JOIN a9 USING (doc_id)
    GROUP BY 1
    """,
    tags=("L9", "A1", "F3"),
)
def l63_hrw_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding with a rebalance
    proof: assign every document to one of 8 shards by
    argmax_s md5(doc_id|s), then re-assign under 9 shards and report,
    per new shard, the document count and how many documents MOVED in.
    HRW's guarantee — growing 8→9 shards moves only the ~1/9 of keys
    won by the new shard, and nothing relocates between surviving
    shards — shows up directly in the result: n_moved_in = 0 for
    shards 0-7, ≈ N/9 for shard 8. This is the stable-sharding
    primitive for 100 TB training-data layout (adding capacity must
    not reshuffle the corpus; cf. consistent hashing) and for
    deterministic worker routing.

    Plan shape: the argmax is a per-row array_max over 8/9
    (hash, shard) structs — pure map-side JVM expressions, zero
    shuffle, zero UDF — followed by one 9-group partial aggregate.
    Scales as a single linear scan at any corpus size.
    """
    ids = load(spark, sf_dir, "documents").select("doc_id")

    # ONE 9-struct (h, s) array per row: the 8-shard assignment is the
    # argmax over its first 8 entries (HRW's stability property in the
    # plan itself) — 9 md5 evaluations per row, not 8 + 9
    cands = F.array(
        *[
            F.struct(
                F.md5(
                    F.concat_ws(
                        "|", F.col("doc_id").cast("string"), F.lit(str(s))
                    )
                ).alias("h"),
                F.lit(s).alias("s"),
            )
            for s in range(9)
        ]
    )
    assigned = ids.select(cands.alias("c")).select(
        F.array_max(F.slice(F.col("c"), 1, 8))["s"].alias("shard_old"),
        F.array_max(F.col("c"))["s"].alias("shard_new"),
    )
    return (
        assigned.groupBy(F.col("shard_new").cast("long").alias("shard_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("shard_old") != F.col("shard_new")).alias(
                "n_moved_in"
            ),
        )
    )


@query(
    "l64_systematic_token_sample",
    # Integer-exact end to end: weights, the running sum, the total and
    # the stride test (100·run) div tot are all BIGINT ops — no float
    # ever enters, so both engines agree bit-for-bit. DuckDB's SUM over
    # BIGINT widens to HUGEINT → explicit BIGINT casts on every output.
    sql="""
    WITH d AS (
      SELECT doc_id, source,
             (doc_id * 1103) % 10007 AS hk,
             len(string_split(text, ' ')) AS w
      FROM documents
    ),
    c AS (
      SELECT *, sum(w) OVER (ORDER BY hk, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM d
    ),
    t AS (SELECT sum(w) AS tot FROM d),
    p AS (
      SELECT c.*,
             ((100 * run) // tot) - ((100 * (run - w)) // tot) AS m
      FROM c, t
    )
    SELECT source,
           CAST(count(*) FILTER (WHERE m > 0) AS BIGINT) AS n_picked,
           CAST(sum(m) AS BIGINT) AS n_draws,
           CAST(sum(doc_id) FILTER (WHERE m > 0) AS BIGINT)
             AS picked_id_sum,
           CAST(sum(w) FILTER (WHERE m > 0) AS BIGINT) AS picked_tokens
    FROM p GROUP BY source
    """,
    tags=("L9", "W3", "A12"),
)
def l64_systematic_token_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic sampling proportional to token count —
    the 'downsample the corpus to a K-draw token budget with exact
    proportional representation' step of a mixture build (the
    with-replacement complement of l58's per-source cap; UniMax l60
    sets the budgets, this executes a draw). Documents are laid on a
    token-weighted number line in multiplicative-hash order (the l17
    split discipline — stable under repartitioning, no RNG state) and
    every (i·T/100)-th token boundary selects the document under it;
    a document longer than T/100 is legitimately drawn multiple times
    (``n_draws`` = its multiplicity, Σ n_draws = 100 exactly).

    Everything is 64-bit integer arithmetic — selection is
    (100·run) div tot strides over the inclusive running token sum —
    so the draw is bit-reproducible on any engine (overflow bound:
    100·total_tokens < 2⁶³ holds to ~9·10¹⁶ tokens, three orders past
    a 100 TB corpus).

    Plan shape: the global running sum is the bucketed two-level form
    (operators/ranks.with_global_running_sum) — per-bucket window +
    broadcast offsets, no single-partition stage; the total is a 1-row
    broadcast; the verdict is one per-source partial aggregate. One
    narrow-projection scan, two tiny exchanges.
    """
    from nipd_spark.operators.ranks import with_global_running_sum

    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        F.pmod(F.col("doc_id") * 1103, F.lit(10007)).alias("hk"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("w"),
    )
    c = with_global_running_sum(
        base, key="hk", tiebreaks=["doc_id"], val="w", out="run"
    )
    tot = base.agg(F.sum("w").alias("tot"))
    p = c.crossJoin(F.broadcast(tot)).withColumn(
        "m",
        F.expr("(100 * run) div tot") - F.expr("(100 * (run - w)) div tot"),
    )
    return p.groupBy("source").agg(
        F.count_if(F.col("m") > 0).alias("n_picked"),
        F.sum("m").alias("n_draws"),
        F.sum(F.when(F.col("m") > 0, F.col("doc_id"))).alias(
            "picked_id_sum"
        ),
        F.sum(F.when(F.col("m") > 0, F.col("w"))).alias("picked_tokens"),
    )


_RRF_QVECS = ((1, 11), (2, 22), (3, 33), (4, 44))
_RRF_QVEC_VALUES = ", ".join(f"({q}, {v})" for q, v in _RRF_QVECS)


@query(
    "l65_rrf_hybrid",
    # Determinism: ranks on BOTH legs come from 6 dp ROUNDED scores
    # with doc_id tiebreaks (sparse: _BM25_SCORED_CTES discipline;
    # dense: the sequential-double dot product verified bit-identical
    # to list_sum/list_transform, then dround 6). Given identical
    # integer ranks, 1.0/(60+r) and the fixed two-term sum are IEEE
    # bit-identical cross-engine — the fused score needs no rounding.
    sql=f"""
    WITH {_BM25_SCORED_CTES},
    sp AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id ASC) AS r
      FROM scored
    ),
    sp50 AS (SELECT query_id, doc_id, r FROM sp WHERE r <= 50),
    e AS (
      SELECT vec_id, embedding,
             sqrt({vector.duck_sq_norm('embedding')}) AS nrm
      FROM embeddings
    ),
    qv AS (
      SELECT m.query_id, e.embedding AS qemb, e.nrm AS qnrm
      FROM (VALUES {_RRF_QVEC_VALUES}) m(query_id, vec_id)
      JOIN e ON e.vec_id = m.vec_id
    ),
    dsc AS (
      SELECT qv.query_id, e.vec_id AS doc_id,
             {dround(
                 f"({vector.duck_dot('qv.qemb', 'e.embedding')})"
                 " / (qv.qnrm * e.nrm)", 6)} AS score
      FROM qv, e
    ),
    dn AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id ASC) AS r
      FROM dsc
    ),
    dn50 AS (SELECT query_id, doc_id, r FROM dn WHERE r <= 50),
    fused AS (
      SELECT COALESCE(s.query_id, d.query_id) AS query_id,
             COALESCE(s.doc_id, d.doc_id) AS doc_id,
             COALESCE(1.0 / (60 + s.r), 0.0)
               + COALESCE(1.0 / (60 + d.r), 0.0) AS score
      FROM sp50 s FULL OUTER JOIN dn50 d
        ON s.query_id = d.query_id AND s.doc_id = d.doc_id
    ),
    fr AS (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id ASC) AS rn
      FROM fused
    )
    SELECT query_id, CAST(rn AS BIGINT) AS rn, doc_id, score
    FROM fr WHERE rn <= 10
    """,
    tags=("L7", "L4", "J3", "O4"),
)
def l65_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion [PK: Cormack,
    Clarke & Buettcher, "Reciprocal Rank Fusion outperforms Condorcet
    and individual rank learning methods", SIGIR 2009]: each eval
    query carries both its analyzed terms (the l62 BM25 set) and its
    encoder embedding (a designated `embeddings` row per query);
    retrieve depth-50 candidate lists from BOTH systems and fuse with
    RRF(d) = Σ 1/(60 + rank_sys(d)), taking the top-10 fused docs per
    query. This is the standard sparse+dense two-tower retrieval
    pattern behind RAG candidate generation and retrieval-based
    decontamination — neither l62 (lexical only) nor l4b (dense only)
    expresses the fusion.

    Plan shape for 100 TB: the sparse leg is _bm25_scored (broadcast
    query terms filter the token stream before any shuffle); the dense
    leg broadcasts 4 query vectors across the embeddings scan — a
    map-side sequential-double cosine inside whole-stage codegen, no
    pair shuffle. Both legs reduce to ≤ 50·|queries| rows via the
    salted two-level top-k (_salted_topk), so the fusion's full outer
    join runs on two k-bounded tables regardless of corpus size. At
    real scale the dense leg's linear scan is the IVF-probed tier
    (operators/ivf.py) — this query is the exact-retrieval anchor.
    """
    sparse = _salted_topk(_bm25_scored(spark, sf_dir), k=50).select(
        "query_id", "doc_id", F.col("rn").alias("r_sp")
    )
    e = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .withColumn("nrm", vector.l2_norm(F.col("embedding")))
    )
    qmap = spark.createDataFrame(
        list(_RRF_QVECS), "query_id int, vec_id long"
    )
    qv = e.join(F.broadcast(qmap), "vec_id").select(
        "query_id",
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    dsc = e.crossJoin(F.broadcast(qv)).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.round(
            vector.dot(F.col("qemb"), F.col("embedding"))
            / (F.col("qnrm") * F.col("nrm")),
            6,
        ).alias("score"),
    )
    dense = _salted_topk(dsc, k=50).select(
        "query_id", "doc_id", F.col("rn").alias("r_dn")
    )
    rrf = F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_sp")), F.lit(0.0)) + (
        F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_dn")), F.lit(0.0))
    )
    fused = sparse.join(dense, ["query_id", "doc_id"], "full").select(
        "query_id", "doc_id", rrf.alias("score")
    )
    return _salted_topk(fused, k=10)


@query(
    "l66_temperature_mixture",
    # Float discipline: n_tok is an exact integer per source; pow and
    # the 20-term tot_w sum differ cross-engine only in the last ulp,
    # far inside the 6 dp (2 dp for alloc) rounding. Each output is
    # rounded ONCE from full-precision intermediates with identical
    # expression shapes on both engines.
    sql=f"""
    WITH d AS (
      SELECT source, len(string_split(text, ' ')) AS w FROM documents
    ),
    s AS (
      SELECT source, count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS n_tok
      FROM d GROUP BY source
    ),
    t AS (
      SELECT CAST(sum(n_tok) AS BIGINT) AS tot_tok,
             sum(pow(CAST(n_tok AS DOUBLE), 0.3)) AS tot_w
      FROM s
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_tok,
      {dround('pow(CAST(n_tok AS DOUBLE), 0.3) / tot_w', 6)} AS p_temp,
      {dround('''pow(CAST(n_tok AS DOUBLE), 0.3)
         * CAST(tot_tok AS DOUBLE)
         / (tot_w * CAST(n_tok AS DOUBLE))''', 6)} AS boost,
      {dround('1000000.0 * pow(CAST(n_tok AS DOUBLE), 0.3) / tot_w', 2)}
        AS alloc_tok
    FROM s, t
    """,
    tags=("L9", "A1", "F3"),
)
def l66_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights [PK: Xue et al., "mT5: A
    Massively Multilingual Pre-trained Text-to-Text Transformer",
    NAACL 2021, §3.1]: sampling probability p_s ∝ (tokens_s)^α with
    α = 0.3 flattens the natural source distribution so low-resource
    sources are upsampled without letting any source dominate. Reports,
    per source: document/token counts, the temperature probability
    p_temp, the upsampling factor vs natural proportion (boost > 1 ⇔
    low-resource), and the token allocation from a 1 M-token budget.
    Complements the mixture family: l58 caps per-source shares, l59
    materializes a budget as a concrete doc set, l60 waterfills under
    epoch caps — this is the α-temperature reweighting those recipes
    start from.

    Plan shape for 100 TB: one narrow-projection scan with map-side
    partial aggregation down to |sources| rows; the pow/normalize
    arithmetic runs on that tiny table with a 1-row broadcast total.
    Zero raw-row windows, zero UDFs — a single linear pass.
    """
    d = load(spark, sf_dir, "documents").select(
        "source", F.size(F.split(F.col("text"), " ")).alias("w")
    )
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").cast("long").alias("n_tok"),
    )
    t = s.agg(
        F.sum("n_tok").alias("tot_tok"),
        F.sum(F.pow(F.col("n_tok").cast("double"), 0.3)).alias("tot_w"),
    )
    w_s = F.pow(F.col("n_tok").cast("double"), 0.3)
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_tok",
        F.round(w_s / F.col("tot_w"), 6).alias("p_temp"),
        F.round(
            w_s
            * F.col("tot_tok").cast("double")
            / (F.col("tot_w") * F.col("n_tok").cast("double")),
            6,
        ).alias("boost"),
        F.round(F.lit(1000000.0) * w_s / F.col("tot_w"), 2).alias(
            "alloc_tok"
        ),
    )


# Shared KN-bigram CTE chain (l67 per-doc scores; l67b per-source
# profile aggregates docscore further).
_KN_DOC_CTES = f"""toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i])) AS u,
             unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w
      FROM toks WHERE len(t) >= 2
    ),
    cb AS (SELECT u, w, count(*) AS c FROM bg GROUP BY u, w),
    cu AS (
      SELECT u, CAST(sum(c) AS BIGINT) AS cu, count(*) AS n1p_fwd
      FROM cb GROUP BY u
    ),
    cw AS (SELECT w, count(*) AS n1p_back FROM cb GROUP BY w),
    nb AS (SELECT count(*) AS n_types FROM cb),
    p AS (
      SELECT cb.u, cb.w,
             greatest(CAST(cb.c AS DOUBLE) - 0.75, 0.0)
               / CAST(cu.cu AS DOUBLE)
             + (0.75 * CAST(cu.n1p_fwd AS DOUBLE) / CAST(cu.cu AS DOUBLE))
               * (CAST(cw.n1p_back AS DOUBLE) / CAST(nb.n_types AS DOUBLE))
               AS pkn
      FROM cb JOIN cu USING (u) JOIN cw USING (w), nb
    ),
    docscore AS (
      SELECT doc_id, count(*) AS n_bigrams,
             {dround('avg(ln(pkn))', 6)} AS avg_logprob
      FROM bg JOIN p USING (u, w)
      GROUP BY doc_id
    )"""


@query(
    "l67_kneser_ney_logprob",
    # Float discipline: every per-bigram P_KN is the SAME IEEE chain on
    # both engines (greatest/max over integers-minus-0.75, three
    # divisions, one fused add) → bit-identical; ln's last ulp and the
    # order-dependent per-doc avg are covered by the 6 dp round, the
    # l22 precedent. All counts are exact integers.
    sql=f"""
    WITH {_KN_DOC_CTES}
    SELECT doc_id, n_bigrams, avg_logprob FROM docscore
    """,
    tags=("L9", "L8", "J6"),
)
def l67_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram LM scoring [PK: Chen & Goodman,
    "An Empirical Study of Smoothing Techniques for Language
    Modeling", Harvard TR-10-98 / CSL 1999]: train the bigram model on
    the corpus with absolute discount D = 0.75 —
    P_KN(w|u) = max(c(u,w)−D, 0)/c(u·) + λ(u)·P_cont(w), with
    λ(u) = D·N1+(u·)/c(u·) and P_cont(w) = N1+(·w)/|bigram types| —
    then score every document by its mean bigram log-probability.
    This is the KenLM-style n-gram perplexity filter corpora are
    actually pruned with (CCNet et al.); l22's unigram score can't
    see word-order degradation (shuffled text scores identically) —
    the bigram KN model can.

    Plan shape for 100 TB: the bigram stream is one map-side
    two-column explode; c(u,w) is ONE equi-keyed shuffle; the context
    (c(u·), N1+(u·)), continuation (N1+(·w)) and type-count tables are
    vocab-/1-row-sized aggregates broadcast back onto the bigram-type
    table, so P_KN materializes map-side on cb's existing (u,w)
    partitioning; the scoring join re-shuffles only the bigram stream
    (the LM side reuses its hash partitioning); the per-doc avg is the
    final keyed aggregate. At 100 TB train on l21's sample — same
    plan, type-sized tables stay broadcastable. Output is one row per
    doc (grows with the corpus) — l67b is the bounded-output
    production profile over the same scores.
    """
    return _kn_doc_scores(spark, sf_dir)


def _kn_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob): the shared KN-bigram scoring
    core behind l67 (per-doc) and l67b (per-source profile).

    r13 shape: the bigram-TYPE table ``cb`` is vocab²-bounded output of
    a fact-sized scan, and every LM table (cu, cw, nb, p) derives from
    it — the r12 spelling re-derived cb per consumer, so the physical
    plan ran FIVE full scan+tokenize+Generate passes over documents
    (plans/r13/l67_*_before.txt: scans (1)(10)(20)(36)(52)) and
    sort-merge-joined the raw bigram stream against p (Exchange+Sort of
    every bigram instance by (u, w)). Now cb is plan_checkpoint'ed
    (computed once, tiny, in-memory; identity under the lint flag) and
    the scoring join BROADCASTS p — the same vocab-boundedness argument
    the r12 code already made for broadcast(cu)/broadcast(cw). Two
    scans total, and the only remaining fact exchange is the per-doc
    partial aggregate (~1 row per doc after map-side collapse).
    Results identical: the checkpoint is semantics-free and a broadcast
    hint changes only the physical strategy of the same inner equi-join
    (measured 2.0x end-to-end at the 100x tier)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    ).filter(F.size("t") >= 2)
    bg = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda a, b: F.struct(a.alias("u"), b.alias("w")),
            )
        ).alias("uw"),
    ).select("doc_id", "uw.u", "uw.w")
    cb = plan_checkpoint(
        bg.groupBy("u", "w").agg(F.count(F.lit(1)).alias("c"))
    )
    cu = cb.groupBy("u").agg(
        F.sum("c").cast("long").alias("cu"),
        F.count(F.lit(1)).alias("n1p_fwd"),
    )
    cw = cb.groupBy("w").agg(F.count(F.lit(1)).alias("n1p_back"))
    nb = cb.agg(F.count(F.lit(1)).alias("n_types"))
    pkn = (
        F.greatest(F.col("c").cast("double") - 0.75, F.lit(0.0))
        / F.col("cu").cast("double")
    ) + (
        F.lit(0.75) * F.col("n1p_fwd").cast("double")
        / F.col("cu").cast("double")
    ) * (
        F.col("n1p_back").cast("double") / F.col("n_types").cast("double")
    )
    p = (
        cb.join(F.broadcast(cu), "u")
        .join(F.broadcast(cw), "w")
        .crossJoin(F.broadcast(nb))
        .select("u", "w", pkn.alias("pkn"))
    )
    return (
        bg.join(F.broadcast(p), ["u", "w"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("pkn"))), 6).alias("avg_logprob"),
        )
    )


@query(
    "l67b_kneser_ney_source_profile",
    # Source-level stats over the 6 dp-rounded per-doc scores: the
    # rounded doc values are bit-identical cross-engine (l67's gate),
    # so min/max are exact; the source mean re-introduces summation
    # order → one more 6 dp round (two-level rounded-agg precedent).
    sql=f"""
    WITH {_KN_DOC_CTES}
    SELECT d.source,
           count(*) AS n_docs,
           CAST(sum(s.n_bigrams) AS BIGINT) AS n_bigrams,
           {dround('avg(s.avg_logprob)', 6)} AS mean_doc_logprob,
           min(s.avg_logprob) AS min_doc_logprob,
           max(s.avg_logprob) AS max_doc_logprob
    FROM docscore s JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
    tags=("L9", "L8", "A1"),
)
def l67b_kneser_ney_source_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-SOURCE Kneser–Ney perplexity profile — the bounded-output
    production shape of l67 (round-7 verdict: l67's 100× probe ratio
    was output-growth dominated, one score row per document). A corpus
    pipeline prunes or reweights by source-level LM quality (CCNet's
    perplexity buckets operate exactly this way), so the shipped
    artifact is the per-source distribution of doc scores: count,
    bigram mass, mean/min/max mean-log-probability. Output is
    source-domain-sized — FIXED as the corpus grows — so the 100×
    probe measures pure input scaling.

    Plan shape for 100 TB: identical to l67 through the per-doc
    aggregate (one bigram explode, one (u,w) shuffle, broadcast LM
    tables); the extra work is a broadcast-joined 2-column source map
    and one final agg over the source domain. Docs with < 2 tokens
    carry no bigram evidence and are excluded from the profile, same
    as l67.
    """
    s = _kn_doc_scores(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        s.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            F.round(F.avg("avg_logprob"), 6).alias("mean_doc_logprob"),
            F.min("avg_logprob").alias("min_doc_logprob"),
            F.max("avg_logprob").alias("max_doc_logprob"),
        )
    )


def _rrf_ivf(
    spark: SparkSession, sf_dir: str, nprobe: int = 6
) -> DataFrame:
    """l65b body with the probe width exposed so the recall sweep
    (tests + SCALE.md curve) can vary it; the registered query pins
    the production default."""
    from nipd_spark.operators import ivf

    sparse = _salted_topk(_bm25_scored(spark, sf_dir), k=50).select(
        "query_id", "doc_id", F.col("rn").alias("r_sp")
    )
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qmap = spark.createDataFrame(
        list(_RRF_QVECS), "query_id int, vec_id long"
    )
    qvecs = e.join(F.broadcast(qmap), "vec_id").select(
        "query_id", "vec_id", "embedding"
    )
    centroids = ivf.train_centroids(e, n_lists=16)
    assigned = ivf.assign(e, centroids)
    # The dense leg is l65's leg verbatim — self pair kept, score
    # rounded to 6 dp BEFORE ranking, doc_id tiebreak, salted top-50 —
    # evaluated over the IVF candidate relation instead of the full
    # scan, so probe-all (nprobe = n_lists) reproduces l65's fused
    # output EXACTLY (pinned by the property test).
    cand = ivf.candidates(
        e,
        qvecs.select("vec_id", "embedding"),
        centroids,
        assigned,
        nprobe=nprobe,
    )
    dsc = cand.join(
        F.broadcast(qmap.withColumnRenamed("vec_id", "q_id")), "q_id"
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.round(F.col("cosine"), 6).alias("score"),
    )
    dense = _salted_topk(dsc, k=50).select(
        "query_id", "doc_id", F.col("rn").alias("r_dn")
    )
    rrf = F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_sp")), F.lit(0.0)) + (
        F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_dn")), F.lit(0.0))
    )
    fused = sparse.join(dense, ["query_id", "doc_id"], "full").select(
        "query_id", "doc_id", rrf.alias("score")
    )
    return _salted_topk(fused, k=10)


@query("l65b_rrf_ivf", sql=None, tags=("L7", "L5", "O4"))
def l65b_rrf_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid RRF retrieval with the dense leg on the IVF-probed path —
    l65's 100 TB plan as an actual query (cf. l14 → l14b): the dense
    candidates come from operators/ivf.search (broadcast k-means
    centroids → probe nprobe of 16 inverted lists → exact-cosine
    re-rank inside the probed lists) instead of the full-scan cosine.
    Rows-only: the IVF leg is recall<1 by design at nprobe < n_lists,
    so no SQL twin — the property test pins probe-all == l65's FUSED
    OUTPUT EXACTLY (ids, ranks, scores) and asserts the default-nprobe
    fused-top-10 overlap floor.

    r8 changes: (a) the dense leg is now l65's leg verbatim — self
    pair kept, 6 dp-rounded ranks, doc_id tiebreak — over the IVF
    candidate relation (ivf.candidates), where the old ivf.search leg
    dropped self and ranked raw cosines, a systematic rank-offset that
    capped probe-all agreement at 36/40; (b) default nprobe=10
    (was 6). Measured fused overlap vs l65 on the fixture (full curve
    in SCALE.md): 21/40 @2, 28 @4, 34 @6, 36 @10, 38 @12, 40 @16 —
    the synthetic embeddings are near-isotropic (worst case for a
    coarse quantizer), so production corpora with real cluster
    structure sit above this curve at the same nprobe/n_lists ratio.

    Scale: the dense leg's work drops from a full corpus scan per
    query batch to Θ(n · nprobe / n_lists) rows through one equi-join
    on list_id; everything downstream (depth-50 truncation, RRF
    fusion on two k-bounded tables, salted top-k) is unchanged from
    l65.
    """
    return _rrf_ivf(spark, sf_dir, nprobe=10)


def _bpe_merge_expr(sym_col: str, a: str, b: str) -> str:
    """SQL expression merging adjacent (a, b) symbol pairs in an
    array<string>, leftmost-first and non-overlapping (the BPE merge
    semantics): a left fold whose state carries the pending previous
    symbol, so 'aaa' with rule (a,a) becomes ['aa','a'], never
    ['aa','aa']."""

    def q(s: str) -> str:
        # Backslash first: inside a Spark SQL string literal '\' is an
        # escape character, so a raw backslash in a merge symbol would
        # either raise ParseException ('\'' at end) or silently rewrite
        # a different symbol (e.g. '\n'). Then double the quotes.
        return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

    return f"""aggregate(
      {sym_col},
      named_struct('acc', cast(array() as array<string>),
                   'prev', cast(null as string)),
      (st, x) -> case
        when st.prev is null
          then named_struct('acc', st.acc, 'prev', x)
        when st.prev = {q(a)} and x = {q(b)}
          then named_struct('acc', array_append(st.acc, {q(a + b)}),
                            'prev', cast(null as string))
        else named_struct('acc', array_append(st.acc, st.prev),
                          'prev', x) end,
      st -> case when st.prev is null then st.acc
                 else array_append(st.acc, st.prev) end
    )"""


@query("l31b_bpe_train", sql=None, tags=("L6", "L8", "A1"))
def l31b_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, not just one step [PK: Sennrich, Haddow
    & Birch, "Neural Machine Translation of Rare Words with Subword
    Units", ACL 2016]: 5 merge rounds over the corpus vocabulary —
    each round counts adjacent symbol pairs weighted by word
    frequency, takes the argmax pair (count desc, then lexicographic
    (left, right) — deterministic), and rewrites every word's symbol
    sequence with the leftmost-first non-overlapping merge. Returns
    the learned merge table (step, left, right, merged, n) — the
    artifact a tokenizer ships. l31 is the single-step anchor; this is
    the loop. Rows-only: the iterative merge is not one SQL statement —
    a python reference pins exact merges on random corpora
    (tests/test_hypothesis_edges.py).

    Scale shape: the corpus collapses ONCE to the (word, freq) table
    (map-side-combined agg over the fact-sized token stream; the
    domain is vocabulary-sized), so every merge round is a Spark job
    over the tiny vocab table — per-round cost independent of corpus
    size, the same once-per-corpus collapse a real BPE trainer does.
    The pair count is one vocab-domain shuffle per round; the argmax
    is a 1-row bounded collect (a17-certificate precedent); the merge
    rewrite is a per-row fold. Lineage is cut per round with a
    localCheckpoint on the vocab-sized table (plain storage level —
    O(vocab) rows, the materialize.py DISK_ONLY rule is for
    fact-sized tables).
    """
    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(text.tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.length("word") >= 2)
    )
    syms = words.select(
        F.expr(
            "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
        ).alias("s"),
        "freq",
    ).localCheckpoint()
    merges = []
    for step in range(1, 6):
        pairs = syms.filter(F.size("s") >= 2).select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("s"), 1, F.size("s") - 1),
                    F.slice(F.col("s"), 2, F.size("s") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            "freq",
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0].l, top[0].r, top[0].n
        merges.append((step, a, b, a + b, n))
        syms = syms.select(
            F.expr(_bpe_merge_expr("s", a, b)).alias("s"), "freq"
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "step long, left string, right string, merged string, n long"
    )


@query(
    "l70_retrieval_eval",
    # Determinism: both rankings rank 6 dp ROUNDED scores with doc_id
    # tiebreaks (identical integer ranks cross-engine); n_hits is an
    # exact integer; p/r are single divisions of exact integers by
    # constants. DCG/IDCG are order-dependent 10-term float sums →
    # rounded 6 dp each before the final (also rounded) ratio.
    sql=f"""
    WITH {_BM25_SCORED_CTES},
    sp AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id ASC) AS rn
      FROM scored
    ),
    sp10 AS (SELECT query_id, doc_id, rn FROM sp WHERE rn <= 10),
    e AS (
      SELECT vec_id, embedding,
             sqrt({vector.duck_sq_norm('embedding')}) AS nrm
      FROM embeddings
    ),
    qv AS (
      SELECT m.query_id, e.embedding AS qemb, e.nrm AS qnrm
      FROM (VALUES {_RRF_QVEC_VALUES}) m(query_id, vec_id)
      JOIN e ON e.vec_id = m.vec_id
    ),
    dsc AS (
      SELECT qv.query_id, e.vec_id AS doc_id,
             {dround(
                 f"({vector.duck_dot('qv.qemb', 'e.embedding')})"
                 " / (qv.qnrm * e.nrm)", 6)} AS score
      FROM qv, e
    ),
    tr AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id ASC) AS r
      FROM dsc
    ),
    t20 AS (
      SELECT query_id, doc_id, r, CAST(21 - r AS DOUBLE) AS rel
      FROM tr WHERE r <= 20
    ),
    idcg AS (
      SELECT query_id,
             {dround('sum(rel / log2(r + 1.0))', 6)} AS idcg
      FROM t20 WHERE r <= 10 GROUP BY query_id
    ),
    dcg AS (
      SELECT s.query_id,
             count(t.doc_id) AS n_hits,
             {dround(
                 'sum(coalesce(t.rel, 0.0) / log2(s.rn + 1.0))', 6)} AS dcg
      FROM sp10 s
      LEFT JOIN t20 t ON t.query_id = s.query_id AND t.doc_id = s.doc_id
      GROUP BY s.query_id
    )
    SELECT d.query_id,
           CAST(d.n_hits AS BIGINT) AS n_hits,
           d.n_hits / 10.0 AS p_at_10,
           d.n_hits / 20.0 AS r_at_10,
           {dround('d.dcg / i.idcg', 6)} AS ndcg_at_10
    FROM dcg d JOIN idcg i USING (query_id)
    """,
    tags=("L7", "L4", "A1", "W1"),
)
def l70_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation [PK: Järvelin & Kekäläinen,
    "Cumulated gain-based evaluation of IR techniques", TOIS 2002]:
    score the BM25 lexical ranking (the l62 system) against a graded
    dense ground truth — each query's exact-cosine top-20 with linear
    grades rel = 21 - rank — reporting per query: hits in the truth
    set, precision@10, recall@10 (truth depth 20), and nDCG@10 with
    the standard log2(pos+1) discount. This is the eval harness every
    retrieval/RAG pipeline runs after changing a retriever: l62/l65
    produce rankings, this measures them, closing the build→measure
    loop inside the engine itself.

    Plan shape for 100 TB: both legs reduce to k-bounded tables before
    any metric math — the sparse leg is _bm25_scored (broadcast query
    terms filter the token stream before the shuffle) cut to 10 rows
    per query by the salted two-level top-k, the truth leg broadcasts
    4 query vectors across the embeddings scan (map-side cosine inside
    codegen) cut to 20 rows per query the same way. The metric joins
    and DCG sums then run on ≤ 30·|queries| rows total, regardless of
    corpus size. At real scale the truth leg's linear scan is the
    IVF-probed tier (cf. l65 → l65b); this query is the exact anchor.
    """
    sparse = _salted_topk(_bm25_scored(spark, sf_dir), k=10).select(
        "query_id", "doc_id", "rn"
    )
    e = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .withColumn("nrm", vector.l2_norm(F.col("embedding")))
    )
    qmap = spark.createDataFrame(
        list(_RRF_QVECS), "query_id int, vec_id long"
    )
    qv = e.join(F.broadcast(qmap), "vec_id").select(
        "query_id",
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    dsc = e.crossJoin(F.broadcast(qv)).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.round(
            vector.dot(F.col("qemb"), F.col("embedding"))
            / (F.col("qnrm") * F.col("nrm")),
            6,
        ).alias("score"),
    )
    # t20 feeds BOTH metric branches (DCG join + IDCG agg); it is
    # ≤ 20·|queries| rows, so materialize it once rather than re-running
    # the fact-sized dense scan per consumer (tiny table → in-memory
    # localCheckpoint, not the DISK_ONLY spill path)
    t20 = (
        _salted_topk(dsc, k=20)
        .select(
            "query_id",
            "doc_id",
            F.col("rn").alias("r"),
            (F.lit(21) - F.col("rn")).cast("double").alias("rel"),
        )
        .localCheckpoint()
    )
    idcg = (
        t20.filter(F.col("r") <= 10)
        .groupBy("query_id")
        .agg(
            F.round(
                F.sum(F.col("rel") / F.log2(F.col("r") + F.lit(1.0))), 6
            ).alias("idcg")
        )
    )
    dcg = (
        sparse.join(
            t20.select("query_id", "doc_id", "rel"),
            ["query_id", "doc_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("rel").alias("n_hits"),
            F.round(
                F.sum(
                    F.coalesce(F.col("rel"), F.lit(0.0))
                    / F.log2(F.col("rn") + F.lit(1.0))
                ),
                6,
            ).alias("dcg"),
        )
    )
    return dcg.join(idcg, "query_id").select(
        "query_id",
        F.col("n_hits").cast("long").alias("n_hits"),
        (F.col("n_hits") / F.lit(10.0)).alias("p_at_10"),
        (F.col("n_hits") / F.lit(20.0)).alias("r_at_10"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_10"),
    )


@query(
    "l71_tokenizer_fertility",
    # Integer-exact end to end: word/piece/char counts are BIGINT sums
    # (DuckDB's HUGEINT widening cast back); the two output ratios are
    # single divisions of exact integers — IEEE-deterministic, so they
    # stay UNROUNDED per the float policy.
    sql="""
    WITH w AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    ws AS (
      SELECT lang,
             count(*) AS n_words,
             CAST(sum((len(word) + 3) // 4) AS BIGINT) AS n_pieces,
             CAST(sum(len(word)) AS BIGINT) AS n_chars
      FROM w GROUP BY lang
    ),
    d AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
    SELECT d.lang, d.n_docs, ws.n_words, ws.n_pieces,
           ws.n_pieces / CAST(ws.n_words AS DOUBLE) AS fertility,
           ws.n_chars / CAST(ws.n_pieces AS DOUBLE) AS chars_per_piece
    FROM d JOIN ws USING (lang)
    """,
    tags=("L9", "L6", "A1"),
)
def l71_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility profile per language: subword pieces per
    whitespace word and characters per piece, under a fixed-width
    4-char piece model (⌈len/4⌉ pieces per word — the deterministic
    stand-in for a trained subword vocab; cf. l31b/l72 which train
    real ones). Fertility is the standard tokenizer-efficiency metric
    for multilingual corpus budgeting [PK: Rust et al., "How Good is
    Your Tokenizer? On the Monolingual Performance of Multilingual
    Language Models", ACL 2021]: a language with high fertility
    consumes more sequence positions per word, so token budgets (l59,
    l64, l66) allocated by raw token counts systematically under-buy
    high-fertility languages. This query produces the per-language
    correction table.

    Plan shape for 100 TB: one narrow-projection scan of (lang, text);
    the word explode feeds a map-side partial aggregation keyed by
    lang (≤ a few dozen groups), so the shuffle carries only per-lang
    partial sums. The doc-count agg is a second tiny aggregate joined
    on lang. All arithmetic is integer JVM expressions inside codegen
    — zero UDFs, zero windows, a single linear pass.
    """
    docs = load(spark, sf_dir, "documents")
    w = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).withColumn("wl", F.length("word"))
    ws = w.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.floor((F.col("wl") + F.lit(3)) / F.lit(4)))
        .cast("long")
        .alias("n_pieces"),
        F.sum("wl").cast("long").alias("n_chars"),
    )
    d = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return d.join(ws, "lang").select(
        "lang",
        "n_docs",
        "n_words",
        "n_pieces",
        (F.col("n_pieces") / F.col("n_words").cast("double")).alias(
            "fertility"
        ),
        (F.col("n_chars") / F.col("n_pieces").cast("double")).alias(
            "chars_per_piece"
        ),
    )


def _viterbi_piece_counts(word: str, freq: int, logp: dict) -> dict:
    """Best unigram-LM segmentation of ``word`` (pieces ≤ 4 chars, all
    single chars guaranteed in vocab) and its piece usage × freq.
    Deterministic tie-break: candidate piece lengths are tried 1→4 and
    a longer piece replaces the incumbent only on a STRICTLY better
    score, so ties keep the shortest final piece."""
    n = len(word)
    best = [float("-inf")] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for ln in range(1, min(4, i) + 1):
            p = word[i - ln : i]
            lp = logp.get(p)
            if lp is None:
                continue
            sc = best[i - ln] + lp
            if sc > best[i]:
                best[i] = sc
                back[i] = ln
    counts: dict = {}
    i = n
    while i > 0:
        ln = back[i]
        p = word[i - ln : i]
        counts[p] = counts.get(p, 0) + freq
        i -= ln
    return counts


@query("l72_unigram_lm_em", sql=None, tags=("L8", "L6", "D6", "A1"))
def l72_unigram_lm_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EM iteration of unigram-LM subword training [PK: Kudo,
    "Subword Regularization: Improving Neural Network Translation
    Models with Multiple Subword Candidates", ACL 2018 — the
    SentencePiece unigram algorithm]: seed a candidate vocabulary with
    every ≤4-char substring of the corpus (all single chars kept for
    coverage, top-300 multi-char pieces by weighted frequency),
    initialize P(piece) ∝ substring frequency, Viterbi-segment every
    distinct word under that model (hard EM's E-step), and re-estimate
    P(piece) from segmentation usage (M-step). Returns the top-30
    pieces by re-estimated probability with usage counts and the
    initial probability for comparison — the complement of BPE (l31,
    l31b): BPE grows merges bottom-up, unigram-LM prunes a rich vocab
    top-down, and real pipelines ship both.

    Rows-only by design: the E-step is a per-word dynamic program over
    a trained model — not expressible as ANSI SQL the oracle harness
    can mirror. Correctness is pinned by a from-scratch Python EM
    reference in tests/test_operators_properties.py (exact usage
    counts and ranking on a crafted corpus).

    Plan shape for 100 TB: the corpus collapses ONCE to a (word, freq)
    vocabulary table (the l31b discipline), so EM cost is
    vocabulary-sized, corpus-size-independent. Candidate pieces come
    from a substring explode over that vocab table (map-side,
    bounded: ≤ 4·max_len pieces per word); the selected piece model is
    a ≤ ~350-row driver collect (bounded by the top-300 cap + alphabet
    size) broadcast into an Arrow-batched mapInPandas over the vocab
    table — each task segments its word batch with zero shuffle. The
    M-step is one tiny aggregation over piece ids.
    """
    import pandas as pd

    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    subs = words.select(
        "freq",
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(word)), i -> "
                "transform(sequence(i, least(length(word), i + 3)), "
                "j -> substring(word, i, j - i + 1))))"
            )
        ).alias("piece"),
    )
    pf = subs.groupBy("piece").agg(F.sum("freq").alias("pfreq"))
    singles = pf.filter(F.length("piece") == 1)
    multi = (
        pf.filter(F.length("piece") > 1)
        .orderBy(F.col("pfreq").desc(), F.col("piece").asc())
        .limit(300)
    )
    vocab = singles.union(multi)
    # Bounded driver collect: ≤ 300 multi-char pieces + alphabet.
    import math

    rows = vocab.collect()
    tot0 = float(sum(r.pfreq for r in rows))
    logp = {r.piece: math.log(r.pfreq / tot0) for r in rows}
    p_init = {r.piece: r.pfreq / tot0 for r in rows}
    bc = spark.sparkContext.broadcast(logp)

    def estep(batches):
        for pdf in batches:
            model = bc.value
            acc: dict = {}
            for word, freq in zip(pdf["word"], pdf["freq"]):
                for p, c in _viterbi_piece_counts(
                    word, int(freq), model
                ).items():
                    acc[p] = acc.get(p, 0) + c
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "cnt": list(acc.values())}
            )

    used = words.mapInPandas(estep, "piece string, cnt long")
    msum = used.groupBy("piece").agg(F.sum("cnt").alias("n_uses"))
    tot1 = msum.agg(F.sum("n_uses").alias("t"))
    pinit_df = spark.createDataFrame(
        [(k, v) for k, v in p_init.items()], "piece string, pi double"
    )
    return (
        msum.crossJoin(F.broadcast(tot1))
        .join(F.broadcast(pinit_df), "piece")
        .select(
            "piece",
            "n_uses",
            F.round(F.col("n_uses") / F.col("t").cast("double"), 6).alias(
                "p_em"
            ),
            F.round(F.col("pi"), 6).alias("p_init"),
        )
        .orderBy(F.col("n_uses").desc(), F.col("piece").asc())
        .limit(30)
    )


@query(
    "l73_phrase_search",
    # Integer-exact end to end (counts, positions, ranks — no floats):
    # phrase selection and doc ranking both carry deterministic
    # tiebreaks, so the engines agree bit-for-bit.
    sql="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
      FROM d WHERE len(t) >= 2
    ),
    ph AS (
      SELECT w1, w2, w1 || ' ' || w2 AS phrase, count(*) AS cnt
      FROM bg GROUP BY w1, w2
      ORDER BY cnt DESC, phrase ASC LIMIT 3
    ),
    tok AS (
      SELECT doc_id,
             unnest(range(1, len(t) + 1)) AS pos,
             unnest(t) AS term
      FROM d
    ),
    i1 AS (
      SELECT ph.phrase, ph.w2, tok.doc_id, tok.pos
      FROM tok JOIN ph ON tok.term = ph.w1
    ),
    occ AS (
      SELECT i1.phrase, i1.doc_id, count(*) AS n_occ
      FROM i1 JOIN tok t2
        ON t2.doc_id = i1.doc_id AND t2.pos = i1.pos + 1
           AND t2.term = i1.w2
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT phrase, doc_id, n_occ,
             row_number() OVER (PARTITION BY phrase
               ORDER BY n_occ DESC, doc_id ASC) AS rn
      FROM occ
    )
    SELECT phrase, CAST(rn AS BIGINT) AS rn, doc_id, n_occ
    FROM rk WHERE rn <= 5
    """,
    tags=("L6", "L8", "J1", "O4"),
)
def l73_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-inverted-index phrase search: build a (term, doc,
    position) index, self-select the corpus's top-3 bigram phrases,
    and answer each as an adjacency join — occurrences are positions
    p where term(p) = w₁ and term(p+1) = w₂ — returning the top-5
    matching documents per phrase by occurrence count. This is the
    exact-phrase primitive every search engine layers over the bag-of-
    words index (l62's BM25 cannot distinguish "new york" from "york
    new") [PK: Manning, Raghavan & Schütze, "Introduction to
    Information Retrieval", ch. 2 — positional postings].

    Plan shape for 100 TB: the positional index is one posexplode scan;
    the phrase table is a 3-row broadcast (checkpointed once — two
    broadcast consumers must not re-run the fact-sized phrase-selection
    aggregate), so BOTH sides of the adjacency join are filtered to
    phrase-word postings BEFORE any shuffle, from ONE index scan (the
    l62 discipline; until r12 the probe side shipped the raw ~50M-token
    positional index through the exchange AND re-ran the posexplode per
    consumer — measured 41.4 → 8.0 s fresh noop at the 100× replica for
    the broadcast pre-filter + single checkpointed postings pass).
    The adjacency join is equi-keyed on (doc_id, pos+1)
    — hash-partitionable, no position-range scan — and per-phrase doc
    ranking uses the salted two-level top-k, so no window ever funnels
    one phrase's full posting list through one task.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    )
    bg = (
        docs.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(t[i-1] AS w1, t[i] AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    ph = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("phrase", F.concat_ws(" ", "w1", "w2"))
        .orderBy(F.col("cnt").desc(), F.col("phrase").asc())
        .limit(3)
        .select("phrase", "w1", "w2")
    )
    tok = docs.select(
        "doc_id", F.posexplode("t").alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    # r12 optimization (guide §3.2): BOTH posting streams are reduced to
    # phrase-word postings before the adjacency shuffle. The w1 side was
    # always broadcast-filtered, but the w2 probe side used to be the
    # RAW positional index — the (doc_id, pos) exchange carried every
    # token of every document (~50M rows at the 100× replica) to match
    # ~3 target terms. Checkpointing the 3-row phrase table lets both
    # consumers share one materialization instead of re-running the
    # fact-sized phrase-selection aggregate per broadcast.
    from nipd_spark.operators.materialize import plan_checkpoint, spill_checkpoint

    ph = plan_checkpoint(ph, eager=False)  # lint-transparent (r13)
    # One positional-index scan serves both adjacency sides: postings of
    # the ≤6 phrase words (w1 ∪ w2) are extracted once and checkpointed
    # DISK_ONLY (phrase words are frequent by construction, so this is
    # a few % of tokens — far cheaper to re-read than to re-run the
    # 50M-token posexplode per consumer).

    pw = (
        ph.select(F.col("w1").alias("term"))
        .union(ph.select(F.col("w2").alias("term")))
        .distinct()
    )
    postings = spill_checkpoint(
        tok.join(F.broadcast(pw), "term").select("doc_id", "pos", "term"),
        eager=False,
    )
    i1 = postings.join(
        F.broadcast(ph), postings["term"] == ph["w1"]
    ).select("phrase", "w2", "doc_id", "pos")
    t2 = postings.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("p2"),
        F.col("term").alias("term2"),
    )
    occ = (
        i1.join(
            t2,
            (F.col("d2") == F.col("doc_id"))
            & (F.col("p2") == F.col("pos") + 1)
            & (F.col("term2") == F.col("w2")),
        )
        .groupBy("phrase", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    top = _salted_topk(
        occ.select(
            F.col("phrase").alias("query_id"),
            "doc_id",
            F.col("n_occ").cast("double").alias("score"),
        ),
        k=5,
    )
    return top.select(
        F.col("query_id").alias("phrase"),
        "rn",
        "doc_id",
        F.col("score").cast("long").alias("n_occ"),
    )


@query(
    "l74_length_bucket_packing",
    # Integer-exact end to end: token counts, 64-token bucket ceilings,
    # per-batch capacities and batch counts are all BIGINT arithmetic;
    # the efficiency ratio is one division of exact integers.
    sql="""
    WITH d AS (
      SELECT least(len(string_split(text, ' ')), 512) AS w_eff
      FROM documents
    ),
    b AS (
      SELECT ((w_eff + 63) // 64) * 64 AS bucket_len, w_eff FROM d
    ),
    g AS (
      SELECT bucket_len,
             count(*) AS n_docs,
             512 // bucket_len AS per_batch,
             CAST(sum(w_eff) AS BIGINT) AS sum_tokens
      FROM b GROUP BY bucket_len
    )
    SELECT CAST(bucket_len AS BIGINT) AS bucket_len,
           n_docs,
           CAST(per_batch AS BIGINT) AS per_batch,
           CAST((n_docs + per_batch - 1) // per_batch AS BIGINT)
             AS n_batches,
           sum_tokens,
           CAST(((n_docs + per_batch - 1) // per_batch) * 512
                - sum_tokens AS BIGINT) AS pad_waste,
           sum_tokens / (CAST((n_docs + per_batch - 1) // per_batch
                AS DOUBLE) * 512.0) AS efficiency
    FROM g
    """,
    tags=("L9", "A1", "F3"),
)
def l74_length_bucket_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch packing audit: assign every document to a
    64-token-granular length bucket (capped at a 512-token context),
    batch each bucket at capacity ⌊512/bucket_len⌋ docs, and report per
    bucket the batch count, padding waste (batch slots × 512 − real
    tokens) and packing efficiency. This is the dynamic-batching
    planner's cost model — the standard alternative to sequence
    packing (l25) when cross-document attention contamination must be
    avoided; the per-bucket efficiency column is exactly the number a
    training pipeline tunes bucket granularity against.

    Plan shape for 100 TB: one narrow scan computes the token count and
    bucket key map-side (integer codegen expressions, no UDF), then a
    partial aggregation down to ≤ 8 bucket rows; all batch math runs on
    that tiny table. A single linear pass at any corpus size.
    """
    d = load(spark, sf_dir, "documents").select(
        F.least(F.size(F.split(F.col("text"), " ")), F.lit(512)).alias(
            "w_eff"
        )
    )
    b = d.select(
        (F.floor((F.col("w_eff") + F.lit(63)) / F.lit(64)) * 64)
        .cast("long")
        .alias("bucket_len"),
        "w_eff",
    )
    g = b.groupBy("bucket_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w_eff").cast("long").alias("sum_tokens"),
    ).withColumn(
        "per_batch",
        F.floor(F.lit(512) / F.col("bucket_len")).cast("long"),
    )
    n_batches = F.floor(
        (F.col("n_docs") + F.col("per_batch") - 1) / F.col("per_batch")
    ).cast("long")
    return g.select(
        "bucket_len",
        "n_docs",
        "per_batch",
        n_batches.alias("n_batches"),
        "sum_tokens",
        (n_batches * 512 - F.col("sum_tokens"))
        .cast("long")
        .alias("pad_waste"),
        (
            F.col("sum_tokens")
            / (n_batches.cast("double") * F.lit(512.0))
        ).alias("efficiency"),
    )


@query(
    "l76_zipf_fit",
    # Determinism: term counts and ranks are integer-exact (count desc,
    # token asc ties); ln() of identical integers is bit-identical; the
    # regression aggregates are order-dependent float sums → dround 6
    # (the f12 regr-family discipline).
    sql=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2
    ),
    rk AS (
      SELECT source, c,
             row_number() OVER (PARTITION BY source
               ORDER BY c DESC, token ASC) AS rn
      FROM tf
    ),
    top AS (
      SELECT source,
             ln(CAST(rn AS DOUBLE)) AS x,
             ln(CAST(c AS DOUBLE)) AS y
      FROM rk WHERE rn <= 100
    )
    SELECT source,
           count(*) AS n_terms,
           {dround('regr_slope(y, x)', 6)} AS slope,
           {dround('regr_r2(y, x)', 6)} AS r2
    FROM top GROUP BY source
    """,
    tags=("L9", "L6", "A10", "W1"),
)
def l76_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit per source: OLS slope and R² of
    ln(freq) vs ln(rank) over each source's top-100 terms [PK: Zipf
    1949; Piantadosi, "Zipf's word frequency law in natural language",
    Psychon Bull Rev 2014]. Natural text sits near slope −1 with high
    R²; machine-generated spam, boilerplate floods and template farms
    bend the curve — this is the distribution-level corpus-quality
    diagnostic that per-document filters (l50 gopher rules, l43
    perplexity) cannot see, and the standard first plot on any new
    crawl source before mixing it (l66/l29 consume the verdict).

    Plan shape for 100 TB: tokenize/explode feeds a map-side partial
    (source, token) count — the only fact-sized shuffle; the per-source
    rank window runs over the PRE-AGGREGATED term table (the c2/dq9
    lint-allowed shape — input is vocabulary-sized, not corpus-sized),
    is cut to 100 rows per source immediately, and the regression is a
    tiny algebraic aggregate over ≤ 100·|sources| rows.
    """
    tf = (
        load(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("token").asc()
    )
    top = (
        tf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select(
            "source",
            F.log(F.col("rn").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    return top.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope("y", "x"), 6).alias("slope"),
        F.round(F.regr_r2("y", "x"), 6).alias("r2"),
    )
